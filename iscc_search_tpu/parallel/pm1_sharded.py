"""
Sharded ±1-matmul top-k: the production scan over a device mesh.

Row-shards the packed code matrix over the 1-D mesh axis; each device runs
the local pm1 scan (ops/pm1_scan.py) over its rows, then per-shard candidates
merge with an all_gather over ICI plus a local top-k (k·n_shards floats per
query — latency-bound, not bandwidth-bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from iscc_search_tpu.ops.pm1_scan import NEG_SCORE, pm1_blockmax_topk_impl, pm1_topk_impl
from iscc_search_tpu.parallel.mesh import SHARD_AXIS


def shard_pm1_database(mesh, db_packed, db_valid, axis_name=SHARD_AXIS):
    # type: (...) -> tuple
    """Place packed codes + validity row-sharded over the mesh axis."""
    n = mesh.shape[axis_name]
    if db_packed.shape[0] % n:
        raise ValueError(f"db rows {db_packed.shape[0]} not divisible by {n} shards")
    return (
        jax.device_put(db_packed, NamedSharding(mesh, P(axis_name, None))),
        jax.device_put(db_valid, NamedSharding(mesh, P(axis_name))),
    )


@functools.lru_cache(maxsize=64)
def _make_fn(mesh, k, nbits, chunk_size, dtype, recall_target, axis_name, merge_k=None):
    # merge_k: width of the GLOBAL top-k over the gathered n*k candidates.
    # Defaults to k; counts larger than the per-shard k need merge_k > k or
    # the merge silently truncates results that exist across shards.
    merge_k = k if merge_k is None else merge_k
    def local_step(q_pm1, q_scale, db_packed, db_valid):
        if recall_target is None:
            # Exact local scan via two-phase block-max (no per-chunk sort) —
            # the same fast path the single-device engine uses.
            scores, idx = pm1_blockmax_topk_impl(
                q_pm1,
                q_scale,
                db_packed,
                db_valid,
                k,
                nbits,
                chunk_size=chunk_size,
                dtype=dtype,
                pvary_axes=(axis_name,),
            )
        else:
            scores, idx = pm1_topk_impl(
                q_pm1,
                q_scale,
                db_packed,
                db_valid,
                k,
                nbits,
                chunk_size=chunk_size,
                dtype=dtype,
                recall_target=recall_target,
                pvary_axes=(axis_name,),
            )
        shard = jax.lax.axis_index(axis_name)
        idx = jnp.where(idx >= 0, idx + shard * db_packed.shape[0], -1)
        all_s = jax.lax.all_gather(scores, axis_name, axis=1, tiled=True)
        all_i = jax.lax.all_gather(idx, axis_name, axis=1, tiled=True)
        top_s, pos = jax.lax.top_k(all_s, min(merge_k, all_s.shape[1]))
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        return top_s, jnp.where(top_s > NEG_SCORE, top_i, -1)

    kwargs = dict(
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name, None), P(axis_name)),
        out_specs=(P(), P()),
    )
    try:
        mapped = shard_map(local_step, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax spelling
        mapped = shard_map(local_step, check_rep=False, **kwargs)
    return jax.jit(mapped)


def sharded_pm1_topk(
    mesh,
    q_pm1,
    q_scale,
    db_packed,
    db_valid,
    k,
    nbits,
    chunk_size=32768,
    dtype=jnp.bfloat16,
    recall_target=None,
    axis_name=SHARD_AXIS,
    merge_k=None,
):
    # type: (...) -> tuple
    """
    Global top-k over a row-sharded packed database via the ±1 matmul scan.

    :param q_pm1: (Q, nbits) ±1 queries, prefix-masked (replicated)
    :param q_scale: (Q,) per-query scale 1/(2*min_bits)
    :param db_packed/db_valid: row-sharded (see shard_pm1_database)
    :return: replicated (scores (Q, merge_k or k), global row indices of the same width)
    """
    fn = _make_fn(mesh, k, nbits, chunk_size, dtype, recall_target, axis_name, merge_k)
    return fn(q_pm1, q_scale, db_packed, db_valid)
