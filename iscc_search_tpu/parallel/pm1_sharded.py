"""
Sharded ±1-matmul top-k: the production scan over a device mesh.

Row-shards the packed code matrix over the mesh's row axes; each device runs
the local pm1 scan (ops/pm1_scan.py) over its rows, then per-shard candidates
merge via :mod:`iscc_search_tpu.parallel.merge` — a flat all_gather + top-k
on a 1-D ICI mesh, a hierarchical ICI-then-DCN two-stage merge on the 2-D
multi-host mesh (parallel/hier.py design). Placement is multi-process aware
(parallel/mesh.place_rows): under jax.distributed each host uploads only its
own row block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from iscc_search_tpu.ops.pm1_scan import pm1_blockmax_topk_impl, pm1_topk_impl
from iscc_search_tpu.parallel.merge import lift_rows, merge_topk
from iscc_search_tpu.parallel.mesh import place_rows


def shard_pm1_database(mesh, db_packed, db_valid, axis_name=None):
    # type: (...) -> tuple
    """Place packed codes + validity row-sharded over ALL mesh row axes
    (multi-process aware — see place_rows). ``axis_name`` is accepted for
    backward compatibility and ignored; the mesh defines its axes."""
    n = int(np.prod(list(mesh.shape.values())))
    if db_packed.shape[0] % n:
        raise ValueError(f"db rows {db_packed.shape[0]} not divisible by {n} shards")
    return (
        place_rows(mesh, db_packed),
        place_rows(mesh, db_valid, with_cols=False),
    )


@functools.lru_cache(maxsize=64)
def _make_fn(mesh, k, nbits, chunk_size, dtype, recall_target, axes, merge_k=None):
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
                pvary_axes=axes,
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
                pvary_axes=axes,
            )
        idx = lift_rows(idx, db_packed.shape[0], axes)
        return merge_topk(scores, idx, axes, merge_k)

    kwargs = dict(
        mesh=mesh,
        in_specs=(P(), P(), P(axes, None), P(axes)),
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
    axis_name=None,
    merge_k=None,
):
    # type: (...) -> tuple
    """
    Global top-k over a row-sharded packed database via the ±1 matmul scan.

    Works over any row-sharded mesh: flat merge on a 1-D mesh, hierarchical
    ICI→DCN merge on the 2-D multi-host mesh (merge.merge_topk).

    :param q_pm1: (Q, nbits) ±1 queries, prefix-masked (replicated)
    :param q_scale: (Q,) per-query scale 1/(2*min_bits)
    :param db_packed/db_valid: row-sharded (see shard_pm1_database)
    :return: replicated (scores (Q, merge_k or k), global row indices of the same width)
    """
    fn = _make_fn(mesh, k, nbits, chunk_size, dtype, recall_target, tuple(mesh.axis_names), merge_k)
    return fn(q_pm1, q_scale, db_packed, db_valid)
