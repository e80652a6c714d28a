"""
Sharded fused-Pallas top-k: the fast single-chip kernel, per shard.

Row-shards the ±1 int8 layout over the mesh's row axes and runs the fused
Pallas phase-1 + hierarchical block select + Pallas gather rescore on every
device (the same path the single-chip engine uses), then merges per-shard
candidates via parallel/merge — a flat all_gather on a 1-D ICI mesh, the
hierarchical ICI-then-DCN two-stage merge on the 2-D multi-host mesh — so
multi-chip AND multi-host deployments keep the fast kernel instead of
regressing to the XLA packed scan (engine/device_index.py routing).
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

from iscc_search_tpu.ops.pm1_scan import unpack_pm1
from iscc_search_tpu.parallel.merge import lift_rows, merge_topk


def shard_unpacked_db(mesh, db_packed_sharded, nbits, axis_name=None, chunk_rows=65536, permute=False):
    # type: (...) -> jnp.ndarray
    """
    Build the row-sharded ±1 int8 layout from a row-sharded packed database.

    Each device unpacks its own rows chunk-wise (lax.map bounds the transient
    unpack intermediates to one chunk), so peak per-chip HBM is the local
    int8 output plus one chunk. ``permute=True`` builds the permute_rows()
    twin for the fast tree-epilogue kernel (per-shard rows % 4096 == 0).
    """
    from iscc_search_tpu.ops.pallas_scan import permute_rows

    def local(packed):
        n, lanes = packed.shape
        c = chunk_rows if n % chunk_rows == 0 else n
        c = min(c, n)
        if permute and c % 4096:
            c = n
        out = jax.lax.map(
            lambda ch: permute_rows(unpack_pm1(ch, nbits, jnp.int8)) if permute
            else unpack_pm1(ch, nbits, jnp.int8),
            packed.reshape(n // c, c, lanes),
        )
        return out.reshape(n, nbits)

    axes = tuple(mesh.axis_names)
    kwargs = dict(mesh=mesh, in_specs=P(axes, None), out_specs=P(axes, None))
    try:
        mapped = shard_map(local, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax spelling
        mapped = shard_map(local, check_rep=False, **kwargs)
    return jax.jit(mapped)(db_packed_sharded)


@functools.lru_cache(maxsize=32)
def _penalty_fn(mesh, mode, axes):
    # Cached per (mesh, mode, axis): building shard_map + jit objects per
    # call would retrace and recompile the sharded permute on EVERY validity
    # generation — hundreds of ms to save the ~3-6 ms it amortizes.
    from iscc_search_tpu.ops.pallas_scan import make_blockmax_penalty

    local = functools.partial(make_blockmax_penalty, mode=mode)
    kwargs = dict(mesh=mesh, in_specs=P(axes), out_specs=P(None, axes))
    try:
        mapped = shard_map(local, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax spelling
        mapped = shard_map(local, check_rep=False, **kwargs)
    return jax.jit(mapped)


def shard_blockmax_penalty(mesh, db_valid_sharded, mode, axis_name=None):
    # type: (...) -> jnp.ndarray
    """
    Row-sharded make_blockmax_penalty(): each device builds the (1, local_n)
    penalty row for its own validity shard. Build once per validity
    generation and pass to sharded_pallas_topk(db_penalty=...) — the in-jit
    fallback permute costs ~half a sweep at 10M rows per chip.
    """
    return _penalty_fn(mesh, mode, tuple(mesh.axis_names))(db_valid_sharded)


@functools.lru_cache(maxsize=64)
def _make_fn(mesh, k, nbits, chunk_size, interpret, axes, with_unpacked, with_perm, merge_k=None, with_penalty=False):
    merge_k = k if merge_k is None else merge_k  # see pm1_sharded._make_fn
    from iscc_search_tpu.ops.pallas_scan import pallas_blockmax_topk_impl

    def local_step(q_pm1, q_scale, db_packed, db_valid, *twins):
        db_penalty = twins[-1] if with_penalty else None
        if with_penalty:
            twins = twins[:-1]
        db_unpacked = twins[0] if with_unpacked else None
        db_perm = twins[-1] if with_perm else None
        scores, idx = pallas_blockmax_topk_impl(
            q_pm1,
            q_scale,
            db_packed,
            db_valid,
            k,
            nbits,
            chunk_size=chunk_size,
            interpret=interpret,
            db_unpacked=db_unpacked,
            unpacked=True,
            db_perm=db_perm,
            db_penalty=db_penalty,
        )
        idx = lift_rows(idx, db_packed.shape[0], axes)
        return merge_topk(scores, idx, axes, merge_k)

    in_specs = [P(), P(), P(axes, None), P(axes)]
    in_specs += [P(axes, None)] * (int(with_unpacked) + int(with_perm))
    if with_penalty:
        in_specs += [P(None, axes)]
    kwargs = dict(mesh=mesh, in_specs=tuple(in_specs), out_specs=(P(), P()))
    try:
        mapped = shard_map(local_step, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax spelling
        mapped = shard_map(local_step, check_rep=False, **kwargs)
    return jax.jit(mapped)


def sharded_pallas_topk(
    mesh,
    q_pm1,
    q_scale,
    db_packed,
    db_unpacked,
    db_valid,
    k,
    nbits,
    chunk_size=16384,
    interpret=False,
    db_perm=None,
    axis_name=None,
    merge_k=None,
    db_penalty=None,
):
    # type: (...) -> tuple
    """
    Global exact top-k over a row-sharded ±1 int8 layout via the fused
    Pallas kernel per shard + ICI all-gather merge.

    :param q_pm1: (Q, nbits) ±1 queries, prefix-masked (replicated)
    :param q_scale: (Q,) per-query scale 1/(2*min_bits)
    :param db_packed/db_valid: row-sharded arrays
    :param db_unpacked: optional row-sharded ±1 int8 twin (fast Pallas
        phase-3 gather); None falls back to packed takes + XLA unpack
    :param interpret: run the Pallas kernels in interpreter mode (CPU meshes)
    :param db_perm: optional row-sharded permute_rows() twin — routes phase 1
        through the fast tree-epilogue kernel per shard
    :param db_penalty: optional shard_blockmax_penalty() row for this path's
        penalty_mode() — hot callers pass it to skip the per-sweep permute
    :return: replicated (scores (Q, merge_k or k), global row indices of the same width)
    """
    if db_unpacked is None and db_perm is None:
        raise ValueError("sharded_pallas_topk needs at least one int8 twin")
    fn = _make_fn(
        mesh, k, nbits, chunk_size, interpret, tuple(mesh.axis_names),
        db_unpacked is not None, db_perm is not None, merge_k,
        db_penalty is not None,
    )
    args = (q_pm1, q_scale, db_packed, db_valid)
    if db_unpacked is not None:
        args = args + (db_unpacked,)
    if db_perm is not None:
        args = args + (db_perm,)
    if db_penalty is not None:
        args = args + (db_penalty,)
    return fn(*args)
