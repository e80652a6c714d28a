"""
Exact chunked top-k scan over the packed code matrix.

The database never materializes a full (Q, N) score matrix: a ``lax.scan``
walks fixed-size chunks, scores each chunk, and merges it into a carried
(Q, k) best set with ``lax.top_k``. XLA pipelines the chunk loads against the
merge, so the scan runs at HBM bandwidth for large N. This is the exhaustive
replacement for the reference's HNSW graph traversal (recall is 1.0 by
construction — contract mirrored from tests/test_usearch_search.py semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from iscc_search_tpu.ops.nphd import NEG_SCORE, hamming_scores, nphd_scores


def topk_scan_impl(
    q_codes,
    q_lanes,
    db_codes,
    db_lanes,
    db_valid,
    k,
    chunk_size=8192,
    metric="nphd",
    ndim_bits=None,
    pvary_axes=(),
):
    # type: (...) -> tuple[jnp.ndarray, jnp.ndarray]
    """
    Exact top-k search over a packed database.

    :param q_codes: (Q, L) uint32 packed queries
    :param q_lanes: (Q,) int32 query lane counts (ignored for metric="hamming")
    :param db_codes: (N, L) uint32 packed database; N must be a multiple of
        chunk_size (the engine pads capacity with invalid rows)
    :param db_lanes: (N,) int32 row lane counts
    :param db_valid: (N,) bool row validity (tombstones/padding = False)
    :param k: number of results per query (static)
    :param metric: "nphd" or "hamming" (static)
    :param ndim_bits: bit width for hamming normalization (static)
    :return: (scores (Q, k) float32 desc-sorted, indices (Q, k) int32;
        padding entries have score NEG_SCORE and index -1)
    """
    n = db_codes.shape[0]
    q = q_codes.shape[0]
    max_lanes = db_codes.shape[1]
    if n % chunk_size:
        raise ValueError(f"db size {n} not a multiple of chunk_size {chunk_size}")
    if k > chunk_size:
        raise ValueError(f"k={k} exceeds chunk_size={chunk_size}")
    if metric not in ("nphd", "hamming"):
        # an unknown string would silently fall through to the hamming branch
        raise ValueError(f"unknown metric: {metric!r} (expected 'nphd' or 'hamming')")
    nchunks = n // chunk_size

    db_codes_c = db_codes.reshape(nchunks, chunk_size, max_lanes)
    db_lanes_c = db_lanes.reshape(nchunks, chunk_size)
    db_valid_c = db_valid.reshape(nchunks, chunk_size)
    bases = (jnp.arange(nchunks, dtype=jnp.int32) * chunk_size)[:, None]

    col_idx = jnp.arange(chunk_size, dtype=jnp.int32)[None, :]

    def body(carry, xs):
        best_s, best_i = carry
        codes, lanes, valid, base = xs
        if metric == "nphd":
            s = nphd_scores(q_codes, q_lanes, codes, lanes, valid)
        else:
            s = hamming_scores(q_codes, codes, ndim_bits, valid)
        idx = jnp.broadcast_to(base + col_idx, (q, chunk_size))
        all_s = jnp.concatenate([best_s, s], axis=1)
        all_i = jnp.concatenate([best_i, idx], axis=1)
        top_s, pos = jax.lax.top_k(all_s, k)
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        return (top_s, top_i), None

    init = (
        jnp.full((q, k), NEG_SCORE, dtype=jnp.float32),
        jnp.full((q, k), -1, dtype=jnp.int32),
    )
    if pvary_axes:
        # Inside shard_map the scanned db arrays are device-varying while this
        # constant carry is replicated; mark it varying so the scan types agree
        # under jax's varying-mesh-axes checking.
        from iscc_search_tpu.ops.pm1_scan import _mark_varying

        init = tuple(_mark_varying(x, tuple(pvary_axes)) for x in init)
    (scores, indices), _ = jax.lax.scan(body, init, (db_codes_c, db_lanes_c, db_valid_c, bases))
    # Mark padding (score == NEG_SCORE) indices as -1
    indices = jnp.where(scores > NEG_SCORE, indices, -1)
    return scores, indices


topk_scan = jax.jit(topk_scan_impl, static_argnames=("k", "chunk_size", "metric", "ndim_bits", "pvary_axes"))
