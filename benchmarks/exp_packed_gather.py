"""A/B the phase-3 rescore source: int8 twin vs in-kernel packed unpack.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/exp_packed_gather.py

If the packed variant holds parity, the plain int8 twin (2.68 GB at 10M
rows) can be dropped from HBM entirely (capacity: ~18M -> ~40M rows/chip).
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from iscc_search_tpu.ops.pallas_scan import (
    BLOCK,
    build_unpacked_db,
    gather_perm_offsets,
    pallas_blockmax,
    pallas_gather_rescore,
    pallas_gather_rescore_packed,
)
from iscc_search_tpu.ops.pm1_scan import NEG_SCORE, prepare_queries, topk_blocks_hier

N = 10 * 1024 * 1024
Q = 256
K = 10
NBITS = 256
CHUNK = 32768
REPEAT = 20


def bench(fn, *args, repeat=REPEAT, rounds=3, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    _rb(out)
    cs = time.perf_counter() - t0
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _r in range(repeat):
            out = fn(*args, **kw)
        _rb(out)
        best = min(best, (time.perf_counter() - t0) / repeat)
    return best * 1e3, cs, out


def _rb(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[tuple(slice(0, 1) for _ in leaf.shape)])


def full_packed_p3(q_pm1, q_scale, db_packed, db_valid2d, k, db_perm):
    """End-to-end sweep with NO plain int8 twin: perm twin phase 1 + packed
    in-kernel-unpack phase 3."""
    n = db_perm.shape[0]
    q = q_pm1.shape[0]
    block_max = pallas_blockmax(
        q_pm1, q_scale, db_perm, db_valid2d.reshape(n), NBITS,
        chunk_size=CHUNK, unpacked=True, permuted=True,
    )
    kk = min(k, n // BLOCK)
    top_blocks = topk_blocks_hier(block_max, kk)
    offs = jnp.asarray(gather_perm_offsets())
    rows = (top_blocks[:, :, None] * BLOCK + offs[None, None, :]).reshape(q, kk * BLOCK)
    cand_valid = jnp.take(
        db_valid2d.reshape(n // BLOCK, BLOCK), top_blocks.reshape(-1), axis=0
    ).reshape(q, kk, BLOCK)[:, :, offs].reshape(q, kk * BLOCK)
    dots = pallas_gather_rescore_packed(q_pm1, top_blocks, db_packed, kk, NBITS)
    scores = 0.5 + dots.astype(jnp.float32) * q_scale[:, None]
    scores = jnp.where(cand_valid, scores, NEG_SCORE)
    fs, pos = jax.lax.top_k(scores, k)
    fi = jnp.take_along_axis(rows, pos, axis=1)
    return fs, jnp.where(fs > NEG_SCORE, fi, -1)


def main():
    print(json.dumps({"device": str(jax.devices()[0]), "n": N}), flush=True)
    rng = np.random.default_rng(7)
    packed = rng.integers(0, 2**32, (N, NBITS // 32), dtype=np.uint32)
    valid = np.ones(N, bool)
    valid[rng.integers(0, N, 1000)] = False
    qi = rng.integers(0, N, Q)
    q_pm1, q_scale = prepare_queries(packed[qi], np.full(Q, 8, np.int32), NBITS)

    db_packed = jax.device_put(jnp.asarray(packed))
    db_valid = jax.device_put(jnp.asarray(valid))
    db_valid2d = jax.device_put(jnp.asarray(valid.reshape(N // BLOCK, BLOCK)))
    _rb(db_packed)
    db_unpacked = build_unpacked_db(db_packed, NBITS)
    db_perm = build_unpacked_db(db_packed, NBITS, permute=True)
    _rb(db_perm)
    qp, qs = jnp.asarray(q_pm1), jnp.asarray(q_scale)
    q_i8 = jnp.asarray(q_pm1.astype(np.int8))
    results = {}

    # Phase 3 alone
    bm = pallas_blockmax(qp, qs, db_perm, db_valid, NBITS, chunk_size=CHUNK, unpacked=True, permuted=True)
    tb = jax.jit(lambda b: topk_blocks_hier(b, K))(bm)
    ms, cs, d_old = bench(pallas_gather_rescore, q_i8, tb, db_unpacked, K)
    results["p3_int8twin_ms"] = round(ms, 2)
    print(f"p3 int8-twin:   {ms:.2f} ms (compile {cs:.1f}s)", flush=True)
    ms, cs, d_new = bench(pallas_gather_rescore_packed, qp, tb, db_packed, K, NBITS)
    results["p3_packed_ms"] = round(ms, 2)
    print(f"p3 packed:      {ms:.2f} ms (compile {cs:.1f}s)", flush=True)
    perm = gather_perm_offsets()
    same = bool(
        jnp.all(
            jnp.asarray(d_new).reshape(Q, K, BLOCK)
            == jnp.asarray(d_old).reshape(Q, K, BLOCK)[:, :, perm]
        )
    )
    results["p3_match"] = same
    print(f"dots identical (mod perm): {same}", flush=True)

    # End-to-end without the plain twin
    from iscc_search_tpu.ops.pallas_scan import pallas_blockmax_topk

    ms, cs, ref = bench(
        pallas_blockmax_topk, qp, qs, db_packed, db_valid, K, NBITS,
        chunk_size=CHUNK, db_unpacked=db_unpacked, unpacked=True, db_perm=db_perm,
    )
    results["full_twin_ms"] = round(ms, 2)
    print(f"full (twin p3):   {ms:.2f} ms = {Q/(ms/1e3):.0f} QPS", flush=True)
    fj = jax.jit(full_packed_p3, static_argnames=("k",))
    ms, cs, out = bench(fj, qp, qs, db_packed, db_valid2d, K, db_perm)
    results["full_packed_ms"] = round(ms, 2)
    print(f"full (packed p3): {ms:.2f} ms = {Q/(ms/1e3):.0f} QPS (compile {cs:.1f}s)", flush=True)
    same_i = bool(jnp.all(ref[1] == out[1]))
    same_s = bool(jnp.allclose(ref[0], out[0]))
    results["full_match"] = same_i and same_s
    print(f"end-to-end identical: idx={same_i} scores={same_s}", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
