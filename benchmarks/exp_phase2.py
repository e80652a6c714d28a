"""Round-2 phase decomposition + glue experiments for the production path.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/exp_phase2.py [exp ...]

Decomposes the CURRENT production wiring (permuted int8 twin, chunk 32768)
and A/Bs the inter-phase glue:

  full      - production pallas_blockmax_topk (perm twin)
  parts     - p1(perm) / p2 / p3 measured separately
  validblk  - full with cand_valid gathered per 128-row BLOCK (one take of
              (N/128, 128) rows) instead of 327K scattered element takes
  chunk64   - p1(perm) at chunk 65536 (DMA sizing)
  sub8k     - p1(perm) with _SUBTILE=8192 (not run by default; edit module)
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
    pallas_blockmax,
    pallas_blockmax_topk,
    pallas_gather_rescore,
)
from iscc_search_tpu.ops.pm1_scan import NEG_SCORE, prepare_queries, topk_blocks_hier

N = int(float(sys.argv[sys.argv.index("--n") + 1])) if "--n" in sys.argv else 10 * 1024 * 1024
Q = 256
K = 10
NBITS = 256
CHUNK = 32768
REPEAT = 20

exps = [a for a in sys.argv[1:] if not a.startswith("--") and not a.replace(".", "").isdigit()]
if not exps:
    exps = ["full", "parts", "validblk"]


def bench(fn, *args, repeat=REPEAT, rounds=3, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    _readback(out)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _r in range(repeat):
            out = fn(*args, **kw)
        _readback(out)
        best = min(best, (time.perf_counter() - t0) / repeat)
    return best * 1e3, compile_s, out


def _readback(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[tuple(slice(0, 1) for _ in leaf.shape)])


def validblk_topk(q_pm1, q_scale, db_packed, db_valid2d, k, nbits, chunk_size, db_unpacked, db_perm):
    """pallas_blockmax_topk with the validity gather done per block row."""
    n = db_unpacked.shape[0]
    q = q_pm1.shape[0]
    block_max = pallas_blockmax(
        q_pm1, q_scale, db_perm, db_valid2d.reshape(n), nbits,
        chunk_size=chunk_size, unpacked=True, permuted=True,
    )
    kk = min(k, n // BLOCK)
    top_blocks = topk_blocks_hier(block_max, kk)
    rows = top_blocks[:, :, None] * BLOCK + jnp.arange(BLOCK, dtype=jnp.int32)[None, None, :]
    rows = rows.reshape(q, kk * BLOCK)
    # ONE row-gather per candidate block instead of 128 element-gathers
    cand_valid = jnp.take(db_valid2d, top_blocks.reshape(-1), axis=0).reshape(q, kk * BLOCK)
    dots = pallas_gather_rescore(q_pm1.astype(jnp.int8), top_blocks, db_unpacked, kk)
    scores = 0.5 + dots.astype(jnp.float32) * q_scale[:, None]
    scores = jnp.where(cand_valid, scores, NEG_SCORE)
    fs, pos = jax.lax.top_k(scores, k)
    fi = jnp.take_along_axis(rows, pos, axis=1)
    fi = jnp.where(fs > NEG_SCORE, fi, -1)
    return fs, fi


def main():
    print(json.dumps({"device": str(jax.devices()[0]), "n": N, "q": Q, "chunk": CHUNK}), flush=True)
    rng = np.random.default_rng(7)
    packed = rng.integers(0, 2**32, (N, NBITS // 32), dtype=np.uint32)
    lanes = np.full(N, 8, np.int32)
    q_packed = packed[rng.integers(0, N, Q)]
    q_pm1, q_scale = prepare_queries(q_packed, lanes[:Q], NBITS)
    valid = np.ones(N, bool)
    valid[rng.integers(0, N, 1000)] = False

    t0 = time.perf_counter()
    db_packed = jax.device_put(jnp.asarray(packed))
    db_valid = jax.device_put(jnp.asarray(valid))
    db_valid2d = jax.device_put(jnp.asarray(valid.reshape(N // BLOCK, BLOCK)))
    _readback(db_packed)
    print(f"stage packed: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    db_unpacked = build_unpacked_db(db_packed, NBITS)
    db_perm = build_unpacked_db(db_packed, NBITS, permute=True)
    _readback(db_unpacked)
    print(f"build unpacked+perm: {time.perf_counter()-t0:.1f}s", flush=True)

    qp = jnp.asarray(q_pm1)
    qs = jnp.asarray(q_scale)
    q_i8 = jnp.asarray(q_pm1.astype(np.int8))
    results = {}

    if "full" in exps:
        ms, cs, (fs, fi) = bench(
            pallas_blockmax_topk, qp, qs, db_packed, db_valid, K, NBITS,
            chunk_size=CHUNK, db_unpacked=db_unpacked, unpacked=True, db_perm=db_perm,
        )
        results["full_ms"] = round(ms, 2)
        print(f"full (production): {ms:.2f} ms = {Q/(ms/1e3):.0f} QPS (compile {cs:.1f}s)", flush=True)

    if "parts" in exps:
        ms, cs, bm = bench(
            pallas_blockmax, qp, qs, db_perm, db_valid, NBITS,
            chunk_size=CHUNK, unpacked=True, permuted=True,
        )
        results["p1_perm_ms"] = round(ms, 2)
        print(f"p1 perm: {ms:.2f} ms (compile {cs:.1f}s)", flush=True)
        f = jax.jit(lambda b: topk_blocks_hier(b, K))
        ms, cs, top_blocks = bench(f, bm)
        results["p2_ms"] = round(ms, 2)
        print(f"p2 select: {ms:.2f} ms", flush=True)
        ms, cs, _ = bench(pallas_gather_rescore, q_i8, top_blocks, db_unpacked, K)
        results["p3_ms"] = round(ms, 2)
        print(f"p3 gather-rescore: {ms:.2f} ms (compile {cs:.1f}s)", flush=True)

    if "validblk" in exps:
        fj = jax.jit(validblk_topk, static_argnames=("k", "nbits", "chunk_size"))
        ms, cs, (fs2, fi2) = bench(
            fj, qp, qs, db_packed, db_valid2d, K, NBITS, CHUNK, db_unpacked, db_perm
        )
        results["validblk_ms"] = round(ms, 2)
        print(f"full validblk: {ms:.2f} ms = {Q/(ms/1e3):.0f} QPS (compile {cs:.1f}s)", flush=True)
        if "full" in exps:
            same = bool(jnp.all(fi == fi2)) and bool(jnp.allclose(fs, fs2))
            results["validblk_match"] = same
            print(f"validblk results identical: {same}", flush=True)

    if "chunk64" in exps:
        ms, cs, _ = bench(
            pallas_blockmax, qp, qs, db_perm, db_valid, NBITS,
            chunk_size=65536, unpacked=True, permuted=True,
        )
        results["p1_perm_chunk64_ms"] = round(ms, 2)
        print(f"p1 perm chunk 65536: {ms:.2f} ms (compile {cs:.1f}s)", flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
