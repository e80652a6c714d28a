"""Phase-level A/B timing harness for the exact scan on one TPU chip.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/exp_phase.py [exp ...]

Timing methodology (axon tunnel has ~30-60 ms fixed dispatch/readback
latency): queue REPEAT async dispatches, force ONE tiny readback, divide.

Experiments (default: p1 p2 p3old p3new full):
  p1     - fused Pallas phase-1 block maxima (unpacked int8 layout)
  p2     - hierarchical top-k block selection from maxima
  p3old  - XLA take + batched dot rescore
  p3new  - Pallas scalar-prefetch gather + dot rescore
  full   - end-to-end pallas_blockmax_topk (current wiring)
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
from iscc_search_tpu.ops.pm1_scan import prepare_queries, topk_blocks_hier

N = int(float(sys.argv[sys.argv.index("--n") + 1])) if "--n" in sys.argv else 10 * 1024 * 1024
Q = 256
K = 10
NBITS = 256
CHUNK = 16384
REPEAT = 10

args = sys.argv[1:]
exps = []
skip = False
for i, a in enumerate(args):
    if skip:
        skip = False
        continue
    if a.startswith("--"):
        skip = True
        continue
    exps.append(a)
if not exps:
    exps = ["p1", "p2", "p3old", "p3new", "full"]


def bench(fn, *args, repeat=REPEAT, rounds=3, **kw):
    """Queue `repeat` async dispatches, one tiny readback; min over rounds."""
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


def main():
    print(json.dumps({"device": str(jax.devices()[0]), "n": N, "q": Q}), flush=True)
    rng = np.random.default_rng(7)
    packed = rng.integers(0, 2**32, (N, NBITS // 32), dtype=np.uint32)
    lanes = np.full(N, 8, np.int32)
    q_packed = packed[rng.integers(0, N, Q)]
    q_pm1, q_scale = prepare_queries(q_packed, lanes[:Q], NBITS)

    t0 = time.perf_counter()
    db_packed = jax.device_put(jnp.asarray(packed))
    db_valid = jax.device_put(jnp.asarray(np.ones(N, bool)))
    _readback(db_packed)
    print(f"stage packed: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    db_unpacked = build_unpacked_db(db_packed, NBITS)
    _readback(db_unpacked)
    print(f"build unpacked: {time.perf_counter()-t0:.1f}s", flush=True)

    qp = jnp.asarray(q_pm1)
    qs = jnp.asarray(q_scale)
    q_i8 = jnp.asarray(q_pm1.astype(np.int8))

    results = {}

    bm = None
    if {"p1", "p2", "p3old", "p3new"} & set(exps):
        ms, cs, bm = bench(
            pallas_blockmax, qp, qs, db_unpacked, db_valid, NBITS, chunk_size=CHUNK, unpacked=True
        )
        results["p1_blockmax_ms"] = round(ms, 2)
        print(f"p1 blockmax: {ms:.2f} ms (compile {cs:.1f}s)", flush=True)

    top_blocks = None
    if bm is not None:
        f = jax.jit(lambda b: topk_blocks_hier(b, K))
        ms, cs, top_blocks = bench(f, bm)
        results["p2_blocksel_ms"] = round(ms, 2)
        print(f"p2 block select: {ms:.2f} ms", flush=True)

    d_old = d_new = None
    if "p3old" in exps and top_blocks is not None:
        @jax.jit
        def p3_old(tb, db, qi8):
            rows = tb[:, :, None] * BLOCK + jnp.arange(BLOCK, dtype=jnp.int32)[None, None, :]
            rows = rows.reshape(Q, K * BLOCK)
            cand = jnp.take(db, rows.reshape(-1), axis=0).reshape(Q, K * BLOCK, NBITS)
            return jax.lax.dot_general(
                qi8[:, None, :], cand, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.int32
            ).reshape(Q, K * BLOCK)

        ms, cs, d_old = bench(p3_old, top_blocks, db_unpacked, q_i8)
        results["p3_old_ms"] = round(ms, 2)
        print(f"p3 old (XLA take+dot): {ms:.2f} ms", flush=True)

    if "p3new" in exps and top_blocks is not None:
        ms, cs, d_new = bench(pallas_gather_rescore, q_i8, top_blocks, db_unpacked, K)
        results["p3_new_ms"] = round(ms, 2)
        print(f"p3 new (pallas gather): {ms:.2f} ms (compile {cs:.1f}s)", flush=True)
        if d_old is not None:
            same = bool(jnp.all(d_old == d_new))
            print(f"p3 old/new dots identical: {same}", flush=True)
            results["p3_match"] = same

    if "full" in exps:
        ms, cs, (fs, fi) = bench(
            pallas_blockmax_topk, qp, qs, db_packed, db_valid, K, NBITS,
            chunk_size=CHUNK, db_unpacked=db_unpacked, unpacked=True,
        )
        results["full_ms"] = round(ms, 2)
        results["full_qps"] = round(Q / (ms / 1e3))
        print(f"full exact sweep: {ms:.2f} ms = {Q/(ms/1e3):.0f} QPS (compile {cs:.1f}s)", flush=True)
        i0 = np.asarray(fi[:4, 0])
        s0 = np.asarray(fs[:4, 0])
        print(f"sanity: top-1 self-match scores {s0} (expect ~1.0)", flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
