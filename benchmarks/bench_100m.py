"""
100M-codes-on-one-chip benchmark (BASELINE.json config 5 scale, single chip).

The packed layout keeps 100M x 256-bit codes in ~3.2 GB of HBM, so one v5e
chip can serve the aggregator-scale corpus exhaustively (exact top-k) without
sharding; the fused packed-layout Pallas kernel unpacks in VMEM on the fly.
The database is generated on device (jax.random.bits) to avoid staging 3.2 GB
through the host.

Writes benchmarks/RESULTS_100M.json. Run on TPU:
    PYTHONPATH=. python benchmarks/bench_100m.py
"""

import json
import os
import time
from pathlib import Path

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from iscc_search_tpu.ops.pm1_scan import pm1_blockmax_topk, prepare_queries

    # 6144 super-blocks of 128 blocks of 128 rows = 100,663,296 rows
    n = int(os.environ.get("ISCC_BENCH_100M_N", 6144 * 128 * 128))
    n = (n // 32768) * 32768  # scan requires a chunk multiple (see bench.py)
    q_batch = int(os.environ.get("ISCC_BENCH_100M_Q", 256))
    k = 10
    chunk = 32768

    results = {"device": str(jax.devices()[0]), "n": n, "q": q_batch, "k": k, "chunk": chunk}

    t0 = time.perf_counter()
    key = jax.random.key(0)
    db = jax.random.bits(key, (n, 8), dtype=jnp.uint32)
    valid = jnp.ones(n, bool)
    _ = np.asarray(db[:1, :1])
    results["device_gen_s"] = round(time.perf_counter() - t0, 2)

    qi = (np.arange(q_batch) * (n // q_batch)).astype(np.int64)
    q_packed = np.asarray(db[jnp.asarray(qi)])
    q_pm1, q_scale = prepare_queries(q_packed, np.full(q_batch, 8, np.int32), 256)
    qp, qs = jnp.asarray(q_pm1), jnp.asarray(q_scale)

    # Bitplane Pallas kernel (the 100M fast path: bit_transpose_packed twin,
    # 2x packed HBM, stored as its native (N/16, 128) view so the operand
    # tiles compactly — the u32[N,8] shape would lane-pad 16x, 51 GB) vs the
    # XLA packed block-max scan (the no-twin fallback).
    from iscc_search_tpu.ops.pallas_scan import (
        bit_transpose_packed,
        make_blockmax_penalty,
        packed_to_view,
        pallas_blockmax_topk,
    )

    # The production tier keeps the packed view (contiguous phase-3 gathers)
    # and the hoisted penalty row alongside the bitplane twin — same twins
    # the engine builds, in the same order (view FIRST: building it next to
    # an already-resident bitplane twin measured a runtime OOM at 100M).
    t0 = time.perf_counter()
    view = jax.block_until_ready(packed_to_view(db))
    pen = jax.block_until_ready(
        jax.jit(lambda v: make_blockmax_penalty(v, "bitplane"))(valid)
    )
    results["view_build_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    bt = jax.block_until_ready(jax.jit(bit_transpose_packed)(db))
    results["bitplane_build_s"] = round(time.perf_counter() - t0, 2)

    modes = {
        "bitplane": lambda: pallas_blockmax_topk(
            qp, qs, db, valid, k, 256, chunk_size=chunk, db_bitplane=bt,
            db_penalty=pen, db_packed_view=view,
        ),
        "xla": lambda: pm1_blockmax_topk(qp, qs, db, valid, k, 256, chunk_size=chunk),
    }
    repeat = int(os.environ.get("ISCC_BENCH_REPEAT", 5))
    first_scores = {}
    for label, run in modes.items():
        t0 = time.perf_counter()
        fs, fi = run()
        fs, fi = np.asarray(fs), np.asarray(fi)
        results[label] = {"compile_s": round(time.perf_counter() - t0, 2)}
        assert np.array_equal(fi[:, 0], qi), f"{label}: self-match failed"
        assert np.allclose(fs[:, 0], 1.0, atol=1e-3)
        first_scores[label] = fs
    # Exactness across kernels: both are exact top-k, so the score
    # multisets must agree everywhere (not just the self-match column).
    assert np.allclose(first_scores["bitplane"], first_scores["xla"], atol=2e-3), (
        "bitplane vs XLA top-k scores diverge"
    )
    for label, run in modes.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(repeat):
                out = run()
            np.asarray(out[0])
            best = min(best, (time.perf_counter() - t0) / repeat)
        results[label]["exact_sweep_ms"] = round(best * 1e3, 1)
        results[label]["exact_qps"] = round(q_batch / best)
    results["exact_qps"] = max(results[m]["exact_qps"] for m in modes)
    results["hbm_db_gb"] = round(n * 32 / 2**30, 2)

    out_path = Path(__file__).parent / "RESULTS_100M.json"
    out_path.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
