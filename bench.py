"""
Headline benchmark: exact NPHD top-10 QPS over 10M x 256-bit ISCC codes on a
single TPU chip (BASELINE.json config 3 scale).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline compares against a measured single-core CPU brute-force scan of
the same workload (the reference publishes no benchmark numbers — SURVEY §6 —
and its usearch/LMDB stack is not installable in this environment, so the
exhaustive CPU scan is the measured baseline; details, including the
recall-targeted fast path, go to BENCH_DETAILS.json).

Env knobs:
    ISCC_BENCH_N        database rows        (default 10_485_760)
    ISCC_BENCH_Q        query batch          (default 512 — the measured
                                              throughput peak; 1024 regresses)
    ISCC_BENCH_K        top-k                (default 10)
    ISCC_BENCH_CHUNK    scan chunk rows      (default 32768)
"""

import json
import os
import time

import numpy as np


def cpu_brute_force_qps(packed, q_packed, k, sample_rows=1_048_576):
    """Single-core numpy XOR+popcount scan QPS, extrapolated to full N.

    Best-of-3 trials: the single-sample figure swung 2x between runs on a
    busy host, and the baseline should get its most favorable (fastest)
    measurement.
    """
    n = packed.shape[0]
    rows = min(sample_rows, n)
    db = packed[:rows]
    nq = min(4, q_packed.shape[0])
    best = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        for qi in range(nq):
            x = np.bitwise_xor(db, q_packed[qi][None, :])
            ham = np.bitwise_count(x).sum(axis=1)
            np.argpartition(ham, k)[:k]
        best = min(best, (time.perf_counter() - t0) / nq)
    # Extrapolate linearly to the full database size
    return 1.0 / (best * (n / rows))


def main():
    n = int(os.environ.get("ISCC_BENCH_N", 10_485_760))
    q = int(os.environ.get("ISCC_BENCH_Q", 512))
    k = int(os.environ.get("ISCC_BENCH_K", 10))
    chunk = int(os.environ.get("ISCC_BENCH_CHUNK", 32768))
    n = (n // chunk) * chunk

    import jax
    import jax.numpy as jnp

    from iscc_search_tpu.ops.pm1_scan import pm1_blockmax_topk, pm1_topk, prepare_queries

    rng = np.random.default_rng(0)
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    q_idx = (np.arange(q) * (n // q)).astype(np.int64)
    q_packed = packed[q_idx].copy()
    q_lanes = np.full(q, 8, np.int32)

    details = {"n": n, "q": q, "k": k, "chunk": chunk, "device": str(jax.devices()[0])}

    # Stage database on device
    t0 = time.perf_counter()
    db_d = jax.device_put(jnp.asarray(packed))
    valid_d = jax.device_put(jnp.asarray(np.ones(n, bool)))
    _ = np.asarray(db_d[:1, :1])
    details["device_put_s"] = round(time.perf_counter() - t0, 2)

    q_pm1, q_scale = prepare_queries(q_packed, q_lanes, 256)
    q_pm1_d, q_scale_d = jnp.asarray(q_pm1), jnp.asarray(q_scale)

    from iscc_search_tpu.ops.pallas_scan import (
        bit_transpose_packed,
        build_unpacked_db,
        make_blockmax_penalty,
        pallas_blockmax_topk,
    )

    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
    db_unpacked = db_perm = db_bitplane = pen_bt = None
    if on_tpu:
        t0 = time.perf_counter()
        db_unpacked = build_unpacked_db(db_d, 256)
        db_perm = build_unpacked_db(db_d, 256, permute=True)
        db_bitplane = jax.jit(bit_transpose_packed)(db_d)
        pen_bt = make_blockmax_penalty(valid_d, "bitplane")
        _ = np.asarray(db_unpacked[:1, :1])
        details["unpacked_build_s"] = round(time.perf_counter() - t0, 2)

    def dispatch(mode):
        if mode == "exact_pallas":
            # The engine's production tier: bitplane phase 1 (32 B/row HBM)
            # + plain-int8 Pallas gather phase 3 (EXP_BITPLANE_10M.json).
            return pallas_blockmax_topk(
                q_pm1_d, q_scale_d, db_d, valid_d, k, 256, chunk_size=chunk,
                db_unpacked=db_unpacked, unpacked=False, db_bitplane=db_bitplane,
                db_penalty=pen_bt,
            )
        if mode == "exact_pallas_perm":
            # Previous production tier (perm-int8 phase 1), kept for the A/B.
            return pallas_blockmax_topk(
                q_pm1_d, q_scale_d, db_d, valid_d, k, 256, chunk_size=chunk,
                db_unpacked=db_unpacked, unpacked=True, db_perm=db_perm,
            )
        if mode == "exact":
            return pm1_blockmax_topk(q_pm1_d, q_scale_d, db_d, valid_d, k, 256, chunk_size=chunk)
        return pm1_topk(q_pm1_d, q_scale_d, db_d, valid_d, k, 256, chunk_size=chunk, recall_target=0.99)

    # The harness reaches the TPU through a tunnel with tens of ms of fixed
    # dispatch+readback latency per call; amortize it by queueing REPEAT async
    # dispatches and forcing one readback at the end (single-device program
    # order serializes them). 30 reps leave <= ~2ms of residual readback bias
    # per sweep (was 10 in round 1, which inflated sweeps by ~3ms).
    repeat = int(os.environ.get("ISCC_BENCH_REPEAT", 30))
    results = {}
    modes = ["exact", "recall_0.99"] + (["exact_pallas", "exact_pallas_perm"] if on_tpu else [])
    for label in modes:
        t0 = time.perf_counter()
        s, i = dispatch(label)
        s, i = np.asarray(s), np.asarray(i)
        results.setdefault(label, {})["compile_s"] = round(time.perf_counter() - t0, 2)
        assert np.array_equal(i[:, 0], q_idx), "self-match failed"
        assert np.allclose(s[:, 0], 1.0, atol=1e-3)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _r in range(repeat):
                out = dispatch(label)
            np.asarray(out[0])
            best = min(best, (time.perf_counter() - t0) / repeat)
        results[label]["sweep_ms"] = round(best * 1000, 2)
        results[label]["qps"] = round(q / best)
    details["tpu"] = results

    # CPU brute-force baseline (same workload, single core)
    cpu_qps = cpu_brute_force_qps(packed, q_packed, k)
    details["cpu_brute_force_qps"] = round(cpu_qps, 3)

    # Headline: the best exact path (fused Pallas kernel when on TPU)
    tpu_qps = max(results[m]["qps"] for m in results if m.startswith("exact"))
    details["speedup_exact_vs_cpu"] = round(tpu_qps / cpu_qps, 1)
    details["speedup_fast_vs_cpu"] = round(results["recall_0.99"]["qps"] / cpu_qps, 1)

    # Preserve the hand-curated usearch-baseline comparison section across
    # re-runs (it anchors the vs-HNSW claim; see benchmarks/hnsw_baseline.py),
    # refreshing only the live engine number inside it.
    details_path = os.path.join(os.path.dirname(__file__) or ".", "BENCH_DETAILS.json")
    try:
        with open(details_path) as fh:
            prior = json.load(fh)
        baseline_cmp = prior.get("baseline_comparison")
    except (OSError, ValueError):
        baseline_cmp = None
    if baseline_cmp is not None:
        baseline_cmp.setdefault("this_engine", {})["qps_one_chip"] = tpu_qps
        # Regenerate the native-HNSW extrapolation from the MEASURED
        # eval-cost artifact (benchmarks/hnsw_evalbench.py writes it), so the
        # two committed files can never quote different baselines — the
        # pre-measurement 50-150 ns/eval assumption once left a stale 5,751
        # QPS bound here while HNSW_BASELINE.json measured 1,738-1,751.
        hnsw_path = os.path.join(os.path.dirname(__file__) or ".", "benchmarks", "HNSW_BASELINE.json")
        try:
            with open(hnsw_path) as fh:
                est = json.load(fh)["native_hnsw_estimate_at_10m"]
        except (OSError, ValueError, KeyError):
            est = None
        if est is not None:
            baseline_cmp["native_hnsw_extrapolation"] = {
                "upper_bound_single_core_qps": max(est["single_core_qps_range"]),
                "single_core_qps_range": est["single_core_qps_range"],
                "measured_ns_per_eval": est["measured_ns_per_eval"],
                "evals_per_query_at_10m": est["evals_per_query_at_10m"],
                "model": est["model"],
                "bias": est["bias"],
                "source": "benchmarks/HNSW_BASELINE.json (measured on this host)",
            }
        # Keep the hand-written conclusion's embedded numbers in sync with
        # the refreshed measurement (a stale conclusion quoting the previous
        # QPS would contradict qps_one_chip in the same file).
        upper = baseline_cmp.get("native_hnsw_extrapolation", {}).get("upper_bound_single_core_qps")
        if upper:
            baseline_cmp["conclusion"] = (
                f"{tpu_qps / 1000:.1f}K exact QPS at recall 1.0 vs a measured <={upper / 1000:.1f}K "
                f"single-core native HNSW upper bound: ~{tpu_qps / upper:.0f}x, with recall 1.0 vs "
                f"~0.9 and near-zero build cost; multi-core HNSW scales with cores as this engine "
                f"scales with chips"
            )
        details["baseline_comparison"] = baseline_cmp
    with open(details_path, "w") as fh:
        json.dump(details, fh, indent=2)

    print(
        json.dumps(
            {
                "metric": f"exact NPHD top-{k} QPS, {n // 1_000_000}M x 256-bit codes, batch {q}, single chip",
                "value": tpu_qps,
                "unit": "QPS",
                "vs_baseline": details["speedup_exact_vs_cpu"],
            }
        )
    )


if __name__ == "__main__":
    main()
