"""Measure the packed-perm Pallas phase-1 kernel vs the XLA packed scan.

The 100M-scale question: with no HBM budget for an int8 twin, can a fused
in-kernel-unpack Pallas kernel over the permute_packed_rows() twin (32 B/row,
native (N*lanes/128, 128) u32 operand view, no padded copy) beat the XLA
packed block-max scan? Run on TPU: PYTHONPATH=.:/root/.axon_site python
benchmarks/exp_packed_perm.py [n_million]
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, reps=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from iscc_search_tpu.ops.pallas_scan import (
        pallas_blockmax,
        pallas_blockmax_topk,
        permute_packed_rows,
    )
    from iscc_search_tpu.ops.pm1_scan import pm1_blockmax_topk, prepare_queries

    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = int(n_m * 1024 * 1024)
    q_n, k, chunk = 256, 10, 32768
    dev = jax.devices()[0]
    print(f"device={dev}, n={n:,}, q={q_n}, k={k}, chunk={chunk}", flush=True)

    rng = np.random.default_rng(5)
    t0 = time.perf_counter()
    # Generate on device to avoid host->device transfer of GBs
    key = jax.random.PRNGKey(5)
    packed = jax.random.bits(key, (n, 8), dtype=jnp.uint32)
    packed = jax.block_until_ready(packed)
    valid = jnp.ones(n, bool)
    print(f"gen {time.perf_counter()-t0:.1f}s", flush=True)

    skip_perm_early = bool(int(os.environ.get("ISCC_EXP_SKIP_PERM", "0")))
    pperm = None
    if not skip_perm_early:
        t0 = time.perf_counter()
        build = jax.jit(lambda p: permute_packed_rows(p, 8))
        pperm = jax.block_until_ready(build(packed))
        print(f"perm-packed twin build {time.perf_counter()-t0:.1f}s", flush=True)

    q_packed = np.asarray(packed[:q_n])
    q_lanes = np.full(q_n, 8, np.int32)
    q_pm1, q_scale = prepare_queries(q_packed, q_lanes, 256)
    q_pm1 = jnp.asarray(q_pm1)
    q_scale = jnp.asarray(q_scale)

    results = {"n": n, "q": q_n, "chunk": chunk}

    # Phase-1 only: packed-perm Pallas kernel
    skip_perm = bool(int(os.environ.get("ISCC_EXP_SKIP_PERM", "0")))
    if not skip_perm:
        t0 = time.perf_counter()
        f = lambda: pallas_blockmax(
            q_pm1, q_scale, pperm, valid, 256, chunk_size=chunk, packed_perm=True
        )
        jax.block_until_ready(f())
        results["packed_perm_phase1_compile_s"] = round(time.perf_counter() - t0, 1)
        dt = timeit(f)
        results["packed_perm_phase1_ms"] = round(dt * 1e3, 2)
        print(f"packed-perm phase1: {dt*1e3:.2f} ms", flush=True)

        # Full top-k: packed-perm phase1 + XLA-take rescore
        t0 = time.perf_counter()
        g = lambda: pallas_blockmax_topk(
            q_pm1, q_scale, packed, valid, k, 256, chunk_size=chunk, db_packed_perm=pperm
        )
        jax.block_until_ready(g())
        results["packed_perm_topk_compile_s"] = round(time.perf_counter() - t0, 1)
        dt = timeit(g)
        results["packed_perm_topk_ms"] = round(dt * 1e3, 2)
        results["packed_perm_topk_qps"] = round(q_n / dt)
        print(f"packed-perm topk: {dt*1e3:.2f} ms -> {q_n/dt:,.0f} QPS", flush=True)

    # Bitplane twin: per-lane shift/mask unpack + plane dots
    from iscc_search_tpu.ops.pallas_scan import bit_transpose_packed

    t0 = time.perf_counter()
    build_bt = jax.jit(bit_transpose_packed)
    bt = jax.block_until_ready(build_bt(packed))
    results["bitplane_build_s"] = round(time.perf_counter() - t0, 1)
    print(f"bitplane twin build {results['bitplane_build_s']}s", flush=True)

    for ppd in (1, 2, 4, 8):
        t0 = time.perf_counter()
        f2 = lambda: pallas_blockmax(
            q_pm1, q_scale, bt, valid, 256, chunk_size=chunk, bitplane=True, planes_per_dot=ppd
        )
        try:
            jax.block_until_ready(f2())
        except Exception as e:
            print(f"bitplane ppd={ppd}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        results[f"bitplane_phase1_ppd{ppd}_compile_s"] = round(time.perf_counter() - t0, 1)
        dt = timeit(f2)
        results[f"bitplane_phase1_ppd{ppd}_ms"] = round(dt * 1e3, 2)
        print(f"bitplane phase1 ppd={ppd}: {dt*1e3:.2f} ms", flush=True)

    t0 = time.perf_counter()
    g2 = lambda: pallas_blockmax_topk(
        q_pm1, q_scale, packed, valid, k, 256, chunk_size=chunk, db_bitplane=bt
    )
    jax.block_until_ready(g2())
    results["bitplane_topk_compile_s"] = round(time.perf_counter() - t0, 1)
    dt = timeit(g2)
    results["bitplane_topk_ms"] = round(dt * 1e3, 2)
    results["bitplane_topk_qps"] = round(q_n / dt)
    print(f"bitplane topk: {dt*1e3:.2f} ms -> {q_n/dt:,.0f} QPS", flush=True)

    # Baseline: XLA packed block-max scan (the current 100M fallback)
    t0 = time.perf_counter()
    h = lambda: pm1_blockmax_topk(q_pm1, q_scale, packed, valid, k, 256, chunk_size=chunk)
    jax.block_until_ready(h())
    results["xla_topk_compile_s"] = round(time.perf_counter() - t0, 1)
    dt = timeit(h)
    results["xla_topk_ms"] = round(dt * 1e3, 2)
    results["xla_topk_qps"] = round(q_n / dt)
    print(f"xla packed topk: {dt*1e3:.2f} ms -> {q_n/dt:,.0f} QPS", flush=True)

    # Exactness cross-check on this hardware (top-k score sets match)
    s2, i2 = h()
    s3, i3 = g2()
    s2, s3 = np.asarray(s2), np.asarray(s3)
    if not skip_perm:
        s1, i1 = g()
        s1 = np.asarray(s1)
        assert np.allclose(np.sort(s1, 1), np.sort(s2, 1), atol=2e-3), "packed-perm != xla top-k"
    assert np.allclose(np.sort(s3, 1), np.sort(s2, 1), atol=2e-3), "bitplane != xla top-k"
    results["exact_match"] = True

    print(json.dumps(results))


if __name__ == "__main__":
    main()
