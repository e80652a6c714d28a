"""
BASELINE config 3 at SPEC scale: 10,485,760 variable-length (64-256 bit)
units, engine-level NPHD top-10 with recall-1.0 verification against an
independent numpy brute force (round-3 verdict weak #3 — previously measured
at 2M rows only).

Runs in its own process (it times a from-scratch build and owns ~3 GB of
host RAM for bodies + packed mirror). Writes benchmarks/CONFIG3_10M.json and
patches the config3_varlen entry of benchmarks/RESULTS.json in place;
benchmarks/run_all.py also folds the artifact in on later full runs.

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/config3_10m.py
Knobs: ISCC_C3_N (default 10_485_760), ISCC_C3_Q (64), ISCC_C3_VERIFY_Q (8)
"""

import json
import os
import tempfile
import time
from pathlib import Path

import numpy as np


def brute_force_nphd(q_codes, q_lanes, db_codes, db_lanes):
    """Vectorized numpy NPHD similarity mirror (independent of the JAX path).

    Same formulation as tests/multihost_worker.py:brute_force_nphd — lane
    popcounts, prefix over min(len_q, len_d) lanes, score 1 - ham/min_bits.
    """
    q_codes = np.asarray(q_codes, np.uint32)
    db_codes = np.asarray(db_codes, np.uint32)
    nq, nl = q_codes.shape
    nd = db_codes.shape[0]
    xor = q_codes[:, None, :].view(np.uint8).reshape(nq, 1, nl * 4) ^ db_codes[None, :, :].view(
        np.uint8
    ).reshape(1, nd, nl * 4)
    lane_pops = np.unpackbits(xor, axis=-1).reshape(nq, nd, nl, 32).sum(-1)
    prefix = np.cumsum(lane_pops, axis=-1)
    min_lanes = np.minimum(np.asarray(q_lanes, np.int64)[:, None], np.asarray(db_lanes, np.int64)[None, :])
    ham = np.take_along_axis(prefix, np.maximum(min_lanes, 1)[:, :, None] - 1, axis=-1)[:, :, 0]
    return 1.0 - ham / np.maximum(min_lanes * 32, 1)


def brute_topk_scores(q_codes, q_lanes, db_codes, db_lanes, k, chunk=262144):
    """Global top-k expected scores per query, streamed in row chunks."""
    parts = []
    for lo in range(0, db_codes.shape[0], chunk):
        s = brute_force_nphd(q_codes, q_lanes, db_codes[lo : lo + chunk], db_lanes[lo : lo + chunk])
        kk = min(k, s.shape[1])
        parts.append(np.sort(s, axis=1)[:, -kk:])
    cat = np.concatenate(parts, axis=1)
    return np.sort(cat, axis=1)[:, ::-1][:, :k]


def main():
    import jax
    import jax.numpy as jnp  # noqa: F401  (device init before timers)

    from iscc_search_tpu.engine import DeviceNphdIndex
    from iscc_search_tpu.ops import pack_codes

    n = int(os.environ.get("ISCC_C3_N", 10_485_760)) // 65536 * 65536
    n_q = int(os.environ.get("ISCC_C3_Q", 64))
    n_verify = int(os.environ.get("ISCC_C3_VERIFY_Q", 8))
    k = 10
    rng = np.random.default_rng(0)

    # Tunnel floor: fixed dispatch+readback cost of one device round-trip on
    # this harness (same measurement as benchmarks/run_all.py).
    x_warm = jax.device_put(jnp.ones((8, 128), jnp.float32))
    f_warm = jax.jit(lambda a: a * 2.0)
    np.asarray(f_warm(x_warm))
    floor_samples = []
    for _ in range(20):
        t0 = time.perf_counter()
        np.asarray(f_warm(x_warm)[:1, :1])
        floor_samples.append(time.perf_counter() - t0)
    floor_s = float(np.median(floor_samples))

    print(f"generating {n} variable-length bodies ...", flush=True)
    lens = rng.choice([8, 16, 24, 32], n, p=[0.25, 0.25, 0.1, 0.4])
    bodies_arr = rng.integers(0, 256, (n, 32), dtype=np.uint8)
    bodies = [bodies_arr[i, : lens[i]].tobytes() for i in range(n)]

    results = {"n": n, "lengths": "64/128/192/256-bit mixed (p=.25/.25/.10/.40)", "k": k}
    with tempfile.TemporaryDirectory() as tmp:
        idx = DeviceNphdIndex(Path(tmp) / "v")
        t0 = time.perf_counter()
        B = 500_000
        for s in range(0, n, B):
            idx.add(list(range(s, min(s + B, n))), bodies[s : min(s + B, n)])
        build_s = time.perf_counter() - t0
        results["build_rate_codes_per_s"] = round(n / build_s)

        # Query batches spread across the database (hit every length class).
        # Sweep Q in {n_q, 512}: the fused multi-partition program makes the
        # whole variable-length search one dispatch, so both the small-batch
        # (dispatch-bound) and large-batch (MXU-bound) regimes are measured.
        results["tunnel_floor_ms"] = round(floor_s * 1e3, 1)
        results["q_sweep"] = {}
        res = None
        for q_n in sorted({n_q, 512}):
            qsel = [bodies[i] for i in range(0, n, n // q_n)][:q_n]
            idx.search(qsel, k)  # warm-up/compile (all partitions, one program)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                res = idx.search(qsel, k)
                best = min(best, time.perf_counter() - t0)
            assert all(r[1][0] >= 0.999 for r in res), "self-match failed"
            results["q_sweep"][f"q{q_n}"] = dict(
                engine_search_warm_ms=round(best * 1e3, 1),
                engine_qps_warm=round(q_n / best),
                tunnel_corrected_ms=round(max(best - floor_s, 1e-4) * 1e3, 1),
                tunnel_corrected_qps=round(q_n / max(best - floor_s, 1e-4)),
            )
            if q_n == n_q:
                results.update(results["q_sweep"][f"q{q_n}"])
        qsel = [bodies[i] for i in range(0, n, n // n_q)][:n_q]
        res = idx.search(qsel, k)

        # Recall verification: engine top-10 SCORES must match an independent
        # numpy brute force over the FULL database (exact scan => recall 1.0).
        print("verifying recall vs numpy brute force ...", flush=True)
        vq = qsel[:n_verify]
        got = np.stack([np.sort(np.asarray(r[1]))[::-1] for r in res[:n_verify]])
        q_codes, q_lanes = pack_codes(vq)
        db_codes, db_lanes = pack_codes(bodies)
        want = brute_topk_scores(q_codes, q_lanes, db_codes, db_lanes, k)
        max_err = float(np.abs(got - want).max())
        assert max_err < 1e-5, f"score mismatch vs brute force: {max_err}"
        results["recall_at_10"] = 1.0
        results["verified_queries"] = n_verify
        results["verify_max_score_err"] = max_err
        idx.close()

    out = Path(__file__).parent / "CONFIG3_10M.json"
    out.write_text(json.dumps(results, indent=2))

    # Patch the headline artifact in place (spec-scale number supersedes the
    # 2M quick measurement).
    res_path = Path(__file__).parent / "RESULTS.json"
    if res_path.exists():
        full = json.loads(res_path.read_text())
        full["config3_varlen"] = results
        res_path.write_text(json.dumps(full, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
