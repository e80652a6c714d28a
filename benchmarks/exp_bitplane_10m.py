"""
A/B the 100M bitplane-tier phase-1 formulation back onto the 10M int8 tier
(round-3 verdict weak #4: the bigger problem ran 22% more op/s per op).

Hypothesis: at Q=512 the perm-int8 phase 1 is HBM-bound on its 256 B/row
layout (2.56 GB/sweep at 10M), while the bitplane kernel reads 32 B/row
(0.32 GB/sweep) for the same int8 MXU dots — so a hybrid
(bitplane phase 1 + plain-int8 Pallas gather rescore) should beat the
production perm+gather path at large Q.

Variants (all exact, verified identical scores):
  perm+gather      — production 10M tier: perm-int8 phase 1, int8 gather P3
  bitplane+gather  — bitplane phase 1, int8 gather P3 (the candidate)
  bitplane+view    — the 100M tier as-is (view rescore, no int8 twin)

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/exp_bitplane_10m.py
Writes benchmarks/EXP_BITPLANE_10M.json.
Knobs: ISCC_EXP_N (10_485_760), ISCC_EXP_QS ("64,512"), ISCC_EXP_K (10)
"""

import json
import os
import time
from pathlib import Path

import numpy as np


def amortized(fn, repeat=30):
    # repeat=30 matches bench.py: the tunnel's fixed ~30 ms dispatch+readback
    # must amortize over MANY async dispatches or it inflates each sweep by
    # fixed_cost/repeat (repeat=5 measured ~+5 ms/sweep vs repeat=30).
    out = fn()
    np.asarray(out[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _r in range(repeat):
            out = fn()
        np.asarray(out[0])
        best = min(best, (time.perf_counter() - t0) / repeat)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from iscc_search_tpu.ops.pallas_scan import (
        bit_transpose_packed,
        build_unpacked_db,
        make_blockmax_penalty,
        packed_to_view,
        pallas_blockmax_topk_packedq,
    )

    n = int(os.environ.get("ISCC_EXP_N", 10_485_760)) // 32768 * 32768
    qs_list = [int(x) for x in os.environ.get("ISCC_EXP_QS", "64,512").split(",")]
    k = int(os.environ.get("ISCC_EXP_K", 10))
    chunk = 32768
    rng = np.random.default_rng(0)

    print(f"building {n} x 256-bit database + twins ...", flush=True)
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, n // 64)] = False  # realistic tombstone load
    db = jax.device_put(jnp.asarray(packed))
    valid_dev = jax.device_put(jnp.asarray(valid))

    t0 = time.perf_counter()
    unpacked = build_unpacked_db(db, 256)
    plain_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    perm = build_unpacked_db(db, 256, permute=True)
    perm_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    bt = jax.jit(bit_transpose_packed)(db)
    bt.block_until_ready()
    bt_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    view = packed_to_view(db)
    view.block_until_ready()
    view_s = time.perf_counter() - t0

    pen_perm = make_blockmax_penalty(valid_dev, "perm")
    pen_bt = make_blockmax_penalty(valid_dev, "bitplane")
    jax.block_until_ready((pen_perm, pen_bt))

    results = {
        "device": str(jax.devices()[0]),
        "n": n,
        "k": k,
        "chunk": chunk,
        "build_s": {"plain_int8": round(plain_s, 2), "perm_int8": round(perm_s, 2),
                    "bitplane": round(bt_s, 2), "view": round(view_s, 2)},
        "hbm_bytes": {
            "packed": n * 32, "plain_int8": n * 256, "perm_int8": n * 256,
            "bitplane": n * 32, "view": n * 32,
        },
        "sweeps": {},
    }

    for q in qs_list:
        q_packed = packed[(np.arange(q) * (n // q)) % n]
        q_lanes = np.full(q, 8, np.int32)
        qp = jax.device_put(jnp.asarray(q_packed))
        ql = jax.device_put(jnp.asarray(q_lanes))

        variants = {
            "perm_gather": dict(
                db_unpacked=unpacked, unpacked=True, db_perm=perm, db_penalty=pen_perm
            ),
            "bitplane_gather": dict(
                db_unpacked=unpacked, unpacked=False, db_bitplane=bt, db_penalty=pen_bt
            ),
            "bitplane_gather_p8": dict(
                db_unpacked=unpacked, unpacked=False, db_bitplane=bt, db_penalty=pen_bt,
                planes_per_dot=8,
            ),
            "bitplane_gather_c64k": dict(
                db_unpacked=unpacked, unpacked=False, db_bitplane=bt, db_penalty=pen_bt,
                chunk_size=65536,
            ),
            "bitplane_view": dict(
                db_bitplane=bt, db_packed_view=view, db_penalty=pen_bt
            ),
        }
        entry = {}
        ref_scores = None
        for name, kw in variants.items():
            kw = dict(kw)
            cs = kw.pop("chunk_size", chunk)
            fn = lambda kw=kw, cs=cs: pallas_blockmax_topk_packedq(
                qp, ql, db, valid_dev, k, 256, chunk_size=cs, **kw
            )
            t0 = time.perf_counter()
            s, i = fn()
            s.block_until_ready()
            compile_s = time.perf_counter() - t0
            dt = amortized(fn)
            s_np = np.asarray(s)
            if ref_scores is None:
                ref_scores = s_np
                exact = True
            else:
                exact = bool(np.allclose(np.sort(s_np, 1), np.sort(ref_scores, 1), atol=1e-5))
            entry[name] = {
                "compile_s": round(compile_s, 2),
                "sweep_ms": round(dt * 1e3, 2),
                "qps": round(q / dt),
                "scores_match": exact,
            }
            print(f"Q={q} {name}: {entry[name]}", flush=True)
        results["sweeps"][f"q{q}"] = entry

    out = Path(__file__).parent / "EXP_BITPLANE_10M.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
