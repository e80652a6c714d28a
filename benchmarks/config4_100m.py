"""
BASELINE config 4 at SPEC scale: 1M assets x 100 chunk simprints = 100M
chunk vectors (128-bit), engine-level granular search with QPS and a
score-parity quality artifact (round-3 verdict weak #2 — previously measured
at 100K assets with a 3-query timing and no quality artifact).

What it measures:
- bulk build rate (SimprintEngine.add_packed, the vectorized ingest path)
- per-query-asset search latency/QPS: one query = ``chunks_per_query``
  simprints (the reference's search unit: all chunks of one asset,
  /root/reference/iscc_search/indexes/simprint/usearch_core.py:137-269),
  swept over several chunk counts
- quality/parity:
  (a) per-chunk: every matched chunk's similarity recomputed on CPU by
      XOR+popcount must equal the device score;
  (b) per-asset: the engine's IDF-weighted asset score recomputed on CPU
      from the detailed matches must match;
  (c) cross-formula: for an exact-copy query subset (sim 1.0 matches,
      quality == 1), the approximate path's asset score equals the exact
      coverage x quality score of engine/simprint_ops.py's hard-boundary
      formula (coverage = matched/queried) — the semantic intersection of
      the two scoring paths.

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/config4_100m.py
Writes benchmarks/CONFIG4_100M.json and patches RESULTS.json config4_simprint.
Knobs: ISCC_C4_ASSETS (1_000_000), ISCC_C4_CHUNKS (100), ISCC_C4_QSWEEP
       ("10,100"), ISCC_C4_TRIALS (5)
"""

import json
import os
import tempfile
import time
from pathlib import Path

import numpy as np


def build_keys(asset_ids, chunks_per):
    # type: (np.ndarray, int) -> np.ndarray
    """(n_assets * chunks_per, 16) uint8 composite keys, vectorized."""
    n = len(asset_ids)
    keys = np.zeros((n, chunks_per, 16), np.uint8)
    keys[:, :, :8] = asset_ids.astype(">u8")[:, None].view(np.uint8).reshape(n, 1, 8)
    offsets = (np.arange(chunks_per, dtype=">u4") * 100)[None, :]
    keys[:, :, 8:12] = offsets.view(np.uint8).reshape(1, chunks_per, 4)
    keys[:, :, 12:16] = np.frombuffer(np.uint32(100).astype(">u4").tobytes(), np.uint8)
    return keys.reshape(n * chunks_per, 16)


def main():
    import jax

    from iscc_search_tpu.engine.simprint import SimprintEngine

    n_assets = int(os.environ.get("ISCC_C4_ASSETS", 1_000_000))
    chunks_per = int(os.environ.get("ISCC_C4_CHUNKS", 100))
    q_sweep = [int(x) for x in os.environ.get("ISCC_C4_QSWEEP", "10,100").split(",")]
    trials = int(os.environ.get("ISCC_C4_TRIALS", 5))
    limit, threshold = 10, 0.75
    n_chunks = n_assets * chunks_per
    rng = np.random.default_rng(0)

    results = {
        "device": str(jax.devices()[0]),
        "assets": n_assets,
        "chunks": n_chunks,
        "ndim": 128,
        "limit": limit,
        "threshold": threshold,
    }

    with tempfile.TemporaryDirectory() as tmp:
        sp = SimprintEngine(Path(tmp) / "sp", ndim=128)
        print(f"building {n_chunks} chunk simprints ...", flush=True)
        slice_assets = 40_000  # 4M rows per add_packed call bounds temporaries
        t0 = time.perf_counter()
        for a0 in range(0, n_assets, slice_assets):
            a1 = min(a0 + slice_assets, n_assets)
            keys = build_keys(np.arange(a0, a1, dtype=np.uint64), chunks_per)
            vecs = rng.integers(0, 256, ((a1 - a0) * chunks_per, 16), dtype=np.uint8)
            sp.add_packed(keys, vecs)
        build_s = time.perf_counter() - t0
        assert sp.size == n_chunks
        results["build_s"] = round(build_s, 1)
        results["build_rate_chunks_per_s"] = round(n_chunks / build_s)

        # Query material: asset 123_456's chunks, regenerated from the same
        # stream position. Regenerate ALL vectors per slice instead of
        # holding 1.6 GB: re-seed and skip to the slice.
        rng2 = np.random.default_rng(0)
        target_asset = min(123_456, n_assets - 1)
        tslice = target_asset // slice_assets
        for _ in range(tslice + 1):
            vecs = rng2.integers(0, 256, (slice_assets * chunks_per, 16), dtype=np.uint8)
        local = target_asset - tslice * slice_assets
        target_vecs = vecs[local * chunks_per : (local + 1) * chunks_per].copy()
        del vecs

        def perturb(v, nbits):
            out = v.copy()
            for b in rng.choice(128, nbits, replace=False):
                out[b // 8] ^= 1 << (b % 8)
            return out

        # ---- QPS sweep: one query-asset = q perturbed chunks ----
        sweep = {}
        for q in q_sweep:
            queries = [perturb(target_vecs[c], 6).tobytes() for c in range(q)]
            sp.search_raw(queries, limit=limit, threshold=threshold, total_assets=n_assets)  # warm/compile
            t_scan = []
            for _ in range(trials):
                t0 = time.perf_counter()
                matches = sp.search_raw(queries, limit=limit, threshold=threshold, total_assets=n_assets)
                t_scan.append(time.perf_counter() - t0)
            best = min(t_scan)
            assert matches and matches[0].iscc_id_body == int(target_asset).to_bytes(8, "big"), (
                "target asset not top-1"
            )
            sweep[f"q{q}"] = {
                "chunks_per_query": q,
                "search_ms": round(best * 1e3, 1),
                "query_assets_per_s": round(1.0 / best, 1),
                "chunk_queries_per_s": round(q / best),
                "top1_score": round(matches[0].score, 4),
            }
            print(f"q={q}: {sweep[f'q{q}']}", flush=True)
        results["search_sweep"] = sweep

        # ---- quality artifact ----
        # (a)+(b): detailed result; recompute per-chunk sims + asset score.
        q = chunks_per
        queries = [perturb(target_vecs[c], 6).tobytes() for c in range(q)]
        detailed = sp.search_raw(
            queries, limit=limit, threshold=threshold, detailed=True, total_assets=n_assets
        )
        top = detailed[0]
        chunk_errs = []
        for ch in top.chunks:
            qv = np.frombuffer(ch.query, np.uint8)
            mv = np.frombuffer(ch.match, np.uint8)
            sim_cpu = 1.0 - int(np.unpackbits(qv ^ mv).sum()) / 128.0
            chunk_errs.append(abs(sim_cpu - ch.score))
        import math

        idf = math.log(1 + n_assets / 2)  # freq=1 everywhere (random corpus)
        weighted = sum(ch.score for ch in top.chunks) * idf
        total_idf = idf * q
        asset_score_cpu = weighted / total_idf
        results["quality"] = {
            "per_chunk_max_err": round(max(chunk_errs), 7),
            "chunks_matched": top.matches,
            "asset_score_engine": round(top.score, 7),
            "asset_score_cpu_formula": round(asset_score_cpu, 7),
            "asset_score_err": round(abs(top.score - asset_score_cpu), 7),
        }

        # (c) cross-formula parity at the semantic intersection: exact-copy
        # queries (60 stored chunks + 40 foreign random chunks). Approx path:
        # best sim = 1.0 for the 60, unmatched contribute idf*0 -> score =
        # 60/100. Exact coverage x quality (simprint_ops formula): coverage =
        # 60/100, quality = mean sim of matches = 1.0 -> same score.
        n_hit = int(chunks_per * 0.6)
        exact_q = [target_vecs[c].tobytes() for c in range(n_hit)] + [
            rng.integers(0, 256, 16, dtype=np.uint8).tobytes() for _ in range(chunks_per - n_hit)
        ]
        em = sp.search_raw(exact_q, limit=limit, threshold=0.999, total_assets=n_assets)
        assert em and em[0].iscc_id_body == int(target_asset).to_bytes(8, "big")
        from iscc_search_tpu.engine import simprint_ops as ops_mod

        # The exact path's match tuples: (query_sp, match_sp, offset, size);
        # uniform doc frequencies -> quality 1.0, score = coverage.
        exact_matches = [(exact_q[c], exact_q[c], c * 100, 100) for c in range(n_hit)]
        exact_score = ops_mod.coverage_quality_score(exact_matches, {}, len(exact_q))
        results["quality"]["cross_formula"] = {
            "approx_asset_score": round(em[0].score, 7),
            "exact_coverage_x_quality": round(exact_score, 7),
            "matched": em[0].matches,
            "queried": em[0].queried,
        }
        results["quality"]["cross_formula"]["err"] = round(
            abs(
                results["quality"]["cross_formula"]["approx_asset_score"]
                - results["quality"]["cross_formula"]["exact_coverage_x_quality"]
            ),
            7,
        )
        sp.close()

    out = Path(__file__).parent / "CONFIG4_100M.json"
    out.write_text(json.dumps(results, indent=2))
    res_path = Path(__file__).parent / "RESULTS.json"
    if res_path.exists():
        full = json.loads(res_path.read_text())
        full["config4_simprint"] = results
        res_path.write_text(json.dumps(full, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
