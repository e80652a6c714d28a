"""Measure the native-HNSW per-eval cost on THIS host and fold it into
benchmarks/HNSW_BASELINE.json (replacing the previously *assumed*
50-150 ns/eval constant — round-3 verdict weak #5).

Builds and runs iscc_search_tpu/native/hnsw_evalbench.cpp: a dependent
pointer chase + 32-byte XOR+popcount over a >LLC working set at 10M-node
scale, modeling usearch's layer-0 traversal
(/root/reference/iscc_search/indexes/usearch/index.py:2024-2045, M0=32).

Run: python benchmarks/hnsw_evalbench.py
"""

import json
import pathlib
import subprocess

ROOT = pathlib.Path(__file__).resolve().parent.parent
NATIVE = ROOT / "iscc_search_tpu" / "native"
ARTIFACT = ROOT / "benchmarks" / "HNSW_BASELINE.json"


def main():
    subprocess.run(["make", "evalbench"], cwd=NATIVE, check=True)
    # 10M nodes, M0=32, 4M evals — plus an LLC-resident control run that
    # verifies the benchmark measures memory, not loop overhead.
    big = json.loads(
        subprocess.run(
            [str(NATIVE / "evalbench"), "10000000", "32", "4000000"],
            check=True, capture_output=True, text=True,
        ).stdout
    )
    small = json.loads(
        subprocess.run(
            [str(NATIVE / "evalbench"), "100000", "32", "4000000"],
            check=True, capture_output=True, text=True,
        ).stdout
    )

    data = json.loads(ARTIFACT.read_text())
    evals = data["native_hnsw_estimate_at_10m"]["evals_per_query_at_10m"]
    # hop model = achievable (amortized) cost; chase = fully serialized bound.
    lo_ns, hi_ns = big["hop_ns_per_eval"], big["chase_ns_per_eval"]
    data["native_hnsw_estimate_at_10m"] = {
        "measured_ns_per_eval": {
            "hop_model": lo_ns,
            "dependent_chase": hi_ns,
            "llc_resident_control": small["hop_ns_per_eval"],
            "working_set_bytes": big["working_set_bytes"],
            "source": "iscc_search_tpu/native/hnsw_evalbench.cpp (this host)",
        },
        "evals_per_query_at_10m": evals,
        "single_core_qps_range": [
            round(1e9 / (evals * hi_ns)),
            round(1e9 / (evals * lo_ns)),
        ],
        "model": (
            "evals/query ~ log(N); native eval = 32B XOR+popcount + dependent "
            "graph pointer load (working set >> LLC at 10M); QPS = 1/(evals x ns); "
            "ns/eval MEASURED on this host (hop model = per-hop dependent "
            "neighbor-list load + M0=32 overlappable code evals; chase = fully "
            "dependent chain)"
        ),
        "bias": (
            "this HNSW lacks usearch's neighbor-diversity heuristic, so its "
            "evals-for-recall are a LOWER bound on what recall>=0.9 costs; the "
            "native QPS range is therefore an UPPER bound (conservative for our "
            "comparison)"
        ),
    }
    ARTIFACT.write_text(json.dumps(data, indent=2) + "\n")
    print(json.dumps(data["native_hnsw_estimate_at_10m"], indent=2))


if __name__ == "__main__":
    main()
