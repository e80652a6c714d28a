"""
Open-loop serving benchmark: offered-load sweep to find saturation QPS.

Closed-loop client pools (benchmarks/latency_serve.py) measure latency AT a
concurrency level but can't say where the server saturates — the clients
slow down with the server (coordinated omission). This harness fires
requests on a fixed schedule regardless of completions, sweeps the offered
rate, and reports achieved throughput + latency percentiles per step; the
saturation point is the last step where achieved >= 95% of offered.

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/latency_openloop.py
Knobs: ISCC_OL_ASSETS (200_000), ISCC_OL_SECONDS (12 per step),
       ISCC_OL_RATES (csv, default "100,200,400,800,1600,3200")
Writes benchmarks/LATENCY_OPENLOOP.json.
"""

import json
import os
import tempfile
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from wsgiref.simple_server import make_server

import numpy as np


def build_index(n_assets):
    from iscc_search_tpu import codec as ic
    from iscc_search_tpu.options import SearchOptions, get_index
    from iscc_search_tpu.schema import IsccEntry, IsccIndex

    rng = np.random.default_rng(0)
    tmp_dir = tempfile.mkdtemp()
    opts = SearchOptions(index_uri=f"tpu://{tmp_dir}")
    index = get_index(opts.index_uri)
    index.create_index(IsccIndex(name="ol"))

    def unit(mt, body):
        header = ic.encode_header(mt, 0, ic.VS.V0, ic.encode_length(mt, len(body) * 8))
        return "ISCC:" + ic.encode_base32(header + body)

    bodies = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes() for _ in range(n_assets)]
    batch = []
    for i, body in enumerate(bodies):
        iscc_id = ic.gen_iscc_id_v1(timestamp_us=i + 1, server_id=i % 4096, realm_id=0)["iscc"]
        batch.append(
            IsccEntry(iscc_id=iscc_id, units=[unit(ic.MT.DATA, body), unit(ic.MT.INSTANCE, body[:8])])
        )
        if len(batch) == 50_000:
            index.add_assets("ol", batch)
            batch = []
    if batch:
        index.add_assets("ol", batch)
    return index, opts, bodies


def run_step(port, queries, rate, seconds, pool):
    # type: (int, list[bytes], float, float, ThreadPoolExecutor) -> dict
    """Fire requests on a fixed schedule for `seconds`; gather latencies."""
    import urllib.request

    latencies = []
    errors = [0]
    error_samples = []
    lock = threading.Lock()

    def one(body):
        t0 = time.perf_counter()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/indexes/ol/search",
                data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as res:
                res.read()
            dt = time.perf_counter() - t0
            with lock:
                latencies.append(dt)
        except Exception as exc:
            with lock:
                errors[0] += 1
                if len(error_samples) < 3:
                    error_samples.append(f"{type(exc).__name__}: {exc}")

    n_total = int(rate * seconds)
    interval = 1.0 / rate
    t_start = time.perf_counter()
    futures = []
    for i in range(n_total):
        target = t_start + i * interval
        now = time.perf_counter()
        if target > now:
            time.sleep(target - now)
        futures.append(pool.submit(one, queries[i % len(queries)]))
    for f in futures:
        f.result()
    wall = time.perf_counter() - t_start
    lat = np.array(sorted(latencies)) * 1e3
    return {
        "offered_qps": rate,
        "achieved_qps": round(len(latencies) / wall, 1),
        "errors": errors[0],
        **({"error_samples": error_samples} if error_samples else {}),
        "p50_ms": round(float(np.percentile(lat, 50)), 1) if len(lat) else None,
        "p90_ms": round(float(np.percentile(lat, 90)), 1) if len(lat) else None,
        "p99_ms": round(float(np.percentile(lat, 99)), 1) if len(lat) else None,
    }


def serve_forever(port_file):
    # type: (str) -> None
    """Child-process mode: build the index, serve, report the port."""
    n_assets = int(os.environ.get("ISCC_OL_ASSETS", 200_000))
    from iscc_search_tpu.server.app import create_app
    from iscc_search_tpu.server.httpd import QuietHandler, ThreadingWSGIServer

    index, opts, _bodies = build_index(n_assets)
    app = create_app(index=index, opts=opts)
    srv = make_server(
        "127.0.0.1", 0, app, server_class=ThreadingWSGIServer, handler_class=QuietHandler
    )
    with open(port_file, "w") as f:
        f.write(str(srv.server_address[1]))
    srv.serve_forever()


def main():
    # The SERVER runs in its own process: sharing one interpreter between
    # the load generator and the server under test couples them through the
    # GIL, and at a few hundred offered QPS the measurement collapses to the
    # combined-process python ceiling instead of the server's (first version
    # of this harness measured exactly that artifact).
    import subprocess
    import sys
    import tempfile as _tf

    n_assets = int(os.environ.get("ISCC_OL_ASSETS", 200_000))
    seconds = float(os.environ.get("ISCC_OL_SECONDS", 12))
    rates = [float(r) for r in os.environ.get("ISCC_OL_RATES", "100,200,400,800,1600,3200").split(",")]

    from iscc_search_tpu import codec as ic

    port_file = _tf.mktemp(prefix="ol_port_")
    server = subprocess.Popen([sys.executable, __file__, "--serve", port_file])
    try:
        print(f"waiting for the server subprocess to build {n_assets:,} assets...", flush=True)
        deadline = time.time() + 1200
        port = None
        while time.time() < deadline:
            if os.path.exists(port_file):
                port = int(open(port_file).read())
                break
            if server.poll() is not None:
                raise RuntimeError("server subprocess died during index build")
            time.sleep(1.0)
        assert port, "server never became ready"

        def unit(mt, body):
            header = ic.encode_header(mt, 0, ic.VS.V0, ic.encode_length(mt, len(body) * 8))
            return "ISCC:" + ic.encode_base32(header + body)

        # Same generator seed as build_index: queries are db members
        rng0 = np.random.default_rng(0)
        bodies = [rng0.integers(0, 256, 32, dtype=np.uint8).tobytes() for _ in range(n_assets)]
        rng = np.random.default_rng(1)
        queries = []
        for i in rng.integers(0, len(bodies), 512):
            q = {"units": [unit(3, bodies[int(i)])], "limit": 10}  # MT.DATA = 3
            queries.append(json.dumps(q).encode())

        # Readiness: one long-timeout search forces the device compile
        # before the sweep (remote pallas compiles take tens of seconds).
        import urllib.request as _ur

        req = _ur.Request(
            f"http://127.0.0.1:{port}/indexes/ol/search",
            data=queries[0],
            headers={"Content-Type": "application/json"},
        )
        with _ur.urlopen(req, timeout=900) as res:
            assert res.status == 200, res.status
        print("server compiled + ready", flush=True)

        pool = ThreadPoolExecutor(max_workers=512)

        # Warm EVERY query-pad bucket the batcher can produce: fusion sizes
        # grow with offered load, and each pow2 pad bucket (8..256) is a
        # separate device compile (~10-60 s through the dev tunnel). Without
        # this, the first mid-step bucket crossing stalls every queued
        # request behind one compile and poisons the percentiles.
        def fire(body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/indexes/ol/search",
                data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=900) as res:
                res.read()

        import urllib.request

        for conc in (8, 16, 32, 64, 128, 256):
            t0 = time.perf_counter()
            list(pool.map(fire, queries[:conc]))
            print(f"warm burst conc={conc}: {time.perf_counter()-t0:.1f}s", flush=True)

        warm = run_step(port, queries, 50, 2, pool)
        print(f"warm: {warm}", flush=True)

        steps = []
        saturation = None
        for rate in rates:
            step = run_step(port, queries, rate, seconds, pool)
            steps.append(step)
            print(step, flush=True)
            if step["achieved_qps"] >= 0.95 * rate and step["errors"] == 0:
                saturation = step
            else:
                break

        out = {
            "description": (
                f"Open-loop offered-load sweep through the full HTTP stack, {n_assets} assets, "
                "single-unit queries, fixed-schedule arrivals (no coordinated omission); "
                "server under test runs in its own process (GIL-isolated from the load generator)"
            ),
            "assets": n_assets,
            "step_seconds": seconds,
            "steps": steps,
            "saturation_qps": saturation["offered_qps"] if saturation else None,
            "saturation_detail": saturation,
        }
        print(json.dumps(out, indent=1))
        with open("benchmarks/LATENCY_OPENLOOP.json", "w") as f:
            json.dump(out, f, indent=1)
    finally:
        server.terminate()
        server.wait(30)
        try:
            os.unlink(port_file)
        except OSError:
            pass


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 2 and sys.argv[1] == "--serve":
        serve_forever(sys.argv[2])
    else:
        main()
