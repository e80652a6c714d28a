"""
Closed-loop serving latency through the full HTTP stack, with an explicit
tunnel-floor correction.

The dev harness reaches the TPU through a tunnel that adds a fixed
dispatch+readback cost to EVERY device call; production-local serving does
not pay it. This script measures both:

1. the closed-loop request percentiles through WSGI + engine + device, and
2. the tunnel floor itself (median round-trip of a trivial device op),

and reports corrected percentiles = measured - floor (the engine batches one
device sweep per request burst, so one floor per request is the right
correction; see BENCH_DETAILS discussion).

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/latency_serve.py
Knobs: ISCC_LAT_ASSETS (default 200_000), ISCC_LAT_CLIENTS (4),
       ISCC_LAT_SECONDS (45)
Writes benchmarks/LATENCY.json.
"""

import json
import os
import shutil
import tempfile
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from wsgiref.simple_server import make_server

import numpy as np


def measure_tunnel_floor(reps=30):
    # type: (int) -> float
    """Median round-trip of a trivial device op (dispatch + tiny readback)."""
    import jax
    import jax.numpy as jnp

    x = jax.device_put(jnp.ones((8, 128), jnp.float32))
    f = jax.jit(lambda a: a * 2.0)
    np.asarray(f(x))  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(x)[:1, :1])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    n_assets = int(os.environ.get("ISCC_LAT_ASSETS", 200_000))
    n_clients = int(os.environ.get("ISCC_LAT_CLIENTS", 4))
    seconds = float(os.environ.get("ISCC_LAT_SECONDS", 45))

    from iscc_search_tpu import codec as ic
    from iscc_search_tpu.options import SearchOptions, get_index
    from iscc_search_tpu.schema import IsccEntry, IsccIndex
    from iscc_search_tpu.server.app import create_app
    from iscc_search_tpu.server.httpd import QuietHandler, ThreadingWSGIServer

    floor_s = measure_tunnel_floor()
    print(f"tunnel floor (trivial device op round-trip): {floor_s*1e3:.1f} ms", flush=True)

    rng = np.random.default_rng(0)
    tmp_dir = tempfile.mkdtemp()
    opts = SearchOptions(index_uri=f"tpu://{tmp_dir}")
    index = get_index(opts.index_uri)
    index.create_index(IsccIndex(name="lat"))

    def unit(mt, body):
        header = ic.encode_header(mt, 0, ic.VS.V0, ic.encode_length(mt, len(body) * 8))
        return "ISCC:" + ic.encode_base32(header + body)

    bodies = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes() for _ in range(n_assets)]
    t0 = time.perf_counter()
    batch = []
    for i, body in enumerate(bodies):
        iscc_id = ic.gen_iscc_id_v1(timestamp_us=i + 1, server_id=i % 4096, realm_id=0)["iscc"]
        # IsccEntry requires >= 2 units (reference schema parity); the DATA
        # unit carries the searched body, the CONTENT unit is filler.
        batch.append(
            IsccEntry(iscc_id=iscc_id, units=[unit(ic.MT.DATA, body), unit(ic.MT.CONTENT, body)])
        )
        if len(batch) == 2000:
            index.add_assets("lat", batch)
            batch = []
    if batch:
        index.add_assets("lat", batch)
    print(f"ingested {n_assets} assets in {time.perf_counter()-t0:.1f}s", flush=True)

    app = create_app(index=index, opts=opts)
    srv = make_server("127.0.0.1", 18223, app, server_class=ThreadingWSGIServer, handler_class=QuietHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    import urllib.request

    def one_request(qbody):
        payload = json.dumps({"units": [unit(ic.MT.DATA, qbody)]}).encode()
        req = urllib.request.Request(
            "http://127.0.0.1:18223/indexes/lat/search?limit=10",
            data=payload,
            headers={"Content-Type": "application/json"},
        )
        t0 = time.perf_counter()
        with urllib.request.urlopen(req) as res:
            res.read()
        return time.perf_counter() - t0

    one_request(bodies[0])  # warm compile

    latencies = []
    lock = threading.Lock()
    stop_at = time.perf_counter() + seconds

    def client(cid):
        local_rng = np.random.default_rng(cid)
        while time.perf_counter() < stop_at:
            qbody = bodies[int(local_rng.integers(0, n_assets))]
            dt = one_request(qbody)
            with lock:
                latencies.append(dt)

    with ThreadPoolExecutor(max_workers=n_clients) as pool:
        list(pool.map(client, range(n_clients)))
    srv.shutdown()
    index.close()
    shutil.rmtree(tmp_dir, ignore_errors=True)  # a 200K-asset index per run adds up

    lat = np.array(sorted(latencies))
    pct = lambda p: float(np.percentile(lat, p)) * 1e3
    floor_ms = floor_s * 1e3
    out = {
        "description": (
            f"Closed-loop serving latency through the full HTTP stack on one chip, "
            f"{n_assets} assets, {n_clients} concurrent clients, {seconds:.0f}s, "
            f"single-unit queries (search_batching on)"
        ),
        "assets": n_assets,
        "clients": n_clients,
        "requests": len(lat),
        "qps_closed_loop": round(len(lat) / seconds, 1),
        "p50_ms": round(pct(50), 1),
        "p90_ms": round(pct(90), 1),
        "p99_ms": round(pct(99), 1),
        "tunnel_floor_ms": round(floor_ms, 1),
        "corrected": {
            "method": "measured percentile minus the measured tunnel floor (one "
            "device round-trip per request); production-local serving does not "
            "pay the tunnel",
            "p50_ms": round(max(0.0, pct(50) - floor_ms), 1),
            "p90_ms": round(max(0.0, pct(90) - floor_ms), 1),
            "p99_ms": round(max(0.0, pct(99) - floor_ms), 1),
        },
    }
    Path(__file__).with_name("LATENCY.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
