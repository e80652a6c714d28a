"""Profile the per-request Python cost of the serving hot path.

Three measurements on a CPU-JAX index (engine device work is not the
subject here; the Python overhead around it is):

1. engine-only: index.search_assets() called directly, sequential
2. wsgi-only: the WSGI callable invoked in-process (no socket, no HTTP parse)
3. http: full wsgiref round trip over localhost

plus a cProfile of the in-process WSGI leg to attribute the cost.

Run: JAX_PLATFORMS=cpu PYTHONPATH=. python benchmarks/profile_serving.py
"""

from __future__ import annotations

import cProfile
import io
import json
import os
import pstats
import sys
import tempfile
import threading
import time
import urllib.request
from wsgiref.simple_server import make_server
from wsgiref.util import setup_testing_defaults

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from iscc_search_tpu import codec as ic  # noqa: E402
from iscc_search_tpu.options import SearchOptions, get_index  # noqa: E402
from iscc_search_tpu.schema import IsccEntry, IsccIndex, IsccQuery  # noqa: E402
from iscc_search_tpu.server.app import create_app  # noqa: E402
from iscc_search_tpu.server.httpd import QuietHandler, ThreadingWSGIServer  # noqa: E402

N_ASSETS = int(os.environ.get("PROFILE_ASSETS", 50_000))
N_REQ = int(os.environ.get("PROFILE_REQS", 2_000))
PORT = 18123


def _unit(mt, body):
    header = ic.encode_header(mt, 0, ic.VS.V0, ic.encode_length(mt, len(body) * 8))
    return "ISCC:" + ic.encode_base32(header + body)


def build_index(tmp):
    rng = np.random.default_rng(7)
    opts = SearchOptions(index_uri=f"tpu://{tmp}")
    index = get_index(opts.index_uri)
    index.create_index(IsccIndex(name="prof"))
    bodies = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes() for _ in range(N_ASSETS)]
    batch = []
    for i, body in enumerate(bodies):
        iscc_id = ic.gen_iscc_id_v1(timestamp_us=i + 1, server_id=i % 4096, realm_id=0)["iscc"]
        batch.append(
            IsccEntry(iscc_id=iscc_id, units=[_unit(ic.MT.DATA, body), _unit(ic.MT.INSTANCE, body[:8])])
        )
        if len(batch) == 50_000:
            index.add_assets("prof", batch)
            batch = []
    if batch:
        index.add_assets("prof", batch)
    return index, opts, bodies


def run_wsgi_inproc(app, body, n):
    times = []
    for _ in range(n):
        environ = {}
        setup_testing_defaults(environ)
        environ.update(
            REQUEST_METHOD="POST",
            PATH_INFO="/indexes/prof/search",
            CONTENT_TYPE="application/json",
            CONTENT_LENGTH=str(len(body)),
        )
        environ["wsgi.input"] = io.BytesIO(body)
        t0 = time.perf_counter()
        list(app(environ, lambda *a: None))
        times.append(time.perf_counter() - t0)
    return times


def main():
    t_start = time.perf_counter()
    tmp = tempfile.mkdtemp()
    index, opts, bodies = build_index(tmp)
    print(f"index built {time.perf_counter()-t_start:.1f}s", flush=True)
    app = create_app(index=index, opts=opts)
    query = {"units": [_unit(ic.MT.DATA, bodies[123])], "limit": 10}
    body = json.dumps(query).encode()

    # 1. engine only
    q = IsccQuery(**query)
    for _ in range(50):
        index.search_assets("prof", q, limit=10)
    t0 = time.perf_counter()
    for _ in range(N_REQ):
        index.search_assets("prof", q, limit=10)
    engine_ms = (time.perf_counter() - t0) / N_REQ * 1e3
    print(f"engine leg done {time.perf_counter()-t_start:.1f}s", flush=True)

    # 2. wsgi in-process
    run_wsgi_inproc(app, body, 50)
    times = run_wsgi_inproc(app, body, N_REQ)
    wsgi_ms = sum(times) / len(times) * 1e3
    print(f"wsgi leg done {time.perf_counter()-t_start:.1f}s", flush=True)

    # 3. full http, sequential single client
    srv = make_server("127.0.0.1", PORT, app, server_class=ThreadingWSGIServer, handler_class=QuietHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    time.sleep(0.2)

    def one():
        req = urllib.request.Request(
            f"http://127.0.0.1:{PORT}/indexes/prof/search",
            data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as res:
            res.read()

    for _ in range(50):
        one()
    t0 = time.perf_counter()
    for _ in range(N_REQ):
        one()
    http_ms = (time.perf_counter() - t0) / N_REQ * 1e3

    print(f"assets={N_ASSETS} reqs={N_REQ}")
    print(f"engine-only : {engine_ms:8.3f} ms/req")
    print(f"wsgi-inproc : {wsgi_ms:8.3f} ms/req (app overhead {wsgi_ms - engine_ms:+.3f})")
    print(f"http-full   : {http_ms:8.3f} ms/req (server+client overhead {http_ms - wsgi_ms:+.3f})")

    prof = cProfile.Profile()
    prof.enable()
    run_wsgi_inproc(app, body, 500)
    prof.disable()
    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(35)
    print(s.getvalue())

    srv.shutdown()
    index.close()


if __name__ == "__main__":
    main()
