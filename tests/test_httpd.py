"""Threaded HTTP server smoke test over a real socket + concurrency checks."""

import threading
import time
from wsgiref.simple_server import make_server

import httpx
import pytest

from iscc_search_tpu.indexes.memory import MemoryIndex
from iscc_search_tpu.indexes.tpu import TpuIndexManager
from iscc_search_tpu.options import SearchOptions
from iscc_search_tpu.schema import IsccEntry, IsccIndex, IsccQuery
from iscc_search_tpu.server.app import create_app
from iscc_search_tpu.server.httpd import QuietHandler, ThreadingWSGIServer


@pytest.fixture
def live_server():
    opts = SearchOptions(index_uri="memory://")
    app = create_app(index=MemoryIndex(), opts=opts)
    httpd = make_server("127.0.0.1", 0, app, server_class=ThreadingWSGIServer, handler_class=QuietHandler)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()
    httpd.server_close()
    thread.join(5)


def test_live_server_roundtrip(live_server, entry_factory):
    with httpx.Client(base_url=live_server, timeout=10) as client:
        assert client.get("/healthz").json() == {"status": "ok"}
        assert client.post("/indexes", json={"name": "idx"}).status_code == 201
        entry = entry_factory()
        r = client.post("/indexes/idx/assets", json=[entry])
        assert r.status_code == 201
        r = client.post("/indexes/idx/search", json={"units": entry["units"]})
        assert r.json()["global_matches"][0]["iscc_id"] == entry["iscc_id"]


def test_live_server_concurrent_requests(live_server, entry_factory):
    with httpx.Client(base_url=live_server, timeout=10) as client:
        client.post("/indexes", json={"name": "idx"})
        entries = [entry_factory() for _ in range(20)]
        errors = []

        def worker(chunk):
            try:
                with httpx.Client(base_url=live_server, timeout=10) as c:
                    r = c.post("/indexes/idx/assets", json=chunk)
                    assert r.status_code == 201
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(entries[i::4],)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(10)
        assert not errors
        assert client.get("/indexes/idx").json()["assets"] == 20


def test_tpu_backend_concurrent_add_search(tmp_path, entry_factory):
    """Writer and readers interleave safely on the device-backed index."""
    mgr = TpuIndexManager(tmp_path / "c")
    mgr.create_index(IsccIndex(name="idx"))
    entries = [IsccEntry(**entry_factory()) for _ in range(30)]
    mgr.add_assets("idx", entries[:10])
    errors = []
    stop = threading.Event()

    def reader():
        try:
            while not stop.is_set():
                mgr.search_assets("idx", IsccQuery(units=entries[0].units), limit=5)
                time.sleep(0.001)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=reader) for _ in range(3)]
    for t in threads:
        t.start()
    try:
        for batch_start in range(10, 30, 5):
            mgr.add_assets("idx", entries[batch_start : batch_start + 5])
    finally:
        stop.set()
        for t in threads:
            t.join(10)
    assert not errors
    assert mgr.get_index("idx").assets == 30
    result = mgr.search_assets("idx", IsccQuery(units=entries[29].units), limit=3)
    assert result.global_matches[0].iscc_id == entries[29].iscc_id
    mgr.close()


def test_http_soak_with_index_churn(tmp_path, entry_factory):
    """Concurrent HTTP clients (add/search/get/status) against one index
    while another index is created and deleted in a loop: zero 5xx."""
    import json as _json
    import random
    import threading
    import time
    import urllib.error
    import urllib.request
    from wsgiref.simple_server import make_server

    from iscc_search_tpu.options import SearchOptions, get_index
    from iscc_search_tpu.server.app import create_app
    from iscc_search_tpu.server.httpd import QuietHandler, ThreadingWSGIServer

    opts = SearchOptions(index_uri=f"tpu://{tmp_path / 'srv'}")
    index = get_index(opts.index_uri)
    app = create_app(index=index, opts=opts)
    srv = make_server("127.0.0.1", 0, app, server_class=ThreadingWSGIServer, handler_class=QuietHandler)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def req(method, path, payload=None):
        data = _json.dumps(payload).encode() if payload is not None else None
        r = urllib.request.Request(
            base + path, data=data, method=method, headers={"Content-Type": "application/json"}
        )
        try:
            with urllib.request.urlopen(r) as resp:
                return resp.status
        except urllib.error.HTTPError as e:
            return e.code

    assert req("POST", "/indexes", {"name": "main"}) == 201
    errors = []
    stop = threading.Event()
    entries = [entry_factory() for _ in range(40)]

    def client(tid):
        rng = random.Random(tid)
        try:
            while not stop.is_set():
                e = entries[rng.randrange(len(entries))]
                op = rng.random()
                if op < 0.4:
                    code = req("POST", "/indexes/main/assets", [e])
                    if code != 201:
                        errors.append(f"add {code}")
                        return
                elif op < 0.8:
                    code = req("POST", "/indexes/main/search", {"units": e["units"]})
                    if code != 200:
                        errors.append(f"search {code}")
                        return
                else:
                    if req("GET", "/status") != 200:
                        errors.append("status")
                        return
        except Exception as exc:
            errors.append(repr(exc))

    def churner():
        try:
            while not stop.is_set():
                if req("POST", "/indexes", {"name": "temp"}) not in (201, 409):
                    errors.append("create")
                    return
                time.sleep(0.1)
                if req("DELETE", "/indexes/temp") not in (204, 404):
                    errors.append("delete")
                    return
                time.sleep(0.1)
        except Exception as exc:
            errors.append(repr(exc))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    threads.append(threading.Thread(target=churner))
    for t in threads:
        t.start()
    time.sleep(5)
    stop.set()
    for t in threads:
        t.join(timeout=60)
    wedged = [t.name for t in threads if t.is_alive()]
    srv.shutdown()
    index.close()
    assert errors == [] and wedged == []
