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
