"""Overload behavior: past saturation the serving stack SHEDS (503 +
Retry-After, bounded latency) instead of queueing unboundedly — the
round-3 finding was 12.3 s p50 at 2x offered load with zero errors."""

import json
import socket
import threading
import time

import pytest

from iscc_search_tpu.server.pooled import PooledHTTPServer
from iscc_search_tpu.utils import OverloadedError


def _slow_app(delay):
    def app(environ, start_response):
        time.sleep(delay)
        start_response("200 OK", [("Content-Type", "application/json")])
        return [b'{"ok": true}']

    return app


def _get(port, timeout=10.0):
    with socket.create_connection(("127.0.0.1", port), timeout=timeout) as s:
        s.sendall(b"GET / HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n")
        buf = b""
        while True:
            data = s.recv(65536)
            if not data:
                break
            buf += data
    status = int(buf.split(b" ", 2)[1])
    return status, buf


def _serve(srv):
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    time.sleep(0.2)
    return t


def test_queue_deadline_sheds_stale_requests():
    """One worker, slow app: requests stuck in queue past the deadline get
    503 + Retry-After; at least the first request is served."""
    srv = PooledHTTPServer("127.0.0.1", 0, _slow_app(0.4), threads=1, queue_deadline=0.15)
    _serve(srv)
    try:
        codes = []
        lock = threading.Lock()

        def client():
            try:
                status, raw = _get(srv.server_port)
            except OSError:
                status, raw = -1, b""
            with lock:
                codes.append((status, raw))

        threads = [threading.Thread(target=client) for _ in range(6)]
        for t in threads:
            t.start()
            time.sleep(0.01)
        for t in threads:
            t.join(15)
        statuses = [c for c, _ in codes]
        assert 200 in statuses, statuses
        assert 503 in statuses, statuses
        shed = next(raw for c, raw in codes if c == 503)
        assert b"Retry-After: 1" in shed
        assert b"overloaded" in shed.lower()
        assert srv.shed_count >= statuses.count(503)
    finally:
        srv.server_close()


def test_admission_bound_sheds_burst():
    """max_pending=1: a burst beyond worker + queue capacity is shed at
    admission (no unbounded queue growth)."""
    srv = PooledHTTPServer("127.0.0.1", 0, _slow_app(0.3), threads=1, max_pending=1, queue_deadline=0)
    _serve(srv)
    try:
        codes = []
        lock = threading.Lock()

        def client():
            try:
                status, _ = _get(srv.server_port)
            except OSError:
                status = -1
            with lock:
                codes.append(status)

        threads = [threading.Thread(target=client) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(15)
        assert 200 in codes, codes
        # Shed responses (503) or resets for peers whose 503 couldn't be
        # written non-blockingly; either way nothing queued unboundedly.
        assert any(c in (503, -1) for c in codes), codes
    finally:
        srv.server_close()


def test_overload_latency_stays_bounded():
    """At ~3x capacity, served requests stay near queue_deadline instead of
    stacking to (n_requests x service_time)."""
    deadline = 0.3
    srv = PooledHTTPServer("127.0.0.1", 0, _slow_app(0.1), threads=1, queue_deadline=deadline)
    _serve(srv)
    try:
        latencies = []
        lock = threading.Lock()

        def client():
            t0 = time.monotonic()
            try:
                status, _ = _get(srv.server_port)
            except OSError:
                status = -1
            with lock:
                latencies.append((status, time.monotonic() - t0))

        threads = [threading.Thread(target=client) for _ in range(12)]
        for t in threads:
            t.start()
            time.sleep(0.005)
        for t in threads:
            t.join(20)
        served = [lat for status, lat in latencies if status == 200]
        assert served, latencies
        # Unbounded queueing would make the slowest served request wait
        # ~12 x 0.1 s; the deadline bounds it to ~deadline + service + eps.
        assert max(served) < deadline + 0.1 + 0.5, latencies
    finally:
        srv.server_close()


def test_zero_disables_shedding():
    srv = PooledHTTPServer("127.0.0.1", 0, _slow_app(0.0), threads=2, max_pending=0, queue_deadline=0)
    _serve(srv)
    try:
        status, _ = _get(srv.server_port)
        assert status == 200
        assert srv.shed_count == 0
    finally:
        srv.server_close()


def test_wsgi_maps_overloaded_to_503():
    from iscc_search_tpu.server.wsgi import WsgiApp

    app = WsgiApp()

    @app.route("GET", "/boom")
    def boom(request):
        raise OverloadedError("engine search capacity exhausted")

    environ = {
        "REQUEST_METHOD": "GET", "PATH_INFO": "/boom", "QUERY_STRING": "",
        "wsgi.input": None, "wsgi.errors": None,
    }
    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = dict(headers)

    body = b"".join(app(environ, start_response))
    assert captured["status"].startswith("503")
    assert captured["headers"].get("Retry-After") == "1"
    assert b"capacity" in body


def test_engine_ipc_sheds_past_inflight_bound(tmp_path):
    """search_raw past the in-flight bound returns OverloadedError by name."""
    import pickle

    from iscc_search_tpu.server.scaleout import EngineIPCServer, _recv_frame, _send_frame

    class DummyIndex:
        def search_assets(self, name, query, limit):  # pragma: no cover - never admitted
            raise AssertionError("should have been shed")

    path = str(tmp_path / "e.sock")
    ipc = EngineIPCServer(DummyIndex(), path, max_inflight=0)
    ipc.start()
    try:
        conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        conn.connect(path)
        _send_frame(conn, ("search_raw", "idx", {"units": ["ISCC:GAAQAAICAMCAKBQH"]}, 10))
        reply = _recv_frame(conn)
        assert reply[0] == "err" and reply[1] == "OverloadedError", reply
        conn.close()
    finally:
        ipc.close()


def test_rpc_client_raises_overloaded(tmp_path):
    """The worker-side client converts the wire error back to OverloadedError
    (which the WSGI layer then maps to 503 + Retry-After)."""
    from iscc_search_tpu.schema import IsccQuery
    from iscc_search_tpu.server.scaleout import EngineIPCServer, EngineRPCIndex

    class DummyIndex:
        def search_assets(self, name, query, limit):  # pragma: no cover
            raise AssertionError("should have been shed")

    path = str(tmp_path / "e.sock")
    ipc = EngineIPCServer(DummyIndex(), path, max_inflight=0)
    ipc.start()
    try:
        rpc = EngineRPCIndex(path)
        with pytest.raises(OverloadedError):
            rpc.search_assets("idx", IsccQuery(units=["ISCC:GAAQAAICAMCAKBQH"]), 10)
        rpc.close()
    finally:
        ipc.close()


def test_rpc_breaker_fails_fast_after_rejection(tmp_path):
    """After one engine rejection the breaker window makes searches fail
    locally (no pickle + socket round trip per doomed request); the window
    expires and traffic returns to the wire."""
    from iscc_search_tpu.schema import IsccQuery
    from iscc_search_tpu.server.scaleout import EngineIPCServer, EngineRPCIndex

    class DummyIndex:
        def search_assets(self, name, query, limit):  # pragma: no cover
            raise AssertionError("should have been shed")

    path = str(tmp_path / "e.sock")
    ipc = EngineIPCServer(DummyIndex(), path, max_inflight=0)
    ipc.start()
    try:
        rpc = EngineRPCIndex(path, breaker_s=0.2)
        q = IsccQuery(units=["ISCC:GAAQAAICAMCAKBQH"])
        with pytest.raises(OverloadedError):  # wire rejection arms the breaker
            rpc.search_assets("idx", q, 10)
        assert rpc.overloaded
        rpc._roundtrip = lambda frame: pytest.fail("paid a round trip inside the breaker window")
        with pytest.raises(OverloadedError):  # local fast-fail, no wire
            rpc.search_assets("idx", q, 10)
        time.sleep(0.25)
        assert not rpc.overloaded
        sentinel = RuntimeError("reached the wire again")
        rpc._roundtrip = lambda frame: (_ for _ in ()).throw(sentinel)
        with pytest.raises(RuntimeError, match="reached the wire again"):
            rpc.search_assets("idx", q, 10)
        rpc.close()
    finally:
        ipc.close()


def test_rpc_breaker_disabled(tmp_path):
    """breaker_s=0 keeps the pre-breaker behavior: every search pays the
    round trip and ``overloaded`` never reports True."""
    from iscc_search_tpu.schema import IsccQuery
    from iscc_search_tpu.server.scaleout import EngineIPCServer, EngineRPCIndex

    class DummyIndex:
        def search_assets(self, name, query, limit):  # pragma: no cover
            raise AssertionError("should have been shed")

    path = str(tmp_path / "e.sock")
    ipc = EngineIPCServer(DummyIndex(), path, max_inflight=0)
    ipc.start()
    try:
        rpc = EngineRPCIndex(path, breaker_s=0)
        q = IsccQuery(units=["ISCC:GAAQAAICAMCAKBQH"])
        for _ in range(2):  # both calls reach the wire
            with pytest.raises(OverloadedError):
                rpc.search_assets("idx", q, 10)
            assert not rpc.overloaded
        rpc.close()
    finally:
        ipc.close()


def test_admission_probe_sheds_before_parse():
    """An active overload probe sheds at admission: 503 + Retry-After with
    the app (and therefore parse/RPC work) never invoked."""
    calls = []

    def app(environ, start_response):
        calls.append(environ["PATH_INFO"])
        start_response("200 OK", [("Content-Type", "application/json")])
        return [b'{"ok": true}']

    flag = [True]
    srv = PooledHTTPServer("127.0.0.1", 0, app, threads=2, overload_probe=lambda: flag[0])
    _serve(srv)
    try:
        status, raw = _get(srv.server_port)
        assert status == 503, raw
        assert b"Retry-After: 1" in raw
        assert calls == []  # shed before any app/parse work
        assert srv.shed_count == 1
        flag[0] = False
        status, _ = _get(srv.server_port)
        assert status == 200
        assert calls == ["/"]
    finally:
        srv.server_close()


class TestCoreGuard:
    def test_shrinks_workers_to_cores_minus_one(self, monkeypatch):
        from iscc_search_tpu.options import SearchOptions
        from iscc_search_tpu.server import scaleout

        monkeypatch.delenv("ISCC_SEARCH_SCALEOUT_FORCE", raising=False)
        monkeypatch.setattr(scaleout, "_runnable_cores", lambda: 3)
        out = scaleout._apply_core_guard(SearchOptions(workers=4))
        assert out is not None and out.workers == 2

    def test_falls_back_on_single_core(self, monkeypatch):
        from iscc_search_tpu.options import SearchOptions
        from iscc_search_tpu.server import scaleout

        monkeypatch.delenv("ISCC_SEARCH_SCALEOUT_FORCE", raising=False)
        monkeypatch.setattr(scaleout, "_runnable_cores", lambda: 1)
        assert scaleout._apply_core_guard(SearchOptions(workers=2)) is None

    def test_sufficient_cores_untouched(self, monkeypatch):
        from iscc_search_tpu.options import SearchOptions
        from iscc_search_tpu.server import scaleout

        monkeypatch.delenv("ISCC_SEARCH_SCALEOUT_FORCE", raising=False)
        monkeypatch.setattr(scaleout, "_runnable_cores", lambda: 8)
        opts = SearchOptions(workers=2)
        assert scaleout._apply_core_guard(opts) is opts

    def test_force_env_skips_guard(self, monkeypatch):
        from iscc_search_tpu.options import SearchOptions
        from iscc_search_tpu.server import scaleout

        monkeypatch.setenv("ISCC_SEARCH_SCALEOUT_FORCE", "1")
        monkeypatch.setattr(scaleout, "_runnable_cores", lambda: 1)
        opts = SearchOptions(workers=4)
        assert scaleout._apply_core_guard(opts) is opts

    def test_serve_scaleout_single_core_falls_back(self, monkeypatch, tmp_path):
        """serve_scaleout on a 1-core host routes to single-process serve."""
        from iscc_search_tpu.options import SearchOptions
        from iscc_search_tpu.server import httpd, scaleout

        monkeypatch.delenv("ISCC_SEARCH_SCALEOUT_FORCE", raising=False)
        monkeypatch.setattr(scaleout, "_runnable_cores", lambda: 1)
        called = []
        monkeypatch.setattr(httpd, "serve", lambda opts: called.append(opts))
        scaleout.serve_scaleout(SearchOptions(index_uri="memory://", workers=3, port=18123))
        assert called and called[0].workers == 1
