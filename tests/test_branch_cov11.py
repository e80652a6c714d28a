"""Branch coverage round 11: serve() multi-host dispatch arms, the
exception-path copies of serve()'s finally block (CPython duplicates finally
bodies in bytecode, so each branch inside needs both outcomes on the normal
AND the raising path), and AggregatorRunner.stop() partial-init."""

import asyncio
import threading

import pytest

from iscc_search_tpu import options as optmod
from iscc_search_tpu.server import httpd as httpd_mod
from iscc_search_tpu.server.httpd import AggregatorRunner


def test_runner_stop_with_loop_but_no_stop_event():
    runner = AggregatorRunner(index=None, opts=None, status={})
    loop = asyncio.new_event_loop()
    try:
        runner._loop = loop  # crashed between loop creation and event creation
        runner.stop()  # must early-return, not call_soon on a loop with no event
    finally:
        loop.close()


# ------------------------------------------------- serve(): multi-host arms


class _RecordingIndex:
    def __init__(self):
        self.calls = []

    def open_index(self, name):
        self.calls.append(("open", name))

    def follow_index(self, name):
        self.calls.append(("follow", name))

    def close(self):
        self.calls.append(("close",))


def _fake_jax(monkeypatch, process_index):
    import jax

    monkeypatch.setattr(jax.distributed, "initialize", lambda: None)
    monkeypatch.setattr(jax, "process_index", lambda: process_index)


def test_serve_distributed_follower_path(monkeypatch, tmp_path):
    """Non-zero process: no HTTP — open the replica, follow, close."""
    _fake_jax(monkeypatch, 1)
    index = _RecordingIndex()
    monkeypatch.setattr(optmod, "get_index", lambda uri: index)
    opts = optmod.SearchOptions(
        index_uri=f"tpu://{tmp_path}/idx", distributed=True, multihost_index="data", port=0
    )
    httpd_mod.serve(opts)
    assert index.calls == [("follow", "data"), ("close",)]


def test_serve_distributed_coordinator_requires_index_name(monkeypatch, tmp_path):
    _fake_jax(monkeypatch, 0)
    index = _RecordingIndex()
    monkeypatch.setattr(optmod, "get_index", lambda uri: index)
    opts = optmod.SearchOptions(index_uri=f"tpu://{tmp_path}/idx", distributed=True, port=0)
    with pytest.raises(ValueError, match="MULTIHOST_INDEX"):
        httpd_mod.serve(opts)
    assert index.calls == [("close",)]


def test_serve_distributed_coordinator_requires_tpu_backend(monkeypatch, tmp_path):
    """workers=1 exercises the truthy-but-not->1 arm on the way through."""
    _fake_jax(monkeypatch, 0)

    class NoOpen:
        closed = False

        def close(self):
            NoOpen.closed = True

    monkeypatch.setattr(optmod, "get_index", lambda uri: NoOpen())
    opts = optmod.SearchOptions(
        index_uri="memory://", distributed=True, multihost_index="data", workers=1, port=0
    )
    with pytest.raises(ValueError, match="tpu://"):
        httpd_mod.serve(opts)
    assert NoOpen.closed


def test_serve_distributed_coordinator_opens_index_before_app(monkeypatch, tmp_path):
    _fake_jax(monkeypatch, 0)
    index = _RecordingIndex()
    monkeypatch.setattr(optmod, "get_index", lambda uri: index)

    def boom_app(index, opts):
        raise RuntimeError("stop after open")

    monkeypatch.setattr("iscc_search_tpu.server.app.create_app", boom_app)
    opts = optmod.SearchOptions(
        index_uri=f"tpu://{tmp_path}/idx", distributed=True, multihost_index="data", port=0
    )
    with pytest.raises(RuntimeError, match="stop after open"):
        httpd_mod.serve(opts)
    assert index.calls == [("open", "data")]


# ------------------------- serve(): exception-path copy of the finally block


def _raising_serve_forever(monkeypatch):
    def boom(self, poll_interval=0.5):
        raise RuntimeError("server loop died")

    monkeypatch.setattr(httpd_mod.ThreadingWSGIServer, "serve_forever", boom)


def test_serve_finally_on_crash_without_runner(monkeypatch):
    _raising_serve_forever(monkeypatch)
    opts = optmod.SearchOptions(
        index_uri="memory://", host="127.0.0.1", port=0, http_backend="wsgiref"
    )
    with pytest.raises(RuntimeError, match="server loop died"):
        httpd_mod.serve(opts)


def test_serve_finally_on_crash_with_runner(monkeypatch):
    _raising_serve_forever(monkeypatch)
    opts = optmod.SearchOptions(
        index_uri="memory://",
        host="127.0.0.1",
        port=0,
        http_backend="wsgiref",
        aggregator_network="testnet",
        aggregator_hub_list_url="http://127.0.0.1:9/hubs.yaml",  # refused instantly
        aggregator_poll_interval=3600,
    )
    with pytest.raises(RuntimeError, match="server loop died"):
        httpd_mod.serve(opts)


def _serve_in_thread(opts):
    """Run serve() off the main thread (signal.signal raises ValueError there,
    so the SIGTERM-restore arm sees previous=None) and return its outcome."""
    result = {}

    def run():
        try:
            httpd_mod.serve(opts)
            result["ok"] = True
        except BaseException as exc:
            result["exc"] = exc

    t = threading.Thread(target=run)
    t.start()
    t.join(timeout=30)
    assert not t.is_alive(), "serve() did not return"
    return result


def test_serve_off_main_thread_returns(monkeypatch):
    monkeypatch.setattr(
        httpd_mod.ThreadingWSGIServer, "serve_forever", lambda self, poll_interval=0.5: None
    )
    opts = optmod.SearchOptions(
        index_uri="memory://", host="127.0.0.1", port=0, http_backend="wsgiref"
    )
    assert _serve_in_thread(opts) == {"ok": True}


def test_serve_off_main_thread_crash(monkeypatch):
    _raising_serve_forever(monkeypatch)
    opts = optmod.SearchOptions(
        index_uri="memory://", host="127.0.0.1", port=0, http_backend="wsgiref"
    )
    result = _serve_in_thread(opts)
    assert isinstance(result["exc"], RuntimeError)


# ----------------------------------------------- pooled transport edge arms

import select
import socket
import time

from iscc_search_tpu.server.pooled import PooledHTTPServer, _Conn


def _app(environ, start_response):
    start_response("200 OK", [("Content-Type", "text/plain")])
    return [b"ok"]


class _ScriptedSock:
    """Fake socket: recv pops from a script (callables raise), sends collect."""

    def __init__(self, recvs=(), sendall_exc=None):
        self.recvs = list(recvs)
        self.sendall_exc = sendall_exc
        self.sent = []
        self.closed = False

    def fileno(self):
        return 999

    def settimeout(self, t):
        pass

    def setblocking(self, b):
        pass

    def send(self, data):
        self.sent.append(data)
        return len(data)

    def sendall(self, data):
        if self.sendall_exc is not None:
            raise self.sendall_exc
        self.sent.append(data)

    def shutdown(self, how):
        pass

    def recv(self, n):
        if not self.recvs:
            return b""
        item = self.recvs.pop(0)
        if isinstance(item, BaseException):
            raise item
        return item

    def close(self):
        self.closed = True


@pytest.fixture
def pooled_srv():
    srv = PooledHTTPServer("127.0.0.1", 0, _app, threads=1)
    yield srv
    srv.server_close()


def test_shed_blocking_drain_exhausts(pooled_srv):
    """A shed peer that never stops sending: the bounded drain runs out."""
    sock = _ScriptedSock(recvs=[b"x"] * 70)
    pooled_srv._shed(_Conn(sock, ("t", 0)), blocking=True)
    assert sock.closed
    assert b"503" in sock.sent[0]


def test_shed_blocking_drain_timeout(pooled_srv):
    """A shed peer that goes silent: the drain read times out, still closed."""
    sock = _ScriptedSock(recvs=[b"x", socket.timeout("silent")])
    pooled_srv._shed(_Conn(sock, ("t", 0)), blocking=True)
    assert sock.closed


def test_shed_nonblocking_drains_buffered_bytes(pooled_srv):
    sock = _ScriptedSock(recvs=[b"leftover", b""])
    pooled_srv._shed(_Conn(sock, ("t", 0)), blocking=False)
    assert sock.closed


def test_handle_one_expect_with_body_already_buffered(pooled_srv):
    """Expect: 100-continue with the full body in the buffer: no interim."""
    sock = _ScriptedSock()
    conn = _Conn(sock, ("t", 0))
    conn.buf = (
        b"POST /x HTTP/1.1\r\nHost: t\r\nContent-Length: 2\r\n"
        b"Expect: 100-continue\r\n\r\nhi"
    )
    keep = pooled_srv._handle_one(conn)
    assert keep
    joined = b"".join(sock.sent)
    assert b"100 Continue" not in joined
    assert joined.startswith(b"HTTP/1.1 200")


def test_handle_one_interim_write_failure(pooled_srv):
    sock = _ScriptedSock(sendall_exc=BrokenPipeError("peer gone"))
    conn = _Conn(sock, ("t", 0))
    conn.buf = (
        b"POST /x HTTP/1.1\r\nHost: t\r\nContent-Length: 5\r\n"
        b"Expect: 100-continue\r\n\r\n"
    )
    assert pooled_srv._handle_one(conn) is False


def test_handle_one_response_write_failure(pooled_srv):
    sock = _ScriptedSock(sendall_exc=ConnectionResetError("rst"))
    conn = _Conn(sock, ("t", 0))
    conn.buf = b"GET / HTTP/1.1\r\nHost: t\r\n\r\n"
    assert pooled_srv._handle_one(conn) is False


def test_handle_one_body_read_deadline(pooled_srv):
    """Headers arrive whole but the body trickles past the request budget."""
    pooled_srv.request_timeout = 1e-9
    sock = _ScriptedSock()
    conn = _Conn(sock, ("t", 0))
    conn.buf = b"POST /x HTTP/1.1\r\nHost: t\r\nContent-Length: 10\r\n\r\nab"
    assert pooled_srv._handle_one(conn) is False


def test_read_until_deadline_expired(pooled_srv):
    sock = _ScriptedSock()
    conn = _Conn(sock, ("t", 0))
    assert pooled_srv._read_until(conn, b"\r\n\r\n", 100, time.monotonic() - 1) is None


def test_pooled_clean_thread_exit_and_parked_close_at_shutdown():
    """Clean while-condition exits of the accept/park loops, the orphan epoll
    event arm (reap race), and parked connections closed by server_close."""
    srv = PooledHTTPServer("127.0.0.1", 0, _app, threads=1)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    time.sleep(0.1)
    client = socket.create_connection(("127.0.0.1", srv.server_port))
    time.sleep(0.3)  # accepted -> parked (no bytes sent)
    a, b = socket.socketpair()
    try:
        srv._epoll.register(a.fileno(), select.EPOLLIN)
        b.sendall(b"x")  # event for an fd with no parked entry
        time.sleep(0.3)
        assert len(srv._parked) == 1
        srv.shutdown()
        time.sleep(1.2)  # let accept() hit its 0.5s timeout and re-check
        srv.server_close()  # the parked client is still there -> close loop
        t.join(5)
        assert not t.is_alive()
    finally:
        client.close()
        a.close()
        b.close()


def test_pooled_accept_survives_listener_close_without_shutdown():
    srv = PooledHTTPServer("127.0.0.1", 0, _app, threads=1)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    time.sleep(0.1)
    srv._sock.close()  # listener dies with no shutdown: fileno<0 arm
    time.sleep(0.8)
    srv.shutdown()
    srv.server_close()
    t.join(5)
    assert not t.is_alive()
