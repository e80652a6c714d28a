"""Branch-coverage round 6: pooled transport and scale-out RPC edges.

Covers the remaining uncovered paths in server/pooled.py (transient accept
errors, worker exception containment, header/body deadlines, body EOF,
app-supplied Content-Length) and server/scaleout.py (zero-length reads,
accept-timeout parking, reply-loss semantics, ping timeout, serve_scaleout
startup-failure cleanup, stopped-server connection handling).
"""

import pickle
import socket
import struct
import threading
import time

import pytest

from iscc_search_tpu.server import scaleout as so
from iscc_search_tpu.server.pooled import PooledHTTPServer, _Conn


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _ok_app(environ, start_response):
    start_response("200 OK", [("Content-Type", "application/json")])
    return [b'{"ok": true}']


# ---------------------------------------------------------------- pooled


def test_accept_transient_oserror_keeps_serving(caplog):
    """ECONNABORTED/EMFILE-style accept errors must not kill the accept
    thread; only a closed listener ends the loop."""

    class FlakyListener:
        def __init__(self):
            self.calls = 0

        def getsockname(self):
            return ("127.0.0.1", 12345)

        def settimeout(self, _t):
            pass

        def fileno(self):
            return 99  # still-open listener

        def accept(self):
            self.calls += 1
            if self.calls == 1:
                raise OSError("ECONNABORTED")
            raise socket.timeout()

        def close(self):
            pass

    listener = FlakyListener()
    srv = PooledHTTPServer("127.0.0.1", 0, _ok_app, threads=0, sock=listener)
    t = threading.Thread(target=srv._accept_loop, daemon=True)
    import logging

    with caplog.at_level(logging.WARNING, logger="iscc_search_tpu.server.pooled"):
        t.start()
        time.sleep(0.3)
        srv._shutdown.set()
        t.join(3)
    assert not t.is_alive()
    assert listener.calls >= 2  # survived the OSError and kept accepting
    assert any("accept() error" in r.message for r in caplog.records)
    srv._done.set()
    srv.server_close()


def test_close_conn_idempotent():
    a, b = socket.socketpair()
    srv = PooledHTTPServer("127.0.0.1", 0, _ok_app, threads=0)
    conn = _Conn(a, ("127.0.0.1", 1))
    srv._close_conn(conn)
    srv._close_conn(conn)  # second call: early return, no double-close error
    assert conn.closed
    b.close()
    srv._done.set()
    srv.server_close()


def test_worker_contains_nonsocket_exceptions():
    """A poisoned connection object raising a non-OSError inside request
    handling is logged and closed without killing the pool worker."""

    class BoomSock:
        def fileno(self):
            return 7

        def settimeout(self, _t):
            raise RuntimeError("poisoned")

        def close(self):
            pass

    srv = PooledHTTPServer("127.0.0.1", 0, _ok_app, threads=0)
    conn = _Conn(BoomSock(), ("127.0.0.1", 2))
    worker = threading.Thread(target=srv._worker_loop, daemon=True)
    worker.start()
    srv._queue.put(conn)
    deadline = time.monotonic() + 3
    while not conn.closed and time.monotonic() < deadline:
        time.sleep(0.01)
    assert conn.closed
    assert worker.is_alive()  # the worker survived to serve the next conn
    srv._queue.put(None)
    worker.join(3)
    srv._done.set()
    srv.server_close()


@pytest.fixture
def tight_server():
    """Server with a tiny request budget for deadline-path tests."""
    srv = PooledHTTPServer("127.0.0.1", 0, _ok_app, threads=2, request_timeout=0.4)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.server_close()
    t.join(5)


def test_header_trickle_hits_request_deadline(tight_server):
    s = socket.create_connection(("127.0.0.1", tight_server.server_port), timeout=5)
    s.sendall(b"GET / HT")  # never completes the header
    s.settimeout(5)
    assert s.recv(1024) == b""  # server gave up at the deadline and closed
    s.close()


def test_body_eof_closes_connection(tight_server):
    s = socket.create_connection(("127.0.0.1", tight_server.server_port), timeout=5)
    s.sendall(b"POST /indexes HTTP/1.1\r\nContent-Length: 10\r\n\r\nabc")
    s.shutdown(socket.SHUT_WR)  # EOF before the promised body arrives
    s.settimeout(5)
    assert s.recv(1024) == b""
    s.close()


def test_body_trickle_hits_request_deadline(tight_server):
    s = socket.create_connection(("127.0.0.1", tight_server.server_port), timeout=5)
    s.sendall(b"POST /indexes HTTP/1.1\r\nContent-Length: 10\r\n\r\nabc")
    s.settimeout(5)  # keep the write side open: only the deadline can end it
    assert s.recv(1024) == b""
    s.close()


def test_app_supplied_content_length_not_duplicated():
    def cl_app(environ, start_response):
        start_response("200 OK", [("Content-Type", "text/plain"), ("Content-Length", "5")])
        return [b"hello"]

    srv = PooledHTTPServer("127.0.0.1", 0, cl_app, threads=2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        s = socket.create_connection(("127.0.0.1", srv.server_port), timeout=5)
        s.sendall(b"GET / HTTP/1.1\r\n\r\n")
        s.settimeout(3)
        data = b""
        while b"hello" not in data:
            chunk = s.recv(65536)
            if not chunk:
                break
            data += chunk
        s.close()
        head = data.split(b"\r\n\r\n", 1)[0].lower()
        assert head.count(b"content-length:") == 1
        assert data.endswith(b"hello")
    finally:
        srv.server_close()
        t.join(5)


# --------------------------------------------------------------- scaleout


def test_recv_exact_zero_bytes():
    assert so._recv_exact(None, 0) == b""  # zero-length read never touches the socket


def test_engine_ipc_accept_timeout_then_close(tmp_path):
    ipc = so.EngineIPCServer(index=None, socket_path=str(tmp_path / "e.sock"))
    ipc.start()
    time.sleep(0.8)  # > the 0.5s accept timeout: the timeout branch fires
    ipc.close()
    assert not ipc._accept.is_alive()


def test_serve_conn_exits_immediately_when_stopped(tmp_path):
    ipc = so.EngineIPCServer(index=None, socket_path=str(tmp_path / "s.sock"))
    ipc._stop.set()
    a, b = socket.socketpair()
    ipc._serve_conn(a)  # loop guard false on entry: close and return
    assert a.fileno() == -1
    b.close()
    ipc.close()


def test_serve_conn_reply_send_failure_ends_connection(tmp_path):
    """A peer that vanishes between request and reply ends the handler
    cleanly (no exception, no retry loop)."""

    class HalfDeadSock:
        def __init__(self):
            payload = pickle.dumps(("ping",), protocol=5)
            self.frame = struct.pack(">I", len(payload)) + payload
            self.pos = 0
            self.closed = False

        def recv(self, n):
            data = self.frame[self.pos : self.pos + n]
            self.pos += len(data)
            return data

        def sendall(self, _data):
            raise OSError("peer gone")

        def close(self):
            self.closed = True

    ipc = so.EngineIPCServer(index=None, socket_path=str(tmp_path / "h.sock"))
    sock = HalfDeadSock()
    ipc._serve_conn(sock)  # returns on the failed reply write
    assert sock.closed
    ipc.close()


def test_rpc_reply_loss_raises_not_retries(tmp_path):
    """Connection death AFTER a successful send must surface as an error —
    resending could double-apply a non-idempotent mutation."""
    path = str(tmp_path / "engine.sock")
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(path)
    srv.listen(1)

    def engine():
        conn, _ = srv.accept()
        so._recv_frame(conn)  # consume the full request, then vanish
        conn.close()

    t = threading.Thread(target=engine, daemon=True)
    t.start()
    rpc = so.EngineRPCIndex(path)
    with pytest.raises(ConnectionError, match="awaiting reply"):
        rpc.list_indexes()
    t.join(3)
    srv.close()
    rpc.close()


def test_rpc_ping_times_out_to_false(tmp_path):
    rpc = so.EngineRPCIndex(str(tmp_path / "never-created.sock"))
    t0 = time.monotonic()
    assert rpc.ping(timeout=0.2) is False
    assert time.monotonic() - t0 < 5


def test_serve_scaleout_cleanup_on_startup_failure(monkeypatch):
    """A failure between index open and IPC creation must close the index
    (no unflushed leak) and re-raise."""
    from iscc_search_tpu import options as optmod

    closed = []

    class FakeIndex:
        def close(self):
            closed.append(1)

    monkeypatch.setattr(optmod, "get_index", lambda uri: FakeIndex())

    def boom(**_kw):
        raise RuntimeError("disk full")

    monkeypatch.setattr(so.tempfile, "mkdtemp", boom)
    opts = optmod.SearchOptions(index_uri="memory://", workers=2, port=_free_port())
    with pytest.raises(RuntimeError, match="disk full"):
        so.serve_scaleout(opts)
    assert closed == [1]
