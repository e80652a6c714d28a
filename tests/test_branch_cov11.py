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


# ------------------------------------------------- native store (HostStore)

from iscc_search_tpu.store import kv as kvmod
from iscc_search_tpu.store.kv import HostStore


def test_lib_freshness_arms(tmp_path, monkeypatch):
    lib = tmp_path / "lib.so"
    native = tmp_path
    (native / "store.cpp").write_bytes(b"")
    (native / "Makefile").write_bytes(b"")
    monkeypatch.setattr(kvmod, "_LIB_PATH", lib)
    monkeypatch.setattr(kvmod, "_NATIVE_DIR", native)
    assert kvmod._lib_is_fresh() is False  # no lib yet
    lib.write_bytes(b"")
    import os

    os.utime(native / "store.cpp", (2, 2))
    os.utime(native / "Makefile", (2, 2))
    os.utime(lib, (1, 1))  # stale vs both sources
    assert kvmod._lib_is_fresh() is False  # genexp early-False arm
    os.utime(lib, (3, 3))
    assert kvmod._lib_is_fresh() is True


def test_build_library_fresh_early_return():
    # The suite already built the real library, so this is the no-op arm.
    assert kvmod._lib_is_fresh() is True
    kvmod._build_library()


class _LibProxy:
    """Delegates to the real CDLL except for scripted function names."""

    def __init__(self, real, **fakes):
        self._real = real
        self._fakes = fakes

    def __getattr__(self, name):
        if name in self._fakes:
            return self._fakes[name]
        return getattr(self._real, name)


def _nonnull_empty(*args):
    """Scan fn returning a non-NULL pointer with zero payload bytes."""
    out_len = args[-2]
    out_count = args[-1]
    out_len._obj.value = 0
    out_count._obj.value = 0
    return 1


def test_scan_nonnull_empty_pointer_arms(tmp_path, monkeypatch):
    """The `ptr truthy but out_len == 0` arm of every scan early-return."""
    s = HostStore(tmp_path / "db")
    try:
        proxy = _LibProxy(
            s._lib,
            ts_prefix_scan=_nonnull_empty,
            ts_range_scan_after=_nonnull_empty,
            ts_get_dups=_nonnull_empty,
            ts_list_dbs=lambda h, ol, oc: (_nonnull_empty(h, ol, oc)),
        )
        monkeypatch.setattr(s, "_lib", proxy)
        assert s.prefix_scan("assets", b"x") == []
        assert s.range_scan_after("assets", b"a", b"b") == []
        assert s.get_dups("assets", b"k") == []
        assert s.list_dbs() == []
    finally:
        monkeypatch.undo()
        s.close()


def test_use_concurrent_inflight_and_close_waits(tmp_path):
    """Two overlapping sessions (the inflight>0 arm of _use's finally) and a
    close() that has to wait for an in-flight call."""
    s = HostStore(tmp_path / "db")
    a_in = threading.Event()
    a_release = threading.Event()

    def hold():
        with s._use():
            a_in.set()
            a_release.wait(10)

    t = threading.Thread(target=hold)
    t.start()
    assert a_in.wait(10)
    with s._use():  # exits while t still holds one -> no notify arm
        pass

    closer = threading.Thread(target=s.close)
    closer.start()
    time.sleep(0.2)  # close() is now waiting on the inflight session
    assert closer.is_alive()
    a_release.set()
    t.join(10)
    closer.join(10)
    assert not closer.is_alive()


def test_compact_in_background_skips_while_running(tmp_path):
    s = HostStore(tmp_path / "db")
    try:
        gate = threading.Event()
        dummy = threading.Thread(target=gate.wait, args=(5,))
        dummy.start()
        s._compact_thread = dummy
        s._compact_in_background()  # must not start a second one
        assert s._compact_thread is dummy
        gate.set()
        dummy.join(10)
        s._compact_in_background()  # dead thread -> a real one starts
        assert s._compact_thread is not dummy
        s._compact_thread.join(10)
    finally:
        s.close()


# --------------------------------------------------- scale-out edge arms

from iscc_search_tpu.server import scaleout as so_mod


def test_runnable_cores_direct():
    assert so_mod._runnable_cores() >= 1


def test_rpc_ping_times_out_against_missing_socket(tmp_path):
    rpc = so_mod.EngineRPCIndex(str(tmp_path / "nope.sock"))
    t0 = time.monotonic()
    assert rpc.ping(timeout=0.15) is False
    assert time.monotonic() - t0 < 5


class _FakeTime:
    def __init__(self):
        self.t = 0.0

    def monotonic(self):
        return self.t


class _FakeProc:
    def __init__(self, clock, dead, advance):
        self.clock = clock
        self.dead = dead
        self.advance = advance
        self.pid = 4242
        self.polls = 0

    def poll(self):
        self.polls += 1
        self.clock.t += self.advance
        return 1 if self.dead else None


def test_supervise_backoff_escalation_and_reset(monkeypatch):
    """Slot 0 crash-loops to the error-level backoff tier; slot 1 stays up
    through both sides of the stability-reset window."""
    clock = _FakeTime()
    monkeypatch.setattr(so_mod, "time", clock)
    stop = threading.Event()
    crasher = _FakeProc(clock, dead=True, advance=40.0)
    steady = _FakeProc(clock, dead=False, advance=0.0)
    procs = [crasher, steady]
    spawns = []

    def spawn():
        p = _FakeProc(clock, dead=True, advance=40.0)
        spawns.append(p)
        if len(spawns) >= 7:  # past the 8s backoff tier -> logger.error arm
            stop.set()
        return p

    so_mod._supervise(procs, spawn, stop, poll_wait=0.001, stable_after=50.0)
    assert len(spawns) >= 7
    assert procs[0] is spawns[-1]


def test_supervise_respawn_gated_by_backoff_window(monkeypatch):
    """A replacement that dies instantly is NOT respawned inside its backoff
    window (the now < next_spawn arm)."""
    clock = _FakeTime()
    monkeypatch.setattr(so_mod, "time", clock)
    stop = threading.Event()
    crasher = _FakeProc(clock, dead=True, advance=0.01)
    spawns = []

    def spawn():
        p = _FakeProc(clock, dead=True, advance=0.01)
        spawns.append(p)
        return p

    def stopper():
        time.sleep(0.2)
        stop.set()

    t = threading.Thread(target=stopper)
    t.start()
    so_mod._supervise([crasher], spawn, stop, poll_wait=0.001)
    t.join(5)
    # clock advances 0.01/poll; the 0.5s backoff window spans ~50 polls, so
    # far fewer spawns than polls happened
    assert len(spawns) < spawns[0].polls + crasher.polls


def test_supervise_stop_set_during_poll(monkeypatch):
    """stop set between the while check and the respawn decision: the
    mid-iteration stop arm."""
    clock = _FakeTime()
    monkeypatch.setattr(so_mod, "time", clock)
    stop = threading.Event()

    class StopperProc(_FakeProc):
        def poll(self):
            stop.set()
            return 1

    spawned = []
    so_mod._supervise(
        [StopperProc(clock, dead=True, advance=1.0)],
        lambda: spawned.append(1),  # pragma: no cover - must not spawn
        stop,
        poll_wait=0.001,
    )
    assert spawned == []


class _NullIndex:
    def close(self):
        pass


def test_ipc_accept_prunes_dead_handlers_and_exits_cleanly(tmp_path):
    sp = str(tmp_path / "e.sock")
    ipc = so_mod.EngineIPCServer(_NullIndex(), sp)
    ipc.start()
    c1 = socket.socket(socket.AF_UNIX)
    c1.connect(sp)
    c1.close()
    time.sleep(0.3)  # handler thread exits on peer close
    c2 = socket.socket(socket.AF_UNIX)
    c2.connect(sp)  # prune comprehension drops the dead handler
    time.sleep(0.2)
    ipc._stop.set()
    time.sleep(1.2)  # accept() times out, while-condition exits cleanly
    c2.close()
    ipc.close()
    assert not ipc._accept.is_alive()
