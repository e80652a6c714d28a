"""Pooled keep-alive HTTP/1.1 server: protocol + app-integration tests."""

import json
import socket
import threading
import time

import httpx
import pytest

from iscc_search_tpu.indexes.memory import MemoryIndex
from iscc_search_tpu.options import SearchOptions
from iscc_search_tpu.schema import IsccEntry, IsccIndex
from iscc_search_tpu.server.app import create_app
from iscc_search_tpu.server.pooled import PooledHTTPServer


@pytest.fixture
def pooled_server():
    opts = SearchOptions(index_uri="memory://")
    app = create_app(index=MemoryIndex(), opts=opts)
    srv = PooledHTTPServer("127.0.0.1", 0, app, threads=4)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, f"http://127.0.0.1:{srv.server_port}"
    srv.server_close()
    thread.join(5)


def _raw(port, payload, recv_until_close=False):
    s = socket.create_connection(("127.0.0.1", port), timeout=5)
    s.sendall(payload)
    chunks = []
    s.settimeout(2)
    try:
        while True:
            data = s.recv(65536)
            if not data:
                break
            chunks.append(data)
            if not recv_until_close and b"\r\n\r\n" in b"".join(chunks):
                head, _, rest = b"".join(chunks).partition(b"\r\n\r\n")
                clen = 0
                for line in head.split(b"\r\n"):
                    if line.lower().startswith(b"content-length:"):
                        clen = int(line.split(b":")[1])
                if len(rest) >= clen:
                    break
    except socket.timeout:
        pass
    s.close()
    return b"".join(chunks)


def test_roundtrip_and_crud(pooled_server, entry_factory):
    _, base = pooled_server
    with httpx.Client(base_url=base) as client:
        r = client.get("/healthz")
        assert r.status_code == 200 and r.json()["status"] == "ok"
        r = client.post("/indexes", json={"name": "pool"})
        assert r.status_code == 201
        entry = entry_factory()
        r = client.post("/indexes/pool/assets", json=[entry])
        assert r.status_code == 201
        r = client.post("/indexes/pool/search", json={"iscc_code": entry["iscc_code"]})
        assert r.status_code == 200
        assert r.json()["global_matches"][0]["iscc_id"] == entry["iscc_id"]


def test_keepalive_reuses_connection(pooled_server):
    srv, base = pooled_server
    port = srv.server_port
    s = socket.create_connection(("127.0.0.1", port), timeout=5)
    for _ in range(3):
        s.sendall(b"GET /healthz HTTP/1.1\r\nHost: x\r\n\r\n")
        buf = b""
        while b'"ok"' not in buf:
            data = s.recv(65536)
            assert data, "server closed a keep-alive connection"
            buf += data
        assert b"Connection: keep-alive" in buf
    s.close()


def test_pipelined_requests(pooled_server):
    srv, _ = pooled_server
    # Two requests in one write; both responses must come back in order
    payload = b"GET /healthz HTTP/1.1\r\nHost: x\r\n\r\n" * 2
    data = _raw(srv.server_port, payload, recv_until_close=False)
    # Wait for the second response too
    time.sleep(0.2)
    assert data.count(b"HTTP/1.1 200") >= 1


def test_http10_closes_by_default(pooled_server):
    srv, _ = pooled_server
    data = _raw(srv.server_port, b"GET /healthz HTTP/1.0\r\nHost: x\r\n\r\n", recv_until_close=True)
    assert b"HTTP/1.1 200" in data
    assert b"Connection: close" in data


def test_connection_close_honored(pooled_server):
    srv, _ = pooled_server
    data = _raw(
        srv.server_port,
        b"GET /healthz HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n",
        recv_until_close=True,
    )
    assert b"Connection: close" in data


def test_head_request_no_body(pooled_server):
    srv, _ = pooled_server
    data = _raw(srv.server_port, b"HEAD /healthz HTTP/1.1\r\nHost: x\r\n\r\n")
    head, _, rest = data.partition(b"\r\n\r\n")
    assert b"200" in head.split(b"\r\n")[0]
    assert rest == b""
    assert b"Content-Length" in head  # length advertised, body stripped


def test_chunked_request_rejected(pooled_server):
    srv, _ = pooled_server
    data = _raw(
        srv.server_port,
        b"POST /indexes HTTP/1.1\r\nHost: x\r\nTransfer-Encoding: chunked\r\n\r\n0\r\n\r\n",
        recv_until_close=True,
    )
    assert b"411" in data.split(b"\r\n")[0]


def test_malformed_request_line(pooled_server):
    srv, _ = pooled_server
    data = _raw(srv.server_port, b"GARBAGE\r\n\r\n", recv_until_close=True)
    assert b"400" in data.split(b"\r\n")[0]


def test_query_string_and_path_decode(pooled_server, entry_factory):
    _, base = pooled_server
    with httpx.Client(base_url=base) as client:
        client.post("/indexes", json={"name": "qs"})
        entry = entry_factory()
        client.post("/indexes/qs/assets", json=[entry])
        r = client.get("/indexes/qs/search", params={"iscc_code": entry["iscc_code"], "limit": 3})
        assert r.status_code == 200
        assert r.json()["global_matches"]


def test_concurrent_clients(pooled_server, entry_factory):
    _, base = pooled_server
    with httpx.Client(base_url=base) as setup:
        setup.post("/indexes", json={"name": "conc"})
        entry = entry_factory()
        setup.post("/indexes/conc/assets", json=[entry])
    errors = []

    def worker():
        try:
            with httpx.Client(base_url=base) as client:
                for _ in range(20):
                    r = client.post("/indexes/conc/search", json={"iscc_code": entry["iscc_code"]})
                    assert r.status_code == 200
        except Exception as exc:  # pragma: no cover - failure reporting
            errors.append(exc)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    assert not errors


def test_body_spanning_multiple_reads(pooled_server):
    srv, _ = pooled_server
    body = json.dumps({"name": "bigread"}).encode()
    head = (
        f"POST /indexes HTTP/1.1\r\nHost: x\r\nContent-Type: application/json\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    s = socket.create_connection(("127.0.0.1", srv.server_port), timeout=5)
    s.sendall(head + body[:3])
    time.sleep(0.05)
    s.sendall(body[3:])
    buf = b""
    s.settimeout(5)
    while b"\r\n\r\n" not in buf:
        buf += s.recv(65536)
    assert b"201" in buf.split(b"\r\n")[0]
    s.close()


def test_shutdown_unblocks_serve_forever():
    opts = SearchOptions(index_uri="memory://")
    app = create_app(index=MemoryIndex(), opts=opts)
    srv = PooledHTTPServer("127.0.0.1", 0, app, threads=2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    time.sleep(0.1)
    srv.shutdown()
    t.join(5)
    assert not t.is_alive()
    srv.server_close()


def test_serve_uses_pooled_backend(tmp_path, monkeypatch):
    """httpd.serve() honors http_backend=pooled and serves over it."""
    import urllib.request

    from iscc_search_tpu.options import SearchOptions as SO
    from iscc_search_tpu.server import httpd as httpd_mod

    opts = SO(index_uri="memory://", host="127.0.0.1", port=0, http_backend="pooled")
    # serve() blocks; drive it on a thread and stop via the server it builds.
    built = {}
    orig = httpd_mod.PooledHTTPServer if hasattr(httpd_mod, "PooledHTTPServer") else None  # noqa: F841

    from iscc_search_tpu.server.pooled import PooledHTTPServer as RealPooled

    class Capture(RealPooled):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            built["srv"] = self

    import iscc_search_tpu.server.pooled as pooled_mod

    monkeypatch.setattr(pooled_mod, "PooledHTTPServer", Capture)
    t = threading.Thread(target=httpd_mod.serve, args=(opts,), daemon=True)
    t.start()
    for _ in range(100):
        if "srv" in built:
            break
        time.sleep(0.05)
    srv = built["srv"]
    ok = json.load(urllib.request.urlopen(f"http://127.0.0.1:{srv.server_port}/healthz"))
    assert ok["status"] == "ok"
    srv.shutdown()
    t.join(10)
    assert not t.is_alive()


# ---------------------------------------------------------- branch fillers


def test_oversized_header_rejected(pooled_server):
    srv, _ = pooled_server
    # > 64 KiB of header bytes without a terminator: connection dropped
    s = socket.create_connection(("127.0.0.1", srv.server_port), timeout=5)
    s.sendall(b"GET / HTTP/1.1\r\nX-Pad: " + b"a" * 70000)
    s.settimeout(3)
    try:
        data = s.recv(65536)
    except socket.timeout:  # pragma: no cover - acceptable alternative
        data = b"x"
    assert data == b""  # server closed without a response
    s.close()


def test_bad_content_length_rejected(pooled_server):
    """RFC 7230 3.3.2: invalid Content-Length -> 400 + close (treating it
    as 0 would desync keep-alive framing on the buffered body bytes)."""
    srv, _ = pooled_server
    data = _raw(
        srv.server_port,
        b"GET /healthz HTTP/1.1\r\nHost: x\r\nContent-Length: abc\r\n\r\n",
        recv_until_close=True,
    )
    assert b"400" in data.split(b"\r\n")[0]


def test_body_too_large_rejected(pooled_server):
    srv, _ = pooled_server
    data = _raw(
        srv.server_port,
        b"POST /indexes HTTP/1.1\r\nHost: x\r\nContent-Length: 999999999999\r\n\r\n",
        recv_until_close=True,
    )
    assert b"413" in data.split(b"\r\n")[0]


def test_http10_keepalive_header_honored(pooled_server):
    srv, _ = pooled_server
    s = socket.create_connection(("127.0.0.1", srv.server_port), timeout=5)
    s.sendall(b"GET /healthz HTTP/1.0\r\nHost: x\r\nConnection: keep-alive\r\n\r\n")
    buf = b""
    while b'"ok"' not in buf:
        data = s.recv(65536)
        assert data
        buf += data
    assert b"Connection: keep-alive" in buf
    # and the connection really stays open for a second request
    s.sendall(b"GET /healthz HTTP/1.0\r\nHost: x\r\nConnection: keep-alive\r\n\r\n")
    buf = b""
    while b'"ok"' not in buf:
        data = s.recv(65536)
        assert data
        buf += data
    s.close()


def test_options_preflight_204_no_content_length_added(pooled_server):
    srv, _ = pooled_server
    data = _raw(
        srv.server_port,
        b"OPTIONS /indexes HTTP/1.1\r\nHost: x\r\nOrigin: http://a\r\n\r\n",
    )
    head = data.split(b"\r\n\r\n")[0]
    assert b"204" in head.split(b"\r\n")[0]


def test_raising_app_returns_500():
    def bomb_app(environ, start_response):
        raise RuntimeError("boom")

    srv = PooledHTTPServer("127.0.0.1", 0, bomb_app, threads=2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    data = _raw(srv.server_port, b"GET / HTTP/1.1\r\nHost: x\r\n\r\n", recv_until_close=True)
    assert b"500" in data.split(b"\r\n")[0]
    srv.server_close()
    t.join(5)


def test_server_close_without_explicit_shutdown():
    opts = SearchOptions(index_uri="memory://")
    app = create_app(index=MemoryIndex(), opts=opts)
    srv = PooledHTTPServer("127.0.0.1", 0, app, threads=2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    time.sleep(0.1)
    srv.server_close()  # implies shutdown()
    t.join(5)
    assert not t.is_alive()


def test_parked_connection_closed_by_peer(pooled_server):
    """A keep-alive connection closed while parked is reaped via EPOLLRDHUP."""
    srv, _ = pooled_server
    s = socket.create_connection(("127.0.0.1", srv.server_port), timeout=5)
    s.sendall(b"GET /healthz HTTP/1.1\r\nHost: x\r\n\r\n")
    buf = b""
    while b'"ok"' not in buf:
        buf += s.recv(65536)
    s.close()  # connection is parked server-side; close it
    time.sleep(0.3)
    with srv._parked_lock:
        assert len(srv._parked) == 0


def test_negative_content_length_rejected(pooled_server):
    srv, _ = pooled_server
    data = _raw(
        srv.server_port,
        b"POST /indexes HTTP/1.1\r\nHost: x\r\nContent-Length: -5\r\n\r\n",
        recv_until_close=True,
    )
    assert b"413" in data.split(b"\r\n")[0]


def test_expect_100_continue(pooled_server):
    """Server sends the interim 100 before reading a delayed body."""
    srv, _ = pooled_server
    body = json.dumps({"name": "expect"}).encode()
    s = socket.create_connection(("127.0.0.1", srv.server_port), timeout=5)
    s.sendall(
        (
            f"POST /indexes HTTP/1.1\r\nHost: x\r\nContent-Type: application/json\r\n"
            f"Content-Length: {len(body)}\r\nExpect: 100-continue\r\n\r\n"
        ).encode()
    )
    s.settimeout(5)
    interim = s.recv(65536)
    assert interim.startswith(b"HTTP/1.1 100 Continue")
    s.sendall(body)
    buf = b""
    while b"\r\n\r\n" not in buf:
        buf += s.recv(65536)
    assert b"201" in buf.split(b"\r\n")[0]
    s.close()


def test_trickling_request_hits_whole_request_deadline():
    """A byte-at-a-time client cannot renew its timeout forever: the whole
    request read is bounded by request_timeout, freeing the pool worker."""
    opts = SearchOptions(index_uri="memory://")
    app = create_app(index=MemoryIndex(), opts=opts)
    srv = PooledHTTPServer("127.0.0.1", 0, app, threads=2, request_timeout=1.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    s = socket.create_connection(("127.0.0.1", srv.server_port), timeout=10)
    s.sendall(b"GET /healthz")
    t0 = time.monotonic()
    s.settimeout(10)
    try:
        data = s.recv(65536)
    except (socket.timeout, ConnectionError):
        data = b""
    # Server dropped the trickler within ~request_timeout, not 30 s/byte
    assert data == b""
    assert time.monotonic() - t0 < 8
    s.close()
    srv.server_close()
    t.join(5)


def test_idle_parked_connection_reaped():
    opts = SearchOptions(index_uri="memory://")
    app = create_app(index=MemoryIndex(), opts=opts)
    srv = PooledHTTPServer("127.0.0.1", 0, app, threads=2, idle_timeout=3.0, sweep_interval=0.2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()

    def parked_conn():
        s = socket.create_connection(("127.0.0.1", srv.server_port), timeout=5)
        s.sendall(b"GET /healthz HTTP/1.1\r\nHost: x\r\n\r\n")
        buf = b""
        while b'"ok"' not in buf:
            buf += s.recv(65536)
        return s

    s = parked_conn()
    # Parked now; the sweep tick reaps s after idle_timeout
    s.settimeout(10)
    assert s.recv(65536) == b""  # server closes the stale conn -> EOF
    s.close()
    # A YOUNG parked connection rides out a sweep un-reaped and still serves
    fresh = parked_conn()
    time.sleep(1.2)  # > one epoll cycle: at least one sweep saw it young
    fresh.settimeout(10)
    fresh.sendall(b"GET /healthz HTTP/1.1\r\nHost: x\r\n\r\n")
    buf = b""
    while b'"ok"' not in buf:
        data = fresh.recv(65536)
        assert data, "young parked connection was reaped"
        buf += data
    fresh.close()
    srv.server_close()
    t.join(5)


def test_pooled_soak_mixed_traffic(entry_factory):
    """8s of concurrent CRUD over real sockets with keep-alive churn: the
    pooled transport must produce zero 5xx and zero framing errors while
    connections are opened, reused, pipelined, and dropped mid-stream."""
    opts = SearchOptions(index_uri="memory://")
    app = create_app(index=MemoryIndex(), opts=opts)
    srv = PooledHTTPServer("127.0.0.1", 0, app, threads=6, idle_timeout=2.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    with httpx.Client(base_url=base) as setup:
        assert setup.post("/indexes", json={"name": "soak"}).status_code == 201
    stop = threading.Event()
    errors = []
    entries = [entry_factory() for _ in range(32)]
    with httpx.Client(base_url=base) as seed:
        seed.post("/indexes/soak/assets", json=entries)

    def crud(worker_id):
        try:
            with httpx.Client(base_url=base) as client:
                i = 0
                while not stop.is_set():
                    i += 1
                    op = i % 4
                    if op == 0:
                        r = client.post("/indexes/soak/assets", json=[entries[i % 32]])
                        assert r.status_code in (200, 201), r.status_code
                    elif op == 1:
                        r = client.post(
                            "/indexes/soak/search", json={"iscc_code": entries[i % 32]["iscc_code"]}
                        )
                        assert r.status_code == 200, r.status_code
                    elif op == 2:
                        r = client.get(f"/indexes/soak/assets/{entries[i % 32]['iscc_id']}")
                        assert r.status_code == 200, r.status_code
                    else:
                        r = client.get("/metrics")
                        assert r.status_code == 200, r.status_code
        except Exception as exc:  # pragma: no cover - failure reporting
            errors.append((worker_id, exc))

    def churner():
        """Open connections and drop them mid-request to stress cleanup."""
        try:
            while not stop.is_set():
                s = socket.create_connection(("127.0.0.1", srv.server_port), timeout=5)
                s.sendall(b"GET /healthz HTT")  # partial request line
                s.close()
                s2 = socket.create_connection(("127.0.0.1", srv.server_port), timeout=5)
                s2.sendall(b"GET /healthz HTTP/1.1\r\nHost: x\r\n\r\n")
                s2.recv(100)
                s2.close()  # parked then dropped
                time.sleep(0.01)
        except Exception as exc:  # pragma: no cover
            errors.append(("churner", exc))

    workers = [threading.Thread(target=crud, args=(i,)) for i in range(4)]
    workers.append(threading.Thread(target=churner))
    for w in workers:
        w.start()
    time.sleep(8)
    stop.set()
    for w in workers:
        w.join(20)
    srv.server_close()
    t.join(5)
    assert not errors, errors[:3]


def test_transfer_encoding_variants_all_rejected(pooled_server):
    """ANY Transfer-Encoding header closes with 411 — 'gzip, chunked' (still
    chunked-framed per RFC 7230 §3.3.3) previously slipped the exact-match
    check and desynced keep-alive framing (request smuggling shape)."""
    srv, _ = pooled_server
    for te in (b"gzip, chunked", b"chunked;ext=1", b"identity"):
        data = _raw(
            srv.server_port,
            b"POST /indexes HTTP/1.1\r\nHost: x\r\nTransfer-Encoding: " + te
            + b"\r\nContent-Length: 5\r\n\r\nhello",
            recv_until_close=True,
        )
        assert b"411" in data.split(b"\r\n")[0], te


def test_repeated_headers_comma_joined():
    """RFC 7230 §3.2.2: repeated field names combine with ', ' — last-wins
    silently dropped earlier Cookie/XFF values."""
    import json as _json

    seen = {}

    def echo_app(environ, start_response):
        seen["xff"] = environ.get("HTTP_X_FORWARDED_FOR")
        body = b"{}"
        start_response("200 OK", [("Content-Type", "application/json"), ("Content-Length", str(len(body)))])
        return [body]

    srv = PooledHTTPServer("127.0.0.1", 0, echo_app, threads=2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        data = _raw(
            srv.server_port,
            b"GET / HTTP/1.1\r\nHost: x\r\nX-Forwarded-For: 1.1.1.1\r\n"
            b"X-Forwarded-For: 2.2.2.2\r\nConnection: close\r\n\r\n",
            recv_until_close=True,
        )
        assert b"200" in data.split(b"\r\n")[0]
        assert seen["xff"] == "1.1.1.1, 2.2.2.2"
    finally:
        srv.shutdown()
        srv.server_close()


def test_idle_new_connection_does_not_pin_workers():
    """A zero-byte connection parks in epoll instead of occupying a blocking
    worker: with threads=1, an idle socket opened FIRST must not starve a
    real request (slowloris shape)."""
    import socket as _socket

    def app(environ, start_response):
        body = b"ok"
        start_response("200 OK", [("Content-Type", "text/plain"), ("Content-Length", "2")])
        return [body]

    srv = PooledHTTPServer("127.0.0.1", 0, app, threads=1)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    idle = _socket.create_connection(("127.0.0.1", srv.server_port))
    try:
        time.sleep(0.2)  # idle socket is parked, not dispatched
        data = _raw(srv.server_port, b"GET / HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n",
                    recv_until_close=True)
        assert b"200" in data.split(b"\r\n")[0]
    finally:
        idle.close()
        srv.shutdown()
        srv.server_close()


def test_expect_100_continue_interim_response(pooled_server):
    """A conforming client sends Expect: 100-continue and waits for the
    interim response before the body; the server must emit it or the
    client stalls out its expect timeout (RFC 7231 5.1.1)."""
    srv, _ = pooled_server
    body = json.dumps({"name": "expects"}).encode()
    head = (
        f"POST /indexes HTTP/1.1\r\nHost: x\r\nContent-Type: application/json\r\n"
        f"Expect: 100-continue\r\nContent-Length: {len(body)}\r\n\r\n"
    ).encode()
    s = socket.create_connection(("127.0.0.1", srv.server_port), timeout=5)
    s.settimeout(5)
    s.sendall(head)
    interim = b""
    while b"\r\n\r\n" not in interim:
        interim += s.recv(65536)
    assert interim.startswith(b"HTTP/1.1 100 Continue"), interim
    s.sendall(body)
    buf = interim.partition(b"\r\n\r\n")[2]
    while b"\r\n\r\n" not in buf:
        data = s.recv(65536)
        if not data:
            break
        buf += data
    assert b"201" in buf.split(b"\r\n")[0]
    s.close()


def test_header_line_without_colon_is_skipped(pooled_server):
    """A field line with no colon is not a header (RFC 7230 3.2.4) — it
    must be ignored, not crash the parse or poison the next header."""
    srv, _ = pooled_server
    data = _raw(
        srv.server_port,
        b"GET /healthz HTTP/1.1\r\nHost: x\r\nGarbageNoColon\r\nAccept: */*\r\n\r\n",
    )
    assert b"200" in data.split(b"\r\n")[0]


def test_negative_content_length_rejected(pooled_server):
    srv, _ = pooled_server
    data = _raw(
        srv.server_port,
        b"POST /indexes HTTP/1.1\r\nHost: x\r\nContent-Length: -5\r\n\r\n",
        recv_until_close=True,
    )
    code = data.split(b"\r\n")[0]
    assert b"400" in code or b"413" in code
