"""WSGI micro-framework unit tests (request parsing, responses, routing)."""

import io
import json

import pytest

from iscc_search_tpu.server.wsgi import HTTPError, Request, Response, WsgiApp


def make_environ(method="GET", path="/", query="", body=b"", headers=None):
    env = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "QUERY_STRING": query,
        "wsgi.input": io.BytesIO(body),
        "CONTENT_LENGTH": str(len(body)),
    }
    for k, v in (headers or {}).items():
        env["HTTP_" + k.upper().replace("-", "_")] = v
    return env


def test_request_parsing():
    req = Request(make_environ("POST", "/x", "a=1&b=two", b'{"k": 1}', {"X-API-Key": "s"}))
    assert req.method == "POST"
    assert req.query == {"a": "1", "b": "two"}
    assert req.headers["x-api-key"] == "s"
    assert req.json() == {"k": 1}


def test_request_invalid_json():
    req = Request(make_environ("POST", "/x", body=b"{nope"))
    with pytest.raises(HTTPError):
        req.json()


def test_request_bad_content_length():
    env = make_environ("POST", "/x", body=b"abc")
    env["CONTENT_LENGTH"] = "notanumber"
    assert Request(env).body == b""


def test_response_types():
    assert Response({"a": 1}).body == b'{"a": 1}'
    assert Response(None, status=204).body == b""
    assert Response(b"raw", media_type="application/octet-stream").body == b"raw"
    r = Response("<html>", media_type="text/html")
    assert r.body == b"<html>"
    assert r.headers["Content-Type"] == "text/html"


def test_routing_and_path_params():
    app = WsgiApp()

    @app.route("GET", "/items/{name}")
    def get_item(request):
        return Response({"name": request.path_params["name"]})

    req = Request(make_environ("GET", "/items/abc"))
    resp = app.handle(req)
    assert resp.status == 200
    assert json.loads(resp.body) == {"name": "abc"}

    assert app.handle(Request(make_environ("GET", "/other"))).status == 404
    assert app.handle(Request(make_environ("POST", "/items/abc"))).status == 405


def test_exception_mapping():
    app = WsgiApp()

    @app.route("GET", "/v")
    def v(request):
        raise ValueError("bad value")

    @app.route("GET", "/nf")
    def nf(request):
        raise FileNotFoundError("missing")

    @app.route("GET", "/fe")
    def fe(request):
        raise FileExistsError("exists")

    @app.route("GET", "/boom")
    def boom(request):
        raise RuntimeError("internal")

    assert app.handle(Request(make_environ("GET", "/v"))).status == 400
    assert app.handle(Request(make_environ("GET", "/nf"))).status == 404
    assert app.handle(Request(make_environ("GET", "/fe"))).status == 409
    resp = app.handle(Request(make_environ("GET", "/boom")))
    assert resp.status == 500
    assert b"Internal Server Error" in resp.body


def test_cors_denied_origin():
    app = WsgiApp(cors_origins=["https://allowed.com"])

    @app.route("GET", "/x")
    def x(request):
        return Response({})

    resp = app.handle(Request(make_environ("GET", "/x", headers={"Origin": "https://evil.com"})))
    assert "Access-Control-Allow-Origin" not in resp.headers
    resp = app.handle(Request(make_environ("GET", "/x", headers={"Origin": "https://allowed.com"})))
    assert resp.headers["Access-Control-Allow-Origin"] == "https://allowed.com"


def test_wsgi_callable_interface():
    app = WsgiApp()

    @app.route("GET", "/x")
    def x(request):
        return Response({"ok": True})

    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = dict(headers)

    body = app(make_environ("GET", "/x"), start_response)
    assert captured["status"] == "200 OK"
    assert json.loads(b"".join(body)) == {"ok": True}
    assert int(captured["headers"]["Content-Length"]) == len(b"".join(body))


def test_timer_logs(caplog):
    import logging

    from iscc_search_tpu.utils import timer

    with caplog.at_level(logging.INFO, logger="iscc_search_tpu"):
        with timer("unit-test op"):
            pass
    assert any("unit-test op" in r.message for r in caplog.records)


def test_fuzz_requests_never_500(tmp_path):
    """Random garbage requests against the live app yield 4xx/2xx, never 500.

    The exception contract maps bad input to 400/404/422; a 500 means an
    unmapped crash leaked out of a handler.
    """
    import random

    from iscc_search_tpu.indexes.memory import MemoryIndex
    from iscc_search_tpu.options import SearchOptions
    from iscc_search_tpu.server.app import create_app

    app = create_app(index=MemoryIndex(), opts=SearchOptions(index_uri="memory://"))
    rnd = random.Random(606)

    paths = [
        "/", "/healthz", "/indexes", "/indexes/x", "/indexes/x/assets",
        "/indexes/x/assets/ISCC:GARBAGE", "/indexes/x/search", "/openapi.json",
        "/static/../etc/passwd", "/static/%2e%2e/secret", "/nope", "/indexes/UPPER",
        "/indexes/x/search?limit=notanint", "/indexes/x/search?iscc_code=junk",
    ]
    methods = ["GET", "POST", "DELETE", "PUT", "PATCH", "HEAD"]
    bodies = [
        b"", b"{", b"[]", b"[{]", b'{"units": 3}', b'[{"iscc_id": 5}]',
        b"\xff\xfe\x00\x01", b'{"iscc_code": "' + b"A" * 5000 + b'"}',
        b'[{"iscc_id": "ISCC:' + b"Z" * 400 + b'"}]',
        json.dumps([{"iscc_id": "ISCC:MAIGIIFJRDGEQQAA", "units": ["x", "y"]}]).encode(),
    ]

    def call(method, full_path, body):
        path, _, query = full_path.partition("?")
        env = make_environ(method, path, query=query, body=body)
        captured = {}

        def start_response(status, headers):
            captured["status"] = status

        out = b"".join(app(env, start_response))
        return captured["status"], out

    for _ in range(300):
        path = rnd.choice(paths)
        method = rnd.choice(methods)
        body = rnd.choice(bodies)
        status, out = call(method, path, body)
        code = int(status.split()[0])
        assert code != 500, (method, path, body[:50], status, out[:200])
