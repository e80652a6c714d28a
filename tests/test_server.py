"""HTTP layer tests via httpx.WSGITransport (no sockets) — mirrors the
reference's TestClient strategy (SURVEY §4.6)."""

import httpx
import pytest

from iscc_search_tpu.indexes.memory import MemoryIndex
from iscc_search_tpu.options import SearchOptions
from iscc_search_tpu.server.app import create_app


@pytest.fixture
def opts():
    return SearchOptions(index_uri="memory://")


@pytest.fixture
def client(opts):
    app = create_app(index=MemoryIndex(), opts=opts)
    transport = httpx.WSGITransport(app=app)
    with httpx.Client(transport=transport, base_url="http://testserver") as c:
        yield c


def test_healthz(client):
    r = client.get("/healthz")
    assert r.status_code == 200
    assert r.json() == {"status": "ok"}


def test_readyz(client):
    r = client.get("/readyz")
    assert r.status_code == 200
    assert r.json() == {"status": "ready"}


def test_status_public(client):
    r = client.get("/status")
    assert r.status_code == 200
    body = r.json()
    assert body["mode"] == "standard"
    assert "version" in body


def test_index_crud(client):
    r = client.post("/indexes", json={"name": "myidx"})
    assert r.status_code == 201
    assert r.json()["name"] == "myidx"

    r = client.post("/indexes", json={"name": "myidx"})
    assert r.status_code == 409

    r = client.get("/indexes")
    assert r.status_code == 200
    assert [i["name"] for i in r.json()] == ["myidx"]

    r = client.get("/indexes/myidx")
    assert r.status_code == 200
    assert r.json()["assets"] == 0

    r = client.get("/indexes/missing")
    assert r.status_code == 404

    r = client.delete("/indexes/myidx")
    assert r.status_code == 204
    r = client.delete("/indexes/myidx")
    assert r.status_code == 404


def test_create_index_invalid_name(client):
    r = client.post("/indexes", json={"name": "Bad-Name"})
    assert r.status_code == 422


def test_add_and_get_assets(client, entry_factory):
    client.post("/indexes", json={"name": "idx"})
    entry = entry_factory(metadata={"name": "X"})
    r = client.post("/indexes/idx/assets", json=[entry])
    assert r.status_code == 201
    assert r.json()[0]["status"] == "created"

    r = client.get(f"/indexes/idx/assets/{entry['iscc_id']}")
    assert r.status_code == 200
    assert r.json()["units"] == entry["units"]

    r = client.get("/indexes/idx/assets/ISCC:MAIGIIFJRDGEQQAA")
    assert r.status_code == 404


def test_add_assets_validation_error(client):
    client.post("/indexes", json={"name": "idx"})
    r = client.post("/indexes/idx/assets", json=[{"units": "notalist"}])
    assert r.status_code == 422
    r = client.post("/indexes/idx/assets", json={"not": "a list"})
    assert r.status_code == 422


def test_search_post_and_get(client, entry_factory):
    client.post("/indexes", json={"name": "idx"})
    entry = entry_factory()
    client.post("/indexes/idx/assets", json=[entry])

    r = client.post("/indexes/idx/search", json={"units": entry["units"]})
    assert r.status_code == 200
    body = r.json()
    assert body["global_matches"][0]["iscc_id"] == entry["iscc_id"]
    assert "chunk_matches" in body

    r = client.get("/indexes/idx/search", params={"iscc_code": entry["iscc_code"]})
    assert r.status_code == 200
    assert r.json()["global_matches"][0]["iscc_id"] == entry["iscc_id"]

    r = client.get("/indexes/idx/search")
    assert r.status_code == 422

    r = client.post("/indexes/idx/search", json={})
    assert r.status_code == 400  # empty query -> ValueError


def test_search_missing_index(client):
    r = client.post("/indexes/nope/search", json={"iscc_code": "ISCC:KACYPXW445FTYNJ3"})
    assert r.status_code == 404


def test_openapi_and_docs(client):
    r = client.get("/openapi.json")
    assert r.status_code == 200
    spec = r.json()
    assert spec["openapi"].startswith("3.1")
    assert "/indexes/{name}/search" in spec["paths"]
    assert "IsccEntry" in spec["components"]["schemas"]

    r = client.get("/docs")
    assert r.status_code == 200
    assert "elements-api" in r.text


def test_landing_and_static(client):
    r = client.get("/")
    assert r.status_code == 200
    assert "ISCC-Search" in r.text
    r = client.get("/static/app.js")
    assert r.status_code == 200
    r = client.get("/static/../app.py")
    assert r.status_code in (404, 500)


def test_unknown_route_404(client):
    assert client.get("/nope").status_code == 404


def test_method_not_allowed(client):
    assert client.put("/indexes").status_code == 405


def test_cors_preflight(client):
    r = client.options("/indexes", headers={"Origin": "https://example.com"})
    assert r.status_code == 204
    assert r.headers.get("Access-Control-Allow-Origin") == "*"
    r = client.get("/healthz", headers={"Origin": "https://example.com"})
    assert r.headers.get("Access-Control-Allow-Origin") == "*"


class TestAuth:
    @pytest.fixture
    def secure_client(self):
        opts = SearchOptions(index_uri="memory://", api_secret="topsecret")
        app = create_app(index=MemoryIndex(), opts=opts)
        with httpx.Client(transport=httpx.WSGITransport(app=app), base_url="http://t") as c:
            yield c

    def test_requires_key(self, secure_client):
        assert secure_client.get("/indexes").status_code == 401
        assert secure_client.get("/indexes", headers={"X-API-Key": "wrong"}).status_code == 401
        assert secure_client.get("/indexes", headers={"X-API-Key": "topsecret"}).status_code == 200

    def test_probes_public(self, secure_client):
        assert secure_client.get("/healthz").status_code == 200
        assert secure_client.get("/status").status_code == 200

    def test_mutations_require_key(self, secure_client):
        r = secure_client.post("/indexes", json={"name": "locked"})
        assert r.status_code == 401
        r = secure_client.post(
            "/indexes", json={"name": "locked"}, headers={"X-API-Key": "topsecret"}
        )
        assert r.status_code == 201

    def test_frontend_public_with_auth_enabled(self, secure_client):
        # The landing page and docs stay reachable; only the API is gated
        assert secure_client.get("/").status_code == 200
        assert secure_client.get("/docs").status_code == 200


class TestAggregatorMode:
    @pytest.fixture
    def agg_client(self):
        opts = SearchOptions(index_uri="memory://", aggregator_network="testnet")
        index = MemoryIndex()
        from iscc_search_tpu.schema import IsccIndex

        index.create_index(IsccIndex(name="idptest"))
        app = create_app(index=index, opts=opts)
        with httpx.Client(transport=httpx.WSGITransport(app=app), base_url="http://t") as c:
            yield c

    def test_suppressed_routes_match_unknown_404(self, agg_client):
        """Hidden management routes are indistinguishable from unknown routes
        (no information leak about aggregator internals)."""
        hidden = agg_client.post("/indexes", json={"name": "x"})
        unknown = agg_client.post("/nosuchroute", json={})
        assert hidden.status_code == unknown.status_code == 404

    def test_suppression_applies_before_auth(self):
        """In aggregator mode WITH an api key, suppressed routes 404 rather
        than 401 — suppression must not reveal that a route exists."""
        opts = SearchOptions(
            index_uri="memory://", aggregator_network="testnet", api_secret="k"
        )
        index = MemoryIndex()
        from iscc_search_tpu.schema import IsccIndex

        index.create_index(IsccIndex(name="idptest"))
        app = create_app(index=index, opts=opts)
        with httpx.Client(transport=httpx.WSGITransport(app=app), base_url="http://t") as c:
            assert c.post("/indexes", json={"name": "x"}).status_code == 404

    def test_management_routes_hidden(self, agg_client):
        assert agg_client.get("/indexes").status_code == 404
        assert agg_client.post("/indexes", json={"name": "x"}).status_code == 404
        assert agg_client.post("/indexes/idptest/assets", json=[]).status_code == 404
        assert agg_client.delete("/indexes/idptest").status_code == 404

    def test_foreign_index_reads_blocked(self, agg_client):
        assert agg_client.post("/indexes/other/search", json={"iscc_code": "ISCC:AAAA"}).status_code == 404
        # Aggregator index itself is searchable
        r = agg_client.post("/indexes/idptest/search", json={"iscc_code": "ISCC:KACYPXW445FTYNJ3CYSXHAFJMA2HUWULUNRFE3BLHRSCXYH2M5AEGQY"})
        assert r.status_code == 200

    def test_status_shows_aggregator(self, agg_client):
        body = agg_client.get("/status").json()
        assert body["mode"] == "aggregator"
        assert body["network"] == "testnet"
        assert "hubs" in body

    def test_aggregator_landing_page(self, agg_client):
        r = agg_client.get("/")
        assert "Aggregator" in r.text


def test_head_request(client):
    r = client.head("/healthz")
    assert r.status_code == 200
    assert r.content == b""
    assert int(r.headers.get("Content-Length", 0)) > 0


def test_sigterm_graceful_shutdown(tmp_path):
    """SIGTERM drains the server and closes the index cleanly (derived
    segments saved), exiting 0 — Docker/k8s stop parity."""
    import os
    import signal
    import subprocess
    import sys
    import time
    import urllib.request

    port = 18733
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PYTHONPATH=os.getcwd(),
        ISCC_SEARCH_INDEX_URI=f"tpu://{tmp_path}/data",
        ISCC_SEARCH_HOST="127.0.0.1",
        ISCC_SEARCH_PORT=str(port),
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", "from iscc_search_tpu.server.httpd import serve; serve()"],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    try:
        deadline = time.time() + 60
        while True:
            try:
                urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=1)
                break
            except Exception:
                if time.time() > deadline:
                    proc.kill()
                    raise TimeoutError(proc.communicate()[0].decode()[-2000:])
                time.sleep(0.2)
        # Create an index so shutdown has state to flush
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/indexes",
            data=b'{"name": "graceful"}',
            headers={"Content-Type": "application/json"},
        )
        urllib.request.urlopen(req)
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
        assert proc.returncode == 0, out.decode()[-2000:]
        text = out.decode()
        assert "SIGTERM received" in text
        assert "closing index" in text
        assert (tmp_path / "data" / "graceful").is_dir()
    finally:
        if proc.poll() is None:
            proc.kill()


# ------------------------------------------- backend-parametrized HTTP flow


@pytest.fixture(params=["memory", "kv", "tpu"])
def any_backend_client(request, tmp_path):
    """Full HTTP stack over each backend (reference backend_index strategy
    wired through the app — SURVEY §4.2)."""
    if request.param == "memory":
        backend = MemoryIndex()
    elif request.param == "kv":
        from iscc_search_tpu.indexes.kv import KvIndexManager

        backend = KvIndexManager(tmp_path / "kv")
    else:
        from iscc_search_tpu.indexes.tpu import TpuIndexManager

        backend = TpuIndexManager(tmp_path / "tpu")
    app = create_app(index=backend, opts=SearchOptions(index_uri="memory://"))
    transport = httpx.WSGITransport(app=app)
    with httpx.Client(transport=transport, base_url="http://testserver") as c:
        yield c
    backend.close()


def test_http_flow_all_backends(any_backend_client, entry_factory):
    c = any_backend_client
    assert c.post("/indexes", json={"name": "flow"}).status_code == 201

    entries = [entry_factory() for _ in range(5)]
    r = c.post("/indexes/flow/assets", json=entries)
    assert r.status_code == 201
    results = r.json()
    assert len(results) == 5 and all(res["status"] == "created" for res in results)

    # exact self search finds the asset
    r = c.post("/indexes/flow/search", json={"iscc_code": entries[0]["iscc_code"]})
    assert r.status_code == 200
    matches = r.json()["global_matches"]
    assert entries[0]["iscc_id"] in [m["iscc_id"] for m in matches]

    r = c.get(f"/indexes/flow/assets/{entries[2]['iscc_id']}")
    assert r.status_code == 200
    assert r.json()["iscc_id"] == entries[2]["iscc_id"]

    assert c.get("/indexes/flow/assets/ISCC:MAIGIIFJRDGEQQAB").status_code == 404
    assert c.delete("/indexes/flow").status_code == 204
    assert c.get("/indexes/flow").status_code == 404


def test_frontend_js_api_surface(client, entry_factory):
    """The exact API calls static/app.js makes must keep working: /indexes,
    /status, and POST /indexes/{name}/search?limit=N."""
    import re
    from pathlib import Path

    js = (Path("iscc_search_tpu/server/app.py").parent / "static" / "app.js").read_text()
    called = set(re.findall(r"(?:call|fetch)\(\s*[`\"']([^`\"']+)", js))
    assert {"/indexes", "/status"} <= called
    assert any(p.startswith("/indexes/${") and "/search" in p for p in called)
    assert any(p.startswith("/indexes/${") and "/assets/" in p for p in called)
    # XSS-safety invariant: response data only enters the DOM via createElement/
    # textContent — no innerHTML assignments anywhere (reference parity).
    assert ".innerHTML" not in js
    # API key is session-scoped and sent as the X-API-Key header
    assert "sessionStorage" in js and "X-API-Key" in js

    assert client.post("/indexes", json={"name": "ui"}).status_code == 201
    entry = entry_factory()
    assert client.post("/indexes/ui/assets", json=[entry]).status_code == 201
    assert client.get("/indexes").status_code == 200
    assert client.get("/status").status_code == 200
    r = client.post("/indexes/ui/search?limit=20", json={"iscc_code": entry["iscc_code"]})
    assert r.status_code == 200
    assert entry["iscc_id"] in [m["iscc_id"] for m in r.json()["global_matches"]]
    # Pages and assets the browser loads
    for page in ("/", "/static/app.js", "/static/style.css", "/docs", "/openapi.json"):
        assert client.get(page).status_code == 200, page


def test_frontend_dom_contract():
    """Every element id the JS renders into must exist in the page that runs
    that mode, and the aggregator dashboard carries the stat cards + hub table."""
    import re
    from pathlib import Path

    static = Path("iscc_search_tpu/server/app.py").parent / "static"
    js = (static / "app.js").read_text()
    index_html = (static / "index.html").read_text()
    agg_html = (static / "aggregator.html").read_text()

    for el_id in ("indexRows", "lookupForm", "lookupInput", "results", "keyPanel", "keyInput", "rawPanel", "rawBody", "versionLabel"):
        assert f'id="{el_id}"' in index_html, el_id
    for el_id in (
        "modeBadge", "statAssets", "assetsDelta", "sparkline", "statSize",
        "statHubs", "hubsDetail", "statSeq", "hubRows", "liveAge", "lookupForm",
    ):
        assert f'id="{el_id}"' in agg_html, el_id
    # pages declare their mode for the shared script
    assert 'data-mode="standard"' in index_html
    assert 'data-mode="aggregator"' in agg_html
    # the JS references each dashboard id it renders into
    for el_id in ("statAssets", "sparkline", "hubRows", "statSeq"):
        assert re.search(rf'["\']({el_id})["\']', js), el_id
