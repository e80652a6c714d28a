"""Remote client tested against the in-process WSGI server (no sockets) —
protocol-over-HTTP parity testing (reference strategy, SURVEY §4.7)."""

import httpx
import pytest

from iscc_search_tpu.indexes.memory import MemoryIndex
from iscc_search_tpu.options import SearchOptions
from iscc_search_tpu.protocols.index import IsccIndexProtocol
from iscc_search_tpu.remote import RemoteIndex
from iscc_search_tpu.schema import IsccEntry, IsccIndex, IsccQuery
from iscc_search_tpu.server.app import create_app


@pytest.fixture
def remote(entry_factory):
    opts = SearchOptions(index_uri="memory://")
    app = create_app(index=MemoryIndex(), opts=opts)
    client = RemoteIndex("http://testserver", "idx", chunk_size=3)
    client._client = httpx.Client(transport=httpx.WSGITransport(app=app), base_url="http://testserver")
    yield client
    client.close()


def test_protocol_conformance(remote):
    assert isinstance(remote, IsccIndexProtocol)


def test_index_lifecycle(remote):
    created = remote.create_index(IsccIndex(name="idx"))
    assert created.name == "idx"
    with pytest.raises(FileExistsError):
        remote.create_index(IsccIndex(name="idx"))
    assert [i.name for i in remote.list_indexes()] == ["idx"]
    assert remote.get_index("idx").assets == 0
    with pytest.raises(FileNotFoundError):
        remote.get_index("missing")
    remote.delete_index("idx")
    with pytest.raises(FileNotFoundError):
        remote.delete_index("idx")


def test_add_get_search_roundtrip(remote, entry_factory):
    remote.create_index(IsccIndex(name="idx"))
    entries = [IsccEntry(**entry_factory()) for _ in range(7)]  # > chunk_size -> chunked
    results = remote.add_assets("idx", entries)
    assert len(results) == 7
    assert all(r.status == "created" for r in results)

    fetched = remote.get_asset("idx", entries[0].iscc_id)
    assert fetched.units == entries[0].units
    with pytest.raises(FileNotFoundError):
        remote.get_asset("idx", "ISCC:MAIGIIFJRDGEQQAA")

    result = remote.search_assets("idx", IsccQuery(units=entries[3].units), limit=5)
    assert result.global_matches[0].iscc_id == entries[3].iscc_id


def test_empty_add(remote):
    assert remote.add_assets("idx", []) == []


def test_error_mapping_400(remote, entry_factory):
    remote.create_index(IsccIndex(name="idx"))
    e = entry_factory()
    del e["iscc_id"]
    with pytest.raises(ValueError):
        remote.add_assets("idx", [IsccEntry(**e)])


def test_retry_on_transport_error(entry_factory, monkeypatch):
    """Transient transport errors are retried with backoff."""
    opts = SearchOptions(index_uri="memory://")
    app = create_app(index=MemoryIndex(), opts=opts)
    inner = httpx.WSGITransport(app=app)
    calls = {"n": 0}

    class FlakyTransport(httpx.BaseTransport):
        def handle_request(self, request):
            # Only the batch-add endpoint is flaky (retry lives in add_assets)
            if request.url.path.endswith("/assets"):
                calls["n"] += 1
                if calls["n"] <= 1:
                    raise httpx.ConnectError("flaky")
            return inner.handle_request(request)

    client = RemoteIndex("http://t", "idx")
    client._client = httpx.Client(transport=FlakyTransport(), base_url="http://t")

    import iscc_search_tpu.remote.client as rc

    monkeypatch.setattr(rc, "RETRY_BASE_DELAY", 0.0)
    client.create_index(IsccIndex(name="idx"))
    results = client.add_assets("idx", [IsccEntry(**entry_factory())])
    assert results[0].status == "created"
    assert calls["n"] >= 2


def test_garbage_success_response_is_runtime_error():
    """A 200 with invalid JSON is a server fault (RuntimeError), not a
    ValueError — ValueError is reserved for invalid user input."""
    import httpx
    import pytest

    from iscc_search_tpu.remote import RemoteIndex

    def handler(request):
        return httpx.Response(200, text="<html>not json</html>")

    idx = RemoteIndex("https://x.example", "main")
    idx._client = httpx.Client(transport=httpx.MockTransport(handler), base_url="https://x.example")
    with pytest.raises(RuntimeError, match="Invalid JSON"):
        idx.list_indexes()
    idx.close()


def test_url_normalization_and_lazy_client():
    idx = RemoteIndex("https://api.example.com/", "main", api_key="sekrit")
    assert idx.url == "https://api.example.com"
    assert idx._client is None  # lazy — no connection at construction
    c = idx.client
    assert c is idx.client  # cached
    assert c.headers["X-API-Key"] == "sekrit"
    idx.close()


def test_close_idempotent(remote):
    remote.close()
    remote.close()  # second close must not raise


def test_retry_exhausted_raises(entry_factory, monkeypatch):
    """Permanent transport failure surfaces after MAX_RETRIES attempts."""

    calls = {"n": 0}

    class DeadTransport(httpx.BaseTransport):
        def handle_request(self, request):
            calls["n"] += 1
            raise httpx.ConnectError("down")

    client = RemoteIndex("http://t", "idx")
    client._client = httpx.Client(transport=DeadTransport(), base_url="http://t")
    import iscc_search_tpu.remote.client as rc

    monkeypatch.setattr(rc, "RETRY_BASE_DELAY", 0.0)
    with pytest.raises(httpx.ConnectError):
        client.add_assets("idx", [IsccEntry(**entry_factory())])
    assert calls["n"] == rc.MAX_RETRIES


def test_no_retry_on_app_error(remote, entry_factory, monkeypatch):
    """HTTP-level application errors (404) must NOT be retried."""
    calls = {"n": 0}
    orig = remote._client.send

    def counting_send(request, **kw):
        if request.url.path.endswith("/assets"):
            calls["n"] += 1
        return orig(request, **kw)

    monkeypatch.setattr(remote._client, "send", counting_send)
    with pytest.raises(FileNotFoundError):
        remote.add_assets("nosuchindex", [IsccEntry(**entry_factory())])
    assert calls["n"] == 1


def test_http_500_maps_to_runtime_error():
    def handler(request):
        return httpx.Response(503, json={"detail": "overloaded"})

    idx = RemoteIndex("https://x.example", "main")
    idx._client = httpx.Client(transport=httpx.MockTransport(handler), base_url="https://x.example")
    with pytest.raises(RuntimeError, match="503"):
        idx.list_indexes()
    idx.close()


def test_chunked_add_batches(remote, entry_factory):
    """chunk_size=3 splits a 7-entry add into 3 HTTP calls, results concatenated
    in order."""
    remote.create_index(IsccIndex(name="idx"))
    calls = {"n": 0}
    orig = remote._client.send

    def counting_send(request, **kw):
        if request.url.path.endswith("/assets"):
            calls["n"] += 1
        return orig(request, **kw)

    remote._client.send = counting_send
    entries = [IsccEntry(**entry_factory()) for _ in range(7)]
    results = remote.add_assets("idx", entries)
    assert calls["n"] == 3
    assert [r.iscc_id for r in results] == [e.iscc_id for e in entries]


def _capture_client(handler):
    """RemoteIndex wired to an httpx.MockTransport handler."""
    client = RemoteIndex("http://testserver", "idx", api_key="sekrit", chunk_size=2)
    client._client = httpx.Client(
        transport=httpx.MockTransport(handler),
        base_url="http://testserver",
        headers={"X-API-Key": "sekrit"},
    )
    return client


def test_api_key_header_and_limit_param():
    """The API key rides every request; the search limit rides as a query
    param (reference remote/client.py auth + search contract)."""
    seen = {}

    def handler(request):
        seen["key"] = request.headers.get("X-API-Key")
        seen["limit"] = httpx.URL(request.url).params.get("limit")
        return httpx.Response(200, json={"query": {}, "global_matches": [], "chunk_matches": []})

    client = _capture_client(handler)
    res = client.search_assets("idx", IsccQuery(units=None), limit=7)
    assert seen["key"] == "sekrit" and seen["limit"] == "7"
    assert res.global_matches == [] and res.chunk_matches == []
    client.close()


def test_422_maps_to_value_error_and_plain_text_detail():
    """422 joins 400 as ValueError; a non-JSON error body falls back to the
    raw text as detail."""

    def handler(request):
        return httpx.Response(422, text="not-json-detail")

    client = _capture_client(handler)
    with pytest.raises(ValueError, match="not-json-detail"):
        client.get_index("idx")
    client.close()


def test_unknown_status_maps_to_runtime_error():
    def handler(request):
        return httpx.Response(503, json={"detail": "overloaded"})

    client = _capture_client(handler)
    with pytest.raises(RuntimeError, match="503"):
        client.list_indexes()
    client.close()


def test_chunk_partial_failure_after_first_chunk(entry_factory):
    """When a later chunk fails permanently, the exception propagates even
    though earlier chunks were applied server-side — chunked adds are NOT
    atomic across chunks (same contract as the reference client); the
    caller re-adds idempotently."""
    calls = []

    def handler(request):
        calls.append(request.url.path)
        if len(calls) == 1:
            import json as _json

            payload = _json.loads(request.content)
            return httpx.Response(
                200, json=[{"iscc_id": e["iscc_id"], "status": "created"} for e in payload]
            )
        return httpx.Response(400, json={"detail": "bad chunk"})

    client = _capture_client(handler)
    entries = [IsccEntry(**entry_factory()) for _ in range(4)]  # 2 chunks of 2
    with pytest.raises(ValueError, match="bad chunk"):
        client.add_assets("idx", entries)
    assert len(calls) == 2  # first chunk applied, second failed, no retry on 400
    client.close()


def test_search_result_chunk_matches_roundtrip():
    """A full wire result with chunk matches and metadata reconstructs
    loss-free through the client models."""
    wire = {
        "query": {"units": None, "simprints": {"CONTENT_TEXT_V0": ["AAAA"]}},
        "global_matches": [
            {"iscc_id": "ISCC:MAIATETDPXBL7OKD", "score": 0.93,
             "types": {"DATA_NONE_V0": 0.93}, "metadata": {"name": "x"}}
        ],
        "chunk_matches": [
            {"iscc_id": "ISCC:MAIATETDPXBL7OKD", "score": 0.8,
             "types": {"CONTENT_TEXT_V0": {
                 "score": 0.8, "matches": 1, "queried": 2,
                 "chunks": [{"query": "AAAA", "match": "AAAB", "score": 0.8,
                             "freq": 3, "offset": 5, "size": 10}]}}}
        ],
    }

    def handler(request):
        return httpx.Response(200, json=wire)

    client = _capture_client(handler)
    res = client.search_assets("idx", IsccQuery(units=None), limit=5)
    assert res.global_matches[0].metadata.name == "x"
    tr = res.chunk_matches[0].types["CONTENT_TEXT_V0"]
    assert tr.chunks[0].freq == 3 and tr.chunks[0].offset == 5
    assert res.model_dump(mode="json", exclude_none=True)["chunk_matches"][0]["score"] == 0.8
    client.close()


def test_auth_enforced_end_to_end(entry_factory):
    """Against the real app with an API key configured: unauthenticated
    writes are rejected, the keyed client passes (reference
    test_server_auth semantics over the remote client)."""
    opts = SearchOptions(index_uri="memory://", api_secret="k3y")
    app = create_app(index=MemoryIndex(), opts=opts)

    anon = RemoteIndex("http://testserver", "idx")
    anon._client = httpx.Client(transport=httpx.WSGITransport(app=app), base_url="http://testserver")
    with pytest.raises(RuntimeError, match="401"):
        anon.create_index(IsccIndex(name="idx"))
    anon.close()

    keyed = RemoteIndex("http://testserver", "idx", api_key="k3y")
    keyed._client = httpx.Client(
        transport=httpx.WSGITransport(app=app), base_url="http://testserver",
        headers={"X-API-Key": "k3y"},
    )
    assert keyed.create_index(IsccIndex(name="idx")).name == "idx"
    keyed.close()
