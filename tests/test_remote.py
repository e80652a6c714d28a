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
