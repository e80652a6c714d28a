"""Prometheus-style metrics: registry semantics + /metrics endpoint."""

import threading

import httpx
import pytest

from iscc_search_tpu.indexes.memory import MemoryIndex
from iscc_search_tpu.options import SearchOptions
from iscc_search_tpu.server import metrics
from iscc_search_tpu.server.app import create_app
from iscc_search_tpu.server.metrics import Counter, Histogram, Registry


def test_counter_labels_and_render():
    c = Counter("t_total", "things")
    c.inc()
    c.inc(2, method="GET", status="200")
    c.inc(method="GET", status="200")
    out = "\n".join(c.render())
    assert "# TYPE t_total counter" in out
    assert "t_total 1" in out
    assert 't_total{method="GET",status="200"} 3' in out


def test_histogram_buckets_sum_count():
    h = Histogram("lat_seconds", "latency", buckets=(0.1, 1.0))
    h.observe(0.05)
    h.observe(0.5)
    h.observe(5.0)
    out = "\n".join(h.render())
    assert 'lat_seconds_bucket{le="0.1"} 1' in out
    assert 'lat_seconds_bucket{le="1"} 2' in out
    assert 'lat_seconds_bucket{le="+Inf"} 3' in out
    assert "lat_seconds_count 3" in out
    assert "lat_seconds_sum 5.55" in out


def test_label_escaping():
    c = Counter("esc_total", "x")
    c.inc(path='a"b\\c\nd')
    out = "\n".join(c.render())
    assert '\\"' in out and "\\\\" in out and "\\n" in out


def test_registry_renders_all():
    r = Registry()
    c = r.counter("one_total", "one")
    h = r.histogram("two_seconds", "two", buckets=(1.0,))
    c.inc()
    h.observe(0.5)
    text = r.render()
    assert "one_total 1" in text
    assert "two_seconds_count 1" in text
    assert text.endswith("\n")


def test_unmatched_paths_collapse_to_one_label(client):
    # Attacker-controlled 404 paths must not grow the label set: every
    # unmatched path records under the single "<unmatched>" route label.
    for i in range(5):
        assert client.get(f"/no/such/path/{i}").status_code == 404
    body = client.get("/metrics").text
    assert 'route="<unmatched>",status="404"' in body
    assert "/no/such/path" not in body


def test_counter_thread_safety():
    c = Counter("race_total", "x")

    def work():
        for _ in range(1000):
            c.inc(worker="w")

    threads = [threading.Thread(target=work) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert c._values[(("worker", "w"),)] == 4000


@pytest.fixture
def client():
    opts = SearchOptions(index_uri="memory://")
    app = create_app(index=MemoryIndex(), opts=opts)
    transport = httpx.WSGITransport(app=app)
    with httpx.Client(transport=transport, base_url="http://testserver") as c:
        yield c


def test_metrics_endpoint(client):
    assert client.get("/healthz").status_code == 200
    r = client.get("/metrics")
    assert r.status_code == 200
    assert r.headers["content-type"].startswith("text/plain")
    body = r.text
    assert "# TYPE iscc_http_requests_total counter" in body
    # The healthz call above was recorded with a collapsed route label
    assert 'route="/healthz"' in body
    assert "iscc_http_request_seconds_bucket" in body


def test_metrics_records_search_and_batch(client, entry_factory):
    # Metrics are process-global: snapshot before, assert deltas via text
    client.post("/indexes", json={"name": "m"})
    entry = entry_factory()
    client.post("/indexes/m/assets", json=[entry])
    client.post("/indexes/m/search", json={"iscc_code": entry["iscc_code"]})
    body = client.get("/metrics").text
    assert 'route="/indexes/{name}/search"' in body
    assert 'status="200"' in body
