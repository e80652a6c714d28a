"""SearchBatcher: fused batching correctness under concurrency."""

import threading

import numpy as np
import pytest

from iscc_search_tpu.engine import DeviceNphdIndex
from iscc_search_tpu.engine.batcher import SearchBatcher


@pytest.fixture
def setup(tmp_path):
    rng = np.random.default_rng(61)
    idx = DeviceNphdIndex(tmp_path / "i")
    bodies = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes() for _ in range(200)]
    idx.add(list(range(200)), bodies)
    batcher = SearchBatcher(idx, max_batch=64, window_ms=1.0)
    yield idx, batcher, bodies
    batcher.close()
    idx.close()


def key_of(arr):
    return int.from_bytes(arr.tobytes(), "big")


def test_single_request(setup):
    idx, batcher, bodies = setup
    results = batcher.search([bodies[5]], count=3)
    assert len(results) == 1
    keys, scores = results[0]
    assert key_of(keys[0]) == 5
    assert scores[0] == pytest.approx(1.0, abs=1e-3)
    assert len(keys) == 3


def test_concurrent_requests_batched(setup):
    idx, batcher, bodies = setup
    results = {}
    errors = []

    def worker(i):
        try:
            res = batcher.search([bodies[i]], count=2)
            results[i] = res[0]
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(24)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(20)
    assert not errors
    assert len(results) == 24
    for i, (keys, scores) in results.items():
        assert key_of(keys[0]) == i
        assert len(keys) == 2


def test_mixed_counts(setup):
    idx, batcher, bodies = setup
    out = {}

    def worker(i, count):
        out[i] = batcher.search([bodies[i]], count=count)[0]

    threads = [threading.Thread(target=worker, args=(i, c)) for i, c in ((0, 1), (1, 5), (2, 9))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(20)
    assert len(out[0][0]) == 1
    assert len(out[1][0]) == 5
    assert len(out[2][0]) == 9


def test_multi_query_request(setup):
    idx, batcher, bodies = setup
    res = batcher.search([bodies[0], bodies[1], bodies[2]], count=2)
    assert len(res) == 3
    for qi in range(3):
        assert key_of(res[qi][0][0]) == qi


def test_error_propagates(tmp_path):
    class Broken:
        def search(self, bodies, count):
            raise RuntimeError("boom")

    batcher = SearchBatcher(Broken(), window_ms=0.0)
    with pytest.raises(RuntimeError, match="boom"):
        batcher.search([b"\x00" * 8], count=1)
    batcher.close()


def test_closed_batcher_rejects(setup):
    idx, batcher, bodies = setup
    batcher.close()
    with pytest.raises(RuntimeError):
        batcher.search([bodies[0]], count=1)
