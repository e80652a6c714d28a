"""Incremental device-mirror sync: appends avoid full rebuilds; tombstones
propagate via validity refresh."""

import numpy as np
import pytest

from iscc_search_tpu.engine import DeviceNphdIndex


@pytest.fixture
def idx(tmp_path):
    i = DeviceNphdIndex(tmp_path / "i")
    yield i
    i.close()


def bodies_of(rng, n, nbytes=32):
    return [rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes() for _ in range(n)]


def test_incremental_append_skips_rebuild(idx, monkeypatch):
    rng = np.random.default_rng(91)
    first = bodies_of(rng, 50)
    idx.add(list(range(50)), first)
    idx.search_one(first[0], 3)  # initial sync (full build)

    builds = {"n": 0}
    original = idx._build_partition

    def counting_build(lanes, row_map):
        builds["n"] += 1
        return original(lanes, row_map)

    monkeypatch.setattr(idx, "_build_partition", counting_build)

    second = bodies_of(rng, 30)
    idx.add(list(range(100, 130)), second)
    res = idx.search_one(second[5], 3)
    assert builds["n"] == 0  # appended in place, no partition rebuild
    assert res[105] == pytest.approx(1.0, abs=1e-3)
    # Earlier rows still searchable
    assert idx.search_one(first[7], 3)[7] == pytest.approx(1.0, abs=1e-3)


def test_incremental_append_new_length_partition(idx, monkeypatch):
    rng = np.random.default_rng(92)
    idx.add(list(range(10)), bodies_of(rng, 10, 32))
    idx.search_one(bodies_of(rng, 1, 32)[0], 2)

    builds = {"n": 0}
    original = idx._build_partition

    def counting_build(lanes, row_map):
        builds["n"] += 1
        return original(lanes, row_map)

    monkeypatch.setattr(idx, "_build_partition", counting_build)
    short = bodies_of(rng, 5, 8)  # 64-bit codes: a brand-new partition
    idx.add(list(range(200, 205)), short)
    res = idx.search_one(short[0], 2)
    assert builds["n"] == 1  # only the new 64-bit partition was built
    assert res[200] == pytest.approx(1.0, abs=1e-3)


def test_tombstones_propagate_incrementally(idx):
    rng = np.random.default_rng(93)
    bodies = bodies_of(rng, 20)
    idx.add(list(range(20)), bodies)
    idx.search_one(bodies[0], 3)  # sync
    idx.remove([4])
    assert 4 not in idx.search_one(bodies[4], 5)
    # Update (tombstone + append) also propagates
    new_body = bodies_of(rng, 1)[0]
    idx.add([5], [new_body])
    res = idx.search_one(new_body, 3)
    assert res[5] == pytest.approx(1.0, abs=1e-3)
    assert idx.search_one(bodies[5], 3).get(5, 0.0) < 1.0


def test_capacity_overflow_triggers_rebuild(tmp_path, monkeypatch):
    idx = DeviceNphdIndex(tmp_path / "i")
    rng = np.random.default_rng(94)
    idx.add(list(range(10)), bodies_of(rng, 10))
    idx.search_one(bodies_of(rng, 1)[0], 2)  # sync; cap = 8192

    builds = {"n": 0}
    original = idx._build_partition

    def counting_build(lanes, row_map):
        builds["n"] += 1
        return original(lanes, row_map)

    monkeypatch.setattr(idx, "_build_partition", counting_build)
    # Exceed the 8192-row partition capacity
    n = 8200
    idx.add(list(range(1000, 1000 + n)), bodies_of(rng, n))
    res = idx.search_one(bodies_of(rng, 1)[0], 2)
    assert builds["n"] == 1  # overflow -> one full partition rebuild
    assert idx.size == 10 + n
    idx.close()


def test_concurrent_search_during_appends(tmp_path):
    """Readers must never crash or see torn state while a writer appends
    (functional buffer updates keep old snapshots valid)."""
    import threading

    rng = np.random.default_rng(95)
    idx = DeviceNphdIndex(tmp_path / "c")
    base = bodies_of(rng, 64)
    idx.add(list(range(64)), base)
    idx.search_one(base[0], 3)  # initial sync
    errors = []
    stop = threading.Event()

    def reader():
        try:
            while not stop.is_set():
                res = idx.search_one(base[3], 3)
                assert res[3] == pytest.approx(1.0, abs=1e-3)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=reader) for _ in range(2)]
    for t in threads:
        t.start()
    try:
        for batch in range(12):
            ids = list(range(1000 + batch * 40, 1040 + batch * 40))
            idx.add(ids, bodies_of(rng, 40))
            idx.search_one(base[1], 2)  # force a sync between appends
    finally:
        stop.set()
        for t in threads:
            t.join(20)
    assert not errors
    idx.close()
