"""Regression tests for the engine persistence review findings.

1. Compaction unlinked sealed segment files before the replacement
   manifest committed — a crash in that window lost the whole index.
2. active/valid files were overwritten in place under fixed names, so a
   crash between data writes and the manifest rename left the old
   manifest paired with new data (row loss / misalignment).
3. An older snapshot could replace a newer one in the coalescing queue
   (snapshot and enqueue are not atomic).
4. ROW_BYTES hardcoded 8-byte keys, mis-sizing hamming segments.
5. k was silently clamped to the scan chunk size, violating the exact
   top-count contract for count > 32768.
6. A partially-failed incremental device sync re-appended rows on retry,
   duplicating valid device rows.
"""

import numpy as np
import pytest

from iscc_search_tpu.engine.device_index import DeviceHammingIndex, DeviceNphdIndex


@pytest.fixture
def rng():
    return np.random.default_rng(21)


def rand_body(rng, nbytes=32):
    return rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes()


# 1. ---------------------------------------------------------------------


def test_compaction_crash_window_preserves_old_state(tmp_path, rng):
    # Smallest shard (floor 1024 rows/segment) so rows seal into segments
    idx = DeviceNphdIndex(tmp_path / "i", shard_size=1)
    n = 2500
    bodies = [rand_body(rng) for _ in range(n)]
    idx.add(list(range(n)), bodies)
    idx.save(wait=True)  # seals segments + commits a manifest
    assert idx.shard_count > 1
    idx.remove(list(range(0, n, 2)))  # 50% tombstones
    idx.save(wait=True)  # persist tombstones (still >50% => compacts below)

    # Compact WITHOUT a follow-up save: simulates a crash before the new
    # manifest lands. The committed manifest's files must all still exist.
    idx.compact()
    reopened = DeviceNphdIndex(tmp_path / "i", shard_size=1)
    try:
        # Pre-compaction durable state: all rows with half tombstoned
        assert reopened.size == n // 2
        assert reopened.get(1) == bodies[1]
        assert reopened.get(0) is None  # tombstone persisted by the save
    finally:
        reopened.close()
    idx.close()


# 2. ---------------------------------------------------------------------


def test_crash_before_manifest_preserves_old_state(tmp_path, rng, monkeypatch):
    idx = DeviceNphdIndex(tmp_path / "i")
    bodies = [rand_body(rng) for _ in range(20)]
    idx.add(list(range(20)), bodies)
    idx.save(wait=True)

    # More rows, then a save that crashes right before the manifest rename
    idx.add(list(range(20, 40)), [rand_body(rng) for _ in range(20)])
    import iscc_search_tpu.engine.device_index as di

    real_write = di._atomic_write

    def crashing_write(path, data, **kw):
        if path.name == "state.json":
            raise OSError("power loss (simulated)")
        return real_write(path, data, **kw)

    monkeypatch.setattr(di, "_atomic_write", crashing_write)
    with pytest.raises(Exception):
        try:
            idx.save(wait=True)
        finally:
            # surface the worker's failure for the assertion
            if idx.dirty:
                raise OSError("save failed as expected")
    monkeypatch.setattr(di, "_atomic_write", real_write)

    reopened = DeviceNphdIndex(tmp_path / "i")
    try:
        # The OLD manifest with its OWN files must load intact: exactly the
        # first 20 rows (new data files have fresh names, old ones untouched).
        assert reopened.size == 20
        assert reopened.get(7) == bodies[7]
    finally:
        reopened.close()
    idx.close()


# 3. ---------------------------------------------------------------------


def test_older_snapshot_never_replaces_newer(tmp_path, rng):
    idx = DeviceNphdIndex(tmp_path / "i")
    idx.add([1], [rand_body(rng)])
    with idx._lock:
        s1 = idx._snapshot_locked()
    idx.add([2], [rand_body(rng)])
    with idx._lock:
        s2 = idx._snapshot_locked()
    assert s2["seq"] > s1["seq"]
    # Enqueue newer first, then the older (the descheduled-thread race)
    idx._enqueue_save(s2, wait=False)
    idx._enqueue_save(s1, wait=True)
    reopened = DeviceNphdIndex(tmp_path / "i")
    try:
        assert reopened.size == 2  # s2 won; s1 must not have clobbered it
    finally:
        reopened.close()
    # In-flight variant: s2 already WRITTEN (not just queued) when the
    # older s1 arrives — the written-seq watermark must drop it.
    with idx._lock:
        s3 = idx._snapshot_locked()
    idx._enqueue_save(s3, wait=True)
    idx._enqueue_save(s1, wait=True)
    reopened = DeviceNphdIndex(tmp_path / "i")
    try:
        assert reopened.size == 2
    finally:
        reopened.close()
    idx.close()


# 4. ---------------------------------------------------------------------


def test_row_bytes_reflects_key_width(tmp_path):
    nphd = DeviceNphdIndex(tmp_path / "a")
    ham = DeviceHammingIndex(tmp_path / "b")
    try:
        assert nphd.ROW_BYTES == 8 + 32 + 4 + 1
        assert ham.ROW_BYTES == 16 + 32 + 4 + 1
        assert ham.shard_rows < nphd.shard_rows  # bigger rows, fewer per shard
    finally:
        nphd.close()
        ham.close()


# 5. ---------------------------------------------------------------------


def test_count_beyond_chunk_size_stays_exact(tmp_path, rng):
    n = 40000  # cap 65536 > default chunk 32768
    idx = DeviceNphdIndex(tmp_path / "i")
    bodies = [rand_body(rng, 8) for _ in range(n)]
    idx.add(list(range(n)), bodies)
    (keys, scores) = idx.search([bodies[0]], count=n)[0]
    # Every valid row must be returned — the old code silently truncated
    # results at the 32768-row chunk size.
    assert len(keys) == n
    assert scores[0] == pytest.approx(1.0)
    idx.close()


# 6. ---------------------------------------------------------------------


def test_failed_incremental_sync_never_duplicates_rows(tmp_path, rng, monkeypatch):
    idx = DeviceNphdIndex(tmp_path / "i")
    idx.add([1], [rand_body(rng, 8)])  # 2-lane partition
    idx.search_one(rand_body(rng, 8), count=3)  # initial sync

    # Next batch adds rows to TWO partitions; fail the new partition's build
    idx.add([2], [rand_body(rng, 8)])
    idx.add([3], [rand_body(rng, 32)])
    real_build = idx._build_partition
    fails = {"n": 0}

    def flaky_build(lanes, row_map):
        if lanes == 8 and fails["n"] == 0:
            fails["n"] += 1
            raise RuntimeError("device OOM (simulated)")
        return real_build(lanes, row_map)

    monkeypatch.setattr(idx, "_build_partition", flaky_build)
    with pytest.raises(RuntimeError):
        idx.search_one(rand_body(rng, 8), count=10)
    # Retry succeeds and must not contain duplicate keys
    keys, scores = idx.search([rand_body(rng, 8)], count=10)[0]
    key_ints = [int.from_bytes(keys[i].tobytes(), "big") for i in range(len(keys))]
    assert len(key_ints) == len(set(key_ints))
    assert set(key_ints) == {1, 2, 3}  # all rows present exactly once
    idx.close()
