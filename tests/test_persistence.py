"""Crash/consistency tests: flush thresholds, out-of-sync detection,
recovery without close (mirrors reference test_indexes_usearch_persistence)."""

import logging

import numpy as np
import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.indexes.tpu import TpuIndex
from iscc_search_tpu.schema import IsccEntry, IsccQuery

from tests.conftest import make_iscc_id, make_unit


def entries(rng, start, n):
    out = []
    for i in range(start, start + n):
        out.append(
            IsccEntry(
                iscc_id=make_iscc_id(i),
                units=[make_unit(ic.MT.DATA, 0, 64, rng=rng), make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)],
            )
        )
    return out


def test_flush_interval_autosaves(tmp_path, rng):
    idx = TpuIndex(tmp_path / "i", flush_interval=5)
    idx.add_assets(entries(rng, 1, 3))
    nphd = idx._nphd_indexes["DATA_NONE_V0"]
    assert nphd.dirty == 3  # below threshold: no auto-save yet
    idx.add_assets(entries(rng, 10, 3))
    assert nphd.dirty == 0  # crossed threshold: snapshot taken for auto-save
    nphd.drain_rotations()  # auto-save file I/O runs on the background worker
    assert (tmp_path / "i" / "DATA_NONE_V0" / "state.json").exists()
    idx.close()


def test_flush_interval_zero_disables(tmp_path, rng):
    idx = TpuIndex(tmp_path / "i", flush_interval=0)
    idx.add_assets(entries(rng, 1, 10))
    assert idx._nphd_indexes["DATA_NONE_V0"].dirty == 10
    idx.close()


def test_recovery_without_close(tmp_path, rng):
    """Store survives an unclosed process; derived state lags but reloads."""
    idx = TpuIndex(tmp_path / "i")
    batch = entries(rng, 1, 5)
    idx.add_assets(batch)
    idx.flush()  # derived segments + store on disk
    idx.add_assets(entries(rng, 100, 3))  # NOT flushed (derived state newer than disk)
    idx.store.flush()
    # Simulate crash: drop the object without close()
    del idx

    idx2 = TpuIndex(tmp_path / "i")
    # Source of truth has all 8 assets
    assert len(idx2) == 8
    # Derived index is stale (5 of 8) but loaded
    assert idx2._nphd_indexes["DATA_NONE_V0"].size == 5
    # Search still works against the stale derived state
    res = idx2.search_assets(IsccQuery(units=batch[0].units), limit=3)
    assert res.global_matches[0].iscc_id == batch[0].iscc_id
    # Explicit rebuild restores sync
    idx2.rebuild(["DATA_NONE_V0"], [])
    assert idx2._nphd_indexes["DATA_NONE_V0"].size == 8
    idx2.close()


def test_out_of_sync_warning_on_load(tmp_path, rng, caplog):
    idx = TpuIndex(tmp_path / "i")
    idx.add_assets(entries(rng, 1, 4))
    idx.flush()
    # Corrupt the recorded count to simulate desync
    import struct

    idx.store.put("metadata", b"nphd_count:DATA_NONE_V0", struct.pack(">Q", 999))
    idx.store.flush()
    idx.store.close()
    idx._closed = True  # skip close-time count rewrite

    with caplog.at_level(logging.WARNING, logger="iscc_search_tpu"):
        idx2 = TpuIndex(tmp_path / "i")
    assert any("out of sync" in r.message for r in caplog.records)
    # Stale index still loaded and searchable (warn-and-load-stale)
    assert "DATA_NONE_V0" in idx2._nphd_indexes
    idx2.close()


def test_missing_derived_dir_warns_and_skips(tmp_path, rng, caplog):
    import shutil

    idx = TpuIndex(tmp_path / "i")
    idx.add_assets(entries(rng, 1, 2))
    idx.close()
    shutil.rmtree(tmp_path / "i" / "DATA_NONE_V0")

    with caplog.at_level(logging.WARNING, logger="iscc_search_tpu"):
        idx2 = TpuIndex(tmp_path / "i")
    assert any("missing" in r.message for r in caplog.records)
    assert "DATA_NONE_V0" not in idx2._nphd_indexes
    # Search silently skips the missing type
    res = idx2.search_assets(IsccQuery(units=entries(rng, 500, 1)[0].units), limit=3)
    assert res.global_matches == []
    idx2.close()


def test_store_log_replay_after_kill(tmp_path, rng):
    """Unsynced store appends survive via the log (flush pushes to the OS)."""
    idx = TpuIndex(tmp_path / "i")
    batch = entries(rng, 1, 3)
    idx.add_assets(batch)  # add_assets flushes the store log internally
    del idx  # no close, no fsync — OS-level durability is the crash model

    idx2 = TpuIndex(tmp_path / "i")
    assert len(idx2) == 3
    fetched = idx2.get_asset(batch[2].iscc_id)
    assert fetched.units == batch[2].units
    idx2.close()


# ------------------------------------------------- background segment saves


def test_background_save_does_not_block_mutations(tmp_path, rng, monkeypatch):
    """add() proceeds while a save's file I/O is still in flight (no ingest stall)."""
    import time as _time

    from iscc_search_tpu.engine import device_index as di
    from iscc_search_tpu.engine.device_index import DeviceNphdIndex

    gate = {"slow": True}
    real_write = di._atomic_write

    def slow_write(path, data, **kw):
        if gate["slow"]:
            _time.sleep(0.5)
        real_write(path, data, **kw)

    monkeypatch.setattr(di, "_atomic_write", slow_write)
    idx = DeviceNphdIndex(tmp_path / "bg")
    idx.add([1, 2, 3], [bytes([i]) * 8 for i in range(3)])
    t0 = _time.perf_counter()
    idx.save(wait=False)  # schedules; worker sleeps inside _atomic_write
    scheduled = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    idx.add([4], [b"\x07" * 8])  # must not wait for the 0.5s write
    mutated = _time.perf_counter() - t0
    assert scheduled < 0.3, f"save(wait=False) blocked for {scheduled:.2f}s"
    assert mutated < 0.3, f"add blocked for {mutated:.2f}s behind background save"
    idx.drain_rotations()
    gate["slow"] = False
    idx.close()
    idx2 = DeviceNphdIndex(tmp_path / "bg")
    assert idx2.size == 4 and 4 in idx2
    idx2.close()


def test_background_save_coalesces_and_drains(tmp_path, rng):
    from iscc_search_tpu.engine.device_index import DeviceNphdIndex

    idx = DeviceNphdIndex(tmp_path / "co")
    for burst in range(5):
        idx.add([burst * 10 + j for j in range(10)], [bytes([burst, j]) * 4 for j in range(10)])
        idx.save(wait=False)
    idx.drain_rotations()
    assert idx.dirty == 0
    assert (tmp_path / "co" / "state.json").exists()
    idx.close()
    idx2 = DeviceNphdIndex(tmp_path / "co")
    assert idx2.size == 50
    idx2.close()


def test_background_save_failure_marks_dirty_and_recovers(tmp_path, rng, monkeypatch):
    from iscc_search_tpu.engine import device_index as di
    from iscc_search_tpu.engine.device_index import DeviceNphdIndex

    real_write = di._atomic_write
    boom = {"on": True}

    def failing_write(path, data, **kw):
        if boom["on"]:
            raise OSError("disk on fire")
        real_write(path, data, **kw)

    monkeypatch.setattr(di, "_atomic_write", failing_write)
    idx = DeviceNphdIndex(tmp_path / "fail")
    idx.add([1, 2], [b"\x01" * 8, b"\x02" * 8])
    idx.save(wait=True)  # write fails on the worker
    assert idx.dirty > 0  # failure re-marks unsaved state
    boom["on"] = False
    idx.save(wait=True)
    assert idx.dirty == 0
    idx.close()
    idx2 = DeviceNphdIndex(tmp_path / "fail")
    assert idx2.size == 2
    idx2.close()
