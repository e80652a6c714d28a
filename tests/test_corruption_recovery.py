"""Corrupt-derived-state recovery and search-during-compaction concurrency.

The derived device indexes are rebuildable; a corrupt segment file must
never prevent the index from opening (warn-and-skip, reference
usearch/index.py:1602-1648 warn-and-load-stale), and an explicit rebuild
must fully repair it from the source-of-truth store.
"""

import threading

import numpy as np
import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.engine.device_index import DeviceNphdIndex
from iscc_search_tpu.indexes.tpu import TpuIndex
from iscc_search_tpu.schema import IsccEntry, IsccQuery

from tests.conftest import make_iscc_id, make_unit


def unit_from_body(mtype, body):
    header = ic.encode_header(mtype, 0, ic.VS.V0, ic.encode_length(mtype, len(body) * 8))
    return "ISCC:" + ic.encode_base32(header + body)


def test_corrupt_segment_warns_skips_and_rebuild_repairs(tmp_path, caplog):
    rng = np.random.default_rng(3)
    path = tmp_path / "idx"
    idx = TpuIndex(path)
    bodies = [rng.integers(0, 256, 8, dtype=np.uint8).tobytes() for _ in range(20)]
    entries = [
        IsccEntry(
            iscc_id=make_iscc_id(i),
            units=[unit_from_body(ic.MT.DATA, bodies[i]), make_unit(ic.MT.INSTANCE, 0, 64)],
        )
        for i in range(20)
    ]
    idx.add_assets(entries)
    idx.close()

    # Corrupt the active segment of the DATA index (versioned name — read
    # the committed manifest to find it)
    import json as _json

    state = _json.loads((path / "DATA_NONE_V0" / "state.json").read_text())
    seg = path / "DATA_NONE_V0" / state["active"]["file"]
    assert seg.exists()
    seg.write_bytes(b"not an npz file")

    idx = TpuIndex(path)
    try:
        assert "DATA_NONE_V0" not in idx._nphd_indexes  # warn-and-skip
        assert any("Failed to load NPHD index" in r.message for r in caplog.records)
        # Asset data intact; similarity search degrades (no crash)
        res = idx.search_assets(IsccQuery(units=[unit_from_body(ic.MT.DATA, bodies[0])]), limit=5)
        assert res.global_matches == []
        assert idx.get_asset(entries[0].iscc_id).iscc_id == entries[0].iscc_id

        # Explicit rebuild repairs from the store
        result = idx.rebuild(["DATA_NONE_V0"], [])
        assert result["unit_types"] == ["DATA_NONE_V0"]
        res = idx.search_assets(IsccQuery(units=[unit_from_body(ic.MT.DATA, bodies[0])]), limit=5)
        assert res.global_matches and res.global_matches[0].iscc_id == entries[0].iscc_id
    finally:
        idx.close()


def test_corrupt_state_json_warns_and_skips(tmp_path, caplog):
    rng = np.random.default_rng(4)
    path = tmp_path / "idx"
    idx = TpuIndex(path)
    idx.add_assets(
        [
            IsccEntry(
                iscc_id=make_iscc_id(1),
                units=[
                    unit_from_body(ic.MT.DATA, rng.integers(0, 256, 8, dtype=np.uint8).tobytes()),
                    make_unit(ic.MT.INSTANCE, 0, 64),
                ],
            )
        ]
    )
    idx.close()
    (path / "DATA_NONE_V0" / "state.json").write_text("{corrupt")
    idx = TpuIndex(path)
    try:
        assert "DATA_NONE_V0" not in idx._nphd_indexes
        assert any("Failed to load" in r.message for r in caplog.records)
    finally:
        idx.close()


def test_search_during_compaction(tmp_path):
    """Concurrent searches racing compact() must stay exact (no crashes,
    no stale/garbage results after the swap)."""
    rng = np.random.default_rng(5)
    idx = DeviceNphdIndex(tmp_path / "i")
    bodies = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes() for _ in range(4000)]
    idx.add(list(range(4000)), bodies)
    idx.remove(list(range(0, 4000, 2)))  # 50% tombstones

    errors = []
    stop = threading.Event()

    def searcher():
        qi = 1
        while not stop.is_set():
            try:
                res = idx.search_one(bodies[qi], count=3)
                # The query's own (kept) key must always be the exact top hit
                if qi not in res or res[qi] != pytest.approx(1.0):
                    errors.append(f"key {qi} missing/wrong: {res}")
                    return
            except Exception as e:
                errors.append(repr(e))
                return
            qi = (qi + 2) % 4000 or 1
        return

    threads = [threading.Thread(target=searcher) for _ in range(2)]
    for t in threads:
        t.start()
    try:
        for _ in range(3):
            idx.compact()
            idx.add([4001], [bodies[1]])  # mutate after compaction too
            idx.remove([4001])
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=30)
    idx.close()
    assert errors == []
