"""TpuIndexManager edge cases mirroring the reference manager suite:
cached-instance deletion, concurrent load race, size breakdown, selective
rebuild, and sealed-segment corruption recovery."""

import random
import threading

import numpy as np
import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.indexes.tpu import TpuIndexManager
from iscc_search_tpu.schema import IsccEntry, IsccIndex, IsccQuery

from tests.conftest import make_iscc_id, make_unit


@pytest.fixture
def mgr(tmp_path):
    m = TpuIndexManager(tmp_path / "idx")
    yield m
    m.close()


def _entry(n, rng, bits=64):
    units = [
        make_unit(ic.MT.DATA, ic.ST.NONE, bits, rng=rng),
        make_unit(ic.MT.INSTANCE, ic.ST.NONE, bits, rng=rng),
    ]
    return IsccEntry(iscc_id=make_iscc_id(n), units=units)


def test_delete_index_with_cached_instance(mgr, rng):
    mgr.create_index(IsccIndex(name="a"))
    mgr.add_assets("a", [_entry(1, rng)])  # loads + caches the instance
    mgr.delete_index("a")
    with pytest.raises(FileNotFoundError):
        mgr.get_index("a")
    # Recreating after delete starts empty
    mgr.create_index(IsccIndex(name="a"))
    assert mgr.get_index("a").assets == 0


def test_sizes_breakdown_components(mgr, rng):
    mgr.create_index(IsccIndex(name="a"))
    mgr.add_assets("a", [_entry(i, rng) for i in range(50)])
    mgr.sync("a")
    info = mgr.get_index("a")
    assert info.assets == 50
    assert info.sizes and any(v >= 0 for v in info.sizes.root.values()) if hasattr(info.sizes, "root") else info.sizes


def test_sizes_count_unloaded_dirs(tmp_path, rng):
    m = TpuIndexManager(tmp_path / "idx")
    m.create_index(IsccIndex(name="a"))
    m.add_assets("a", [_entry(i, rng) for i in range(20)])
    m.close()
    # Fresh manager, index not loaded: list must still report it with a size
    m2 = TpuIndexManager(tmp_path / "idx")
    listed = {i.name: i for i in m2.list_indexes()}
    assert "a" in listed and listed["a"].assets == 20
    m2.close()


def test_concurrent_get_or_load_single_instance(mgr, rng):
    mgr.create_index(IsccIndex(name="a"))
    mgr.add_assets("a", [_entry(1, rng)])
    mgr.close()

    instances = []
    barrier = threading.Barrier(8)

    def load():
        barrier.wait()
        instances.append(mgr._get_or_load_index("a"))

    threads = [threading.Thread(target=load) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len({id(i) for i in instances}) == 1


def test_rebuild_unknown_type_returns_empty(mgr, rng):
    mgr.create_index(IsccIndex(name="a"))
    mgr.add_assets("a", [_entry(1, rng)])
    rebuilt = mgr.rebuild("a", unit_types=["META_NONE_V0"], simprint_types=[])
    assert rebuilt == {"unit_types": [], "simprint_types": []}


def test_rebuild_specific_type_only(mgr, rng):
    mgr.create_index(IsccIndex(name="a"))
    entries = [_entry(i, rng) for i in range(5)]
    mgr.add_assets("a", entries)
    rebuilt = mgr.rebuild("a", unit_types=["DATA_NONE_V0"], simprint_types=[])
    assert rebuilt["unit_types"] == ["DATA_NONE_V0"]
    # Search still works after selective rebuild
    res = mgr.search_assets("a", IsccQuery(units=[entries[1].units[0]]), limit=3)
    assert any(m.iscc_id == entries[1].iscc_id for m in res.global_matches)


def test_segment_corruption_recovery(tmp_path, rng):
    """A corrupted sealed segment file must not brick the index at load: the
    engine warns, loads what it can, and rebuild restores the rest."""
    m = TpuIndexManager(tmp_path / "idx")
    m.create_index(IsccIndex(name="a"))
    entries = [_entry(i, rng) for i in range(30)]
    m.add_assets("a", entries)
    m.sync("a")
    m.close()

    # Corrupt every npz under the DATA unit's derived dir
    seg_files = list((tmp_path / "idx" / "a").rglob("*.npz"))
    assert seg_files, "expected persisted segment files"
    for f in seg_files:
        f.write_bytes(b"\x00corrupt\x00" * 10)

    m2 = TpuIndexManager(tmp_path / "idx")
    # Load must not raise; the asset store (source of truth) is intact
    asset = m2.get_asset("a", entries[0].iscc_id)
    assert asset.units == entries[0].units
    # Rebuild restores derived search state
    m2.rebuild("a")
    res = m2.search_assets("a", IsccQuery(units=[entries[3].units[0]]), limit=3)
    assert any(mm.iscc_id == entries[3].iscc_id for mm in res.global_matches)
    m2.close()
