"""Branch coverage round 16: TpuIndex arms that normally run only inside a
multi-host subprocess cluster (service hooks, follower mode, follow()),
batcher-closed fallbacks, simprint-index degradation paths, metadata /
count-sync recovery arms."""

import numpy as np
import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.indexes.tpu.index import TpuIndex
from iscc_search_tpu.schema import IsccEntry, IsccQuery

from tests.conftest import make_iscc_id, make_unit


@pytest.fixture
def rng():
    import random

    return random.Random(16)


def entry(n, units, simprints=None, metadata=None):
    e = {"iscc_id": make_iscc_id(n), "units": units}
    if simprints:
        e["simprints"] = simprints
    if metadata:
        e["metadata"] = metadata
    return IsccEntry(**e)


def data_entry(n, rng, **kw):
    return entry(n, [make_unit(ic.MT.DATA, 0, 64, rng=rng), make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)], **kw)


def sp_entry(n, rng, sps, metadata=None):
    return entry(
        n,
        [make_unit(ic.MT.DATA, 0, 64, rng=rng), make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)],
        simprints={"CONTENT_TEXT_V0": [
            {"simprint": ic.encode_base64(sp), "offset": i * 10, "size": 10} for i, sp in enumerate(sps)
        ]},
        metadata=metadata,
    )


class FakeService:
    def __init__(self, coord):
        self.is_coordinator = coord
        self.hooked = []
        self.checked = []
        self.stopped = False
        self.followed = None

    def hook(self, name, index):
        self.hooked.append(name)
        index.control_hook = lambda op, args, local: local()

    def check(self, name, rows, live):
        self.checked.append((name, rows, live))

    def stop(self):
        self.stopped = True

    def follow(self, resolve):
        self.followed = resolve


def test_coordinator_service_hooks_new_indexes_and_stops_on_close(tmp_path, rng):
    idx = TpuIndex(tmp_path / "i")
    svc = FakeService(True)
    idx._service = svc
    idx.add_assets([data_entry(1, rng)])
    assert any(name.endswith("DATA_NONE_V0") for name in svc.hooked)
    idx.close()
    assert svc.stopped


def test_follower_service_disables_persistence(tmp_path, rng):
    idx = TpuIndex(tmp_path / "i")
    idx._service = FakeService(False)
    idx.add_assets([data_entry(1, rng)])
    assert all(not n.save_enabled for n in idx._nphd_indexes.values())
    idx._service = None  # followers never persist; let teardown save normally
    idx.close()


def test_follow_requires_follower_role(tmp_path):
    idx = TpuIndex(tmp_path / "i")
    svc = FakeService(True)
    idx._service = svc
    with pytest.raises(RuntimeError, match="follower processes"):
        idx.follow()
    svc.is_coordinator = False
    idx.follow()
    assert callable(svc.followed)
    # resolver rejects foreign index names, creates local replicas otherwise
    with pytest.raises(ValueError, match="follower serves"):
        svc.followed("other:DATA_NONE_V0")
    replica = svc.followed(f"{idx.path.name}:DATA_NONE_V0")
    assert replica is idx._nphd_indexes["DATA_NONE_V0"]
    idx._service = None
    idx.close()


def test_init_multihost_arms(tmp_path, rng, monkeypatch):
    import jax

    from iscc_search_tpu.parallel import service as svc_mod
    from iscc_search_tpu.parallel.hier import make_mesh_2d

    idx = TpuIndex(tmp_path / "i")
    idx.add_assets([data_entry(1, rng)])
    idx._mesh = None
    idx._init_multihost()  # no mesh: no service
    assert idx._service is None
    idx._mesh = make_mesh_2d(2, 4)
    idx._init_multihost()  # 2-D mesh, single process: still no service
    assert idx._service is None

    made = {}

    class FS(FakeService):
        def __init__(self, is_coordinator, n_followers=0, coordinator_host=None, port=0):
            super().__init__(is_coordinator)
            made.update(coord=is_coordinator, nf=n_followers, host=coordinator_host, port=port)

    monkeypatch.setattr(svc_mod, "MultihostService", FS)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    idx._init_multihost()
    assert made["coord"] is True and made["nf"] == 1
    assert idx._service.hooked and idx._service.checked

    idx2 = TpuIndex(tmp_path / "j")
    idx2.add_assets([data_entry(2, rng)])
    idx2._mesh = idx._mesh
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    idx2._init_multihost()
    assert idx2._service.is_coordinator is False
    assert all(not n.save_enabled for n in idx2._nphd_indexes.values())
    idx._service = None
    idx2._service = None
    idx.close()
    idx2.close()


def test_device_mesh_auto_hosts_from_process_count(tmp_path, monkeypatch):
    import jax

    idx = TpuIndex(tmp_path / "i")
    if hasattr(idx, "_mesh"):
        del idx._mesh
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    mesh = idx._device_mesh()
    assert mesh is not None and mesh.shape.get("dcn") == 4
    idx.close()


def test_search_falls_back_when_batcher_closed(tmp_path, rng):
    idx = TpuIndex(tmp_path / "i")
    e = data_entry(1, rng)
    idx.add_assets([e])
    q = IsccQuery(units=list(e.units))
    assert idx.search_assets(q).global_matches  # creates the batcher
    for b in idx._batchers.values():
        b.close()
    assert idx.search_assets(q).global_matches  # RuntimeError -> direct scan
    # index dropped concurrently: the fallback returns empty
    for b in idx._batchers.values():
        b.close()
    idx._nphd_indexes.pop("DATA_NONE_V0")
    res = idx.search_assets(q)
    assert all(m.iscc_id for m in res.global_matches) or res.global_matches == []
    idx.close()


def test_simprint_delete_with_missing_device_index(tmp_path, rng):
    rnd = np.random.default_rng(61)
    sps = [rnd.integers(0, 256, 16, dtype=np.uint8).tobytes() for _ in range(2)]
    idx = TpuIndex(tmp_path / "i")
    e = sp_entry(1, rng, sps)
    idx.add_assets([e])
    dropped = idx._simprint_indexes.pop("CONTENT_TEXT_V0")
    dropped.close()
    # update drops the simprints: the deleted keys have no device index left
    idx.add_assets([IsccEntry(iscc_id=e.iscc_id, units=list(e.units))])
    idx.close()


def test_simprint_search_warns_when_index_missing_but_store_has_data(tmp_path, rng, caplog):
    rnd = np.random.default_rng(62)
    sps = [rnd.integers(0, 256, 16, dtype=np.uint8).tobytes() for _ in range(2)]
    idx = TpuIndex(tmp_path / "i")
    idx.add_assets([sp_entry(1, rng, sps)])
    dropped = idx._simprint_indexes.pop("CONTENT_TEXT_V0")
    dropped.close()
    q = IsccQuery(simprints={"CONTENT_TEXT_V0": [ic.encode_base64(sps[0])]})
    with caplog.at_level("WARNING"):
        res = idx.search_assets(q)
    assert res.chunk_matches == []
    assert any("Simprint index missing" in r.message for r in caplog.records)
    idx.close()


def test_simprint_match_enrichment_metadata_and_deleted_asset(tmp_path, rng):
    from iscc_search_tpu.indexes.tpu.index import DB_ASSETS

    rnd = np.random.default_rng(63)
    sps = [rnd.integers(0, 256, 16, dtype=np.uint8).tobytes() for _ in range(2)]
    idx = TpuIndex(tmp_path / "i")
    e1 = sp_entry(1, rng, [sps[0]], metadata={"source": "https://x", "name": "a"})
    e2 = sp_entry(2, rng, [sps[1]])
    idx.add_assets([e1, e2])
    q = IsccQuery(simprints={"CONTENT_TEXT_V0": [ic.encode_base64(sps[0])]})
    res = idx.search_assets(q)
    top = res.chunk_matches[0]
    assert top.source == "https://x" and top.metadata is not None
    # asset record deleted out from under the derived index: no metadata
    from iscc_search_tpu.models import IsccID

    idx.store.delete(DB_ASSETS, IsccID(e1.iscc_id).digest[2:])
    res2 = idx.search_assets(q)
    assert res2.chunk_matches[0].metadata is None
    idx.close()


def test_init_metadata_without_max_dim(tmp_path, rng):
    from iscc_search_tpu.indexes.tpu.index import DB_META

    path = tmp_path / "i"
    idx = TpuIndex(path)
    idx.add_assets([data_entry(1, rng)])
    idx.store.delete(DB_META, b"max_dim")
    idx.close()
    idx2 = TpuIndex(path)  # legacy store without max_dim: default stands
    assert idx2.max_dim == 256
    idx2.close()


def test_count_sync_warnings_on_reopen(tmp_path, rng, caplog):
    rnd = np.random.default_rng(64)
    path = tmp_path / "i"
    idx = TpuIndex(path)
    idx.add_assets([sp_entry(1, rng, [rnd.integers(0, 256, 16, dtype=np.uint8).tobytes()])])
    idx.flush()
    idx._set_count(b"nphd_count:", "DATA_NONE_V0", 999)
    idx._set_count(b"sp_count:", "CONTENT_TEXT_V0", 999)
    idx.close()
    with caplog.at_level("WARNING"):
        idx2 = TpuIndex(path)
    msgs = " ".join(r.message for r in caplog.records)
    assert "out of sync" in msgs
    idx2.close()


def test_nphd_units_present_arms(tmp_path, rng):
    idx = TpuIndex(tmp_path / "i")
    e = data_entry(1, rng)
    idx.add_assets([e])
    from iscc_search_tpu.models import IsccID

    key = int(IsccID(e.iscc_id))
    assert idx._nphd_units_present(key, list(e.units)) is True  # INSTANCE skipped
    assert idx._nphd_units_present(key + 1, list(e.units)) is False  # key absent
    assert idx._nphd_units_present(key, None) is True  # no units
    idx._nphd_indexes.pop("DATA_NONE_V0")
    assert idx._nphd_units_present(key, list(e.units)) is False  # index missing
    idx.close()


def test_derived_sizes_before_and_after_flush(tmp_path, rng):
    idx = TpuIndex(tmp_path / "i")
    idx.add_assets([data_entry(1, rng)])
    sizes_before = idx.derived_sizes
    idx.flush()
    sizes_after = idx.derived_sizes
    assert set(sizes_before) == set(sizes_after)
    assert sizes_after["DATA_NONE_V0"] >= sizes_before["DATA_NONE_V0"] or sizes_after
    idx.close()
