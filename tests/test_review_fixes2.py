"""Regression tests for the round-2 engine/store/index review findings.

Each test pins one fixed defect:
1. Intra-batch duplicate keys in PackedCodeIndex.add resurrected tombstones.
2. close() captured dirty before drain_rotations(), losing data when an
   in-flight background save failed during the drain.
3. Updates that dropped a similarity unit type left the stale vector
   searchable forever (until manual rebuild).
4. Updates shrinking a simprint type to an empty list deleted store rows but
   never removed the derived chunk vectors.
5. Per-asset simprint deletes scanned the whole forward db; now O(asset)
   via the inverse db, with a legacy fallback for stores without it.
6. HostStore calls after close() passed a NULL handle to the C library
   (process segfault when delete_index raced an in-flight request).
7. Live add kept the LAST same-type dual-length unit while rebuild kept the
   LONGEST — a rebuilt index diverged from the live one.
8. A concurrent rebuild popping a type between search's membership check and
   lookup raised KeyError instead of returning no matches.
"""

import numpy as np
import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.engine import simprint_ops as sp_ops
from iscc_search_tpu.engine.device_index import DeviceNphdIndex
from iscc_search_tpu.indexes.tpu import TpuIndex
from iscc_search_tpu.indexes.tpu.index import _sp_db, _spi_db
from iscc_search_tpu.schema import IsccEntry, IsccQuery
from iscc_search_tpu.store import HostStore

from tests.conftest import make_iscc_id, make_unit


@pytest.fixture
def rng():
    return np.random.default_rng(99)


def rand_body(rng, nbytes=32):
    return rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes()


def unit_from_body(mtype, stype, body):
    header = ic.encode_header(mtype, stype, ic.VS.V0, ic.encode_length(mtype, len(body) * 8))
    return "ISCC:" + ic.encode_base32(header + body)


def entry(n, units, simprints=None):
    e = {"iscc_id": make_iscc_id(n), "units": units}
    if simprints:
        e["simprints"] = simprints
    return IsccEntry(**e)


@pytest.fixture
def idx(tmp_path):
    i = TpuIndex(tmp_path / "idx")
    yield i
    i.close()


# 1. ---------------------------------------------------------------------


def test_intra_batch_duplicate_key_keeps_one_row(tmp_path, rng):
    idx = DeviceNphdIndex(tmp_path / "i")
    v_old, v_new = rand_body(rng), rand_body(rng)
    idx.add([5, 5], [v_old, v_new])
    assert idx.size == 1
    assert idx.get(5) == v_new
    # The superseded row must be tombstoned: a search may return key 5 only
    # once, and only with the new vector's score.
    res = idx.search([v_old, v_new], count=10)
    for qi, (keys, scores) in enumerate(res):
        assert len(keys) == 1
    keys, scores = res[1]
    assert scores[0] == pytest.approx(1.0)
    keys, scores = res[0]
    assert scores[0] < 1.0  # old vector is gone; only the new row matches


# 2. ---------------------------------------------------------------------


def test_close_persists_data_when_background_save_fails(tmp_path, rng, monkeypatch):
    idx = DeviceNphdIndex(tmp_path / "i")
    bodies = [rand_body(rng) for _ in range(10)]
    idx.add(list(range(10)), bodies)

    real_write = DeviceNphdIndex._write_snapshot
    fails = {"n": 0}

    def flaky_write(self, snapshot):
        if fails["n"] == 0:
            fails["n"] += 1
            raise OSError("disk full (simulated)")
        return real_write(self, snapshot)

    monkeypatch.setattr(DeviceNphdIndex, "_write_snapshot", flaky_write)
    idx.save(wait=False)  # background write fails, re-marks dirty
    idx.close()  # must observe the post-drain dirty state and retry
    assert fails["n"] == 1

    reopened = DeviceNphdIndex(tmp_path / "i")
    try:
        assert reopened.size == 10
        assert reopened.get(7) == bodies[7]
    finally:
        reopened.close()


# 3. ---------------------------------------------------------------------


def test_update_dropping_unit_type_removes_stale_vector(idx, rng):
    text_body = rand_body(rng, 8)
    text_unit = unit_from_body(ic.MT.CONTENT, ic.ST_CC.TEXT, text_body)
    data_unit = make_unit(ic.MT.DATA, 0, 64, rng=None)
    inst_unit = make_unit(ic.MT.INSTANCE, 0, 64, rng=None)
    e1 = entry(1, [text_unit, data_unit, inst_unit])
    idx.add_assets([e1])
    res = idx.search_assets(IsccQuery(units=[text_unit]), limit=10)
    assert [m.iscc_id for m in res.global_matches] == [e1.iscc_id]

    # Update: same asset no longer carries a CONTENT_TEXT unit
    e2 = IsccEntry(iscc_id=e1.iscc_id, units=[data_unit, inst_unit])
    results = idx.add_assets([e2])
    assert results[0].status.value == "updated"
    res = idx.search_assets(IsccQuery(units=[text_unit]), limit=10)
    assert res.global_matches == []
    # Count metadata tracks the removal
    assert idx._nphd_indexes["CONTENT_TEXT_V0"].size == 0


# 4. ---------------------------------------------------------------------


def test_update_with_empty_simprint_list_removes_derived_chunks(idx, rng):
    sp_bytes = bytes(range(16))
    sp = {"text": [{"simprint": ic.encode_base64(sp_bytes), "offset": 0, "size": 100}]}
    units = [make_unit(ic.MT.DATA, 0, 64), make_unit(ic.MT.INSTANCE, 0, 64)]
    e1 = entry(1, units, simprints=sp)
    idx.add_assets([e1])
    q = IsccQuery.model_construct(simprints={"text": [ic.encode_base64(sp_bytes)]})
    assert idx.search_assets(q, limit=10).chunk_matches

    # Schema forbids empty lists on the wire (min_length=1); the library-level
    # API must still handle them: an empty list means "delete this type".
    e2 = IsccEntry.model_construct(iscc_id=e1.iscc_id, units=units, simprints={"text": []})
    idx.add_assets([e2])
    assert idx.search_assets(q, limit=10).chunk_matches == []
    assert idx._simprint_indexes["text"].size == 0


# 5. ---------------------------------------------------------------------


def test_simprint_update_via_inverse_db(idx, rng):
    sp1, sp2 = bytes(range(16)), bytes(range(16, 32))
    units = [make_unit(ic.MT.DATA, 0, 64), make_unit(ic.MT.INSTANCE, 0, 64)]
    e1 = entry(1, units, simprints={"text": [{"simprint": ic.encode_base64(sp1), "offset": 0, "size": 50}]})
    idx.add_assets([e1])
    # Inverse db is populated on add
    body = sp_ops.unpack_chunk_pointer(idx.store.get_dups(_sp_db("text"), sp1)[0])[0]
    assert idx.store.get_dups(_spi_db("text"), body)
    # Update replaces the chunk set; the old pointer must be gone from both dbs
    e2 = IsccEntry(
        iscc_id=e1.iscc_id,
        units=units,
        simprints={"text": [{"simprint": ic.encode_base64(sp2), "offset": 0, "size": 50}]},
    )
    idx.add_assets([e2])
    assert idx.store.get_dups(_sp_db("text"), sp1) == []
    assert len(idx.store.get_dups(_sp_db("text"), sp2)) == 1
    entries = idx.store.get_dups(_spi_db("text"), body)
    assert [sp_ops.unpack_inverse_entry(v)[0] for v in entries] == [sp2]


def test_simprint_delete_legacy_fallback_without_inverse_db(idx, rng):
    sp1, sp2 = bytes(range(16)), bytes(range(16, 32))
    units = [make_unit(ic.MT.DATA, 0, 64), make_unit(ic.MT.INSTANCE, 0, 64)]
    e1 = entry(1, units, simprints={"text": [{"simprint": ic.encode_base64(sp1), "offset": 0, "size": 50}]})
    idx.add_assets([e1])
    # Simulate a store written before the inverse db existed: no inverse
    # rows AND no authoritative-inverse marker for the type
    idx.store.drop_db(_spi_db("text"))
    idx.store.delete("metadata", b"spi_v1:text")
    e2 = IsccEntry(
        iscc_id=e1.iscc_id,
        units=units,
        simprints={"text": [{"simprint": ic.encode_base64(sp2), "offset": 0, "size": 50}]},
    )
    idx.add_assets([e2])  # falls back to the bounded forward-db stream
    assert idx.store.get_dups(_sp_db("text"), sp1) == []
    assert len(idx.store.get_dups(_sp_db("text"), sp2)) == 1


# 6. ---------------------------------------------------------------------


def test_store_calls_after_close_raise_instead_of_segfault(tmp_path):
    store = HostStore(tmp_path / "s")
    store.put("db", b"k", b"v")
    store.close()
    with pytest.raises(RuntimeError, match="closed"):
        store.get("db", b"k")
    with pytest.raises(RuntimeError, match="closed"):
        store.put("db", b"k2", b"v2")
    with pytest.raises(RuntimeError, match="closed"):
        store.prefix_scan("db", b"")
    store.close()  # idempotent


# 7. ---------------------------------------------------------------------


def test_dual_length_same_type_unit_keeps_longest_and_matches_rebuild(idx, rng):
    long_body = rand_body(rng, 32)
    short_body = long_body[:8]
    t_long = unit_from_body(ic.MT.CONTENT, ic.ST_CC.TEXT, long_body)
    t_short = unit_from_body(ic.MT.CONTENT, ic.ST_CC.TEXT, short_body)
    inst = make_unit(ic.MT.INSTANCE, 0, 64)
    # Short listed LAST: the old keep-last rule would index the 64-bit body
    e = entry(1, [t_long, t_short, inst])
    idx.add_assets([e])
    key = int.from_bytes(ic.decode_base32(e.iscc_id.removeprefix("ISCC:"))[2:], "big")
    assert idx._nphd_indexes["CONTENT_TEXT_V0"].get(key) == long_body
    # Rebuild applies the same rule -> identical derived state
    idx.rebuild(["CONTENT_TEXT_V0"], [])
    assert idx._nphd_indexes["CONTENT_TEXT_V0"].get(key) == long_body


# 8. ---------------------------------------------------------------------


def test_search_similarity_unit_missing_index_returns_empty(idx):
    assert idx._search_similarity_unit("CONTENT_TEXT_V0", b"\x00" * 8, 10) == {}
