"""TpuIndex edge-case parity tests, mirroring the reference's engine edge
suite (reference tests/test_indexes_usearch_index.py): realm handling, error
paths, derived-loss reindexing, simprint no-op gate subtleties."""

import random

import numpy as np
import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.indexes.tpu import TpuIndex
from iscc_search_tpu.schema import IsccEntry, IsccQuery

from tests.conftest import make_iscc_id, make_unit


@pytest.fixture
def idx(tmp_path):
    i = TpuIndex(tmp_path / "idx")
    yield i
    i.close()


def _entry(n, rng, bits=64, simprints=None):
    units = [
        make_unit(ic.MT.CONTENT, ic.ST_CC.TEXT, bits, rng=rng),
        make_unit(ic.MT.DATA, ic.ST.NONE, bits, rng=rng),
        make_unit(ic.MT.INSTANCE, ic.ST.NONE, bits, rng=rng),
    ]
    kw = {"simprints": simprints} if simprints else {}
    return IsccEntry(iscc_id=make_iscc_id(n), units=units, **kw)


def _sp(raw, offset, size):
    return {"simprint": ic.encode_base64(raw), "offset": offset, "size": size}


def test_get_asset_not_found(idx, rng):
    idx.add_assets([_entry(1, rng)])
    with pytest.raises(FileNotFoundError):
        idx.get_asset(make_iscc_id(999))


def test_get_asset_realm_mismatch(idx, rng):
    idx.add_assets([_entry(1, rng)])
    with pytest.raises(ValueError):
        idx.get_asset(make_iscc_id(5, realm_id=1))


def test_add_realm_mismatch_raises(idx, rng):
    idx.add_assets([_entry(1, rng)])
    bad = _entry(2, rng)
    bad.iscc_id = make_iscc_id(2, realm_id=1)
    with pytest.raises(ValueError):
        idx.add_assets([bad])


def test_search_fresh_index_returns_empty(idx, rng):
    q = IsccQuery(units=[make_unit(ic.MT.DATA, ic.ST.NONE, 64, rng=rng)])
    res = idx.search_assets(q, limit=5)
    assert res.global_matches == []
    assert res.chunk_matches == []


def test_search_unstored_iscc_id_raises(idx, rng):
    idx.add_assets([_entry(1, rng)])
    with pytest.raises(FileNotFoundError):
        idx.search_assets(IsccQuery(iscc_id=make_iscc_id(404)), limit=5)


def test_instance_binary_scoring_any_prefix(idx, rng):
    """INSTANCE scores are binary: ANY prefix relationship scores exactly 1.0
    (identity codes have no graded similarity)."""
    body = bytes(rng.getrandbits(8) for _ in range(32))
    stored = IsccEntry(
        iscc_id=make_iscc_id(1),
        units=[
            make_unit(ic.MT.DATA, ic.ST.NONE, 64, rng=rng),
            make_unit(ic.MT.INSTANCE, ic.ST.NONE, 256, body=body),
        ],
    )
    idx.add_assets([stored])
    # 64-bit prefix query against the stored 256-bit INSTANCE
    q = IsccQuery(units=[make_unit(ic.MT.INSTANCE, ic.ST.NONE, 64, body=body[:8])])
    res = idx.search_assets(q, limit=5)
    assert res.global_matches
    m = res.global_matches[0]
    assert m.iscc_id == stored.iscc_id
    assert m.types["INSTANCE_NONE_V0"] == 1.0
    assert m.score == 1.0


def test_duplicate_iscc_id_keeps_last_simprints(idx, rng):
    """Within one batch the LAST occurrence wins, including its simprints."""
    a = _sp(bytes(range(16)), 0, 100)
    b = _sp(bytes(range(16, 32)), 100, 100)
    e1 = _entry(1, rng, simprints={"CONTENT_TEXT_V0": [a]})
    e2 = IsccEntry(
        iscc_id=e1.iscc_id, units=e1.units, simprints={"CONTENT_TEXT_V0": [b]}
    )
    results = idx.add_assets([e1, e2])
    # Reference semantics: first occurrence creates, superseding dup reports updated
    assert [r.status for r in results] == ["created", "updated"]
    assert idx._simprint_indexes["CONTENT_TEXT_V0"].size == 1
    # Guard against the stale-union bug: the superseded first occurrence's
    # simprint must NOT be indexed, only the last version's.
    hit_new = idx.search_assets(IsccQuery(simprints={"CONTENT_TEXT_V0": [b["simprint"]]}), limit=5)
    assert any(m.iscc_id == e1.iscc_id for m in hit_new.chunk_matches)
    hit_old = idx.search_assets(
        IsccQuery(simprints={"CONTENT_TEXT_V0": [a["simprint"]]}), limit=5, exact=True
    )
    assert not any(
        m.iscc_id == e1.iscc_id and m.score == 1.0 for m in hit_old.chunk_matches
    )
    # Re-adding the winning version is a derived no-op
    nphd = idx._nphd_indexes["DATA_NONE_V0"]
    rows_before = nphd._rows
    idx.add_assets([e2])
    assert nphd._rows == rows_before


def test_reordered_simprints_noop(idx, rng):
    a = _sp(bytes(range(16)), 0, 500)
    b = _sp(bytes(range(16, 32)), 500, 400)
    e = _entry(1, rng, simprints={"CONTENT_TEXT_V0": [a, b]})
    idx.add_assets([e])
    sp = idx._simprint_indexes["CONTENT_TEXT_V0"]
    nphd = idx._nphd_indexes["DATA_NONE_V0"]
    state = (sp.size, sp.dirty, nphd._rows)
    e2 = IsccEntry(iscc_id=e.iscc_id, units=e.units, simprints={"CONTENT_TEXT_V0": [b, a]})
    res = idx.add_assets([e2])
    assert res[0].status == "updated"
    assert (sp.size, sp.dirty, nphd._rows) == state


def test_changed_simprints_update(idx, rng):
    a = _sp(bytes(range(16)), 0, 500)
    e = _entry(1, rng, simprints={"CONTENT_TEXT_V0": [a]})
    idx.add_assets([e])
    c = _sp(bytes(range(32, 48)), 0, 500)
    e2 = IsccEntry(iscc_id=e.iscc_id, units=e.units, simprints={"CONTENT_TEXT_V0": [c]})
    idx.add_assets([e2])
    sp = idx._simprint_indexes["CONTENT_TEXT_V0"]
    assert sp.size == 1
    # New chunk must be searchable; old one must be gone
    res = idx.search_assets(
        IsccQuery(simprints={"CONTENT_TEXT_V0": [c["simprint"]]}), limit=5
    )
    assert res.chunk_matches and res.chunk_matches[0].iscc_id == e.iscc_id
    res_old = idx.search_assets(
        IsccQuery(simprints={"CONTENT_TEXT_V0": [a["simprint"]]}), limit=5
    )
    assert not res_old.chunk_matches or res_old.chunk_matches[0].score < 1.0


def test_new_simprint_type_triggers_update(idx, rng):
    a = _sp(bytes(range(16)), 0, 500)
    e = _entry(1, rng, simprints={"CONTENT_TEXT_V0": [a]})
    idx.add_assets([e])
    e2 = IsccEntry(
        iscc_id=e.iscc_id,
        units=e.units,
        simprints={"CONTENT_TEXT_V0": [a], "SEMANTIC_TEXT_V0": [a]},
    )
    idx.add_assets([e2])
    assert "SEMANTIC_TEXT_V0" in idx._simprint_indexes
    assert idx._simprint_indexes["SEMANTIC_TEXT_V0"].size == 1


def test_reindex_when_nphd_vector_missing(idx, rng):
    """If a derived vector vanished (e.g. lost derived state after a crash),
    re-adding the identical asset must restore it instead of no-opping."""
    e = _entry(1, rng)
    idx.add_assets([e])
    nphd = idx._nphd_indexes["DATA_NONE_V0"]
    key = int(ic.decode_base32(e.iscc_id.split(":")[1])[2:].hex(), 16)
    nphd.remove([key])
    assert key not in nphd
    idx.add_assets([e])  # identical bytes, but derived state incomplete
    assert key in nphd


def test_search_instance_only_query(idx, rng):
    """A query with ONLY an INSTANCE unit exercises the no-similarity path."""
    body = bytes(rng.getrandbits(8) for _ in range(8))
    e = IsccEntry(
        iscc_id=make_iscc_id(1),
        units=[
            make_unit(ic.MT.DATA, ic.ST.NONE, 64, rng=rng),
            make_unit(ic.MT.INSTANCE, ic.ST.NONE, 64, body=body),
        ],
    )
    idx.add_assets([e])
    res = idx.search_assets(
        IsccQuery(units=[make_unit(ic.MT.INSTANCE, ic.ST.NONE, 64, body=body)]), limit=5
    )
    assert res.global_matches and res.global_matches[0].score == 1.0


def test_match_without_metadata_has_none(idx, rng):
    e = _entry(1, rng)
    idx.add_assets([e])
    res = idx.search_assets(IsccQuery(units=[e.units[1]]), limit=5)
    assert res.global_matches
    assert res.global_matches[0].metadata is None


def test_explicit_realm_persisted_across_reopen(tmp_path, rng):
    i = TpuIndex(tmp_path / "r1", realm_id=1)
    e = _entry(7, rng)
    e.iscc_id = make_iscc_id(7, realm_id=1)
    i.add_assets([e])
    i.close()
    i2 = TpuIndex(tmp_path / "r1")
    assert i2._realm_id == 1
    assert i2.get_asset(e.iscc_id).units == e.units
    i2.close()
