"""KvIndex bidirectional prefix matching and matched-bits scoring tests
(reference lmdb backend semantics: lmdb/index.py:447-494, 255-264)."""

import numpy as np
import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.indexes.kv import KvIndex
from iscc_search_tpu.schema import IsccEntry, IsccQuery

from tests.conftest import make_iscc_id


def unit_from_body(body, mtype=ic.MT.DATA, stype=0):
    header = ic.encode_header(mtype, stype, ic.VS.V0, ic.encode_length(mtype, len(body) * 8))
    return "ISCC:" + ic.encode_base32(header + body)


@pytest.fixture
def idx(tmp_path):
    i = KvIndex(tmp_path / "kv")
    yield i
    i.close()


def test_forward_prefix_match_scores_full_query(idx):
    rng = np.random.default_rng(1)
    full = rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
    inst = unit_from_body(rng.integers(0, 256, 8, dtype=np.uint8).tobytes(), ic.MT.INSTANCE)
    # Stored: 256-bit unit; Query: its 64-bit prefix -> all query bits matched = 1.0
    idx.add_assets([IsccEntry(iscc_id=make_iscc_id(1), units=[unit_from_body(full), inst])])
    res = idx.search_assets(IsccQuery(units=[unit_from_body(full[:8])]))
    assert res.global_matches[0].types["DATA_NONE_V0"] == pytest.approx(1.0)


def test_reverse_prefix_match_scores_partial(idx):
    rng = np.random.default_rng(2)
    full = rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
    inst = unit_from_body(rng.integers(0, 256, 8, dtype=np.uint8).tobytes(), ic.MT.INSTANCE)
    # Stored: 64-bit unit; Query: 256-bit extension -> 64/256 bits matched
    idx.add_assets([IsccEntry(iscc_id=make_iscc_id(1), units=[unit_from_body(full[:8]), inst])])
    res = idx.search_assets(IsccQuery(units=[unit_from_body(full)]))
    assert res.global_matches[0].types["DATA_NONE_V0"] == pytest.approx(64 / 256)


def test_reverse_prefix_all_cut_points(idx):
    rng = np.random.default_rng(3)
    full = rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
    # Store 64/128/192-bit prefixes of the same code in three assets
    for n, cut in ((1, 8), (2, 16), (3, 24)):
        inst = unit_from_body(rng.integers(0, 256, 8, dtype=np.uint8).tobytes(), ic.MT.INSTANCE)
        idx.add_assets([IsccEntry(iscc_id=make_iscc_id(n), units=[unit_from_body(full[:cut]), inst])])
    res = idx.search_assets(IsccQuery(units=[unit_from_body(full)]))
    scores = {m.iscc_id: m.types["DATA_NONE_V0"] for m in res.global_matches}
    assert scores[make_iscc_id(1)] == pytest.approx(64 / 256)
    assert scores[make_iscc_id(2)] == pytest.approx(128 / 256)
    assert scores[make_iscc_id(3)] == pytest.approx(192 / 256)


def test_average_across_queried_units(idx):
    rng = np.random.default_rng(4)
    d_body = rng.integers(0, 256, 8, dtype=np.uint8).tobytes()
    i_body = rng.integers(0, 256, 8, dtype=np.uint8).tobytes()
    idx.add_assets(
        [IsccEntry(iscc_id=make_iscc_id(1), units=[unit_from_body(d_body), unit_from_body(i_body, ic.MT.INSTANCE)])]
    )
    # Query with matching DATA but a non-matching INSTANCE -> average = 0.5
    other = rng.integers(0, 256, 8, dtype=np.uint8).tobytes()
    res = idx.search_assets(
        IsccQuery(units=[unit_from_body(d_body), unit_from_body(other, ic.MT.INSTANCE)])
    )
    m = res.global_matches[0]
    assert m.score == pytest.approx(0.5)
    assert m.types == {"DATA_NONE_V0": 1.0}


def test_no_match_returns_empty(idx):
    rng = np.random.default_rng(5)
    idx.add_assets(
        [
            IsccEntry(
                iscc_id=make_iscc_id(1),
                units=[
                    unit_from_body(rng.integers(0, 256, 8, dtype=np.uint8).tobytes()),
                    unit_from_body(rng.integers(0, 256, 8, dtype=np.uint8).tobytes(), ic.MT.INSTANCE),
                ],
            )
        ]
    )
    res = idx.search_assets(
        IsccQuery(units=[unit_from_body(rng.integers(0, 256, 8, dtype=np.uint8).tobytes())])
    )
    assert res.global_matches == []


def test_persistence(tmp_path):
    rng = np.random.default_rng(6)
    units = [
        unit_from_body(rng.integers(0, 256, 8, dtype=np.uint8).tobytes()),
        unit_from_body(rng.integers(0, 256, 8, dtype=np.uint8).tobytes(), ic.MT.INSTANCE),
    ]
    i1 = KvIndex(tmp_path / "kv")
    i1.add_assets([IsccEntry(iscc_id=make_iscc_id(1), units=units, metadata={"a": 1})])
    i1.close()
    i2 = KvIndex(tmp_path / "kv")
    assert i2.get_realm_id() == 0
    assert i2.get_asset_count() == 1
    res = i2.search_assets(IsccQuery(units=units))
    assert res.global_matches[0].score == pytest.approx(1.0)
    assert i2.get_asset(make_iscc_id(1)).metadata == {"a": 1}
    i2.close()


def test_kv_model_based_fuzz(tmp_path):
    """Random corpus with deliberately shared prefixes, checked against an
    independent brute-force mirror of the bidirectional prefix semantics."""
    import random

    rnd = random.Random(31)
    idx = KvIndex(tmp_path / "fz")

    def body(nbytes):
        # Tiny alphabet so prefixes collide often
        return bytes(rnd.choice([0, 1, 255]) for _ in range(nbytes))

    # corpus: iscc_id -> {unit_type: [bodies]}
    corpus = {}
    entries = []
    for i in range(1, 120):
        iid = make_iscc_id(i)
        units, per_type = [], {}
        for mtype in (ic.MT.DATA, ic.MT.CONTENT):
            b = body(rnd.choice([8, 16, 24, 32]))
            units.append(unit_from_body(b, mtype))
            ut = f"{'DATA_NONE' if mtype == ic.MT.DATA else 'CONTENT_TEXT'}_V0"
            per_type.setdefault(ut, []).append(b)
        inst = unit_from_body(body(16), ic.MT.INSTANCE)
        units.append(inst)
        per_type.setdefault("INSTANCE_NONE_V0", []).append(ic.decode_base32(inst.split(":")[1])[2:])
        corpus[iid] = per_type
        entries.append(IsccEntry(iscc_id=iid, units=units))
    idx.add_assets(entries)

    def brute_bits(stored, qb):
        qbits = len(qb) * 8
        if len(stored) >= len(qb) and stored[: len(qb)] == qb:
            return qbits
        if len(stored) * 8 in (64, 128, 192) and len(stored) < len(qb) and qb[: len(stored)] == stored:
            return len(stored) * 8
        return 0

    for _trial in range(40):
        qd, qc = body(rnd.choice([8, 16, 24, 32])), body(rnd.choice([8, 16, 24, 32]))
        q = IsccQuery(units=[unit_from_body(qd, ic.MT.DATA), unit_from_body(qc, ic.MT.CONTENT)])
        res = idx.search_assets(q, limit=1000)
        got = {m.iscc_id: m.score for m in res.global_matches}
        expected = {}
        for iid, per_type in corpus.items():
            total = 0.0
            matched = False
            for ut, qb in (("DATA_NONE_V0", qd), ("CONTENT_TEXT_V0", qc)):
                bits = max((brute_bits(sb, qb) for sb in per_type.get(ut, [])), default=0)
                if bits:
                    matched = True
                total += bits / (len(qb) * 8)
            if matched:
                expected[iid] = total / 2
        assert got.keys() == expected.keys(), (_trial, len(got), len(expected))
        for iid in got:
            assert got[iid] == pytest.approx(expected[iid]), (_trial, iid)
    idx.close()


def test_kv_lifecycle_and_errors(tmp_path, entry_factory):
    """Created/updated statuses, realm inference + mismatch, error paths,
    count, reopen (reference lmdb index suite behaviors)."""
    from iscc_search_tpu.indexes.kv.index import KvIndex
    from tests.conftest import make_iscc_id

    idx = KvIndex(tmp_path / "kv")
    e = IsccEntry(**entry_factory())
    assert [r.status for r in idx.add_assets([e])] == ["created"]
    assert [r.status for r in idx.add_assets([e])] == ["updated"]
    assert idx.add_assets([]) == []

    # Realm inferred from first asset -> realm-1 asset rejected
    bad = IsccEntry(**entry_factory())
    bad.iscc_id = make_iscc_id(999, realm_id=1)
    with pytest.raises(ValueError):
        idx.add_assets([bad])
    with pytest.raises(ValueError):
        idx.get_asset(make_iscc_id(5, realm_id=1))
    with pytest.raises(FileNotFoundError):
        idx.get_asset(make_iscc_id(424242))
    with pytest.raises(ValueError):
        idx.get_asset("not-an-iscc")

    # Missing iscc_id rejected
    no_id = IsccEntry(**entry_factory())
    no_id.iscc_id = None
    with pytest.raises(ValueError):
        idx.add_assets([no_id])

    assert idx.get_asset_count() == 1
    assert idx.get_realm_id() == 0
    idx.close()
    idx2 = KvIndex(tmp_path / "kv")
    assert idx2.get_asset_count() == 1
    assert idx2.get_realm_id() == 0
    assert idx2.get_asset(e.iscc_id).units == e.units
    idx2.close()


def test_kv_search_limit_and_empty(tmp_path, entry_factory):
    from iscc_search_tpu.indexes.kv.index import KvIndex

    idx = KvIndex(tmp_path / "kv")
    q = IsccQuery(units=IsccEntry(**entry_factory()).units)
    assert idx.search_assets(q, limit=5).global_matches == []

    entries = [IsccEntry(**entry_factory()) for _ in range(8)]
    idx.add_assets(entries)
    # All 8 share no unit bodies, so query one entry's units: only it matches
    res = idx.search_assets(IsccQuery(units=entries[2].units), limit=5)
    assert res.global_matches[0].iscc_id == entries[2].iscc_id
    # limit respected even when many weak matches exist
    shared = entries[0].units
    clones = []
    for i in range(120, 130):
        c = IsccEntry(**entry_factory())
        c.units = shared
        from tests.conftest import make_iscc_id

        c.iscc_id = make_iscc_id(i)
        clones.append(c)
    idx.add_assets(clones)
    res = idx.search_assets(IsccQuery(units=shared), limit=3)
    assert len(res.global_matches) == 3
    idx.close()


def test_update_drops_stale_unit_rows(tmp_path):
    """An update replacing an asset's units must remove the old unit rows —
    a stale body would keep prefix-matching against retracted data."""
    from iscc_search_tpu import codec as ic
    from iscc_search_tpu.indexes.kv.index import KvIndex
    from iscc_search_tpu.schema import IsccEntry, IsccQuery
    from tests.conftest import make_iscc_id, make_unit

    idx = KvIndex(tmp_path / "kv")
    try:
        old_data = make_unit(ic.MT.DATA, 0, 64)
        inst = make_unit(ic.MT.INSTANCE, 0, 64)
        iscc_id = make_iscc_id(1)
        idx.add_assets([IsccEntry(iscc_id=iscc_id, units=[old_data, inst])])
        res = idx.search_assets(IsccQuery(units=[old_data, inst]), limit=10)
        assert [m.iscc_id for m in res.global_matches] == [iscc_id]

        new_data = make_unit(ic.MT.DATA, 0, 64)
        idx.add_assets([IsccEntry(iscc_id=iscc_id, units=[new_data, inst])])
        res = idx.search_assets(IsccQuery(units=[old_data]), limit=10)
        assert res.global_matches == []  # retracted unit no longer matches
        res = idx.search_assets(IsccQuery(units=[new_data]), limit=10)
        assert [m.iscc_id for m in res.global_matches] == [iscc_id]
    finally:
        idx.close()
