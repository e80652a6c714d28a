"""Index commons: serialization, ISCC-ID helpers, validation, normalization."""

import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.indexes import common
from iscc_search_tpu.schema import IsccEntry, IsccQuery

from tests.conftest import make_iscc_id, make_unit

DATA = make_unit(ic.MT.DATA, 0, 64)
INST = make_unit(ic.MT.INSTANCE, 0, 64)
CODE = ic.gen_iscc_code_v0([DATA, INST], wide=False)["iscc"]


def test_serialize_excludes_simprints():
    entry = IsccEntry(
        iscc_id=make_iscc_id(1),
        units=[DATA, INST],
        simprints={"CONTENT_TEXT_V0": [{"simprint": ic.encode_base64(bytes(16)), "offset": 0, "size": 1}]},
        metadata={"name": "x"},
    )
    raw = common.serialize_asset(entry)
    assert b"simprints" not in raw
    restored = common.deserialize_asset(raw)
    assert restored.iscc_id == entry.iscc_id
    assert restored.units == entry.units
    assert restored.simprints is None
    assert restored.metadata == {"name": "x"}


def test_deserialize_invalid():
    # Corrupt stored data is a SERVER fault (RuntimeError -> 500), never a
    # ValueError (which the wsgi layer maps to 400 "invalid user input").
    with pytest.raises(RuntimeError):
        common.deserialize_asset(b"{not json")
    with pytest.raises(RuntimeError):
        common.deserialize_asset(b'{"units": "notalist"}')


def test_extract_body_and_realm():
    iid = make_iscc_id(5)
    body = common.extract_iscc_id_body(iid)
    assert len(body) == 8
    assert common.extract_realm_id(iid) == 0
    assert common.extract_realm_id(make_iscc_id(5, realm_id=1)) == 1
    assert common.reconstruct_iscc_id(body, 0) == iid


def test_reconstruct_validation():
    with pytest.raises(ValueError):
        common.reconstruct_iscc_id(bytes(8), 2)
    with pytest.raises(ValueError):
        common.reconstruct_iscc_id(bytes(7), 0)


def test_validate_iscc_id_errors():
    with pytest.raises(ValueError, match="must start with"):
        common.validate_iscc_id("MAIGIIFJRDGEQQAA")
    with pytest.raises(ValueError, match="base32"):
        common.validate_iscc_id("ISCC:!!!!")
    too_long = "ISCC:" + ic.encode_base32(bytes(12))
    with pytest.raises(ValueError, match="length"):
        common.validate_iscc_id(too_long)
    with pytest.raises(ValueError, match="main type"):
        common.validate_iscc_id(DATA)  # a unit is 10 bytes but MT != ID
    with pytest.raises(ValueError, match="Realm mismatch"):
        common.validate_iscc_id(make_iscc_id(1, realm_id=1), expected_realm=0)


def test_unit_helpers():
    assert common.get_unit_type(DATA) == "DATA_NONE_V0"
    assert len(common.extract_unit_body(DATA)) == 8


def test_validate_index_name():
    common.validate_index_name("abc123")
    for bad in ("", "1abc", "ABC", "a-b", "a_b", "a b"):
        with pytest.raises(ValueError):
            common.validate_index_name(bad)


def test_normalize_query_code_to_units():
    q = common.normalize_query(IsccQuery(iscc_code=CODE))
    assert q.units and len(q.units) == 2
    assert q.iscc_code == CODE


def test_normalize_query_units_to_code():
    q = common.normalize_query(IsccQuery(units=[DATA, INST]))
    assert q.iscc_code == CODE


def test_normalize_query_units_not_composable():
    # A lone CONTENT unit can't form a code; passes through units-only
    content = make_unit(ic.MT.CONTENT, 0, 64)
    q = common.normalize_query(IsccQuery(units=[content]))
    assert q.iscc_code is None
    assert q.units == [content]


def test_normalize_query_both_passthrough():
    q0 = IsccQuery(iscc_code=CODE, units=[DATA, INST])
    assert common.normalize_query(q0) is q0


def test_normalize_query_simprints_only():
    q0 = IsccQuery(simprints={"CONTENT_TEXT_V0": [ic.encode_base64(bytes(16))]})
    assert common.normalize_query(q0) is q0


def test_normalize_query_empty_raises():
    with pytest.raises(ValueError):
        common.normalize_query(IsccQuery())


def test_search_by_iscc_id_precedence(tmp_path, entry_factory):
    """iscc_id wins over any other provided query fields (protocol contract)."""
    from iscc_search_tpu.indexes.tpu import TpuIndexManager
    from iscc_search_tpu.schema import IsccIndex

    mgr = TpuIndexManager(tmp_path / "t")
    mgr.create_index(IsccIndex(name="idx"))
    e1, e2 = entry_factory(), entry_factory()
    mgr.add_assets("idx", [IsccEntry(**e1), IsccEntry(**e2)])
    # Query names e1 by id but passes e2's units — the id must win,
    # so e1 is excluded (self) and e2 only matches if similar to e1 (it isn't).
    res = mgr.search_assets("idx", IsccQuery(iscc_id=e1["iscc_id"], units=e2["units"]), limit=10)
    ids = [m.iscc_id for m in res.global_matches]
    assert e1["iscc_id"] not in ids  # self-excluded -> id took precedence
    mgr.close()
