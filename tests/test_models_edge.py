"""Model-layer edge cases mirroring the reference's test_models_iscc_* suites:
IsccID realm/int/body roundtrips and extremes, IsccCode decomposition across
compositions and widths (incl. WIDE), IsccItem construction variants."""

import numpy as np
import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.models import IsccBase, IsccCode, IsccID, IsccItem, IsccUnit

from tests.conftest import make_unit


# ------------------------------------------------------------------ IsccID


def _iscc_id(ts=123456, server=7, realm=0):
    return ic.gen_iscc_id_v1(timestamp_us=ts, server_id=server, realm_id=realm)["iscc"]


def test_id_init_without_prefix():
    s = _iscc_id()
    assert str(IsccID(s.removeprefix("ISCC:"))) == s


def test_id_init_with_bytes_roundtrip():
    s = _iscc_id()
    obj = IsccID(s)
    assert str(IsccID(bytes(obj))) == s


def test_id_invalid_type_raises():
    with pytest.raises(TypeError):
        IsccID(12345)


def test_id_len_is_body_bits():
    assert len(IsccID(_iscc_id())) == 64


def test_id_int_excludes_header():
    s = _iscc_id(ts=1, server=0)
    obj = IsccID(s)
    assert int(obj) == int.from_bytes(obj.body, "big")
    assert int(obj) == (1 << 12)  # 52-bit timestamp << 12 | server 0


def test_id_from_int_realm_variants():
    s = _iscc_id(realm=0)
    val = int(IsccID(s))
    r0 = IsccID.from_int(val, 0)
    r1 = IsccID.from_int(val, 1)
    assert int(r0) == int(r1) == val
    assert r0.realm_id == 0 and r1.realm_id == 1
    assert str(r0) != str(r1)  # realm changes the header, hence the string


def test_id_from_body_equivalent_to_from_int():
    s = _iscc_id(ts=999, server=42, realm=0)
    obj = IsccID(s)
    assert str(IsccID.from_body(obj.body, 0)) == str(IsccID.from_int(int(obj), 0))


def test_id_from_int_zero_and_max():
    assert int(IsccID.from_int(0, 0)) == 0
    mx = (1 << 64) - 1
    assert int(IsccID.from_int(mx, 0)) == mx


def test_id_extreme_timestamps():
    tiny = _iscc_id(ts=0, server=0)
    huge = _iscc_id(ts=(1 << 52) - 1, server=4095)
    assert int(IsccID(tiny)) == 0
    assert int(IsccID(huge)) == (1 << 64) - 1


def test_id_random_structure():
    a, b = IsccID.random(), IsccID.random()
    assert str(a).startswith("ISCC:")
    assert a.iscc_type.startswith("ID_")
    assert str(a) != str(b)
    assert str(IsccID(bytes(a))) == str(a)


def test_id_equality_and_hash():
    s = _iscc_id()
    assert IsccID(s) == IsccID(s)
    assert hash(IsccID(s)) == hash(IsccID(s))
    assert IsccID(s) != IsccID(_iscc_id(ts=777))


# ---------------------------------------------------------------- IsccUnit


@pytest.mark.parametrize("bits", [64, 128, 192, 256])
def test_unit_lengths(bits, rng):
    u = IsccUnit(make_unit(ic.MT.CONTENT, ic.ST_CC.TEXT, bits, rng=rng))
    assert len(u) == bits
    assert len(u.body) == bits // 8
    assert u.unit_type == "CONTENT_TEXT_V0"


def test_unit_str_adds_prefix(rng):
    u = make_unit(ic.MT.DATA, ic.ST.NONE, 64, rng=rng)
    assert str(IsccUnit(u.removeprefix("ISCC:"))) == u


def test_unit_array_view(rng):
    u = IsccUnit(make_unit(ic.MT.DATA, ic.ST.NONE, 64, rng=rng))
    arr = np.asarray(u)
    assert arr.dtype == np.uint8 and arr.tobytes() == u.body


# ---------------------------------------------------------------- IsccCode


def _gen_code(units, wide=False):
    return ic.gen_iscc_code_v0(units, wide=wide)["iscc"]


def test_code_mdi_composition(rng):
    units = [
        make_unit(ic.MT.META, ic.ST.NONE, 64, rng=rng),
        make_unit(ic.MT.DATA, ic.ST.NONE, 64, rng=rng),
        make_unit(ic.MT.INSTANCE, ic.ST.NONE, 64, rng=rng),
    ]
    code = IsccCode(_gen_code(units))
    got = code.units
    assert [u.unit_type for u in got] == ["META_NONE_V0", "DATA_NONE_V0", "INSTANCE_NONE_V0"]
    # 64-bit reconstruction accuracy: bodies match the source prefixes
    for src, out in zip(units, got):
        assert out.body == IsccUnit(src).body[:8]


def test_code_mcdi_subtype_propagation(rng):
    units = [
        make_unit(ic.MT.META, ic.ST.NONE, 64, rng=rng),
        make_unit(ic.MT.CONTENT, ic.ST_CC.TEXT, 64, rng=rng),
        make_unit(ic.MT.DATA, ic.ST.NONE, 64, rng=rng),
        make_unit(ic.MT.INSTANCE, ic.ST.NONE, 64, rng=rng),
    ]
    got = IsccCode(_gen_code(units)).units
    assert [u.unit_type for u in got] == [
        "META_NONE_V0",
        "CONTENT_TEXT_V0",
        "DATA_NONE_V0",
        "INSTANCE_NONE_V0",
    ]
    assert all(len(u) == 64 for u in got)


def test_code_wide_decomposition(rng):
    units = [
        make_unit(ic.MT.DATA, ic.ST.NONE, 128, rng=rng),
        make_unit(ic.MT.INSTANCE, ic.ST.NONE, 128, rng=rng),
    ]
    code = IsccCode(_gen_code(units, wide=True))
    got = code.units
    assert [u.unit_type for u in got] == ["DATA_NONE_V0", "INSTANCE_NONE_V0"]
    assert all(len(u) == 128 for u in got)  # WIDE keeps 128-bit bodies
    for src, out in zip(units, got):
        assert out.body == IsccUnit(src).body[:16]


def test_code_units_cached(rng):
    units = [
        make_unit(ic.MT.DATA, ic.ST.NONE, 64, rng=rng),
        make_unit(ic.MT.INSTANCE, ic.ST.NONE, 64, rng=rng),
    ]
    code = IsccCode(_gen_code(units))
    assert code.units is code.units


def test_code_units_are_valid_units(rng):
    units = [
        make_unit(ic.MT.CONTENT, ic.ST_CC.TEXT, 64, rng=rng),
        make_unit(ic.MT.DATA, ic.ST.NONE, 64, rng=rng),
        make_unit(ic.MT.INSTANCE, ic.ST.NONE, 64, rng=rng),
    ]
    for u in IsccCode(_gen_code(units)).units:
        assert str(IsccUnit(str(u))) == str(u)


# ---------------------------------------------------------------- IsccItem


def test_item_new_with_units(rng):
    units = [
        make_unit(ic.MT.DATA, ic.ST.NONE, 64, rng=rng),
        make_unit(ic.MT.INSTANCE, ic.ST.NONE, 64, rng=rng),
    ]
    iid = _iscc_id()
    item = IsccItem.new(iid, units=units)
    assert item.iscc_id == iid
    assert item.units == units
    assert item.iscc_code.startswith("ISCC:")


def test_item_new_with_code_decomposes(rng):
    units = [
        make_unit(ic.MT.DATA, ic.ST.NONE, 64, rng=rng),
        make_unit(ic.MT.INSTANCE, ic.ST.NONE, 64, rng=rng),
    ]
    code = _gen_code(units)
    item = IsccItem.new(_iscc_id(), iscc_code=code)
    assert [IsccUnit(u).unit_type for u in item.units] == ["DATA_NONE_V0", "INSTANCE_NONE_V0"]


def test_item_requires_code_or_units():
    with pytest.raises(ValueError):
        IsccItem.new(_iscc_id())


def test_item_dict_json_roundtrip(rng):
    import json

    units = [
        make_unit(ic.MT.DATA, ic.ST.NONE, 64, rng=rng),
        make_unit(ic.MT.INSTANCE, ic.ST.NONE, 64, rng=rng),
    ]
    item = IsccItem.new(_iscc_id(), units=units)
    d = item.dict
    assert d["iscc_id"] == item.iscc_id
    loaded = json.loads(item.json)
    assert loaded == {k: v for k, v in d.items()}
    again = IsccItem.from_dict(d)
    assert again == item


def test_item_equality_and_hash(rng):
    units = [
        make_unit(ic.MT.DATA, ic.ST.NONE, 64, rng=rng),
        make_unit(ic.MT.INSTANCE, ic.ST.NONE, 64, rng=rng),
    ]
    iid = _iscc_id()
    a, b = IsccItem.new(iid, units=units), IsccItem.new(iid, units=units)
    assert a == b and hash(a) == hash(b)
