"""Object-model tests mirroring reference tests/test_models_iscc_*.py semantics."""

import numpy as np
import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.models import (
    IsccBase,
    IsccCode,
    IsccID,
    IsccItem,
    IsccUnit,
    new_iscc_id,
    split_iscc_sequence,
)

META_UNIT = "ISCC:AAAUHBUDQUT3LPWR"
CONTENT_UNIT = "ISCC:EAA57SMMEN62J7ZA"
DATA_UNIT = "ISCC:GAAVB2JS4SVPWSEE"
INSTANCE_UNIT = "ISCC:IAATI64Q5HJYOXFF"
ISCC_ID = "ISCC:MAIGIIFJRDGEQQAA"
ISCC_CODE_TEXT = "ISCC:KADUHBUDQUT3LPWRJH6BUAG7HMBIXX6JRQRX3JH7EBIOSMXEVL5URBBUPOIOTU4HLSSQ"


def test_base_from_string_and_bytes():
    a = IsccBase(META_UNIT)
    b = IsccBase(a.digest)
    assert a == b
    assert str(a) == META_UNIT
    assert bytes(a) == a.digest
    assert len(a) == 64
    assert a.body == a.digest[2:]


def test_base_type_error():
    with pytest.raises(TypeError):
        IsccBase(42)


def test_iscc_type_strings():
    assert IsccUnit(META_UNIT).unit_type == "META_NONE_V0"
    assert IsccUnit(CONTENT_UNIT).unit_type == "CONTENT_TEXT_V0"
    assert IsccUnit(DATA_UNIT).unit_type == "DATA_NONE_V0"
    assert IsccUnit(INSTANCE_UNIT).unit_type == "INSTANCE_NONE_V0"
    assert IsccBase(ISCC_ID).iscc_type == "ID_REALM_0_V1"


def test_iscc_id_int_roundtrip():
    iid = IsccID(ISCC_ID)
    key = int(iid)
    assert IsccID.from_int(key, iid.realm_id) == iid
    assert IsccID.from_body(iid.body, iid.realm_id) == iid
    assert iid.realm_id == 0


def test_iscc_id_random_monotonic_realm0():
    iid = IsccID.random()
    assert iid.realm_id == 0
    assert len(iid.body) == 8
    assert iid.iscc_type == "ID_REALM_0_V1"


def test_new_iscc_id_digest():
    digest = new_iscc_id()
    assert len(digest) == 10
    fields = ic.decode_header(digest)
    assert fields.maintype == ic.MT.ID


def test_unit_array():
    unit = IsccUnit(CONTENT_UNIT)
    arr = np.asarray(unit)
    assert arr.dtype == np.uint8
    assert arr.tobytes() == unit.body
    arr2 = unit.__array__(copy=True)
    assert arr2.tobytes() == unit.body


def test_code_units_decomposition():
    code = IsccCode(ISCC_CODE_TEXT)
    units = code.units
    assert [u.unit_type for u in units] == [
        "META_NONE_V0",
        "SEMANTIC_TEXT_V0",
        "CONTENT_TEXT_V0",
        "DATA_NONE_V0",
        "INSTANCE_NONE_V0",
    ]
    # All unit bodies are 64-bit slices of the composite body
    for u in units:
        assert len(u) == 64


def test_code_units_passthrough_sequence():
    # A concatenation of raw unit digests also decomposes (tail continuation)
    seq = IsccUnit(DATA_UNIT).digest + IsccUnit(INSTANCE_UNIT).digest
    units = IsccCode(seq).units
    assert [str(u) for u in units] == [DATA_UNIT, INSTANCE_UNIT]


def test_split_iscc_sequence():
    seq = IsccUnit(META_UNIT).digest + IsccUnit(DATA_UNIT).digest + IsccID(ISCC_ID).digest
    parts = split_iscc_sequence(seq)
    assert len(parts) == 3
    assert parts[0] == IsccUnit(META_UNIT).digest
    assert parts[2] == IsccID(ISCC_ID).digest


def test_split_iscc_sequence_invalid():
    with pytest.raises(ValueError):
        split_iscc_sequence(IsccUnit(META_UNIT).digest[:5])


def test_iscc_item_new_from_units():
    item = IsccItem.new(ISCC_ID, units=[DATA_UNIT, INSTANCE_UNIT])
    assert item.iscc_id == ISCC_ID
    assert item.units == [DATA_UNIT, INSTANCE_UNIT]
    code = item.iscc_code
    assert code.startswith("ISCC:")


def test_iscc_item_new_from_code():
    item = IsccItem.new(ISCC_ID, iscc_code=ISCC_CODE_TEXT)
    assert len(item.units) == 5
    assert item.iscc_code == ISCC_CODE_TEXT


def test_iscc_item_requires_code_or_units():
    with pytest.raises(ValueError):
        IsccItem.new(ISCC_ID)


def test_iscc_item_from_dict_generates_id():
    item = IsccItem.from_dict({"units": [DATA_UNIT, INSTANCE_UNIT]})
    assert item.iscc_id.startswith("ISCC:")
    d = item.dict
    assert set(d) == {"iscc_id", "iscc_code", "units"}
    assert b"iscc_id" in item.json
