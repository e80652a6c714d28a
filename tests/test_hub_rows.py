"""Hub ingest row conversion tests (pure parts of cli/hub.py)."""

import json

import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.cli.hub import _IdGenerator, row_to_entry

from tests.conftest import make_unit

DATA = make_unit(ic.MT.DATA, 0, 64)
INST = make_unit(ic.MT.INSTANCE, 0, 64)
CODE = ic.gen_iscc_code_v0([DATA, INST], wide=False)["iscc"]


def test_id_generator_monotonic():
    gen = _IdGenerator()
    ids = [gen.next() for _ in range(5)]
    assert len(set(ids)) == 5
    keys = [int.from_bytes(ic.decode_base32(i.removeprefix("ISCC:"))[2:], "big") for i in ids]
    assert keys == sorted(keys)


def test_row_with_iscc_code():
    gen = _IdGenerator()
    entry = row_to_entry({"iscc": CODE, "name": "Title"}, gen)
    assert entry.iscc_code == CODE
    assert len(entry.units) == 2
    assert entry.metadata == {"name": "Title"}
    assert entry.iscc_id.startswith("ISCC:")


def test_row_with_units():
    gen = _IdGenerator()
    entry = row_to_entry({"units": [DATA, INST]}, gen)
    assert entry.units == [DATA, INST]


def test_row_without_code_skipped():
    gen = _IdGenerator()
    assert row_to_entry({"name": "no code"}, gen) is None


def test_row_with_features_json_string():
    gen = _IdGenerator()
    features = json.dumps(
        [
            {
                "maintype": "content",
                "subtype": "text",
                "version": 0,
                "simprints": [ic.encode_base64(bytes(range(16)))],
                "offsets": [0],
                "sizes": [42],
            }
        ]
    )
    entry = row_to_entry({"iscc": CODE, "features": features}, gen)
    assert entry.simprints is not None
    assert "CONTENT_TEXT_V0" in entry.simprints
    assert entry.simprints["CONTENT_TEXT_V0"][0].size == 42


def test_row_with_bad_features_ignored():
    gen = _IdGenerator()
    entry = row_to_entry({"iscc": CODE, "features": "{notjson"}, gen)
    assert entry is not None
    assert entry.simprints is None
