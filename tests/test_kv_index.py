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
