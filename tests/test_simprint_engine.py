"""SimprintEngine invariant tests: IDF-weighted asset aggregation, unmatched
penalty, thresholds, and detailed chunk output (reference
usearch_core.py:137-269 semantics on the exact scan engine)."""

import numpy as np
import pytest

from iscc_search_tpu.engine.simprint import SimprintEngine
from iscc_search_tpu.engine import simprint_ops as ops


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def key(asset, offset=0, size=100):
    return ops.pack_chunk_pointer(asset.to_bytes(8, "big"), offset, size)


def vec(rng):
    return rng.integers(0, 256, 16, dtype=np.uint8).tobytes()


@pytest.fixture
def engine(tmp_path):
    e = SimprintEngine(tmp_path / "sp", ndim=128)
    yield e
    e.close()


def test_full_match_outranks_partial(engine, rng):
    q1, q2 = vec(rng), vec(rng)
    filler = [vec(rng) for _ in range(40)]
    # Asset 1 holds both query chunks; asset 2 only one; assets 3+ noise
    engine.add_raw([key(1, 0), key(1, 100)], [q1, q2])
    engine.add_raw([key(2, 0)], [q1])
    engine.add_raw([key(3 + i, 0) for i in range(40)], filler)

    res = engine.search_raw([q1, q2], limit=10, threshold=0.8, total_assets=43)
    by_asset = {int.from_bytes(r.iscc_id_body, "big"): r for r in res}
    assert 1 in by_asset and 2 in by_asset
    assert by_asset[1].score > by_asset[2].score  # unmatched penalty bites
    assert by_asset[1].score == pytest.approx(1.0, abs=1e-6)  # both exact
    for r in res:
        assert 0.0 <= r.score <= 1.0


def test_threshold_excludes_weak_chunks(engine, rng):
    q = vec(rng)
    near = bytearray(q)
    near[0] ^= 0xFF  # 8/128 bits differ -> similarity 0.9375
    engine.add_raw([key(1, 0)], [bytes(near)])
    res_hi = engine.search_raw([q], limit=5, threshold=0.95, total_assets=1)
    assert not res_hi
    res_lo = engine.search_raw([q], limit=5, threshold=0.9, total_assets=1)
    assert res_lo and res_lo[0].score == pytest.approx(0.9375, abs=1e-3)


def test_detailed_chunks_carry_offsets(engine, rng):
    q = vec(rng)
    engine.add_raw([key(7, offset=12345, size=678)], [q])
    res = engine.search_raw([q], limit=5, threshold=0.5, detailed=True, total_assets=1)
    assert res[0].chunks and res[0].chunks[0].offset == 12345
    assert res[0].chunks[0].size == 678
    assert res[0].chunks[0].match == q


def test_idf_downweights_common_simprints(engine, rng):
    """A rare matching simprint outranks an equally-similar ubiquitous one."""
    common_v, rare_v = vec(rng), vec(rng)
    # common_v appears in 30 assets; rare_v in exactly 1
    for a in range(10, 40):
        engine.add_raw([key(a, 0)], [common_v])
    engine.add_raw([key(1, 0)], [rare_v])

    def doc_freq(sp):
        return 30 if sp == common_v else 1

    # Two-query search: one common, one rare. The asset matching only the
    # rare chunk must outscore an asset matching only the common chunk.
    res = engine.search_raw(
        [common_v, rare_v], limit=50, threshold=0.5, total_assets=31, doc_freq_fn=doc_freq
    )
    by_asset = {int.from_bytes(r.iscc_id_body, "big"): r.score for r in res}
    assert by_asset[1] > by_asset[10]


def test_remove_and_contains(engine, rng):
    k, v = key(9, 5), vec(rng)
    engine.add_raw([k], [v])
    assert k in engine
    engine.remove([k])
    assert k not in engine
    assert not engine.search_raw([v], limit=5, threshold=0.9, total_assets=1)


def test_empty_search_and_add(engine, rng):
    assert engine.search_raw([], limit=5, total_assets=0) == []
    engine.add_raw([], [])  # no-op, no error
    assert engine.search_raw([vec(rng)], limit=5, total_assets=1) == []


def test_add_raw_in_batch_key_dedup(engine, rng):
    """The same composite key twice in one batch must index once, FIRST
    occurrence winning (reference add_raw dedup semantics)."""
    v1, v2 = vec(rng), vec(rng)
    k = key(1, 0)
    engine.add_raw([k, k], [v1, v2])
    assert engine._index.size == 1
    res = engine.search_raw([v1], limit=5, threshold=0.8, total_assets=1)
    assert res and res[0].score == pytest.approx(1.0, abs=1e-6)


def test_multi_type_chunk_query(tmp_path, rng):
    """Two simprint types in one query produce per-type results on the same
    asset (reference multi-type approximate search)."""
    from iscc_search_tpu import codec as ic
    from iscc_search_tpu.indexes.tpu import TpuIndex
    from iscc_search_tpu.schema import IsccEntry, IsccQuery
    from tests.conftest import make_iscc_id, make_unit
    import random

    prng = random.Random(5)
    sp_a = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
    sp_b = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
    idx = TpuIndex(tmp_path / "mt")
    e = IsccEntry(
        iscc_id=make_iscc_id(1),
        units=[
            make_unit(ic.MT.DATA, ic.ST.NONE, 64, rng=prng),
            make_unit(ic.MT.INSTANCE, ic.ST.NONE, 64, rng=prng),
        ],
        simprints={
            "CONTENT_TEXT_V0": [{"simprint": ic.encode_base64(sp_a), "offset": 0, "size": 10}],
            "SEMANTIC_TEXT_V0": [{"simprint": ic.encode_base64(sp_b), "offset": 0, "size": 10}],
        },
    )
    idx.add_assets([e])
    res = idx.search_assets(
        IsccQuery(simprints={
            "CONTENT_TEXT_V0": [ic.encode_base64(sp_a)],
            "SEMANTIC_TEXT_V0": [ic.encode_base64(sp_b)],
        }),
        limit=5,
    )
    assert res.chunk_matches
    m = res.chunk_matches[0]
    assert m.iscc_id == e.iscc_id
    assert set(m.types) == {"CONTENT_TEXT_V0", "SEMANTIC_TEXT_V0"}
    for tr in m.types.values():
        assert tr.score == pytest.approx(1.0, abs=1e-6)
        assert tr.matches == 1 and tr.queried == 1
    idx.close()


def test_unknown_simprint_type_query(tmp_path, rng):
    """Querying a simprint type the index has never seen returns empty, not
    an error."""
    from iscc_search_tpu import codec as ic
    from iscc_search_tpu.indexes.tpu import TpuIndex
    from iscc_search_tpu.schema import IsccQuery

    idx = TpuIndex(tmp_path / "ut")
    res = idx.search_assets(
        IsccQuery(simprints={"CONTENT_AUDIO_V0": [ic.encode_base64(b"\xaa" * 16)]}),
        limit=5,
    )
    assert res.chunk_matches == [] and res.global_matches == []
    idx.close()
