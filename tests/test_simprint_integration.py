"""Simprint integration characterization: multi-type aggregation, IDF
ranking, unmatched penalty, per-query best chunk, auto-registration,
persistence, thresholds, and degenerate queries — through the full
TpuIndex.add_assets/search_assets surface (mirrors the reference's
test_indexes_usearch_simprint_{approx,exact,m1,m2}.py behavior set against
the scan-based engine)."""

import random

import numpy as np
import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.indexes.tpu import TpuIndex
from iscc_search_tpu.schema import IsccEntry, IsccQuery

from tests.conftest import make_iscc_id, make_unit

TT = "CONTENT_TEXT_V0"
TI = "CONTENT_IMAGE_V0"


@pytest.fixture
def rng():
    return np.random.default_rng(77)


@pytest.fixture
def idx(tmp_path):
    i = TpuIndex(tmp_path / "idx")
    yield i
    i.close()


def sp_bytes(rng):
    return rng.integers(0, 256, 16, dtype=np.uint8).tobytes()


def sp(b, offset=0, size=100):
    return {"simprint": ic.encode_base64(b), "offset": offset, "size": size}


_unit_rng = random.Random(4242)


def units(rng):
    return [make_unit(ic.MT.DATA, 0, 64, rng=_unit_rng), make_unit(ic.MT.INSTANCE, 0, 64, rng=_unit_rng)]


def entry(n, rng, simprints=None):
    return IsccEntry(iscc_id=make_iscc_id(n), units=units(rng), simprints=simprints)


def _flip(b, nbits, rng):
    arr = np.frombuffer(b, dtype=np.uint8).copy()
    for p in rng.choice(len(arr) * 8, size=nbits, replace=False):
        arr[p // 8] ^= 1 << (7 - p % 8)
    return arr.tobytes()


def _query(types_to_chunks):
    return IsccQuery(simprints={t: [ic.encode_base64(c) for c in cs] for t, cs in types_to_chunks.items()})


@pytest.mark.parametrize("exact", [False, True])
def test_multi_type_aggregation(idx, rng, exact):
    """An asset matched in TWO simprint types carries both type results; the
    overall score is the MEAN OF MATCHED TYPE SCORES (reference
    usearch/index.py:1325), so a perfect single-type match legitimately
    ties a perfect two-type match — types an asset was never queried in do
    not penalize it across types."""
    t1, t2, other = sp_bytes(rng), sp_bytes(rng), sp_bytes(rng)
    idx.add_assets([
        entry(1, rng, {TT: [sp(t1)], TI: [sp(t2, offset=7, size=9)]}),
        entry(2, rng, {TT: [sp(t1)]}),
        entry(3, rng, {TT: [sp(other)]}),
    ])
    res = idx.search_assets(_query({TT: [t1], TI: [t2]}), limit=10, exact=exact)
    by_id = {m.iscc_id: m for m in res.chunk_matches}
    m1 = by_id[make_iscc_id(1)]
    assert set(m1.types) == {TT, TI}
    assert m1.types[TI].chunks[0].offset == 7 and m1.types[TI].chunks[0].size == 9
    m2 = by_id[make_iscc_id(2)]
    assert set(m2.types) == {TT}
    assert m1.score == pytest.approx(1.0) and m2.score == pytest.approx(1.0)
    assert make_iscc_id(3) not in by_id  # unmatched asset absent


def test_unknown_query_type_ignored(idx, rng):
    """Querying a type no asset ever registered returns no chunk matches and
    does not error (reference: *_search_unknown_type)."""
    idx.add_assets([entry(1, rng, {TT: [sp(sp_bytes(rng))]})])
    res = idx.search_assets(_query({"CONTENT_AUDIO_V0": [sp_bytes(rng)]}), limit=5)
    assert res.chunk_matches == []
    res = idx.search_assets(_query({"CONTENT_AUDIO_V0": [sp_bytes(rng)]}), limit=5, exact=True)
    assert res.chunk_matches == []


def test_new_type_auto_registration_and_reopen(tmp_path, rng):
    """A type first seen on the Nth add auto-registers, serves searches, and
    persists across close/reopen (reference: new_type_auto_registration +
    sp_types_metadata_persistence + persistence_across_close)."""
    path = tmp_path / "idx"
    i1 = TpuIndex(path)
    a = sp_bytes(rng)
    i1.add_assets([entry(1, rng, {TT: [sp(a)]})])
    b = sp_bytes(rng)
    i1.add_assets([entry(2, rng, {TI: [sp(b, offset=3, size=4)]})])  # new type later
    assert set(i1._simprint_indexes) >= {TT, TI}
    i1.close()

    i2 = TpuIndex(path)
    try:
        res = i2.search_assets(_query({TI: [b]}), limit=5)
        assert res.chunk_matches and res.chunk_matches[0].iscc_id == make_iscc_id(2)
        res = i2.search_assets(_query({TT: [a]}), limit=5, exact=True)
        assert res.chunk_matches and res.chunk_matches[0].iscc_id == make_iscc_id(1)
    finally:
        i2.close()


def test_idf_downweights_common_chunks(idx, rng):
    """A query chunk shared by MANY assets contributes less than a rare one:
    the asset holding the rare chunk outranks assets holding only the
    common chunk (reference: idf_scoring)."""
    common, rare = sp_bytes(rng), sp_bytes(rng)
    entries = [entry(n, rng, {TT: [sp(common)]}) for n in range(10, 30)]
    entries.append(entry(1, rng, {TT: [sp(rare)]}))
    idx.add_assets(entries)
    res = idx.search_assets(_query({TT: [rare, common]}), limit=30)
    scores = {m.iscc_id: m.score for m in res.chunk_matches}
    rare_holder = scores[make_iscc_id(1)]
    common_holder = max(s for i, s in scores.items() if i != make_iscc_id(1))
    assert rare_holder > common_holder
    # freq is surfaced on the matched chunk
    by_id = {m.iscc_id: m for m in res.chunk_matches}
    assert by_id[make_iscc_id(10)].types[TT].chunks[0].freq >= 10
    assert by_id[make_iscc_id(1)].types[TT].chunks[0].freq == 1


def test_unmatched_penalty_full_vs_partial_approx(idx, rng):
    """Approx path: matching 2/2 query chunks beats matching 1/2 even when
    each matched chunk is exact (reference: unmatched_penalty)."""
    q1, q2 = sp_bytes(rng), sp_bytes(rng)
    idx.add_assets([
        entry(1, rng, {TT: [sp(q1), sp(q2, offset=100)]}),
        entry(2, rng, {TT: [sp(q1)]}),
    ])
    res = idx.search_assets(_query({TT: [q1, q2]}), limit=5)
    by_id = {m.iscc_id: m for m in res.chunk_matches}
    assert by_id[make_iscc_id(1)].score == pytest.approx(1.0)
    assert by_id[make_iscc_id(1)].score > by_id[make_iscc_id(2)].score
    t1 = by_id[make_iscc_id(1)].types[TT]
    assert (t1.matches, t1.queried) == (2, 2)
    t2 = by_id[make_iscc_id(2)].types[TT]
    assert (t2.matches, t2.queried) == (1, 2)


def test_exact_mode_minmax_quality_characterization(idx, rng, tmp_path):
    """EXACT mode scores coverage x min-max-normalized inverse frequency
    (reference lmdb_ops.py:253-301): with one rare + one common query chunk,
    even FULL coverage scores 0.5 (the common chunk's quality normalizes to
    0), which falls below the 0.75 default threshold — so this query
    returns NO exact chunk matches while the approx path ranks both assets.
    A lower per-index threshold surfaces them with the parity scores."""
    q1, q2 = sp_bytes(rng), sp_bytes(rng)
    entries = [
        entry(1, rng, {TT: [sp(q1), sp(q2, offset=100)]}),
        entry(2, rng, {TT: [sp(q1)]}),
    ]
    idx.add_assets(entries)
    assert idx.search_assets(_query({TT: [q1, q2]}), limit=5, exact=True).chunk_matches == []

    lo = TpuIndex(tmp_path / "lo", match_threshold_simprints=0.4)
    try:
        lo.add_assets(entries)
        res = lo.search_assets(_query({TT: [q1, q2]}), limit=5, exact=True)
        by_id = {m.iscc_id: m.score for m in res.chunk_matches}
        # full coverage, mixed freq: 1.0 * mean(norm_inv) = 0.5
        assert by_id[make_iscc_id(1)] == pytest.approx(0.5)
        # half coverage, uniform freq: 0.5 * 1.0 = 0.5 — a tie by design
        assert by_id[make_iscc_id(2)] == pytest.approx(0.5)
    finally:
        lo.close()


def test_best_chunk_per_query_per_asset(idx, rng):
    """When an asset holds several near-duplicates of one query chunk, the
    approx path reports ONE matched chunk for that query — the best —
    not one per stored near-dup (reference: best_score_update)."""
    base = sp_bytes(rng)
    near = _flip(base, 2, rng)  # closer
    farther = _flip(base, 30, rng)
    idx.add_assets([
        entry(1, rng, {TT: [sp(near, offset=0, size=10), sp(farther, offset=10, size=20)]}),
    ])
    res = idx.search_assets(_query({TT: [base]}), limit=5)
    assert len(res.chunk_matches) == 1
    tr = res.chunk_matches[0].types[TT]
    assert tr.queried == 1 and tr.matches == 1
    assert len(tr.chunks) == 1
    assert tr.chunks[0].offset == 0  # the nearer stored chunk won
    assert tr.chunks[0].match == ic.encode_base64(near)
    assert tr.chunks[0].query == ic.encode_base64(base)


def test_matched_chunk_wire_fields(idx, rng):
    """query/match/score/freq/offset/size land on the wire-shaped chunk
    (reference wire parity: the matched-chunk shape)."""
    b = sp_bytes(rng)
    idx.add_assets([entry(1, rng, {TT: [sp(b, offset=11, size=22)]})])
    res = idx.search_assets(_query({TT: [b]}), limit=5)
    c = res.chunk_matches[0].types[TT].chunks[0]
    assert c.query == ic.encode_base64(b)
    assert c.match == ic.encode_base64(b)
    assert c.score == pytest.approx(1.0)
    assert c.freq == 1 and c.offset == 11 and c.size == 22
    dumped = res.model_dump(mode="json", exclude_none=True)
    chunk = dumped["chunk_matches"][0]["types"][TT]["chunks"][0]
    assert set(chunk) >= {"query", "match", "score", "freq", "offset", "size"}


def test_threshold_option_filters_near_matches(tmp_path, rng):
    """match_threshold_simprints is honored as a per-index override: a
    near-dup below the raised threshold disappears from results."""
    base = sp_bytes(rng)
    near = _flip(base, 24, rng)  # ~0.81 similarity on 128 bits
    lo = TpuIndex(tmp_path / "lo", match_threshold_simprints=0.5)
    hi = TpuIndex(tmp_path / "hi", match_threshold_simprints=0.99)
    try:
        for i in (lo, hi):
            i.add_assets([entry(1, rng, {TT: [sp(near)]})])
        assert lo.search_assets(_query({TT: [base]}), limit=5).chunk_matches
        assert hi.search_assets(_query({TT: [base]}), limit=5).chunk_matches == []
    finally:
        lo.close()
        hi.close()


def test_query_without_simprints_yields_no_chunks(idx, rng):
    idx.add_assets([entry(1, rng, {TT: [sp(sp_bytes(rng))]})])
    res = idx.search_assets(IsccQuery(units=[make_unit(ic.MT.DATA, 0, 64, rng=_unit_rng)]), limit=5)
    assert res.chunk_matches == []


def test_asset_without_simprints_coexists(idx, rng):
    """Assets without simprints index alongside simprint assets; simprint
    queries only surface the latter (reference: empty_simprints_handling)."""
    b = sp_bytes(rng)
    idx.add_assets([entry(1, rng), entry(2, rng, {TT: [sp(b)]})])
    res = idx.search_assets(_query({TT: [b]}), limit=5)
    assert [m.iscc_id for m in res.chunk_matches] == [make_iscc_id(2)]


def test_no_match_far_chunks(idx, rng):
    """Far chunks (below threshold) produce no chunk matches at all
    (reference: exact_search_no_match)."""
    stored = sp_bytes(rng)
    far = bytes(255 - x for x in stored)
    idx.add_assets([entry(1, rng, {TT: [sp(stored)]})])
    for exact in (False, True):
        res = idx.search_assets(_query({TT: [far]}), limit=5, exact=exact)
        assert res.chunk_matches == []


def test_chunk_ranking_is_score_descending(idx, rng):
    """chunk_matches arrive sorted by aggregate score, capped by limit."""
    q1, q2, q3 = (sp_bytes(rng) for _ in range(3))
    idx.add_assets([
        entry(1, rng, {TT: [sp(q1), sp(q2, offset=50), sp(q3, offset=90)]}),
        entry(2, rng, {TT: [sp(q1), sp(q2, offset=10)]}),
        entry(3, rng, {TT: [sp(q1)]}),
    ])
    res = idx.search_assets(_query({TT: [q1, q2, q3]}), limit=2)
    assert [m.iscc_id for m in res.chunk_matches] == [make_iscc_id(1), make_iscc_id(2)]
    scores = [m.score for m in res.chunk_matches]
    assert scores == sorted(scores, reverse=True)


def test_iscc_id_query_self_exclusion_with_simprints(idx, rng):
    """Querying by an existing asset's iscc_id never returns that asset
    (global or chunk level), even when it carries simprints."""
    b = sp_bytes(rng)
    e = entry(1, rng, {TT: [sp(b)]})
    idx.add_assets([e, entry(2, rng, {TT: [sp(b, offset=40)]})])
    res = idx.search_assets(IsccQuery(iscc_id=e.iscc_id), limit=10)
    assert make_iscc_id(1) not in [m.iscc_id for m in res.global_matches]
    assert make_iscc_id(1) not in [m.iscc_id for m in res.chunk_matches]
