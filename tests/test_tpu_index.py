"""TpuIndex deep-behavior tests: NPHD ranking, INSTANCE prefix matching,
simprint chunk matching, idempotent no-op, update semantics, rebuild,
persistence (mirrors reference tests for the usearch backend)."""

import numpy as np
import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.indexes.tpu import TpuIndex
from iscc_search_tpu.schema import IsccEntry, IsccQuery

from tests.conftest import make_iscc_id, make_unit


def unit_from_body(mtype, stype, body):
    header = ic.encode_header(mtype, stype, ic.VS.V0, ic.encode_length(mtype, len(body) * 8))
    return "ISCC:" + ic.encode_base32(header + body)


def entry(n, units, simprints=None, metadata=None):
    e = {"iscc_id": make_iscc_id(n), "units": units}
    if simprints:
        e["simprints"] = simprints
    if metadata:
        e["metadata"] = metadata
    return IsccEntry(**e)


@pytest.fixture
def idx(tmp_path):
    i = TpuIndex(tmp_path / "idx")
    yield i
    i.close()


def _flip_bits(body, nbits, rng):
    arr = np.frombuffer(body, dtype=np.uint8).copy()
    positions = rng.choice(len(arr) * 8, size=nbits, replace=False)
    for p in positions:
        arr[p // 8] ^= 1 << (7 - p % 8)
    return arr.tobytes()


def test_nphd_ranking_near_vs_far(idx):
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
    near = _flip_bits(base, 8, rng)  # ~3% distance
    far = bytes(255 - b for b in base)  # maximal distance

    data_unit = lambda b: unit_from_body(ic.MT.DATA, 0, b)
    inst = make_unit(ic.MT.INSTANCE, 0, 64)
    idx.add_assets(
        [
            entry(1, [data_unit(base), inst]),
            entry(2, [data_unit(near), make_unit(ic.MT.INSTANCE, 0, 64)]),
            entry(3, [data_unit(far), make_unit(ic.MT.INSTANCE, 0, 64)]),
        ]
    )
    res = idx.search_assets(IsccQuery(units=[data_unit(base)]), limit=10)
    ids = [m.iscc_id for m in res.global_matches]
    assert ids[0] == make_iscc_id(1)
    # near match passes the 0.75 threshold, far does not
    assert make_iscc_id(2) in ids
    assert make_iscc_id(3) not in ids
    assert res.global_matches[0].score == pytest.approx(1.0)
    near_score = dict((m.iscc_id, m.score) for m in res.global_matches)[make_iscc_id(2)]
    assert 0.9 < near_score < 1.0


def test_instance_prefix_bidirectional(idx):
    rng = np.random.default_rng(6)
    full = rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
    inst_unit = lambda b: unit_from_body(ic.MT.INSTANCE, 0, b)
    data64 = make_unit(ic.MT.DATA, 0, 64)

    # Stored: 64-bit instance (prefix of full) and full 256-bit instance
    idx.add_assets(
        [
            entry(1, [data64, inst_unit(full[:8])]),
            entry(2, [make_unit(ic.MT.DATA, 0, 64), inst_unit(full)]),
        ]
    )
    # 256-bit query matches stored 64-bit prefix (reverse) and stored 256 (forward)
    res = idx.search_assets(IsccQuery(units=[inst_unit(full)]), limit=10)
    scores = {m.iscc_id: m.types for m in res.global_matches}
    assert scores[make_iscc_id(1)]["INSTANCE_NONE_V0"] == 1.0
    assert scores[make_iscc_id(2)]["INSTANCE_NONE_V0"] == 1.0
    # 64-bit query matches both via forward prefix scan
    res = idx.search_assets(IsccQuery(units=[inst_unit(full[:8])]), limit=10)
    assert len(res.global_matches) == 2


def test_confidence_weighted_aggregation(idx):
    # One type at 1.0 + one at 0.8 -> (1^4 + .8^4)/(1 + .8)
    rng = np.random.default_rng(7)
    base_c = rng.integers(0, 256, 8, dtype=np.uint8).tobytes()
    base_d = rng.integers(0, 256, 8, dtype=np.uint8).tobytes()
    c_unit = unit_from_body(ic.MT.CONTENT, 0, base_c)
    d_unit = unit_from_body(ic.MT.DATA, 0, base_d)
    idx.add_assets([entry(1, [c_unit, d_unit])])

    # Query with exact content unit, data unit ~13 bits flipped (score ~0.8)
    d_query = unit_from_body(ic.MT.DATA, 0, _flip_bits(base_d, 13, rng))
    res = idx.search_assets(IsccQuery(units=[c_unit, d_query]), limit=5)
    m = res.global_matches[0]
    s_c = m.types["CONTENT_TEXT_V0"]
    s_d = m.types["DATA_NONE_V0"]
    assert s_c == pytest.approx(1.0)
    assert s_d == pytest.approx(1.0 - 13 / 64)
    expected = (s_c**4 + s_d**4) / (s_c + s_d)
    assert m.score == pytest.approx(expected, abs=1e-6)


def test_below_threshold_type_excluded_from_score(idx):
    rng = np.random.default_rng(8)
    base_c = rng.integers(0, 256, 8, dtype=np.uint8).tobytes()
    base_d = rng.integers(0, 256, 8, dtype=np.uint8).tobytes()
    idx.add_assets([entry(1, [unit_from_body(ic.MT.CONTENT, 0, base_c), unit_from_body(ic.MT.DATA, 0, base_d)])])
    # Data query is far (score ~0.5, below threshold); content exact
    d_query = unit_from_body(ic.MT.DATA, 0, _flip_bits(base_d, 32, rng))
    res = idx.search_assets(IsccQuery(units=[unit_from_body(ic.MT.CONTENT, 0, base_c), d_query]), limit=5)
    m = res.global_matches[0]
    assert m.score == pytest.approx(1.0)  # only the confident content match counts
    # types still reports the raw per-type scores (including sub-threshold)
    assert m.types["DATA_NONE_V0"] < 0.75


def test_batch_dedup_keeps_last(idx, rng):

    u1 = [make_unit(ic.MT.DATA, 0, 64, rng=rng), make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)]
    u2 = [make_unit(ic.MT.DATA, 0, 64, rng=rng), make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)]
    e1 = entry(1, u1)
    e2 = IsccEntry(iscc_id=e1.iscc_id, units=u2)
    results = idx.add_assets([e1, e2])
    assert [r.status for r in results] == ["created", "updated"]
    stored = idx.get_asset(e1.iscc_id)
    assert stored.units == u2  # last occurrence wins
    # Only the last version is searchable at 1.0
    res = idx.search_assets(IsccQuery(units=[u2[0]]), limit=5)
    assert res.global_matches[0].types["DATA_NONE_V0"] == pytest.approx(1.0)


def test_update_removes_stale_vectors(idx, rng):
    u_old = make_unit(ic.MT.DATA, 0, 64, rng=rng)
    u_new = make_unit(ic.MT.DATA, 0, 64, rng=rng)
    inst_old = make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)
    inst_new = make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)
    e = entry(1, [u_old, inst_old])
    idx.add_assets([e])
    idx.add_assets([IsccEntry(iscc_id=e.iscc_id, units=[u_new, inst_new])])

    # Stale DATA vector no longer matches
    res = idx.search_assets(IsccQuery(units=[u_old]), limit=5)
    assert not any(m.types.get("DATA_NONE_V0") == 1.0 for m in res.global_matches)
    # Stale INSTANCE row removed
    res = idx.search_assets(IsccQuery(units=[inst_old]), limit=5)
    assert res.global_matches == []
    res = idx.search_assets(IsccQuery(units=[inst_new]), limit=5)
    assert len(res.global_matches) == 1


def test_idempotent_noop_fast_path(idx, rng):
    sp = {
        "CONTENT_TEXT_V0": [
            {"simprint": ic.encode_base64(bytes(range(16))), "offset": 0, "size": 100},
        ]
    }
    e = entry(1, [make_unit(ic.MT.DATA, 0, 64, rng=rng), make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)], simprints=sp)
    idx.add_assets([e])
    nphd = idx._nphd_indexes["DATA_NONE_V0"]
    rows_before = nphd._rows
    # Re-adding identical asset must not append new rows (no-op gate)
    results = idx.add_assets([e])
    assert results[0].status == "updated"
    assert nphd._rows == rows_before
    assert idx._simprint_indexes["CONTENT_TEXT_V0"].size == 1


def test_simprint_chunk_matching(idx, rng):
    rnd = np.random.default_rng(9)
    sps = [rnd.integers(0, 256, 16, dtype=np.uint8).tobytes() for _ in range(6)]
    e1 = entry(
        1,
        [make_unit(ic.MT.DATA, 0, 64, rng=rng), make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)],
        simprints={
            "CONTENT_TEXT_V0": [
                {"simprint": ic.encode_base64(sps[0]), "offset": 0, "size": 50},
                {"simprint": ic.encode_base64(sps[1]), "offset": 50, "size": 60},
            ]
        },
    )
    e2 = entry(
        2,
        [make_unit(ic.MT.DATA, 0, 64, rng=rng), make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)],
        simprints={
            "CONTENT_TEXT_V0": [
                {"simprint": ic.encode_base64(sps[2]), "offset": 0, "size": 70},
            ]
        },
    )
    idx.add_assets([e1, e2])

    # Query with e1's simprints: e1 should be the top chunk match
    q = IsccQuery(simprints={"CONTENT_TEXT_V0": [ic.encode_base64(sps[0]), ic.encode_base64(sps[1])]})
    res = idx.search_assets(q, limit=10)
    assert res.chunk_matches
    top = res.chunk_matches[0]
    assert top.iscc_id == make_iscc_id(1)
    assert top.score == pytest.approx(1.0)
    tr = top.types["CONTENT_TEXT_V0"]
    assert tr.matches == 2 and tr.queried == 2
    assert len(tr.chunks) == 2
    offsets = sorted(c.offset for c in tr.chunks)
    assert offsets == [0, 50]


def test_simprint_exact_search(idx, rng):
    rnd = np.random.default_rng(10)
    sp_bytes = rnd.integers(0, 256, 16, dtype=np.uint8).tobytes()
    e = entry(
        1,
        [make_unit(ic.MT.DATA, 0, 64, rng=rng), make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)],
        simprints={"CONTENT_TEXT_V0": [{"simprint": ic.encode_base64(sp_bytes), "offset": 5, "size": 10}]},
    )
    idx.add_assets([e])
    q = IsccQuery(simprints={"CONTENT_TEXT_V0": [ic.encode_base64(sp_bytes)]})
    res = idx.search_assets(q, limit=10, exact=True)
    assert res.chunk_matches[0].iscc_id == make_iscc_id(1)
    chunk = res.chunk_matches[0].types["CONTENT_TEXT_V0"].chunks[0]
    assert chunk.offset == 5 and chunk.size == 10 and chunk.score == 1.0


def test_simprint_update_replaces_chunks(idx, rng):
    rnd = np.random.default_rng(12)
    sp1 = rnd.integers(0, 256, 16, dtype=np.uint8).tobytes()
    sp2 = rnd.integers(0, 256, 16, dtype=np.uint8).tobytes()
    units = [make_unit(ic.MT.DATA, 0, 64, rng=rng), make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)]
    e = entry(1, units, simprints={"CONTENT_TEXT_V0": [{"simprint": ic.encode_base64(sp1), "offset": 0, "size": 9}]})
    idx.add_assets([e])
    e_upd = IsccEntry(
        iscc_id=e.iscc_id,
        units=units,
        simprints={"CONTENT_TEXT_V0": [{"simprint": ic.encode_base64(sp2), "offset": 1, "size": 8}]},
    )
    idx.add_assets([e_upd])
    assert idx._simprint_indexes["CONTENT_TEXT_V0"].size == 1
    res = idx.search_assets(IsccQuery(simprints={"CONTENT_TEXT_V0": [ic.encode_base64(sp1)]}), limit=5, exact=True)
    assert res.chunk_matches == []
    res = idx.search_assets(IsccQuery(simprints={"CONTENT_TEXT_V0": [ic.encode_base64(sp2)]}), limit=5, exact=True)
    assert len(res.chunk_matches) == 1


def test_persistence_across_reopen(tmp_path, rng):
    path = tmp_path / "idx"
    i1 = TpuIndex(path)
    units = [make_unit(ic.MT.CONTENT, 0, 64, rng=rng), make_unit(ic.MT.DATA, 0, 64, rng=rng),
             make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)]
    e = entry(1, units, metadata={"name": "persisted"})
    i1.add_assets([e])
    i1.close()

    i2 = TpuIndex(path)
    assert len(i2) == 1
    fetched = i2.get_asset(e.iscc_id)
    assert fetched.metadata == {"name": "persisted"}
    res = i2.search_assets(IsccQuery(units=units), limit=5)
    assert res.global_matches[0].iscc_id == e.iscc_id
    assert res.global_matches[0].score == pytest.approx(1.0)
    i2.close()


def test_rebuild_from_store(tmp_path, rng):
    import shutil

    path = tmp_path / "idx"
    i1 = TpuIndex(path)
    rnd = np.random.default_rng(13)
    sp_bytes = rnd.integers(0, 256, 16, dtype=np.uint8).tobytes()
    units = [make_unit(ic.MT.DATA, 0, 64, rng=rng), make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)]
    e = entry(
        1, units, simprints={"CONTENT_TEXT_V0": [{"simprint": ic.encode_base64(sp_bytes), "offset": 0, "size": 4}]}
    )
    i1.add_assets([e])
    i1.close()

    # Destroy derived state, reopen, rebuild from source of truth
    shutil.rmtree(path / "DATA_NONE_V0")
    shutil.rmtree(path / "SIMPRINT_CONTENT_TEXT_V0")
    i2 = TpuIndex(path)
    assert i2.tracked_unit_types == ["DATA_NONE_V0"]
    assert i2.tracked_simprint_types == ["CONTENT_TEXT_V0"]
    result = i2.rebuild(i2.tracked_unit_types, i2.tracked_simprint_types)
    assert result == {"unit_types": ["DATA_NONE_V0"], "simprint_types": ["CONTENT_TEXT_V0"]}
    res = i2.search_assets(IsccQuery(units=[units[0]]), limit=5)
    assert res.global_matches[0].iscc_id == e.iscc_id
    res = i2.search_assets(IsccQuery(simprints={"CONTENT_TEXT_V0": [ic.encode_base64(sp_bytes)]}), limit=5)
    assert res.chunk_matches[0].iscc_id == e.iscc_id
    i2.close()


def test_rebuild_simprints_many_with_dup_pointer(tmp_path, rng):
    """The vectorized bulk rebuild reproduces a multi-asset simprint index
    exactly — including the degenerate duplicate chunk pointer (one asset
    submitting two simprints for the same offset+size), which dedups
    keep-first in forward-db iteration order like the streamed rebuild did."""
    import shutil

    path = tmp_path / "idx"
    i1 = TpuIndex(path)
    rnd = np.random.default_rng(23)
    sps = [rnd.integers(0, 256, 16, dtype=np.uint8).tobytes() for _ in range(40)]
    entries = []
    for a in range(10):
        chunk_sps = [
            {"simprint": ic.encode_base64(sps[a * 4 + c]), "offset": c * 10, "size": 10} for c in range(4)
        ]
        units = [make_unit(ic.MT.DATA, 0, 64, rng=rng), make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)]
        entries.append(entry(a + 1, units, simprints={"CONTENT_TEXT_V0": chunk_sps}))
    # Degenerate: asset 11 claims TWO different simprints at the same
    # offset+size (same composite key, two forward rows).
    dup_a, dup_b = (rnd.integers(0, 256, 16, dtype=np.uint8).tobytes() for _ in range(2))
    entries.append(
        entry(
            11,
            [make_unit(ic.MT.DATA, 0, 64, rng=rng), make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)],
            simprints={
                "CONTENT_TEXT_V0": [
                    {"simprint": ic.encode_base64(dup_a), "offset": 0, "size": 10},
                    {"simprint": ic.encode_base64(dup_b), "offset": 0, "size": 10},
                ]
            },
        )
    )
    i1.add_assets(entries)
    live_size = i1._simprint_indexes["CONTENT_TEXT_V0"].size
    live = i1.search_assets(IsccQuery(simprints={"CONTENT_TEXT_V0": [ic.encode_base64(sps[9])]}), limit=5)
    i1.close()

    shutil.rmtree(path / "SIMPRINT_CONTENT_TEXT_V0")
    i2 = TpuIndex(path)
    assert i2.rebuild([], ["CONTENT_TEXT_V0"]) == {"unit_types": [], "simprint_types": ["CONTENT_TEXT_V0"]}
    rebuilt = i2._simprint_indexes["CONTENT_TEXT_V0"]
    # Both forward rows exist in the store; the engine holds ONE row for the
    # duplicate pointer (41 live rows), before and after rebuild.
    assert rebuilt.size == live_size == 41
    res = i2.search_assets(IsccQuery(simprints={"CONTENT_TEXT_V0": [ic.encode_base64(sps[9])]}), limit=5)
    assert [m.iscc_id for m in res.chunk_matches] == [m.iscc_id for m in live.chunk_matches]
    assert res.chunk_matches[0].score == pytest.approx(live.chunk_matches[0].score)
    # The sp_bytes-sorted-first simprint is the one the rebuilt engine serves.
    first_sorted = min(dup_a, dup_b)
    res_dup = i2.search_assets(
        IsccQuery(simprints={"CONTENT_TEXT_V0": [ic.encode_base64(first_sorted)]}), limit=5
    )
    assert res_dup.chunk_matches and res_dup.chunk_matches[0].score == pytest.approx(1.0)
    i2.close()


def test_metadata_enrichment_in_matches(idx, rng):
    units = [make_unit(ic.MT.DATA, 0, 64, rng=rng), make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)]
    e = entry(1, units, metadata={"name": "My Asset", "source": "https://example.com/a.txt"})
    idx.add_assets([e])
    res = idx.search_assets(IsccQuery(units=units), limit=5)
    md = res.global_matches[0].metadata
    assert md.name == "My Asset"


def test_derived_sizes_reported(idx, rng):
    units = [make_unit(ic.MT.DATA, 0, 64, rng=rng), make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)]
    idx.add_assets([entry(1, units)])
    sizes = idx.derived_sizes
    assert "DATA_NONE_V0" in sizes


def test_empty_add(idx):
    assert idx.add_assets([]) == []


def test_simprint_near_match_soft_boundary(idx, rng):
    """The scan path matches SIMILAR simprints (hamming within threshold),
    not just exact collisions — soft-boundary semantics."""
    rnd = np.random.default_rng(14)
    sp = rnd.integers(0, 256, 16, dtype=np.uint8).tobytes()
    e = entry(
        1,
        [make_unit(ic.MT.DATA, 0, 64, rng=rng), make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)],
        simprints={"CONTENT_TEXT_V0": [{"simprint": ic.encode_base64(sp), "offset": 0, "size": 10}]},
    )
    idx.add_assets([e])
    # Flip 8 of 128 bits -> similarity ~0.9375 (above the 0.75 threshold)
    noisy = bytearray(sp)
    for b in range(8):
        noisy[b] ^= 1
    q = IsccQuery(simprints={"CONTENT_TEXT_V0": [ic.encode_base64(bytes(noisy))]})
    res = idx.search_assets(q, limit=5)
    assert res.chunk_matches
    chunk = res.chunk_matches[0].types["CONTENT_TEXT_V0"].chunks[0]
    assert chunk.score == pytest.approx(1.0 - 8 / 128, abs=1e-3)
    assert chunk.match == ic.encode_base64(sp)  # stored simprint returned
    assert chunk.query == ic.encode_base64(bytes(noisy))
    # The exact (hard-boundary) path does NOT match the noisy query
    res_exact = idx.search_assets(q, limit=5, exact=True)
    assert res_exact.chunk_matches == []


def test_instance_cut_points_reference_parity(idx):
    """KATs pinning _search_instance_unit's reverse-cut semantics to the
    reference usearch backend (reference indexes/usearch/index.py:1989-2020):
    a 256-bit query probes the 128- and 64-bit cuts; a 128-bit query probes
    only the 64-bit cut; and NO query probes a 192-bit (24-byte) cut — the
    reference's INSTANCE model is 64/128/256-bit, so a 24-byte stored code is
    reachable only through forward matching from a <= 24-byte query."""
    rng = np.random.default_rng(16)
    full = rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
    inst = lambda b: unit_from_body(ic.MT.INSTANCE, 0, b)
    data64 = make_unit(ic.MT.DATA, 0, 64)

    idx.add_assets(
        [
            entry(1, [data64, inst(full[:8])]),   # 64-bit stored
            entry(2, [data64, inst(full[:16])]),  # 128-bit stored
            entry(3, [data64, inst(full[:24])]),  # 192-bit stored
            entry(4, [data64, inst(full)]),       # 256-bit stored
        ]
    )

    def hits(query_body):
        res = idx.search_assets(IsccQuery(units=[inst(query_body)]), limit=10)
        return {m.iscc_id for m in res.global_matches}

    # 256-bit query: forward finds 256; reverse cuts find 128 and 64 — the
    # 192-bit stored code is NOT probed (reference parity, no 24-byte cut).
    assert hits(full) == {make_iscc_id(1), make_iscc_id(2), make_iscc_id(4)}
    # 192-bit query: forward finds 192 and 256 (extensions); the only reverse
    # cut is 64-bit (qlen != 32 -> no 128-bit cut), so 128-bit stored is NOT
    # probed — byte-for-byte the reference's behavior.
    assert hits(full[:24]) == {make_iscc_id(1), make_iscc_id(3), make_iscc_id(4)}
    # 128-bit query: forward finds 128/192/256; reverse cut 8 finds 64.
    assert hits(full[:16]) == {make_iscc_id(i) for i in (1, 2, 3, 4)}
    # 64-bit query: forward finds everything sharing the prefix.
    assert hits(full[:8]) == {make_iscc_id(i) for i in (1, 2, 3, 4)}
