"""Pure simprint ops: chunk pointers, IDF, coverage x quality, exact search."""

import math

import pytest

from iscc_search_tpu.engine import simprint_ops as ops
from iscc_search_tpu.store import HostStore


def test_pack_unpack_chunk_pointer():
    body = bytes(range(8))
    ptr = ops.pack_chunk_pointer(body, 123, 456)
    assert len(ptr) == 16
    assert ops.unpack_chunk_pointer(ptr) == (body, 123, 456)


def test_pack_chunk_pointer_validation():
    with pytest.raises(ValueError):
        ops.pack_chunk_pointer(b"short", 0, 0)
    with pytest.raises(ValueError):
        ops.pack_chunk_pointer(bytes(8), 2**32, 0)
    with pytest.raises(ValueError):
        ops.pack_chunk_pointer(bytes(8), 0, 2**32)
    with pytest.raises(ValueError):
        ops.unpack_chunk_pointer(bytes(10))


def test_calculate_idf():
    assert ops.calculate_idf(1, 0) == 0.0
    assert ops.calculate_idf(0, 100) == pytest.approx(math.log(101))
    assert ops.calculate_idf(9, 100) == pytest.approx(math.log(11))
    # Rarer simprints weigh more
    assert ops.calculate_idf(1, 1000) > ops.calculate_idf(100, 1000)


def test_coverage_quality_scoring():
    # Single match: coverage 1/queried, quality 1.0
    m = [(b"a", b"a", 0, 10)]
    assert ops.coverage_quality_score(m, {b"a": 5}, 1) == 1.0
    assert ops.coverage_quality_score(m, {b"a": 5}, 2) == 0.5
    # Uniform frequencies: quality 1.0
    m2 = [(b"a", b"a", 0, 1), (b"b", b"b", 1, 1)]
    assert ops.coverage_quality_score(m2, {b"a": 3, b"b": 3}, 2) == 1.0
    # Mixed frequencies: min-max normalized inverse freq mean
    m3 = [(b"a", b"a", 0, 1), (b"b", b"b", 1, 1)]
    score = ops.coverage_quality_score(m3, {b"a": 1, b"b": 10}, 2)
    # inverse freqs 1.0 and 0.1 -> normalized 1.0 and 0.0 -> mean 0.5
    assert score == pytest.approx(0.5)
    assert ops.coverage_quality_score([], {}, 1) == 0.0


def test_coverage_quality_best_freq_per_query():
    # Same query simprint matched twice: keep the rarer (lower) frequency
    m = [(b"a", b"x", 0, 1), (b"a", b"y", 1, 1)]
    s = ops.coverage_quality_score(m, {b"x": 10, b"y": 2}, 1)
    assert s == 1.0  # single query fully covered, single freq -> quality 1.0


@pytest.fixture
def store(tmp_path):
    s = HostStore(tmp_path / "s")
    yield s
    s.close()


def fill_store(store, db="sp"):
    # asset A holds simprints s1, s2; asset B holds s1, s3
    a, b = bytes([1]) * 8, bytes([2]) * 8
    s1, s2, s3 = b"\x10" * 16, b"\x20" * 16, b"\x30" * 16
    store.dup_put(db, s1, ops.pack_chunk_pointer(a, 0, 10))
    store.dup_put(db, s2, ops.pack_chunk_pointer(a, 10, 20))
    store.dup_put(db, s1, ops.pack_chunk_pointer(b, 5, 15))
    store.dup_put(db, s3, ops.pack_chunk_pointer(b, 25, 35))
    return a, b, s1, s2, s3


def test_count_doc_freq(store):
    a, b, s1, s2, s3 = fill_store(store)
    assert ops.count_doc_freq(store, "sp", s1) == 2
    assert ops.count_doc_freq(store, "sp", s2) == 1
    # Unknown simprints floor at 1: a zero would fail the wire schema's
    # freq >= 1 when a concurrent update deletes rows mid-search.
    assert ops.count_doc_freq(store, "sp", b"\xff" * 16) == 1


def test_read_and_delete_asset_simprints(store):
    a, b, s1, s2, s3 = fill_store(store)
    triples = ops.read_asset_simprints(store, "sp", a)
    assert triples == {(s1, 0, 10), (s2, 10, 20)}
    deleted = ops.delete_asset_simprints(store, "sp", a)
    assert len(deleted) == 2
    assert ops.read_asset_simprints(store, "sp", a) == set()
    # B untouched
    assert ops.read_asset_simprints(store, "sp", b) == {(s1, 5, 15), (s3, 25, 35)}


def test_search_simprints_exact(store):
    a, b, s1, s2, s3 = fill_store(store)
    results = ops.search_simprints_exact(
        store, "sp", [s1, s2], limit=10, threshold=0.0, detailed=True
    )
    # A covers 2/2 but its freq spread halves quality (coverage 1.0 x quality
    # 0.5); B covers 1/2 with uniform quality (0.5 x 1.0) — a formula-level
    # tie, broken by ascending asset id (reference lmdb_ops.py:249 semantics).
    assert [r.iscc_id_body for r in results] == [a, b]
    assert results[0].matches == 2 and results[0].queried == 2
    assert results[0].score == pytest.approx(results[1].score)
    chunk = results[0].chunks[0]
    assert chunk.score == 1.0
    assert chunk.freq >= 1


def test_search_simprints_exact_threshold(store):
    a, b, s1, s2, s3 = fill_store(store)
    results = ops.search_simprints_exact(
        store, "sp", [s2], limit=10, threshold=0.9, detailed=False
    )
    assert [r.iscc_id_body for r in results] == [a]
    assert results[0].chunks is None


def test_search_simprints_exact_empty(store):
    assert ops.search_simprints_exact(store, "sp", [], 10, 0.0, False) == []
    assert ops.search_simprints_exact(store, "sp", [b"\x99" * 16], 10, 0.0, False) == []


def test_iter_simprint_vectors(store):
    fill_store(store)
    batches = list(ops.iter_simprint_vectors(store, "sp", batch_size=3))
    total = sum(len(k) for k, _ in batches)
    assert total == 4
    for keys, vectors in batches:
        assert len(keys) == len(vectors)
        for key, vec in zip(keys, vectors):
            assert len(key) == 16
            assert len(vec) == 16
