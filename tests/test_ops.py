"""Ops contract tests vs numpy brute force (the kernel contract layer —
mirrors the role of the reference's usearch characterization tests,
tests/test_usearch_*.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from iscc_search_tpu.ops import pack_codes, unpack_code, nphd_scores, hamming_scores, topk_scan
from iscc_search_tpu.ops.nphd import NEG_SCORE


def np_popcount_bytes(a, b):
    x = np.bitwise_xor(np.frombuffer(a, dtype=np.uint8), np.frombuffer(b, dtype=np.uint8))
    return int(np.unpackbits(x).sum())


def np_nphd_score(qb, db):
    nbytes = min(len(qb), len(db))
    ham = np_popcount_bytes(qb[:nbytes], db[:nbytes])
    return 1.0 - ham / (nbytes * 8)


@pytest.fixture
def random_bodies():
    rng = np.random.default_rng(7)

    def make(n, choices=(8, 16, 24, 32)):
        out = []
        for _ in range(n):
            nb = int(rng.choice(choices))
            out.append(rng.integers(0, 256, nb, dtype=np.uint8).tobytes())
        return out

    return make


def test_pack_unpack_roundtrip(random_bodies):
    bodies = random_bodies(50)
    codes, nlanes = pack_codes(bodies)
    assert codes.shape == (50, 8)
    for i, body in enumerate(bodies):
        assert unpack_code(codes[i], int(nlanes[i])) == body


def test_pack_rejects_bad_length():
    with pytest.raises(ValueError):
        pack_codes([b"abc"])  # not multiple of 4
    with pytest.raises(ValueError):
        pack_codes([b""])
    with pytest.raises(ValueError):
        pack_codes([bytes(40)])  # > 256 bits


def test_pack_prefix_property(random_bodies):
    # lane-prefix equality == byte-prefix equality
    body = random_bodies(1, choices=(32,))[0]
    full, _ = pack_codes([body])
    half, nl = pack_codes([body[:16]])
    assert nl[0] == 4
    assert np.array_equal(full[0, :4], half[0, :4])


def test_nphd_scores_match_numpy(random_bodies):
    q_bodies = random_bodies(5)
    db_bodies = random_bodies(40)
    qc, ql = pack_codes(q_bodies)
    dc, dl = pack_codes(db_bodies)
    scores = np.asarray(nphd_scores(jnp.asarray(qc), jnp.asarray(ql), jnp.asarray(dc), jnp.asarray(dl)))
    for i, qb in enumerate(q_bodies):
        for j, db in enumerate(db_bodies):
            assert scores[i, j] == pytest.approx(np_nphd_score(qb, db), abs=1e-6)


def test_nphd_identical_scores_one(random_bodies):
    bodies = random_bodies(10)
    c, l = pack_codes(bodies)
    scores = np.asarray(nphd_scores(jnp.asarray(c), jnp.asarray(l), jnp.asarray(c), jnp.asarray(l)))
    assert np.allclose(np.diag(scores), 1.0)


def test_nphd_prefix_match_scores_one(random_bodies):
    # A 64-bit query matching the prefix of a stored 256-bit code scores 1.0
    body = random_bodies(1, choices=(32,))[0]
    qc, ql = pack_codes([body[:8]])
    dc, dl = pack_codes([body])
    s = np.asarray(nphd_scores(jnp.asarray(qc), jnp.asarray(ql), jnp.asarray(dc), jnp.asarray(dl)))
    assert s[0, 0] == pytest.approx(1.0)


def test_nphd_invalid_rows(random_bodies):
    bodies = random_bodies(4)
    c, l = pack_codes(bodies)
    valid = jnp.asarray([True, False, True, False])
    s = np.asarray(nphd_scores(jnp.asarray(c[:1]), jnp.asarray(l[:1]), jnp.asarray(c), jnp.asarray(l), valid))
    assert s[0, 1] == NEG_SCORE
    assert s[0, 3] == NEG_SCORE
    assert s[0, 0] == pytest.approx(1.0)


def test_hamming_scores_match_numpy(random_bodies):
    q_bodies = random_bodies(3, choices=(16,))
    db_bodies = random_bodies(20, choices=(16,))
    qc, _ = pack_codes(q_bodies)
    dc, _ = pack_codes(db_bodies)
    scores = np.asarray(hamming_scores(jnp.asarray(qc), jnp.asarray(dc), 128))
    for i, qb in enumerate(q_bodies):
        for j, db in enumerate(db_bodies):
            expected = 1.0 - np_popcount_bytes(qb, db) / 128
            assert scores[i, j] == pytest.approx(expected, abs=1e-6)


def test_topk_scan_exact(random_bodies):
    rng = np.random.default_rng(3)
    n, chunk, k = 512, 128, 10
    db_bodies = random_bodies(n)
    q_bodies = random_bodies(4)
    dc, dl = pack_codes(db_bodies)
    qc, ql = pack_codes(q_bodies)
    valid = np.ones(n, dtype=bool)
    valid[rng.integers(0, n, 20)] = False

    scores, idx = topk_scan(
        jnp.asarray(qc), jnp.asarray(ql), jnp.asarray(dc), jnp.asarray(dl), jnp.asarray(valid), k, chunk_size=chunk
    )
    scores, idx = np.asarray(scores), np.asarray(idx)

    # Brute force expected
    full = np.array(nphd_scores(jnp.asarray(qc), jnp.asarray(ql), jnp.asarray(dc), jnp.asarray(dl)))
    full[:, ~valid] = NEG_SCORE
    for qi in range(4):
        expected = np.sort(full[qi])[::-1][:k]
        assert np.allclose(np.sort(scores[qi])[::-1], expected, atol=1e-6)
        # Indices actually produce those scores
        for r in range(k):
            if idx[qi, r] >= 0:
                assert full[qi, idx[qi, r]] == pytest.approx(scores[qi, r], abs=1e-6)
    # Sorted descending
    assert np.all(np.diff(scores, axis=1) <= 1e-6)


def test_topk_scan_fewer_valid_than_k(random_bodies):
    db_bodies = random_bodies(128)
    dc, dl = pack_codes(db_bodies)
    valid = np.zeros(128, dtype=bool)
    valid[:3] = True
    qc, ql = pack_codes(db_bodies[:1])
    scores, idx = topk_scan(
        jnp.asarray(qc), jnp.asarray(ql), jnp.asarray(dc), jnp.asarray(dl), jnp.asarray(valid), 10, chunk_size=64
    )
    idx = np.asarray(idx)
    assert (idx[0] >= 0).sum() == 3
    assert set(idx[0][idx[0] >= 0]) == {0, 1, 2}


def test_topk_scan_hamming_metric(random_bodies):
    db_bodies = random_bodies(64, choices=(16,))
    dc, dl = pack_codes(db_bodies)
    qc, ql = pack_codes([db_bodies[7]])
    valid = jnp.ones(64, dtype=bool)
    scores, idx = topk_scan(
        jnp.asarray(qc), jnp.asarray(ql), jnp.asarray(dc), jnp.asarray(dl), valid, 5,
        chunk_size=64, metric="hamming", ndim_bits=128,
    )
    assert int(np.asarray(idx)[0, 0]) == 7
    assert float(np.asarray(scores)[0, 0]) == pytest.approx(1.0)


def test_topk_scan_validation(random_bodies):
    db_bodies = random_bodies(64)
    dc, dl = pack_codes(db_bodies)
    qc, ql = pack_codes(db_bodies[:1])
    valid = jnp.ones(64, dtype=bool)
    with pytest.raises(ValueError):
        topk_scan(jnp.asarray(qc), jnp.asarray(ql), jnp.asarray(dc), jnp.asarray(dl), valid, 5, chunk_size=60)
    with pytest.raises(ValueError):
        topk_scan(jnp.asarray(qc), jnp.asarray(ql), jnp.asarray(dc), jnp.asarray(dl), valid, 128, chunk_size=64)
