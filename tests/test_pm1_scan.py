"""±1 matmul scan: exact equivalence with the XOR+popcount NPHD reference ops."""

import numpy as np
import pytest

import jax.numpy as jnp

from iscc_search_tpu.ops import pack_codes, nphd_scores
from iscc_search_tpu.ops.nphd import NEG_SCORE
from iscc_search_tpu.ops.pm1_scan import pm1_topk, prepare_queries, unpack_pm1, unpack_pm1_np


@pytest.fixture
def rng():
    return np.random.default_rng(31)


def test_unpack_pm1_matches_numpy(rng):
    packed = rng.integers(0, 2**32, (16, 8), dtype=np.uint32)
    dev = np.asarray(unpack_pm1(jnp.asarray(packed), 256, jnp.float32))
    host = unpack_pm1_np(packed, 256)
    assert np.array_equal(dev, host)
    # Bit order: MSB of lane 0 is column 0
    one = np.zeros((1, 8), np.uint32)
    one[0, 0] = 0x80000000
    out = unpack_pm1_np(one, 256)
    assert out[0, 0] == 1.0 and np.all(out[0, 1:] == -1.0)


def test_pm1_identity_vs_nphd_fixed_width(rng):
    n, q_n, k, chunk = 256, 8, 10, 64
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    lanes = np.full(n, 8, np.int32)
    valid = np.ones(n, bool)
    q_packed, q_lanes = packed[:q_n], lanes[:q_n]

    q_pm1, q_scale = prepare_queries(q_packed, q_lanes, 256)
    scores, idx = pm1_topk(
        jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed), jnp.asarray(valid), k, 256, chunk_size=chunk
    )
    scores, idx = np.asarray(scores), np.asarray(idx)

    ref = np.array(nphd_scores(jnp.asarray(q_packed), jnp.asarray(q_lanes), jnp.asarray(packed), jnp.asarray(lanes)))
    for qi in range(q_n):
        expected = np.sort(ref[qi])[::-1][:k]
        assert np.allclose(np.sort(scores[qi])[::-1], expected, atol=2e-3)
        assert idx[qi, 0] == qi  # self match
        assert scores[qi, 0] == pytest.approx(1.0, abs=1e-3)


def test_pm1_variable_length_queries(rng):
    # 64-bit query against a 256-bit partition: min_bits = 64
    n, chunk = 128, 64
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    q_packed = packed[:2].copy()
    q_packed[:, 2:] = 0  # queries are 64-bit codes
    q_lanes = np.full(2, 2, np.int32)

    q_pm1, q_scale = prepare_queries(q_packed, q_lanes, 256)
    assert np.all(q_pm1[:, 64:] == 0)
    assert q_scale[0] == pytest.approx(1 / 128)
    scores, idx = pm1_topk(
        jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed), jnp.asarray(valid), 5, 256, chunk_size=chunk
    )
    scores, idx = np.asarray(scores), np.asarray(idx)
    # Prefix matches the stored full-length code at exactly 1.0
    assert idx[0, 0] == 0 and scores[0, 0] == pytest.approx(1.0, abs=1e-3)

    # Cross-check all scores against reference NPHD with variable lengths
    db_lanes = np.full(n, 8, np.int32)
    ref = np.array(nphd_scores(jnp.asarray(q_packed), jnp.asarray(q_lanes), jnp.asarray(packed), jnp.asarray(db_lanes)))
    for qi in range(2):
        for r in range(5):
            assert ref[qi, idx[qi, r]] == pytest.approx(scores[qi, r], abs=2e-3)


def test_pm1_short_partition(rng):
    # 64-bit partition: db codes have 2 lanes; 256-bit query truncates to 64
    n, chunk = 64, 64
    packed = np.zeros((n, 2), np.uint32)
    packed[:, :2] = rng.integers(0, 2**32, (n, 2), dtype=np.uint32)
    valid = np.ones(n, bool)
    q_packed = np.zeros((1, 8), np.uint32)
    q_packed[0, :2] = packed[5, :2]
    q_packed[0, 2:] = rng.integers(0, 2**32, 6, dtype=np.uint32)
    q_lanes = np.array([8], np.int32)

    q_pm1, q_scale = prepare_queries(q_packed, q_lanes, 64)
    assert q_pm1.shape == (1, 64)
    scores, idx = pm1_topk(
        jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed), jnp.asarray(valid), 3, 64, chunk_size=chunk
    )
    assert np.asarray(idx)[0, 0] == 5
    assert np.asarray(scores)[0, 0] == pytest.approx(1.0, abs=1e-3)


def test_pm1_tombstones(rng):
    n, chunk = 64, 64
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    valid[7] = False
    q_pm1, q_scale = prepare_queries(packed[7:8], np.array([8], np.int32), 256)
    scores, idx = pm1_topk(
        jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed), jnp.asarray(valid), 5, 256, chunk_size=chunk
    )
    assert 7 not in np.asarray(idx)[0]


def test_pm1_hamming_simprints(rng):
    # Fixed-width 128-bit hamming: same op, min_bits = 128 for all queries
    n, chunk = 64, 64
    packed = np.zeros((n, 4), np.uint32)
    packed[:] = rng.integers(0, 2**32, (n, 4), dtype=np.uint32)
    valid = np.ones(n, bool)
    q_pm1, q_scale = prepare_queries(packed[:2], np.full(2, 4, np.int32), 128)
    scores, idx = pm1_topk(
        jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed), jnp.asarray(valid), 3, 128, chunk_size=chunk
    )
    assert np.asarray(idx)[0, 0] == 0
    assert np.asarray(scores)[1, 0] == pytest.approx(1.0, abs=1e-3)
