"""Sharded ±1 matmul scan on the 8-device virtual mesh vs brute force."""

import numpy as np
import pytest

import jax.numpy as jnp

from iscc_search_tpu.ops import nphd_scores, pack_codes
from iscc_search_tpu.ops.nphd import NEG_SCORE
from iscc_search_tpu.ops.pm1_scan import prepare_queries
from iscc_search_tpu.parallel import make_mesh
from iscc_search_tpu.parallel.pm1_sharded import shard_pm1_database, sharded_pm1_topk


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_sharded_pm1_matches_brute_force(mesh):
    rng = np.random.default_rng(41)
    n, chunk, k = 8 * 256, 128, 8
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    lanes = np.full(n, 8, np.int32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 40)] = False
    q_packed, q_lanes = packed[:4], lanes[:4]

    q_pm1, q_scale = prepare_queries(q_packed, q_lanes, 256)
    db_s, valid_s = shard_pm1_database(mesh, jnp.asarray(packed), jnp.asarray(valid))
    scores, idx = sharded_pm1_topk(
        mesh, jnp.asarray(q_pm1), jnp.asarray(q_scale), db_s, valid_s, k, 256, chunk_size=chunk
    )
    scores, idx = np.asarray(scores), np.asarray(idx)

    ref = np.array(nphd_scores(jnp.asarray(q_packed), jnp.asarray(q_lanes), jnp.asarray(packed), jnp.asarray(lanes)))
    ref[:, ~valid] = NEG_SCORE
    for qi in range(4):
        expected = np.sort(ref[qi])[::-1][:k]
        assert np.allclose(np.sort(scores[qi])[::-1], expected, atol=2e-3)
        for r in range(k):
            if idx[qi, r] >= 0:
                assert ref[qi, idx[qi, r]] == pytest.approx(scores[qi, r], abs=2e-3)


def test_sharded_pm1_variable_length(mesh):
    rng = np.random.default_rng(42)
    n, chunk = 8 * 128, 128
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    # 64-bit query = prefix of stored row 100
    q_packed = np.zeros((1, 8), np.uint32)
    q_packed[0, :2] = packed[100, :2]
    q_pm1, q_scale = prepare_queries(q_packed, np.array([2], np.int32), 256)
    db_s, valid_s = shard_pm1_database(mesh, jnp.asarray(packed), jnp.asarray(valid))
    scores, idx = sharded_pm1_topk(mesh, jnp.asarray(q_pm1), jnp.asarray(q_scale), db_s, valid_s, 3, 256, chunk_size=chunk)
    assert np.asarray(idx)[0, 0] == 100
    assert np.asarray(scores)[0, 0] == pytest.approx(1.0, abs=1e-3)


def test_sharded_pm1_blockmax_path(mesh):
    """Exact sharded scan at a size where the block-max branch engages
    (blocks per shard >= k, so no tiny-db fallback)."""
    rng = np.random.default_rng(43)
    n, chunk, k = 8 * 2048, 512, 4
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    lanes = np.full(n, 8, np.int32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 200)] = False
    # Plant near-ties spread across shards
    base = packed[17].copy()
    plant = rng.choice(n, 12, replace=False)
    packed[plant] = base
    q_packed = np.stack([base, packed[5000]])
    q_pm1, q_scale = prepare_queries(q_packed, np.full(2, 8, np.int32), 256)
    db_s, valid_s = shard_pm1_database(mesh, jnp.asarray(packed), jnp.asarray(valid))
    scores, idx = sharded_pm1_topk(
        mesh, jnp.asarray(q_pm1), jnp.asarray(q_scale), db_s, valid_s, k, 256, chunk_size=chunk
    )
    scores, idx = np.asarray(scores), np.asarray(idx)
    ref = np.array(nphd_scores(jnp.asarray(q_packed), jnp.asarray(np.full(2, 8, np.int32)),
                               jnp.asarray(packed), jnp.asarray(lanes)))
    ref[:, ~valid] = NEG_SCORE
    for qi in range(2):
        expected = np.sort(ref[qi])[::-1][:k]
        assert np.allclose(np.sort(scores[qi])[::-1], expected, atol=2e-3)
        for r in range(k):
            if idx[qi, r] >= 0:
                assert ref[qi, idx[qi, r]] == pytest.approx(scores[qi, r], abs=2e-3)
