"""Exactness tests for the two-phase block-max top-k (including heavy ties)."""

import numpy as np
import pytest

import jax.numpy as jnp

from iscc_search_tpu.ops import nphd_scores
from iscc_search_tpu.ops.nphd import NEG_SCORE
from iscc_search_tpu.ops.pm1_scan import pm1_blockmax_topk, prepare_queries


def check_exact(packed, valid, q_packed, q_lanes, k, chunk, block):
    n = packed.shape[0]
    q_pm1, q_scale = prepare_queries(q_packed, q_lanes, 256)
    scores, idx = pm1_blockmax_topk(
        jnp.asarray(q_pm1),
        jnp.asarray(q_scale),
        jnp.asarray(packed),
        jnp.asarray(valid),
        k,
        256,
        chunk_size=chunk,
        block=block,
    )
    scores, idx = np.asarray(scores), np.asarray(idx)

    lanes = np.full(n, 8, np.int32)
    ref = np.array(nphd_scores(jnp.asarray(q_packed), jnp.asarray(q_lanes), jnp.asarray(packed), jnp.asarray(lanes)))
    ref[:, ~valid] = NEG_SCORE
    for qi in range(q_packed.shape[0]):
        expected = np.sort(ref[qi])[::-1][:k]
        got = np.sort(scores[qi])[::-1]
        assert np.allclose(got, expected, atol=2e-3), (got, expected)
        for r in range(k):
            if idx[qi, r] >= 0:
                assert ref[qi, idx[qi, r]] == pytest.approx(scores[qi, r], abs=2e-3)
    return scores, idx


def test_blockmax_random():
    rng = np.random.default_rng(51)
    n = 2048
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 100)] = False
    check_exact(packed, valid, packed[:8], np.full(8, 8, np.int32), 10, 512, 128)


def test_blockmax_heavy_ties():
    """Many identical codes spread across blocks — ties must not lose scores."""
    rng = np.random.default_rng(52)
    n = 2048
    base = rng.integers(0, 2**32, 8, dtype=np.uint32)
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    # Plant 60 exact copies of the query scattered widely (ties at score 1.0)
    plant = rng.choice(n, 60, replace=False)
    packed[plant] = base
    valid = np.ones(n, bool)
    q = base[None, :]
    scores, idx = check_exact(packed, valid, q, np.array([8], np.int32), 10, 512, 128)
    assert np.allclose(scores[0], 1.0, atol=1e-3)  # all top-10 are exact copies
    assert set(idx[0]).issubset(set(plant.tolist()))


def test_blockmax_all_topk_in_one_block():
    """All true top-k rows concentrated in a single block."""
    rng = np.random.default_rng(53)
    n = 1024
    base = rng.integers(0, 2**32, 8, dtype=np.uint32)
    packed = np.tile(~base, (n, 1))  # everything is the complement (score ~0)
    # One block (rows 256..384) holds near-duplicates of the query
    for i in range(256, 266):
        row = base.copy()
        row[7] ^= 1 << (i - 256)  # flip one distinct bit each
        packed[i] = row
    valid = np.ones(n, bool)
    scores, idx = check_exact(packed, valid, base[None, :], np.array([8], np.int32), 10, 256, 128)
    assert set(idx[0]) == set(range(256, 266))


def test_blockmax_tiny_db_fallback():
    rng = np.random.default_rng(54)
    n = 256
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    # total_blocks (2) < k (10) -> falls back to single-phase exact
    check_exact(packed, valid, packed[:2], np.full(2, 8, np.int32), 10, 256, 128)


def test_blockmax_fewer_valid_than_k():
    rng = np.random.default_rng(55)
    n = 2048
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.zeros(n, bool)
    valid[[5, 600, 1500]] = True
    q_pm1, q_scale = prepare_queries(packed[5:6], np.array([8], np.int32), 256)
    scores, idx = pm1_blockmax_topk(
        jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed), jnp.asarray(valid), 10, 256,
        chunk_size=512, block=128,
    )
    idx = np.asarray(idx)[0]
    found = set(idx[idx >= 0].tolist())
    assert 5 in found
    assert found.issubset({5, 600, 1500})


# -------------------------------------------------- hierarchical phase 2


def test_topk_blocks_hier_matches_flat_values():
    """Hierarchical block cut returns blocks with the same max multiset."""
    import jax

    from iscc_search_tpu.ops.pm1_scan import topk_blocks_hier

    rng = np.random.default_rng(60)
    for k, nb in [(10, 4096), (1, 2048), (16, 8192)]:
        bm = rng.standard_normal((5, nb)).astype(np.float32)
        # Plant heavy ties: same max value in many super-blocks
        bm[2, rng.choice(nb, 300, replace=False)] = 7.5
        got = np.asarray(topk_blocks_hier(jnp.asarray(bm), k))
        flat_v = np.asarray(jax.lax.top_k(jnp.asarray(bm), k)[0])
        got_v = np.sort(np.take_along_axis(bm, got, axis=1), axis=1)[:, ::-1]
        assert got.shape == (5, k)
        for qi in range(5):
            assert len(set(got[qi].tolist())) == k  # distinct blocks
        assert np.allclose(got_v, flat_v)


def test_topk_blocks_hier_fallback_small():
    """Few blocks -> falls back to flat top_k (still exact)."""
    import jax

    from iscc_search_tpu.ops.pm1_scan import topk_blocks_hier

    rng = np.random.default_rng(61)
    bm = rng.standard_normal((3, 256)).astype(np.float32)
    got = np.asarray(topk_blocks_hier(jnp.asarray(bm), 10))
    flat = np.asarray(jax.lax.top_k(jnp.asarray(bm), 10)[1])
    assert np.array_equal(np.sort(got, axis=1), np.sort(flat, axis=1))


def test_blockmax_hier_engaged_exact():
    """Scan-level exactness at a scale where the hierarchy actually engages."""
    rng = np.random.default_rng(62)
    n = 131072  # nb=1024, ns=8 > 2k for k=3
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    # Ties: plant 40 copies of query 0 across distant super-blocks
    base = packed[7].copy()
    plant = rng.choice(n, 40, replace=False)
    packed[plant] = base
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 500)] = False
    q = np.stack([base, packed[99], packed[12345]])
    scores, idx = check_exact(packed, valid, q, np.full(3, 8, np.int32), 3, 16384, 128)
    live_plant = [p for p in plant if valid[p]]
    if len(live_plant) >= 3:
        assert np.allclose(scores[0], 1.0, atol=1e-3)
        # row 7 is the query itself, also an exact copy
        assert set(idx[0]).issubset(set(plant.tolist()) | {7})

def test_blockmax_large_k_segmented_rescore():
    """k*block beyond the rescore segment budget: the lax.map-segmented
    phase 2 must stay exact (regression for the 8 GB OOM at Q=256, k=256 —
    the unsegmented rescore materialized all (Q, k*block, nbits) unpacked
    candidates at once)."""
    rng = np.random.default_rng(63)
    n = 16384
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 300)] = False
    # Q=64, nbits=256 -> seg budget 16384, k=128 -> k*block = 16384 = 1 seg;
    # force multiple segments with a tighter Q: Q=512 -> budget 2048, 8 segs.
    q_rows = rng.integers(0, n, 512)
    q_packed = packed[q_rows]
    check_exact(packed, valid, q_packed[:512], np.full(512, 8, np.int32), 128, 2048, 128)


@pytest.mark.parametrize("k", [40, 48, 72])
def test_blockmax_non_pow2_k(k):
    """k*block not a multiple of the rescore segment: the padded segmented
    rescore must stay exact (library callers pass arbitrary k; only the
    engine buckets to powers of two)."""
    rng = np.random.default_rng(64)
    n = 32768
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 500)] = False
    # Q=512 -> seg budget 2048 -> k=48 gives 6144 columns (3 segments)
    q_packed = packed[rng.integers(0, n, 512)]
    check_exact(packed, valid, q_packed, np.full(512, 8, np.int32), k, 2048, 128)
