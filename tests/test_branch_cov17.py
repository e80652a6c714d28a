"""Branch coverage round 17: pallas_scan edge arms — multi-step bit
transpose, the TPU-only chunk-size validation raise, odd-total padding in the
packed gather-rescore, and 192-bit (two-segment) packed unpack."""

import jax.numpy as jnp
import numpy as np
import pytest

from iscc_search_tpu.ops.pallas_scan import (
    bit_transpose_packed,
    pallas_blockmax_topk,
    pallas_gather_rescore_packed,
)
from iscc_search_tpu.ops.pm1_scan import prepare_queries


def test_bit_transpose_multi_step_path():
    """n that only divides a smaller step (12288 = 3 x 4096): the lax.map
    multi-group arm, verified against the single-shot transpose."""
    rng = np.random.default_rng(70)
    small = rng.integers(0, 2**32, (4096, 8), dtype=np.uint32)
    big = np.concatenate([small, small, small])
    one = np.asarray(bit_transpose_packed(jnp.asarray(small)))
    three = np.asarray(bit_transpose_packed(jnp.asarray(big)))
    assert three.shape[0] == 3 * one.shape[0]
    assert np.array_equal(three[: one.shape[0]], one)


def test_blockmax_rejects_small_chunk_on_tpu_path():
    """interpret=False with a sub-16384 chunk raises before any compile."""
    rng = np.random.default_rng(71)
    packed = rng.integers(0, 2**32, (4096, 8), dtype=np.uint32)
    q_pm1, q_scale = prepare_queries(packed[:2], np.full(2, 8, np.int32), 256)
    with pytest.raises(ValueError, match="chunk_size must be >="):
        pallas_blockmax_topk(
            jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed),
            jnp.asarray(np.ones(4096, bool)), 3, 256, chunk_size=256, interpret=False,
        )


def test_packed_gather_rescore_odd_total_pads():
    """q*k not a multiple of 8: the grid pads and the tail is dropped."""
    rng = np.random.default_rng(72)
    packed = rng.integers(0, 2**32, (1024, 8), dtype=np.uint32)
    q_pm1, _ = prepare_queries(packed[:3], np.full(3, 8, np.int32), 256)
    k = 3  # 3 x 3 = 9 -> pad 7
    block_ids = jnp.asarray(rng.integers(0, 1024 // 128, (3, k)), jnp.int32)
    out = np.asarray(
        pallas_gather_rescore_packed(jnp.asarray(q_pm1), block_ids, jnp.asarray(packed), k, 256, interpret=True)
    ).reshape(3, k, 128)
    from iscc_search_tpu.ops.pallas_scan import gather_perm_offsets, pallas_gather_rescore
    from iscc_search_tpu.ops.pm1_scan import unpack_pm1

    db_unpacked = unpack_pm1(jnp.asarray(packed), 256, jnp.int8)
    ref = np.asarray(
        pallas_gather_rescore(jnp.asarray(np.asarray(q_pm1).astype(np.int8)), block_ids, db_unpacked, k, interpret=True)
    ).reshape(3, k, 128)
    assert np.array_equal(out, ref[:, :, gather_perm_offsets()])


def test_packed_kernel_192bit_two_segments():
    """192-bit rows (lanes=6): the in-kernel unpack walks a 4-lane segment
    plus a trailing 2-lane segment."""
    rng = np.random.default_rng(73)
    n = 512
    packed = rng.integers(0, 2**32, (n, 6), dtype=np.uint32)
    q_pm1, q_scale = prepare_queries(packed[:4], np.full(4, 6, np.int32), 192)
    scores, idx = pallas_blockmax_topk(
        jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed),
        jnp.asarray(np.ones(n, bool)), 3, 192, chunk_size=256, interpret=True,
    )
    idx = np.asarray(idx)
    assert list(idx[:, 0]) == [0, 1, 2, 3]
    assert np.allclose(np.asarray(scores)[:, 0], 1.0, atol=1e-3)
