"""Pallas fused scan kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from iscc_search_tpu.ops import nphd_scores
from iscc_search_tpu.ops.nphd import NEG_SCORE
from iscc_search_tpu.ops.pallas_scan import build_unpacked_db, pallas_blockmax, pallas_blockmax_topk
from iscc_search_tpu.ops.pm1_scan import prepare_queries


@pytest.fixture
def data():
    rng = np.random.default_rng(71)
    n = 1024
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 60)] = False
    q_packed = packed[:8]
    q_lanes = np.full(8, 8, np.int32)
    return packed, valid, q_packed, q_lanes


def reference_scores(packed, valid, q_packed, q_lanes):
    lanes = np.full(packed.shape[0], 8, np.int32)
    ref = np.array(nphd_scores(jnp.asarray(q_packed), jnp.asarray(q_lanes), jnp.asarray(packed), jnp.asarray(lanes)))
    ref[:, ~valid] = NEG_SCORE
    return ref


def test_pallas_blockmax_matches_reference(data):
    packed, valid, q_packed, q_lanes = data
    q_pm1, q_scale = prepare_queries(q_packed, q_lanes, 256)
    bm = np.asarray(
        pallas_blockmax(
            jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed), jnp.asarray(valid), 256,
            chunk_size=256, interpret=True,
        )
    )
    ref = reference_scores(packed, valid, q_packed, q_lanes)
    expected = ref.reshape(8, -1, 128).max(axis=2)
    assert np.allclose(bm, expected, atol=2e-3)


def test_pallas_blockmax_topk_exact(data):
    packed, valid, q_packed, q_lanes = data
    q_pm1, q_scale = prepare_queries(q_packed, q_lanes, 256)
    scores, idx = pallas_blockmax_topk(
        jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed), jnp.asarray(valid), 5, 256,
        chunk_size=256, interpret=True,
    )
    scores, idx = np.asarray(scores), np.asarray(idx)
    ref = reference_scores(packed, valid, q_packed, q_lanes)
    for qi in range(8):
        expected = np.sort(ref[qi])[::-1][:5]
        assert np.allclose(np.sort(scores[qi])[::-1], expected, atol=2e-3)
        for r in range(5):
            if idx[qi, r] >= 0:
                assert ref[qi, idx[qi, r]] == pytest.approx(scores[qi, r], abs=2e-3)


def test_pallas_unpacked_layout(data):
    packed, valid, q_packed, q_lanes = data
    q_pm1, q_scale = prepare_queries(q_packed, q_lanes, 256)
    db_unpacked = build_unpacked_db(jnp.asarray(packed), 256, chunk_rows=256)
    assert db_unpacked.shape == (1024, 256)
    scores, idx = pallas_blockmax_topk(
        jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed), jnp.asarray(valid), 5, 256,
        chunk_size=256, interpret=True, db_unpacked=db_unpacked, unpacked=True,
    )
    ref = reference_scores(packed, valid, q_packed, q_lanes)
    scores = np.asarray(scores)
    for qi in range(8):
        expected = np.sort(ref[qi])[::-1][:5]
        assert np.allclose(np.sort(scores[qi])[::-1], expected, atol=2e-3)


def test_pallas_variable_length_queries(data):
    packed, valid, q_packed, q_lanes = data
    # 64-bit query prefix of row 0
    qp = np.zeros((1, 8), np.uint32)
    qp[0, :2] = packed[0, :2]
    q_pm1, q_scale = prepare_queries(qp, np.array([2], np.int32), 256)
    scores, idx = pallas_blockmax_topk(
        jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed), jnp.asarray(valid), 3, 256,
        chunk_size=256, interpret=True,
    )
    assert np.asarray(idx)[0, 0] == 0
    assert np.asarray(scores)[0, 0] == pytest.approx(1.0, abs=1e-3)


@pytest.mark.parametrize("nbits,lanes", [(64, 2), (128, 4), (192, 6)])
def test_pallas_narrow_widths(nbits, lanes):
    """64/128-bit partitions (short units, simprints) through both kernels."""
    rng = np.random.default_rng(72)
    n = 512
    packed = rng.integers(0, 2**32, (n, lanes), dtype=np.uint32)
    valid = np.ones(n, bool)
    q_packed = packed[:4]
    q_pm1, q_scale = prepare_queries(q_packed, np.full(4, lanes, np.int32), nbits)
    db_unpacked = build_unpacked_db(jnp.asarray(packed), nbits, chunk_rows=256)
    for kwargs in ({}, {"db_unpacked": db_unpacked, "unpacked": True}):
        scores, idx = pallas_blockmax_topk(
            jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed), jnp.asarray(valid), 3, nbits,
            chunk_size=256, interpret=True, **kwargs,
        )
        idx = np.asarray(idx)
        assert list(idx[:, 0]) == [0, 1, 2, 3]
        assert np.allclose(np.asarray(scores)[:, 0], 1.0, atol=1e-3)


# --------------------------------------------------- permuted fast layout


def test_permute_rows_roundtrip_geometry():
    from iscc_search_tpu.ops.pallas_scan import PERM_CLASSES, PERM_GROUP, permute_rows

    n = 2 * PERM_GROUP
    x = jnp.arange(n, dtype=jnp.int32)[:, None]
    p = np.asarray(permute_rows(x))[:, 0]
    for pos in [0, 1, 31, 32, 4095, 4096, 5000]:
        g, r = divmod(pos, PERM_GROUP)
        i, b = divmod(r, PERM_CLASSES)
        assert p[pos] == g * PERM_GROUP + b * (PERM_GROUP // PERM_CLASSES) + i


def test_permuted_blockmax_matches_plain():
    rng = np.random.default_rng(91)
    from iscc_search_tpu.ops.pallas_scan import build_unpacked_db, pallas_blockmax

    n = 8192
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 100)] = False
    q_pm1, q_scale = prepare_queries(packed[:4], np.full(4, 8, np.int32), 256)
    dbp = jnp.asarray(packed)
    plain = build_unpacked_db(dbp, 256)
    perm = build_unpacked_db(dbp, 256, permute=True)
    bm_plain = pallas_blockmax(
        jnp.asarray(q_pm1), jnp.asarray(q_scale), plain, jnp.asarray(valid), 256,
        chunk_size=4096, interpret=True, unpacked=True,
    )
    bm_perm = pallas_blockmax(
        jnp.asarray(q_pm1), jnp.asarray(q_scale), perm, jnp.asarray(valid), 256,
        chunk_size=4096, interpret=True, unpacked=True, permuted=True,
    )
    assert np.allclose(np.asarray(bm_perm), np.asarray(bm_plain), atol=1e-3)


def test_permuted_topk_exact_vs_brute_force():
    rng = np.random.default_rng(92)
    from iscc_search_tpu.ops.pallas_scan import build_unpacked_db, pallas_blockmax_topk

    n, k = 8192, 7
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    lanes = np.full(n, 8, np.int32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 64)] = False
    q_pm1, q_scale = prepare_queries(packed[:5], lanes[:5], 256)
    dbp = jnp.asarray(packed)
    plain = build_unpacked_db(dbp, 256)
    perm = build_unpacked_db(dbp, 256, permute=True)
    fs, fi = pallas_blockmax_topk(
        jnp.asarray(q_pm1), jnp.asarray(q_scale), dbp, jnp.asarray(valid), k, 256,
        chunk_size=4096, interpret=True, db_unpacked=plain, unpacked=True, db_perm=perm,
    )
    fs, fi = np.asarray(fs), np.asarray(fi)
    ref = np.array(nphd_scores(jnp.asarray(packed[:5]), jnp.asarray(lanes[:5]), dbp, jnp.asarray(lanes)))
    ref[:, ~valid] = -1.0
    for qi in range(5):
        expected = np.sort(ref[qi])[::-1][:k]
        assert np.allclose(np.sort(fs[qi])[::-1], expected, atol=1e-3)
        for r in range(k):
            if fi[qi, r] >= 0:
                assert abs(ref[qi, fi[qi, r]] - fs[qi, r]) < 1e-3


def test_engine_fast_twin_incremental_append(tmp_path, monkeypatch):
    """Forced-pallas engine builds the fast phase-1 twin (bitplane for
    256-bit partitions since EXP_BITPLANE_10M) plus the plain int8 gather
    twin, and keeps both in sync through incremental device appends
    (_bitplane_group_rewrite path)."""
    from iscc_search_tpu.engine import device_index as di
    from iscc_search_tpu.engine.device_index import DeviceNphdIndex

    rng = np.random.default_rng(93)
    monkeypatch.setattr(di, "_PALLAS_MIN_CHUNK", 4096)
    idx = DeviceNphdIndex(tmp_path / "p", scan_kernel="pallas")
    bodies = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes() for _ in range(600)]
    idx.add(list(range(500)), bodies[:500])
    (k0, s0), = idx.search([bodies[42]], 3)
    part = next(iter(idx._partitions.values()))
    assert part.bitplane_dev is not None and part.unpacked_dev is not None
    assert part.perm_dev is None
    # incremental append into the existing partition, then search again
    idx.add(list(range(500, 600)), bodies[500:])
    (k1, s1), = idx.search([bodies[550]], 3)
    assert int.from_bytes(k1[0].tobytes(), "big") == 550
    assert s1[0] == pytest.approx(1.0, abs=1e-3)
    (k2, s2), = idx.search([bodies[42]], 3)
    assert int.from_bytes(k2[0].tobytes(), "big") == 42
    idx.close()


def test_packed_gather_rescore_matches_unpacked(data):
    """In-kernel packed unpack (no int8 twin) must produce the same dots as
    the int8-layout gather, modulo its documented static row permutation."""
    from iscc_search_tpu.ops.pallas_scan import (
        gather_perm_offsets,
        pallas_gather_rescore,
        pallas_gather_rescore_packed,
    )

    packed, valid, q_packed, q_lanes = data
    q_pm1, q_scale = prepare_queries(q_packed, q_lanes, 256)
    db_unpacked = build_unpacked_db(jnp.asarray(packed), 256)
    k = 3
    rng = np.random.default_rng(5)
    block_ids = jnp.asarray(rng.integers(0, packed.shape[0] // 128, (8, k)), jnp.int32)

    ref = np.asarray(
        pallas_gather_rescore(jnp.asarray(q_pm1.astype(np.int8)), block_ids, db_unpacked, k, interpret=True)
    ).reshape(8, k, 128)
    got = np.asarray(
        pallas_gather_rescore_packed(jnp.asarray(q_pm1), block_ids, jnp.asarray(packed), k, 256, interpret=True)
    ).reshape(8, k, 128)
    perm = gather_perm_offsets()
    assert np.array_equal(got, ref[:, :, perm])


def test_packed_gather_rescore_rejects_narrow():
    from iscc_search_tpu.ops.pallas_scan import pallas_gather_rescore_packed

    with pytest.raises(ValueError):
        pallas_gather_rescore_packed(
            jnp.zeros((8, 64)), jnp.zeros((8, 1), jnp.int32), jnp.zeros((128, 2), jnp.uint32), 1, 64,
        )


def test_perm_only_topk_matches_brute_force():
    """HBM budget for one twin: perm-only phase 1 + packed XLA phase 3 must
    stay exact (db_unpacked=None)."""
    rng = np.random.default_rng(93)
    from iscc_search_tpu.ops.pallas_scan import pallas_blockmax_topk

    n, k = 8192, 7
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    lanes = np.full(n, 8, np.int32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 64)] = False
    q_pm1, q_scale = prepare_queries(packed[:5], lanes[:5], 256)
    dbp = jnp.asarray(packed)
    perm = build_unpacked_db(dbp, 256, permute=True)
    fs, fi = pallas_blockmax_topk(
        jnp.asarray(q_pm1), jnp.asarray(q_scale), dbp, jnp.asarray(valid), k, 256,
        chunk_size=4096, interpret=True, db_unpacked=None, unpacked=True, db_perm=perm,
    )
    fs, fi = np.asarray(fs), np.asarray(fi)
    ref = np.array(nphd_scores(jnp.asarray(packed[:5]), jnp.asarray(lanes[:5]), dbp, jnp.asarray(lanes)))
    ref[:, ~valid] = -1.0
    for qi in range(5):
        assert np.allclose(np.sort(fs[qi])[::-1], np.sort(ref[qi])[::-1][:k], atol=1e-3)
        for r in range(k):
            if fi[qi, r] >= 0:
                assert abs(ref[qi, fi[qi, r]] - fs[qi, r]) < 1e-3


def test_unpacked_flag_requires_a_twin():
    from iscc_search_tpu.ops.pallas_scan import pallas_blockmax_topk_impl

    with pytest.raises(ValueError):
        pallas_blockmax_topk_impl(
            jnp.zeros((8, 256)), jnp.zeros(8), jnp.zeros((256, 8), jnp.uint32),
            jnp.ones(256, bool), 5, 256, chunk_size=256, interpret=True, unpacked=True,
        )


def test_engine_single_layout_budget_256bit(tmp_path, monkeypatch):
    """With HBM budget for exactly one int8 layout, 256-bit partitions build
    the plain int8 gather twin + the bitplane phase-1 twin (2x packed bytes,
    outside the int8 budget accounting) and search exactly — the perm twin is
    retired for 128/256-bit widths (EXP_BITPLANE_10M.json)."""
    from iscc_search_tpu.engine import device_index as di
    from iscc_search_tpu.engine.device_index import DeviceNphdIndex

    rng = np.random.default_rng(94)
    monkeypatch.setattr(di, "_PALLAS_MIN_CHUNK", 4096)
    # partition cap will be 8192 rows -> one int8 layout = 8192*256 bytes;
    # budget fits exactly one, not two
    monkeypatch.setenv("ISCC_SEARCH_UNPACKED_MAX_BYTES", str(8192 * 256))
    idx = DeviceNphdIndex(tmp_path / "p", scan_kernel="pallas")
    bodies = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes() for _ in range(700)]
    idx.add(list(range(700)), bodies)
    (k1, s1), = idx.search([bodies[611]], 3)  # triggers the device sync
    part = next(iter(idx._partitions.values()))
    assert part.perm_dev is None
    assert part.unpacked_dev is not None and part.bitplane_dev is not None
    assert int.from_bytes(k1[0].tobytes(), "big") == 611
    assert s1[0] == pytest.approx(1.0, abs=1e-3)
    idx.close()


def test_engine_perm_only_budget_192bit(tmp_path, monkeypatch):
    """192-bit partitions (no bitplane layout) with budget for one int8
    layout keep the PERM-twin-only preference and search exactly."""
    from iscc_search_tpu.engine import device_index as di
    from iscc_search_tpu.engine.device_index import DeviceNphdIndex

    rng = np.random.default_rng(95)
    monkeypatch.setattr(di, "_PALLAS_MIN_CHUNK", 4096)
    monkeypatch.setenv("ISCC_SEARCH_UNPACKED_MAX_BYTES", str(8192 * 192))
    idx = DeviceNphdIndex(tmp_path / "p", scan_kernel="pallas")
    bodies = [rng.integers(0, 256, 24, dtype=np.uint8).tobytes() for _ in range(700)]
    idx.add(list(range(700)), bodies)
    (k1, s1), = idx.search([bodies[611]], 3)
    part = next(iter(idx._partitions.values()))
    assert part.perm_dev is not None and part.bitplane_dev is None
    assert part.unpacked_dev is None
    assert int.from_bytes(k1[0].tobytes(), "big") == 611
    assert s1[0] == pytest.approx(1.0, abs=1e-3)
    idx.close()


def test_permute_packed_rows_geometry():
    """Stored view position (u, col) holds the derived original row's lane."""
    from iscc_search_tpu.ops.pallas_scan import permute_packed_rows

    n, lanes = 8192, 8
    r = 128 // lanes
    packed = np.arange(n, dtype=np.uint32)[:, None] * np.ones((1, lanes), np.uint32)
    stored = np.asarray(permute_packed_rows(jnp.asarray(packed), lanes))
    # stored[c2*32R + v*R + g] = orig[v*128 + g*(128//R) + c2] per 4096 group
    for grp in range(n // 4096):
        for c2 in range(128 // r):
            for v in (0, 3, 31):
                for g in (0, 1, r - 1):
                    s = grp * 4096 + c2 * 32 * r + v * r + g
                    o = grp * 4096 + v * 128 + g * (128 // r) + c2
                    assert stored[s, 0] == o


@pytest.mark.parametrize("nbits", [256, 128, 64])
def test_packed_perm_blockmax_matches_plain(nbits):
    from iscc_search_tpu.ops.pallas_scan import permute_packed_rows

    rng = np.random.default_rng(77)
    n, lanes = 8192, nbits // 32
    packed = rng.integers(0, 2**32, (n, lanes), dtype=np.uint32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 400)] = False
    q_packed = packed[:8]
    q_lanes = np.full(8, lanes, np.int32)
    q_pm1, q_scale = prepare_queries(q_packed, q_lanes, nbits)

    plain = np.asarray(
        pallas_blockmax(
            jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed), jnp.asarray(valid), nbits,
            chunk_size=4096, interpret=True,
        )
    )
    pperm = permute_packed_rows(jnp.asarray(packed), lanes)
    got = np.asarray(
        pallas_blockmax(
            jnp.asarray(q_pm1), jnp.asarray(q_scale), pperm, jnp.asarray(valid), nbits,
            chunk_size=4096, interpret=True, packed_perm=True,
        )
    )
    assert np.allclose(got, plain, atol=2e-3)


def test_packed_perm_topk_exact_vs_brute_force():
    from iscc_search_tpu.ops.pallas_scan import permute_packed_rows

    rng = np.random.default_rng(78)
    n = 8192
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 500)] = False
    q_packed = packed[:8]
    q_lanes = np.array([8, 8, 4, 2, 8, 6, 8, 8], np.int32)  # mixed query lengths
    q_pm1, q_scale = prepare_queries(q_packed, q_lanes, 256)
    pperm = permute_packed_rows(jnp.asarray(packed), 8)

    scores, idx = pallas_blockmax_topk(
        jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed), jnp.asarray(valid), 7, 256,
        chunk_size=4096, interpret=True, db_packed_perm=pperm,
    )
    scores, idx = np.asarray(scores), np.asarray(idx)
    ref = reference_scores(packed, valid, q_packed, q_lanes)
    for qi in range(8):
        expected = np.sort(ref[qi])[::-1][:7]
        assert np.allclose(np.sort(scores[qi])[::-1], expected, atol=2e-3)
        for r in range(7):
            if idx[qi, r] >= 0:
                assert ref[qi, idx[qi, r]] == pytest.approx(scores[qi, r], abs=2e-3)


def test_packed_perm_rejects_bad_config():
    from iscc_search_tpu.ops.pallas_scan import permute_packed_rows

    with pytest.raises(ValueError):
        permute_packed_rows(jnp.zeros((100, 8), jnp.uint32), 8)  # N % 4096
    q = jnp.zeros((8, 256), jnp.float32)
    qs = jnp.ones(8, jnp.float32)
    db = jnp.zeros((4096, 8), jnp.uint32)
    with pytest.raises(ValueError):
        pallas_blockmax(q, qs, db, jnp.ones(4096, bool), 256, chunk_size=256, interpret=True, packed_perm=True)


def test_bitplane_twin_blockmax_matches_plain():
    from iscc_search_tpu.ops.pallas_scan import bit_transpose_packed

    rng = np.random.default_rng(81)
    n = 8192
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 400)] = False
    q_packed = packed[:8]
    q_lanes = np.array([8, 8, 4, 2, 8, 6, 8, 8], np.int32)
    q_pm1, q_scale = prepare_queries(q_packed, q_lanes, 256)

    plain = np.asarray(
        pallas_blockmax(
            jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed), jnp.asarray(valid), 256,
            chunk_size=4096, interpret=True,
        )
    )
    bt = bit_transpose_packed(jnp.asarray(packed))
    got = np.asarray(
        pallas_blockmax(
            jnp.asarray(q_pm1), jnp.asarray(q_scale), bt, jnp.asarray(valid), 256,
            chunk_size=4096, interpret=True, bitplane=True,
        )
    )
    assert np.allclose(got, plain, atol=2e-3)


def test_bitplane_topk_exact_vs_brute_force():
    from iscc_search_tpu.ops.pallas_scan import bit_transpose_packed

    rng = np.random.default_rng(82)
    n = 8192
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 500)] = False
    q_packed = packed[:8]
    q_lanes = np.array([8, 8, 4, 2, 8, 6, 8, 8], np.int32)
    q_pm1, q_scale = prepare_queries(q_packed, q_lanes, 256)
    bt = bit_transpose_packed(jnp.asarray(packed))

    scores, idx = pallas_blockmax_topk(
        jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed), jnp.asarray(valid), 7, 256,
        chunk_size=4096, interpret=True, db_bitplane=bt,
    )
    scores, idx = np.asarray(scores), np.asarray(idx)
    ref = reference_scores(packed, valid, q_packed, q_lanes)
    for qi in range(8):
        expected = np.sort(ref[qi])[::-1][:7]
        assert np.allclose(np.sort(scores[qi])[::-1], expected, atol=2e-3)
        for r in range(7):
            if idx[qi, r] >= 0:
                assert ref[qi, idx[qi, r]] == pytest.approx(scores[qi, r], abs=2e-3)


def test_bitplane_rejects_bad_config():
    from iscc_search_tpu.ops.pallas_scan import bit_transpose_packed

    with pytest.raises(ValueError):
        bit_transpose_packed(jnp.zeros((4096, 2), jnp.uint32))  # not 128/256-bit
    with pytest.raises(ValueError):
        bit_transpose_packed(jnp.zeros((100, 8), jnp.uint32))  # N % 4096
    q = jnp.zeros((8, 256), jnp.float32)
    with pytest.raises(ValueError):
        pallas_blockmax(q, jnp.ones(8, jnp.float32), jnp.zeros((4096, 8), jnp.uint32),
                        jnp.ones(4096, bool), 256, chunk_size=256, interpret=True, bitplane=True)


def test_bitplane_128bit_topk_exact_vs_brute_force():
    """The generalized 128-bit bitplane layout (lanes=4 — SIMPRINT width,
    the config-4 100M-chunk tier) is exact vs the dense reference."""
    from iscc_search_tpu.ops import nphd_scores
    from iscc_search_tpu.ops.nphd import NEG_SCORE as NEG
    from iscc_search_tpu.ops.pallas_scan import bit_transpose_packed

    rng = np.random.default_rng(83)
    n = 8192
    packed = rng.integers(0, 2**32, (n, 4), dtype=np.uint32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 500)] = False
    q_packed = packed[:8]
    q_lanes = np.full(8, 4, np.int32)
    q_pm1, q_scale = prepare_queries(q_packed, q_lanes, 128)
    bt = bit_transpose_packed(jnp.asarray(packed))
    assert bt.shape == (n * 4 // 128, 128)

    scores, idx = pallas_blockmax_topk(
        jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed), jnp.asarray(valid), 7, 128,
        chunk_size=4096, interpret=True, db_bitplane=bt,
    )
    scores, idx = np.asarray(scores), np.asarray(idx)
    lanes_db = np.full(n, 4, np.int32)
    ref = np.array(nphd_scores(jnp.asarray(q_packed), jnp.asarray(q_lanes), jnp.asarray(packed), jnp.asarray(lanes_db)))
    ref[:, ~valid] = NEG
    for qi in range(8):
        expected = np.sort(ref[qi])[::-1][:7]
        assert np.allclose(np.sort(scores[qi])[::-1], expected, atol=2e-3)
        for r in range(7):
            if idx[qi, r] >= 0:
                assert ref[qi, idx[qi, r]] == pytest.approx(scores[qi, r], abs=2e-3)


def test_bitplane_fallback_rescore_segmented_non_pow2_k():
    """The bitplane tier has no int8 twin, so its phase-3 rescore is the
    XLA fallback — now the shared segmented_unpack_dots (regression: the
    unsegmented version materialized (Q, k*128, nbits) bf16, ~4.3 GiB at
    Q=256/k=256 on a chip already holding the 100M layouts). k=40 also
    drives the non-divisible segment padding."""
    import jax

    from iscc_search_tpu.ops import nphd_scores
    from iscc_search_tpu.ops.nphd import NEG_SCORE
    from iscc_search_tpu.ops.pallas_scan import bit_transpose_packed, pallas_blockmax_topk
    from iscc_search_tpu.ops.pm1_scan import prepare_queries

    rng = np.random.default_rng(9)
    n, qn, k = 8192, 16, 40
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 200)] = False
    qp, qs = prepare_queries(packed[:qn], np.full(qn, 8, np.int32), 256)
    bt = jax.jit(bit_transpose_packed)(jnp.asarray(packed))
    s, i = pallas_blockmax_topk(
        jnp.asarray(qp), jnp.asarray(qs), jnp.asarray(packed), jnp.asarray(valid),
        k, 256, chunk_size=4096, db_bitplane=bt, interpret=True,
    )
    s, i = np.asarray(s), np.asarray(i)
    lanes = np.full(n, 8, np.int32)
    ref = np.array(
        nphd_scores(
            jnp.asarray(packed[:qn]), jnp.asarray(np.full(qn, 8, np.int32)),
            jnp.asarray(packed), jnp.asarray(lanes),
        )
    )
    ref[:, ~valid] = NEG_SCORE
    for qi in range(qn):
        expected = np.sort(ref[qi])[::-1][:k]
        got = np.sort(s[qi])[::-1]
        assert np.allclose(got, expected, atol=2e-3), qi


def test_precomputed_penalty_matches_in_jit_every_mode():
    """make_blockmax_penalty(db_valid, mode) passed as db_penalty must give
    bit-identical block maxima to the in-jit fallback for every phase-1
    layout (hot callers hoist the permute out of the sweep)."""
    from iscc_search_tpu.ops.pallas_scan import (
        bit_transpose_packed,
        build_unpacked_db,
        make_blockmax_penalty,
        penalty_mode,
    )

    rng = np.random.default_rng(83)
    n = 8192
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 300)] = False
    valid_d = jnp.asarray(valid)
    q_pm1, q_scale = prepare_queries(packed[:4], np.full(4, 8, np.int32), 256)
    qd, qs = jnp.asarray(q_pm1), jnp.asarray(q_scale)
    dbp = jnp.asarray(packed)
    layouts = {
        "packed": (dbp, {}),
        "unpacked": (build_unpacked_db(dbp, 256), {"unpacked": True}),
        "perm": (build_unpacked_db(dbp, 256, permute=True), {"unpacked": True, "permuted": True}),
        "bitplane": (bit_transpose_packed(dbp), {"bitplane": True}),
    }
    for name, (db, flags) in layouts.items():
        mode = penalty_mode(**flags)
        pen = make_blockmax_penalty(valid_d, mode)
        base = pallas_blockmax(qd, qs, db, valid_d, 256, chunk_size=4096, interpret=True, **flags)
        got = pallas_blockmax(
            qd, qs, db, valid_d, 256, chunk_size=4096, interpret=True, db_penalty=pen, **flags
        )
        assert np.array_equal(np.asarray(got), np.asarray(base)), name


def test_penalty_mode_unknown_rejected():
    from iscc_search_tpu.ops.pallas_scan import make_blockmax_penalty

    with pytest.raises(ValueError):
        make_blockmax_penalty(jnp.ones(4096, bool), "nope")


def test_view_rescore_matches_packed_takes_bitplane_tier():
    """db_packed_view routes phase 3 through contiguous view-row gathers;
    results must be identical to the per-row packed-take rescore."""
    from iscc_search_tpu.ops.pallas_scan import bit_transpose_packed, pallas_blockmax_topk_impl

    rng = np.random.default_rng(87)
    n, k = 8192, 7
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 300)] = False
    q_pm1, q_scale = prepare_queries(packed[:6], np.array([8, 8, 4, 2, 8, 6], np.int32), 256)
    dbp = jnp.asarray(packed)
    bt = bit_transpose_packed(dbp)
    view = dbp.reshape(n // 16, 128)
    args = (jnp.asarray(q_pm1), jnp.asarray(q_scale), dbp, jnp.asarray(valid), k, 256)
    kw = dict(chunk_size=4096, db_bitplane=bt, interpret=True)
    s0, i0 = pallas_blockmax_topk_impl(*args, **kw)
    s1, i1 = pallas_blockmax_topk_impl(*args, db_packed_view=view, **kw)
    assert np.array_equal(np.asarray(s0), np.asarray(s1))
    assert np.array_equal(np.asarray(i0), np.asarray(i1))


def test_segmented_view_dots_segmentation_exact():
    """A tiny segment budget forces the lax.map path (with block padding);
    dots must match the single-shot computation exactly."""
    from iscc_search_tpu.ops.pallas_scan import segmented_view_dots

    rng = np.random.default_rng(88)
    n, q, kk = 4096, 8, 5
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    q_pm1, _ = prepare_queries(packed[:q], np.full(q, 8, np.int32), 256)
    view = jnp.asarray(packed).reshape(n // 16, 128)
    tb = jnp.asarray(rng.integers(0, n // 128, (q, kk), dtype=np.int32))
    qd = jnp.asarray(q_pm1).astype(jnp.bfloat16)
    one = segmented_view_dots(qd, view, tb)
    # budget of exactly 2 blocks/segment -> 3 segments, 1 padded column block
    seg = segmented_view_dots(qd, view, tb, seg_budget_bytes=2 * q * 256 * 4 * 128)
    assert np.array_equal(np.asarray(one), np.asarray(seg))


def test_engine_bitplane_tier_uses_view_rescore(tmp_path, monkeypatch):
    """Beyond the int8 budget the engine builds bitplane + packed-view twins,
    searches exactly through them, and keeps the view fresh across appends."""
    from iscc_search_tpu.engine import device_index as di
    from iscc_search_tpu.engine.device_index import DeviceNphdIndex

    rng = np.random.default_rng(95)
    monkeypatch.setattr(di, "_PALLAS_MIN_CHUNK", 4096)
    monkeypatch.setenv("ISCC_SEARCH_UNPACKED_MAX_BYTES", "0")  # force bitplane tier
    idx = DeviceNphdIndex(tmp_path / "p", scan_kernel="pallas")
    bodies = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes() for _ in range(900)]
    idx.add(list(range(900)), bodies)
    (k1, s1), = idx.search([bodies[333]], 3)
    part = next(iter(idx._partitions.values()))
    assert part.bitplane_dev is not None and part.view_dev is not None
    assert part.unpacked_dev is None and part.perm_dev is None
    assert int.from_bytes(k1[0].tobytes(), "big") == 333
    assert s1[0] == pytest.approx(1.0, abs=1e-3)
    # incremental append goes through _view_range_rewrite
    more = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes() for _ in range(40)]
    idx.add(list(range(900, 940)), more)
    (k2, s2), = idx.search([more[17]], 3)
    assert int.from_bytes(k2[0].tobytes(), "big") == 917
    assert s2[0] == pytest.approx(1.0, abs=1e-3)
    # view matches the packed mirror byte-for-byte after the rewrite
    pv = np.asarray(part.packed_dev).reshape(-1, 128)
    assert np.array_equal(np.asarray(idx._partitions[8].view_dev), pv)
    idx.close()


def test_packed_to_view_streamed_and_errors():
    from iscc_search_tpu.ops.pallas_scan import packed_to_view

    rng = np.random.default_rng(89)
    p = rng.integers(0, 2**32, (16384, 8), dtype=np.uint32)
    # streamed path (step smaller than n, halves until it divides)
    v = np.asarray(packed_to_view(jnp.asarray(p), step=4096))
    assert np.array_equal(v, p.reshape(-1, 128))
    # small path: plain reshape
    v2 = np.asarray(packed_to_view(jnp.asarray(p[:2048])))
    assert np.array_equal(v2, p[:2048].reshape(-1, 128))
    with pytest.raises(ValueError):
        packed_to_view(jnp.zeros((10, 3), jnp.uint32))
    with pytest.raises(ValueError):  # step below one whole view row
        packed_to_view(jnp.zeros((48, 8), jnp.uint32), step=8)


def test_topk_rejects_mismatched_view():
    from iscc_search_tpu.ops.pallas_scan import pallas_blockmax_topk_impl

    with pytest.raises(ValueError, match="db_packed_view"):
        pallas_blockmax_topk_impl(
            jnp.zeros((8, 256)), jnp.zeros(8), jnp.zeros((4096, 8), jnp.uint32),
            jnp.ones(4096, bool), 5, 256, chunk_size=4096, interpret=True,
            db_packed_view=jnp.zeros((100, 128), jnp.uint32),
        )


def test_blockmax_rejects_wrong_layout_penalty():
    """A caller-supplied penalty with the wrong dtype/shape for the selected
    phase-1 path is rejected (stale-generation misuse is documented as
    undetectable; layout misuse is not)."""
    from iscc_search_tpu.ops.pallas_scan import make_blockmax_penalty

    rng = np.random.default_rng(90)
    packed = rng.integers(0, 2**32, (4096, 8), dtype=np.uint32)
    valid = jnp.ones(4096, bool)
    q_pm1, q_scale = prepare_queries(packed[:4], np.full(4, 8, np.int32), 256)
    qd, qs = jnp.asarray(q_pm1), jnp.asarray(q_scale)
    pen_perm = make_blockmax_penalty(valid, "perm")  # bf16 - wrong for plain path
    with pytest.raises(ValueError, match="db_penalty"):
        pallas_blockmax(qd, qs, jnp.asarray(packed), valid, 256,
                        chunk_size=4096, interpret=True, db_penalty=pen_perm)
    with pytest.raises(ValueError, match="db_penalty"):  # wrong width
        pallas_blockmax(qd, qs, jnp.asarray(packed), valid, 256, chunk_size=4096,
                        interpret=True, db_penalty=jnp.zeros((1, 128), jnp.float32))


def test_penalty_memo_keeps_two_generations():
    """A stale in-flight snapshot must not evict the current generation."""
    import jax.numpy as jnp

    from iscc_search_tpu.engine.device_index import _Partition

    n = 4096
    v1, v2 = jnp.ones(n, bool), jnp.ones(n, bool)
    part = _Partition(None, v1, None, None, n, n)
    calls = []
    mk = lambda tag: (lambda v: calls.append(tag) or tag)
    assert part.penalty_for(v1, "m", builder=mk("p1")) == "p1"
    assert part.penalty_for(v2, "m", builder=mk("p2")) == "p2"  # new generation
    # BOTH generations now hit without rebuilding
    assert part.penalty_for(v1, "m", builder=mk("x")) == "p1"
    assert part.penalty_for(v2, "m", builder=mk("x")) == "p2"
    assert calls == ["p1", "p2"]
    # a third generation evicts the oldest, keeps two
    v3 = jnp.ones(n, bool)
    assert part.penalty_for(v3, "m", builder=mk("p3")) == "p3"
    assert len(part.pen_memo["m"]) == 2


def test_engine_perm_twin_64bit_incremental_append(tmp_path, monkeypatch):
    """64-bit partitions (lanes=2, no bitplane layout) still use the perm
    int8 twin and keep it in sync through appends (_perm_group_rewrite)."""
    from iscc_search_tpu.engine import device_index as di
    from iscc_search_tpu.engine.device_index import DeviceNphdIndex

    rng = np.random.default_rng(94)
    monkeypatch.setattr(di, "_PALLAS_MIN_CHUNK", 4096)
    idx = DeviceNphdIndex(tmp_path / "p64", scan_kernel="pallas")
    bodies = [rng.integers(0, 256, 8, dtype=np.uint8).tobytes() for _ in range(600)]
    idx.add(list(range(500)), bodies[:500])
    idx.search([bodies[42]], 3)  # triggers the device sync
    part = next(iter(idx._partitions.values()))
    assert part.perm_dev is not None and part.bitplane_dev is None
    idx.add(list(range(500, 600)), bodies[500:])
    (k1, s1), = idx.search([bodies[550]], 3)
    assert int.from_bytes(k1[0].tobytes(), "big") == 550
    assert s1[0] == pytest.approx(1.0, abs=1e-3)
    idx.close()
