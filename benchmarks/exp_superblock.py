"""Phase-2 super-block size sweep on the full production pipeline.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/exp_superblock.py
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from iscc_search_tpu.ops.pallas_scan import (
    BLOCK,
    build_unpacked_db,
    pallas_blockmax,
    pallas_gather_rescore,
)
from iscc_search_tpu.ops.pm1_scan import NEG_SCORE, prepare_queries, topk_blocks_hier

N = 10 * 1024 * 1024
Q = 256
K = 10
NBITS = 256
CHUNK = 32768
REPEAT = 20


def bench(fn, *args, repeat=REPEAT, rounds=3, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    _rb(out)
    cs = time.perf_counter() - t0
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _r in range(repeat):
            out = fn(*args, **kw)
        _rb(out)
        best = min(best, (time.perf_counter() - t0) / repeat)
    return best * 1e3, cs, out


def _rb(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[tuple(slice(0, 1) for _ in leaf.shape)])


def full(q_pm1, q_scale, db_valid2d, k, db_unpacked, db_perm, super_block):
    n = db_unpacked.shape[0]
    q = q_pm1.shape[0]
    block_max = pallas_blockmax(
        q_pm1, q_scale, db_perm, db_valid2d.reshape(n), NBITS,
        chunk_size=CHUNK, unpacked=True, permuted=True,
    )
    kk = min(k, n // BLOCK)
    top_blocks = topk_blocks_hier(block_max, kk, super_block=super_block)
    rows = top_blocks[:, :, None] * BLOCK + jnp.arange(BLOCK, dtype=jnp.int32)[None, None, :]
    rows = rows.reshape(q, kk * BLOCK)
    cand_valid = jnp.take(db_valid2d, top_blocks.reshape(-1), axis=0).reshape(q, kk * BLOCK)
    dots = pallas_gather_rescore(q_pm1.astype(jnp.int8), top_blocks, db_unpacked, kk)
    scores = 0.5 + dots.astype(jnp.float32) * q_scale[:, None]
    scores = jnp.where(cand_valid, scores, NEG_SCORE)
    fs, pos = jax.lax.top_k(scores, k)
    fi = jnp.take_along_axis(rows, pos, axis=1)
    return fs, jnp.where(fs > NEG_SCORE, fi, -1)


def main():
    print(json.dumps({"device": str(jax.devices()[0]), "n": N}), flush=True)
    rng = np.random.default_rng(7)
    packed = rng.integers(0, 2**32, (N, NBITS // 32), dtype=np.uint32)
    valid = np.ones(N, bool)
    qi = rng.integers(0, N, Q)
    q_pm1, q_scale = prepare_queries(packed[qi], np.full(Q, 8, np.int32), NBITS)
    db_packed = jax.device_put(jnp.asarray(packed))
    db_valid2d = jax.device_put(jnp.asarray(valid.reshape(N // BLOCK, BLOCK)))
    _rb(db_packed)
    db_unpacked = build_unpacked_db(db_packed, NBITS)
    db_perm = build_unpacked_db(db_packed, NBITS, permute=True)
    _rb(db_perm)
    qp, qs = jnp.asarray(q_pm1), jnp.asarray(q_scale)
    results = {}
    ref_idx = None
    fj = jax.jit(full, static_argnames=("k", "super_block"))
    for sb in (64, 128, 256, 512):
        ms, cs, out = bench(fj, qp, qs, db_valid2d, K, db_unpacked, db_perm, sb)
        results[f"sb{sb}_ms"] = round(ms, 2)
        print(f"super_block={sb}: {ms:.2f} ms = {Q/(ms/1e3):.0f} QPS (compile {cs:.1f}s)", flush=True)
        if ref_idx is None:
            ref_idx = out[1]
        else:
            results[f"sb{sb}_match"] = bool(jnp.all(out[1] == ref_idx))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
