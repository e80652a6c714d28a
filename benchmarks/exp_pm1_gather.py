"""A/B the packed XLA path's phase-3 gather: per-row vs per-block take.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/exp_pm1_gather.py
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from iscc_search_tpu.ops.pm1_scan import (
    pm1_blockmax_topk,
    prepare_queries,
    topk_blocks_hier,
    unpack_pm1,
    NEG_SCORE,
)

N = 10 * 1024 * 1024
Q = 256
K = 10
NBITS = 256
CHUNK = 32768
BLOCK = 128
REPEAT = 15


def bench(fn, *args, repeat=REPEAT, rounds=3):
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(repeat):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])
        best = min(best, (time.perf_counter() - t0) / repeat)
    return best * 1e3, compile_s, out


def rowgather_topk(q_pm1, q_scale, db_packed, db_valid):
    """The pre-change formulation: per-row packed take + per-element valid."""
    from iscc_search_tpu.ops.pm1_scan import _chunk_scores

    n = db_packed.shape[0]
    q = q_pm1.shape[0]
    nch = n // CHUNK
    bpc = CHUNK // BLOCK
    db_c = db_packed.reshape(nch, CHUNK, db_packed.shape[1])
    valid_c = db_valid.reshape(nch, CHUNK)

    def body(carry, xs):
        chunk, v = xs
        s = _chunk_scores(q_pm1, q_scale, chunk, v, NBITS, jnp.bfloat16)
        return carry, jnp.max(s.reshape(q, bpc, BLOCK), axis=2)

    _, bm = jax.lax.scan(body, None, (db_c, valid_c))
    block_max = jnp.transpose(bm, (1, 0, 2)).reshape(q, n // BLOCK)
    top_blocks = topk_blocks_hier(block_max, K)
    rows = top_blocks[:, :, None] * BLOCK + jnp.arange(BLOCK, dtype=jnp.int32)[None, None, :]
    rows = rows.reshape(q, K * BLOCK)
    cand_packed = jnp.take(db_packed, rows.reshape(-1), axis=0)
    cand_valid = jnp.take(db_valid, rows.reshape(-1), axis=0).reshape(q, K * BLOCK)
    cand_pm1 = unpack_pm1(cand_packed, NBITS, jnp.bfloat16).reshape(q, K * BLOCK, NBITS)
    dots = jax.lax.dot_general(
        q_pm1.astype(jnp.bfloat16)[:, None, :], cand_pm1,
        (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    ).reshape(q, K * BLOCK)
    scores = 0.5 + dots.astype(jnp.float32) * q_scale[:, None]
    scores = jnp.where(cand_valid, scores, NEG_SCORE)
    fs, pos = jax.lax.top_k(scores, K)
    fi = jnp.take_along_axis(rows, pos, axis=1)
    return fs, jnp.where(fs > NEG_SCORE, fi, -1)


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    rng = np.random.default_rng(7)
    packed = rng.integers(0, 2**32, (N, NBITS // 32), dtype=np.uint32)
    lanes = np.full(N, 8, np.int32)
    q_packed = packed[rng.integers(0, N, Q)]
    q_pm1, q_scale = prepare_queries(q_packed, lanes[:Q], NBITS)
    valid = np.ones(N, bool)

    db = jax.device_put(jnp.asarray(packed))
    dv = jax.device_put(jnp.asarray(valid))
    np.asarray(db[:1, :1])
    qp, qs = jnp.asarray(q_pm1), jnp.asarray(q_scale)

    ms_new, cs, out_new = bench(
        lambda a, b, c, d: pm1_blockmax_topk(a, b, c, d, K, NBITS, chunk_size=CHUNK), qp, qs, db, dv
    )
    print(f"blockgather (current): {ms_new:.2f} ms (compile {cs:.1f}s)", flush=True)
    f_old = jax.jit(rowgather_topk)
    ms_old, cs, out_old = bench(f_old, qp, qs, db, dv)
    print(f"rowgather (previous):  {ms_old:.2f} ms (compile {cs:.1f}s)", flush=True)
    same = bool(jnp.all(out_new[1] == out_old[1]))
    print(json.dumps({"block_ms": round(ms_new, 2), "row_ms": round(ms_old, 2), "match": same}), flush=True)


if __name__ == "__main__":
    main()
