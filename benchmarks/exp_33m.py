"""33M-rows single-twin tier A/B: perm-only (new) vs plain-only (old) vs XLA.

At 33M x 256-bit the int8 layout is 8.86 GB — HBM fits ONE twin, not two.
Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/exp_33m.py [exps]
Exps: perm plain xla (default: perm plain)
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from iscc_search_tpu.ops.pallas_scan import (
    build_unpacked_db,
    make_blockmax_penalty,
    pallas_blockmax_topk,
)
from iscc_search_tpu.ops.pm1_scan import pm1_blockmax_topk, prepare_queries

N = 33 * 1024 * 1024
Q = 256
K = 10
NBITS = 256
CHUNK = 32768
REPEAT = 10

exps = [a for a in sys.argv[1:] if not a.startswith("--")] or ["perm", "plain", "xla"]


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


def main():
    print(json.dumps({"device": str(jax.devices()[0]), "n": N, "q": Q}), flush=True)
    t0 = time.perf_counter()
    key = jax.random.key(0)
    db_packed = jax.random.bits(key, (N, 8), dtype=jnp.uint32)
    db_valid = jnp.ones(N, bool)
    q_packed = np.asarray(db_packed[:: N // Q][:Q])
    q_pm1, q_scale = prepare_queries(q_packed, np.full(Q, 8, np.int32), NBITS)
    qp, qs = jnp.asarray(q_pm1), jnp.asarray(q_scale)
    _rb(db_packed)
    print(f"device-generated db in {time.perf_counter()-t0:.1f}s", flush=True)
    results = {}

    if "xla" in exps:
        ms, cs, _ = bench(pm1_blockmax_topk, qp, qs, db_packed, db_valid, K, NBITS, chunk_size=CHUNK)
        results["xla_ms"] = round(ms, 2)
        print(f"xla packed:  {ms:.2f} ms = {Q/(ms/1e3):.0f} QPS (compile {cs:.1f}s)", flush=True)

    if "plain" in exps:
        t0 = time.perf_counter()
        db_plain = build_unpacked_db(db_packed, NBITS)
        _rb(db_plain)
        print(f"plain twin built in {time.perf_counter()-t0:.1f}s", flush=True)
        ms, cs, out = bench(
            pallas_blockmax_topk, qp, qs, db_packed, db_valid, K, NBITS,
            chunk_size=CHUNK, db_unpacked=db_plain, unpacked=True,
        )
        results["plain_ms"] = round(ms, 2)
        results["plain_qps"] = round(Q / (ms / 1e3))
        print(f"plain-twin:  {ms:.2f} ms = {Q/(ms/1e3):.0f} QPS (compile {cs:.1f}s)", flush=True)
        del db_plain, out

    if "perm" in exps:
        t0 = time.perf_counter()
        db_perm = build_unpacked_db(db_packed, NBITS, permute=True)
        _rb(db_perm)
        print(f"perm twin built in {time.perf_counter()-t0:.1f}s", flush=True)
        ms, cs, out = bench(
            pallas_blockmax_topk, qp, qs, db_packed, db_valid, K, NBITS,
            chunk_size=CHUNK, db_unpacked=None, unpacked=True, db_perm=db_perm,
            # production parity: the engine hoists the penalty out of the sweep
            db_penalty=jax.jit(lambda v: make_blockmax_penalty(v, "perm"))(db_valid),
        )
        results["perm_ms"] = round(ms, 2)
        results["perm_qps"] = round(Q / (ms / 1e3))
        s, i = np.asarray(out[0]), np.asarray(out[1])
        ok = bool((s[:, 0] > 0.999).all())
        results["perm_selfmatch"] = ok
        print(f"perm-only:   {ms:.2f} ms = {Q/(ms/1e3):.0f} QPS (compile {cs:.1f}s) selfmatch={ok}", flush=True)
        del db_perm

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
