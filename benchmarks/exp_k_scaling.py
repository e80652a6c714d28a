"""How does sweep time scale with k (the per-query result count)?

The HTTP search default is limit=100 -> k=128 after pow2 bucketing; the
engine benchmarks all use k=10 -> 16. If phase-2 selection cost grows
super-linearly with k, every default-limit API call pays it.

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/exp_k_scaling.py
Knobs: EXP_ROWS (default 1_048_576), EXP_Q (256)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from iscc_search_tpu.ops.pallas_scan import pallas_blockmax_topk
    from iscc_search_tpu.ops.pm1_scan import pm1_blockmax_topk

    rows = int(os.environ.get("EXP_ROWS", 1 << 20))
    q = int(os.environ.get("EXP_Q", 256))
    nbits = 256
    lanes = nbits // 32
    rng = np.random.default_rng(3)
    db_packed = rng.integers(0, 1 << 32, (rows, lanes), dtype=np.uint32)
    valid = np.ones(rows, dtype=bool)
    qidx = rng.integers(0, rows, q)
    q_codes = db_packed[qidx]

    # unpack to +-1 int8 rows for the unpacked twin
    bits = np.unpackbits(db_packed.view(np.uint8), bitorder="little", axis=1)
    db_unpacked = (bits.astype(np.int8) * 2 - 1)
    q_bits = np.unpackbits(q_codes.view(np.uint8), bitorder="little", axis=1)
    q_pm1 = (q_bits.astype(np.int8) * 2 - 1)
    q_scale = np.full(q, 1.0 / nbits, np.float32)

    dev_packed = jax.device_put(jnp.asarray(db_packed))
    dev_unpacked = jax.device_put(jnp.asarray(db_unpacked))
    dev_valid = jax.device_put(jnp.asarray(valid))
    dev_qpm1 = jax.device_put(jnp.asarray(q_pm1))
    dev_qscale = jax.device_put(jnp.asarray(q_scale))

    chunk = 32768
    print(f"rows={rows} q={q} nbits={nbits} chunk={chunk}", flush=True)
    for kernel_name, fn in (
        ("pallas", lambda k: pallas_blockmax_topk(
            dev_qpm1, dev_qscale, dev_packed, dev_valid, k, nbits,
            chunk_size=chunk, db_unpacked=dev_unpacked, unpacked=True)),
        ("xla", lambda k: pm1_blockmax_topk(
            dev_qpm1, dev_qscale, dev_packed, dev_valid, k, nbits, chunk_size=chunk)),
    ):
        for k in (16, 32, 64, 128, 256):
            t0 = time.perf_counter()
            s, i = fn(k)
            np.asarray(s)
            compile_s = time.perf_counter() - t0
            repeat = 10
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(repeat):
                    s, i = fn(k)
                np.asarray(s)
                best = min(best, (time.perf_counter() - t0) / repeat)
            print(
                f"{kernel_name:7s} k={k:4d}: {best * 1e3:8.2f} ms/sweep "
                f"(compile {compile_s:.1f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
