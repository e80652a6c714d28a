"""int4 ±1 layout feasibility probe (run on one TPU chip).

Round-1 found int4 "broken at device transfer" — this probe sidesteps the
transfer by CONVERTING ON DEVICE (int8 -> int4 under jit) and asks the two
questions that decide whether an int4 database layout could halve phase-1's
DMA floor (measured ~580 GB/s => 4.6 ms for the 2.7 GB int8 layout at 10M):

1. Does an XLA int4 x int4 dot_general (int32 accum) compile and match int8?
2. Does a Pallas kernel accept int4 refs (DMA'd blocks) and run the same
   dot, and at what streaming rate?

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/exp_int4.py [--n ROWS]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

sys.path.insert(0, ".")

N = int(float(sys.argv[sys.argv.index("--n") + 1])) if "--n" in sys.argv else 1024 * 1024
Q = 8
NBITS = 256
CHUNK = 16384


def main():
    rng = np.random.default_rng(0)
    db_i8 = rng.choice(np.array([-1, 1], np.int8), size=(N, NBITS)).astype(np.int8)
    q_i8 = db_i8[:Q].copy()
    db_dev8 = jax.device_put(db_i8)
    q_dev8 = jax.device_put(q_i8)

    # --- 1. XLA int4 dot ---------------------------------------------------
    try:
        to4 = jax.jit(lambda x: x.astype(jnp.int4))
        db4 = to4(db_dev8)
        q4 = to4(q_dev8)
        jax.block_until_ready(db4)
        print(f"on-device int8->int4 convert OK, nbytes={db4.nbytes} (int8 {db_dev8.nbytes})")

        @jax.jit
        def dot4(q, d):
            return jax.lax.dot_general(q, d, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)

        t0 = time.perf_counter()
        out4 = jax.block_until_ready(dot4(q4, db4))
        compile_s = time.perf_counter() - t0
        ref = (q_i8.astype(np.int32) @ db_i8.astype(np.int32).T)
        ok = np.array_equal(np.asarray(out4), ref)
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            out4 = dot4(q4, db4)
        jax.block_until_ready(out4)
        ms = (time.perf_counter() - t0) / reps * 1000
        gbs = db4.nbytes / (ms / 1000) / 1e9
        print(f"XLA int4 dot: exact={ok}, {ms:.2f} ms, {gbs:.0f} GB/s effective (compile {compile_s:.1f}s)")
    except Exception as e:
        print(f"XLA int4 dot FAILED: {type(e).__name__}: {e}")
        return

    # int8 comparison in the same process
    @jax.jit
    def dot8(q, d):
        return jax.lax.dot_general(q, d, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)

    jax.block_until_ready(dot8(q_dev8, db_dev8))
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out8 = dot8(q_dev8, db_dev8)
    jax.block_until_ready(out8)
    ms8 = (time.perf_counter() - t0) / reps * 1000
    print(f"XLA int8 dot: {ms8:.2f} ms, {db_dev8.nbytes / (ms8 / 1000) / 1e9:.0f} GB/s effective")

    # --- 2. Pallas int4 refs ------------------------------------------------
    def kern(q_ref, db_ref, out_ref):
        dot = jax.lax.dot_general(
            q_ref[:], db_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        out_ref[:, :] = dot[:, : CHUNK // 128].astype(jnp.float32)

    try:
        nch = N // CHUNK
        kwargs = {}
        if pltpu is not None:
            kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
        fn = pl.pallas_call(
            kern,
            grid=(nch,),
            in_specs=[
                pl.BlockSpec((Q, NBITS), lambda i: (0, 0)),
                pl.BlockSpec((CHUNK, NBITS), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((Q, CHUNK // 128), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((Q, N // 128), jnp.float32),
            **kwargs,
        )
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jax.block_until_ready(jfn(q4, db4))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jfn(q4, db4)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1000
        gbs = db4.nbytes / (ms / 1000) / 1e9
        print(f"Pallas int4 kernel: {ms:.2f} ms, {gbs:.0f} GB/s streaming (compile {compile_s:.1f}s)")
    except Exception as e:
        print(f"Pallas int4 kernel FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
