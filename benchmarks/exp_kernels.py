"""Phase-1 kernel variant A/B harness (run on one TPU chip).

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/exp_kernels.py [--n ROWS]

Variants (all produce (Q, N/128) block maxima from the ±1 int8 layout):
  base      - production kernel (int32 dot -> f32 convert+penalty -> lane max)
  bf16      - epilogue in bf16 (2x VPU element throughput; exact: |dot|<=256
              and the -65536 penalty are bf16-representable)
  bf16_nopen- bf16 epilogue without the validity penalty (upper bound probe)
  trans     - transposed dot (slab, Q) + sublane-group max (layout probe)
  sub2048 / sub8192 - bf16 epilogue with different sub-tile sizes
"""

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from iscc_search_tpu.ops.pallas_scan import BLOCK, build_unpacked_db, pallas_blockmax
from iscc_search_tpu.ops.pm1_scan import prepare_queries

N = int(float(sys.argv[sys.argv.index("--n") + 1])) if "--n" in sys.argv else 10 * 1024 * 1024
Q = int(sys.argv[sys.argv.index("--q") + 1]) if "--q" in sys.argv else 256
NBITS = 256
CHUNK = 16384
REPEAT = 30

names = [a for i, a in enumerate(sys.argv[1:]) if not a.startswith("--") and (i == 0 or sys.argv[i] not in ("--n", "--q"))]
if not names:
    names = ["base", "bf16", "bf16_nopen", "trans", "sub2048", "sub8192"]


def _kernel_bf16(q_ref, qs_ref, db_ref, pen_ref, out_ref, *, chunk, sub, penalty=True):
    qv = q_ref[:]
    qn = qv.shape[0]
    for t in range(chunk // sub):
        dot = jax.lax.dot_general(
            qv, db_ref[t * sub : (t + 1) * sub, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        d16 = dot.astype(jnp.bfloat16)
        if penalty:
            d16 = d16 + pen_ref[0:1, t * sub : (t + 1) * sub]
        m = jnp.max(d16.reshape(qn, sub // BLOCK, BLOCK), axis=2)
        out_ref[:, t * (sub // BLOCK) : (t + 1) * (sub // BLOCK)] = (
            0.5 + m.astype(jnp.float32) * qs_ref[:]
        )


def _kernel_trans(q_ref, qs_ref, db_ref, pen_ref, out_ref, *, chunk, sub):
    qv = q_ref[:]
    qn = qv.shape[0]
    for t in range(chunk // sub):
        dot = jax.lax.dot_general(
            db_ref[t * sub : (t + 1) * sub, :], qv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (sub, Q)
        d16 = dot.astype(jnp.bfloat16) + pen_ref[t * sub : (t + 1) * sub, 0:1]
        m = jnp.max(d16.reshape(sub // BLOCK, BLOCK, qn), axis=1)  # (sub/128, Q)
        out_ref[t * (sub // BLOCK) : (t + 1) * (sub // BLOCK), :] = (
            0.5 + m.astype(jnp.float32) * qs_ref[:].reshape(1, qn)
        )


def _kernel_dotonly(q_ref, qs_ref, db_ref, pen_ref, out_ref, *, chunk, sub, dtype):
    """Dot + tiny fixed-slice store: isolates MXU(+DMA) cost, no epilogue."""
    qv = q_ref[:]
    if dtype == jnp.bfloat16:
        qv = qv.astype(jnp.bfloat16)
    qn = qv.shape[0]
    acc = jnp.int32 if dtype == jnp.int8 else jnp.float32
    for t in range(chunk // sub):
        d = db_ref[t * sub : (t + 1) * sub, :]
        if dtype == jnp.bfloat16:
            d = d.astype(jnp.bfloat16)
        dot = jax.lax.dot_general(qv, d, (((1,), (1,)), ((), ())), preferred_element_type=acc)
        out_ref[:, t * (sub // BLOCK) : (t + 1) * (sub // BLOCK)] = dot[:, : sub // BLOCK].astype(
            jnp.float32
        )


def _kernel_consume(q_ref, qs_ref, db_ref, pen_ref, out_ref, *, chunk, sub, acc):
    """Full-size dot consumed via a second matmul (no epilogue, no DCE)."""
    qv = q_ref[:]
    qn = qv.shape[0]
    for t in range(chunk // sub):
        dot = jax.lax.dot_general(
            qv, db_ref[t * sub : (t + 1) * sub, :], (((1,), (1,)), ((), ())),
            preferred_element_type=acc,
        )  # (Q, sub)
        d16 = dot.astype(jnp.bfloat16)
        ones = jnp.full((sub // BLOCK, sub), 1, jnp.bfloat16)
        red = jax.lax.dot_general(
            d16, ones, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Q, sub//BLOCK) - consumes every dot column
        out_ref[:, t * (sub // BLOCK) : (t + 1) * (sub // BLOCK)] = red.astype(jnp.float32)


def _kernel_tree(q_ref, qs_ref, db_ref, pen_ref, out_ref, *, chunk, sub):
    """bf16 epilogue with an explicit halving maximum tree over lane groups."""
    qv = q_ref[:]
    qn = qv.shape[0]
    for t in range(chunk // sub):
        dot = jax.lax.dot_general(
            qv, db_ref[t * sub : (t + 1) * sub, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        x = dot.astype(jnp.bfloat16) + pen_ref[0:1, t * sub : (t + 1) * sub]
        x = x.reshape(qn, (sub // BLOCK) * 2, BLOCK // 2)  # pre-split in halves
        w = BLOCK // 2
        x = jnp.maximum(x[:, 0::2, :], x[:, 1::2, :])  # (qn, nb, 64)
        while w > 1:
            x = jnp.maximum(x[..., : w // 2], x[..., w // 2 : w])
            w //= 2
        out_ref[:, t * (sub // BLOCK) : (t + 1) * (sub // BLOCK)] = (
            0.5 + x[..., 0].astype(jnp.float32) * qs_ref[:]
        )


def _kernel_tree_trans(q_ref, qs_ref, db_ref, pen_ref, out_ref, *, chunk, sub):
    """Transposed dot + explicit halving maximum tree over sublane groups."""
    qv = q_ref[:]
    qn = qv.shape[0]
    for t in range(chunk // sub):
        dot = jax.lax.dot_general(
            db_ref[t * sub : (t + 1) * sub, :], qv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (sub, Q)
        x = dot.astype(jnp.bfloat16) + pen_ref[t * sub : (t + 1) * sub, 0:1]
        w = BLOCK
        while w > 1:
            half = x.reshape(-1, w, qn)
            x = jnp.maximum(half[:, : w // 2, :], half[:, w // 2 :, :])
            w //= 2
        m = x.reshape(sub // BLOCK, qn)
        out_ref[t * (sub // BLOCK) : (t + 1) * (sub // BLOCK), :] = (
            0.5 + m.astype(jnp.float32) * qs_ref[:].reshape(1, qn)
        )


def _kernel_u8max(q_ref, qs_ref, db_ref, pen_ref, out_ref, *, chunk, sub):
    """u8-domain epilogue: dot is always even, so dot/2+127 is exact in u8
    (except dot=256 -> 255+... clamped; see analysis), max at 4x VPU rate."""
    qv = q_ref[:]
    qn = qv.shape[0]
    for t in range(chunk // sub):
        dot = jax.lax.dot_general(
            qv, db_ref[t * sub : (t + 1) * sub, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = jnp.clip((dot >> 1) + 127, 0, 255).astype(jnp.uint8)
        # validity as a 0/1 u8 multiply (invalid rows -> 0 = floor)
        y = y * pen_ref[0:1, t * sub : (t + 1) * sub]
        m = jnp.max(y.reshape(qn, sub // BLOCK, BLOCK), axis=2)
        out_ref[:, t * (sub // BLOCK) : (t + 1) * (sub // BLOCK)] = (
            (m.astype(jnp.float32) - 127.0) * 2.0
        )


def _kernel_tree2d(q_ref, qs_ref, db_ref, pen_ref, out_ref, *, chunk, sub):
    """2D full-width halving tree (TIMING PROBE: maxes stride classes, not
    consecutive blocks — grouping is wrong, cost is representative)."""
    qv = q_ref[:]
    qn = qv.shape[0]
    for t in range(chunk // sub):
        dot = jax.lax.dot_general(
            qv, db_ref[t * sub : (t + 1) * sub, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        x = dot.astype(jnp.bfloat16) + pen_ref[0:1, t * sub : (t + 1) * sub]
        w = sub
        while w > sub // BLOCK:
            x = jnp.maximum(x[:, : w // 2], x[:, w // 2 : w])
            w //= 2
        out_ref[:, t * (sub // BLOCK) : (t + 1) * (sub // BLOCK)] = (
            0.5 + x.astype(jnp.float32) * qs_ref[:]
        )


def _kernel_bf16dot(q_ref, qs_ref, db_ref, pen_ref, out_ref, *, chunk, sub):
    """Explicit int8 -> bf16 convert + bf16 MXU dot (f32 accum), f32 epilogue."""
    qv = q_ref[:].astype(jnp.bfloat16)
    qn = qv.shape[0]
    for t in range(chunk // sub):
        d = db_ref[t * sub : (t + 1) * sub, :].astype(jnp.bfloat16)
        dot = jax.lax.dot_general(
            qv, d, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dot = dot + pen_ref[0:1, t * sub : (t + 1) * sub]
        m = jnp.max(dot.reshape(qn, sub // BLOCK, BLOCK), axis=2)
        out_ref[:, t * (sub // BLOCK) : (t + 1) * (sub // BLOCK)] = 0.5 + m * qs_ref[:]


def make_variant(name, n, q):
    chunk = CHUNK
    if name.startswith("chunk"):
        chunk = int(name[5:])
    nch = n // chunk
    vp = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)

    def call(kernel, out_shape, in_specs, out_spec, *arrays):
        return pl.pallas_call(
            kernel, grid=(nch,), in_specs=in_specs, out_specs=out_spec,
            out_shape=out_shape, compiler_params=vp,
        )(*arrays)

    if name.startswith("consume") or name in ("nodma_full", "bf16dot"):
        nodma = "nodma" in name
        if name == "nodma_full":
            kern = functools.partial(_kernel_bf16, chunk=chunk, sub=4096, penalty=True)
        elif name == "bf16dot":
            kern = functools.partial(_kernel_bf16dot, chunk=chunk, sub=4096)
        else:
            acc = jnp.float32 if "f32acc" in name else jnp.int32
            kern = functools.partial(_kernel_consume, chunk=chunk, sub=4096, acc=acc)
        db_map = (lambda i: (0, 0)) if nodma else (lambda i: (i, 0))

        @jax.jit
        def fn(q_i8, qs, db, pen16):
            return call(
                kern,
                jax.ShapeDtypeStruct((q, n // BLOCK), jnp.float32),
                [
                    pl.BlockSpec((q, NBITS), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((q, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((chunk, NBITS), db_map, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
                ],
                pl.BlockSpec((q, chunk // BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
                q_i8, qs, db, pen16,
            )

        return fn, "row"

    if name.startswith("dotonly"):
        nodma = "nodma" in name
        dtype = jnp.bfloat16 if "bf16" in name else jnp.int8
        kern = functools.partial(_kernel_dotonly, chunk=chunk, sub=4096, dtype=dtype)
        db_map = (lambda i: (0, 0)) if nodma else (lambda i: (i, 0))

        @jax.jit
        def fn(q_i8, qs, db, pen16):
            return call(
                kern,
                jax.ShapeDtypeStruct((q, n // BLOCK), jnp.float32),
                [
                    pl.BlockSpec((q, NBITS), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((q, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((chunk, NBITS), db_map, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
                ],
                pl.BlockSpec((q, chunk // BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
                q_i8, qs, db, pen16,
            )

        return fn, "row"

    if name in ("bf16", "bf16_nopen", "sub2048", "sub8192", "tree", "tree2d", "u8max") or name.startswith("chunk"):
        sub = {"sub2048": 2048, "sub8192": 8192}.get(name, 4096)
        if name == "tree":
            kern = functools.partial(_kernel_tree, chunk=chunk, sub=sub)
        elif name == "tree2d":
            kern = functools.partial(_kernel_tree2d, chunk=chunk, sub=sub)
        elif name == "u8max":
            kern = functools.partial(_kernel_u8max, chunk=chunk, sub=sub)
        else:
            kern = functools.partial(
                _kernel_bf16, chunk=chunk, sub=sub, penalty=(name != "bf16_nopen")
            )

        @jax.jit
        def fn(q_i8, qs, db, pen16):
            return call(
                kern,
                jax.ShapeDtypeStruct((q, n // BLOCK), jnp.float32),
                [
                    pl.BlockSpec((q, NBITS), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((q, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((chunk, NBITS), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
                ],
                pl.BlockSpec((q, chunk // BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
                q_i8, qs, db, pen16,
            )

        return fn, "row"

    if name in ("trans", "tree_trans"):
        kern = functools.partial(
            _kernel_tree_trans if name == "tree_trans" else _kernel_trans, chunk=CHUNK, sub=4096
        )

        @jax.jit
        def fn(q_i8, qs, db, pen16_t):
            return call(
                kern,
                jax.ShapeDtypeStruct((n // BLOCK, q), jnp.float32),
                [
                    pl.BlockSpec((q, NBITS), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((q, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((CHUNK, NBITS), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((CHUNK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                pl.BlockSpec((CHUNK // BLOCK, q), lambda i: (i, 0), memory_space=pltpu.VMEM),
                q_i8, qs, db, pen16_t,
            )

        return fn, "col"

    raise ValueError(name)


def main():
    print(json.dumps({"device": str(jax.devices()[0]), "n": N, "q": Q, "repeat": REPEAT}), flush=True)
    rng = np.random.default_rng(7)
    packed = rng.integers(0, 2**32, (N, NBITS // 32), dtype=np.uint32)
    lanes = np.full(N, 8, np.int32)
    valid = np.ones(N, bool)
    valid[rng.integers(0, N, 1000)] = False
    q_packed = packed[rng.integers(0, N, Q)]
    q_pm1, q_scale = prepare_queries(q_packed, lanes[:Q], NBITS)

    db_packed = jax.device_put(jnp.asarray(packed))
    db_unpacked = build_unpacked_db(db_packed, NBITS)
    np.asarray(db_unpacked[:1, :1])

    qp = jnp.asarray(q_pm1)
    qs32 = jnp.asarray(q_scale)[:, None]
    q_i8 = jnp.asarray(q_pm1.astype(np.int8))
    db_valid = jnp.asarray(valid)
    pen16 = jnp.where(db_valid, 0, -65536).astype(jnp.bfloat16)[None, :]
    pen16_t = pen16.reshape(N, 1)
    pen_u8 = db_valid.astype(jnp.uint8)[None, :]

    def bench(fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[:1, :1])
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(REPEAT):
                out = fn(*args)
            np.asarray(out[:1, :1])
            best = min(best, (time.perf_counter() - t0) / REPEAT)
        return best * 1e3, compile_s, out

    ref_bm = None
    results = {}
    for name in names:
        try:
            if name == "base":
                ms, cs, out = bench(
                    lambda a, b, c, d: pallas_blockmax(a, b, c, d, NBITS, chunk_size=CHUNK, unpacked=True),
                    qp, qs32[:, 0], db_unpacked, db_valid,
                )
                ref_bm = np.asarray(out)
            else:
                fn, orient = make_variant(name, N, Q)
                if orient == "row":
                    pen_arg = pen_u8 if name == "u8max" else pen16
                    ms, cs, out = bench(fn, q_i8, qs32, db_unpacked, pen_arg)
                    got = np.asarray(out)
                else:
                    ms, cs, out = bench(fn, q_i8, qs32, db_unpacked, pen16_t)
                    got = np.asarray(out).T
                if ref_bm is not None:
                    ok = np.allclose(got, ref_bm, atol=1e-3)
                    vm = np.abs(got - ref_bm).max()
                    print(f"  {name}: matches base {ok} (max diff {vm:.2e})", flush=True)
            results[name] = round(ms, 2)
            print(f"{name}: {ms:.2f} ms (compile {cs:.1f}s)", flush=True)
        except Exception as exc:
            print(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:300]}", flush=True)
            results[name] = None
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
