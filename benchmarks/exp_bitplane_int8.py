"""
A/B: bitplane phase-1 kernel dot precision + plane-group width.

The shipped `_scan_kernel_bitplane` dots in bf16 (per-bit select -> f32 ->
bf16). v5e bf16 MXU peak is ~197 TFLOPs vs ~394 TOPS int8 — if the 0/1
planes can be materialized as int8 cheaply, phase 1 halves its floor.
Variants measured here, all producing identical block maxima:

  A  shipped kernel (bf16 select, planes_per_dot=4)   — baseline
  B  shipped kernel, planes_per_dot in {8, 16}
  C  int8 planes via bits.astype(int8), int8 MXU dot, planes {4, 8, 16}
  D  bf16 planes via bits.astype(bf16) (cast, no select), planes 4
  E  int8v2: pre-narrow 4 byte groups, per-plane i8 shift+and (4x fewer
     VPU element-ops — phase 1 is VPU-extraction-bound after C)

Measured on v5e (8.4M x 256-bit, Q=256, chunk 32768):
  A/B  bf16 select: 11.4-11.5 ms (planes_per_dot makes no difference jitted)
  C    int8 cast:    6.9-7.1 ms, exact — ADOPTED into _scan_kernel_bitplane
  D    FAILS: Mosaic has no u32 -> bf16 cast lowering (why A used select)
  E    FAILS: Mosaic cannot lower the int8 shift/and ops (remote compile
       exit 1) — the VPU-bound tail (~3.4 us/slab vs 1.4 us int8-MXU floor)
       is not reachable through narrower extraction arithmetic today.

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/exp_bitplane_int8.py
Env: EXP_N (rows, default 8388608), EXP_Q (default 256)
"""

import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from iscc_search_tpu.ops.pallas_scan import (
    BLOCK,
    _SUBTILE,
    _block_spec,
    _HAS_PLTPU,
    bit_transpose_packed,
    bitplane_penalty_perm,
    pallas_blockmax,
)
from iscc_search_tpu.ops.pm1_scan import prepare_queries

if _HAS_PLTPU:
    from jax.experimental.pallas import tpu as pltpu


def _kernel_variant(q_ref, qs_ref, db_ref, pen_ref, out_ref, *, chunk, planes_per_dot, mode):
    """mode: 'int8' (cast planes to i8, i8 dot) | 'bf16cast' (cast, bf16 dot)
    | 'int8v2' (pre-narrow 4 byte groups to i8 once, per-plane i8 shift+and:
    ~4x fewer VPU element-ops than per-plane u32 shift/and/cast)."""
    qv = q_ref[:]
    if mode in ("int8", "int8v2"):
        qsum = jnp.sum(qv.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
    else:
        qsum = jnp.sum(qv.astype(jnp.float32), axis=1, keepdims=True)
    slab = min(_SUBTILE, chunk)
    nb = slab // BLOCK
    vr = slab // 16
    for t in range(chunk // slab):
        tile = db_ref[t * vr : (t + 1) * vr, :]
        if mode == "int8v2":
            groups = [(tile >> jnp.uint32(8 * b)).astype(jnp.int8) for b in range(4)]
        dots = []
        for s0 in range(0, 32, planes_per_dot):
            planes = []
            for s in range(s0, s0 + planes_per_dot):
                if mode == "int8v2":
                    planes.append(
                        (groups[s // 8] >> jnp.int8(s % 8)) & jnp.int8(1)
                    )
                else:
                    bits = (tile >> jnp.uint32(s)) & jnp.uint32(1)
                    if mode == "int8":
                        planes.append(bits.astype(jnp.int8))
                    else:
                        planes.append(bits.astype(jnp.bfloat16))
            d = planes[0] if len(planes) == 1 else jnp.concatenate(planes, axis=1)
            if mode in ("int8", "int8v2"):
                dots.append(
                    jax.lax.dot_general(
                        qv, d, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
                    ).astype(jnp.float32)
                )
            else:
                dots.append(
                    jax.lax.dot_general(
                        qv, d, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                    )
                )
        dot01 = jnp.concatenate(dots, axis=1)
        x = (2.0 * dot01 - qsum).astype(jnp.bfloat16) + pen_ref[0:1, t * slab : (t + 1) * slab]
        w = slab
        while w > nb:
            x = jnp.maximum(x[:, : w // 2], x[:, w // 2 : w])
            w //= 2
        out_ref[:, t * nb : (t + 1) * nb] = 0.5 + x.astype(jnp.float32) * qs_ref[:]


def make_variant(n, q, chunk, planes_per_dot, mode):
    """Build ONE jitted callable per variant (re-jitting per call would
    retrace/recompile every invocation and pollute the measurement)."""
    kernel = functools.partial(
        _kernel_variant, chunk=chunk, planes_per_dot=planes_per_dot, mode=mode
    )
    kwargs = {}
    if _HAS_PLTPU:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)

    def fn(q_pm1, q_scale, db, pen):
        q_in = q_pm1.astype(jnp.int8) if mode == "int8" else q_pm1.astype(jnp.bfloat16)
        qs = q_scale.astype(jnp.float32)[:, None]
        return pl.pallas_call(
            kernel,
            grid=(n // chunk,),
            in_specs=[
                _block_spec((q, 256), lambda i: (0, 0)),
                _block_spec((q, 1), lambda i: (0, 0)),
                _block_spec((chunk // 16, 128), lambda i: (i, 0)),
                _block_spec((1, chunk), lambda i: (0, i)),
            ],
            out_specs=_block_spec((q, chunk // BLOCK), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((q, n // BLOCK), jnp.float32),
            **kwargs,
        )(q_in, qs, db, pen)

    return jax.jit(fn)


def amortized(fn, repeat=10):
    out = fn()
    np.asarray(out[:1, :1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(repeat):
            out = fn()
        np.asarray(out[:1, :1])
        best = min(best, (time.perf_counter() - t0) / repeat)
    return best


def main():
    n = int(os.environ.get("EXP_N", 8_388_608))
    q = int(os.environ.get("EXP_Q", 256))
    chunk = 32768
    rng = np.random.default_rng(0)
    print(f"n={n} q={q} chunk={chunk} device={jax.devices()[0]}", flush=True)

    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, n // 64)] = False
    q_pm1, q_scale = prepare_queries(packed[:: n // q][:q].copy(), np.full(q, 8, np.int32), 256)
    q_pm1_d, q_scale_d = jnp.asarray(q_pm1), jnp.asarray(q_scale)

    t0 = time.perf_counter()
    bt = jax.jit(bit_transpose_packed)(jnp.asarray(packed))
    bt.block_until_ready()
    print(f"twin build {time.perf_counter() - t0:.1f}s", flush=True)
    penalty = jnp.where(jnp.asarray(valid), 0, -65536).astype(jnp.float32)[None, :]
    pen_bp = bitplane_penalty_perm(penalty.reshape(n)).reshape(1, n).astype(jnp.bfloat16)
    pen_bp = jax.device_put(pen_bp)

    # Baseline: shipped kernel under ONE jit (the engine always runs it
    # inside a jitted program; eager calls pay per-op tunnel dispatches and
    # a per-call penalty permute — not what production measures).
    valid_d = jnp.asarray(valid)
    shipped = {
        ppd: jax.jit(
            functools.partial(
                pallas_blockmax, nbits=256, chunk_size=chunk, bitplane=True, planes_per_dot=ppd
            )
        )
        for ppd in (4, 8, 16)
    }
    results = {}
    ref_npy = None
    for ppd, fn in shipped.items():
        label = f"shipped_bf16_p{ppd}"
        t0 = time.perf_counter()
        ref = fn(q_pm1_d, q_scale_d, bt, valid_d)
        ref.block_until_ready()
        compile_s = time.perf_counter() - t0
        dt = amortized(lambda fn=fn: fn(q_pm1_d, q_scale_d, bt, valid_d))
        results[label] = dt
        print(f"{label}: {dt * 1e3:.2f} ms (compile {compile_s:.0f}s)", flush=True)
        if ppd == 4:
            ref_npy = np.asarray(ref)

    for mode in ("int8", "int8v2"):
        for ppd in (4, 8, 16):
            if mode == "int8" and ppd != 8:
                continue  # int8 measured flat across ppd in the first run
            label = f"{mode}_p{ppd}"
            fn = make_variant(n, q, chunk, ppd, mode)
            try:
                t0 = time.perf_counter()
                out = fn(q_pm1_d, q_scale_d, bt, pen_bp)
                out.block_until_ready()
                compile_s = time.perf_counter() - t0
            except Exception as exc:
                print(f"{label}: FAILED {type(exc).__name__}: {str(exc)[:200]}", flush=True)
                continue
            ok = np.allclose(np.asarray(out), ref_npy, atol=2e-3)
            dt = amortized(lambda fn=fn: fn(q_pm1_d, q_scale_d, bt, pen_bp))
            results[label] = dt
            print(
                f"{label}: {dt * 1e3:.2f} ms (compile {compile_s:.0f}s) exact={ok}",
                flush=True,
            )

    best = min(results, key=results.get)
    print(f"BEST: {best} {results[best] * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
