"""
A/B: sub-word bitplane extraction — u8 / u16 twins vs the shipped u32 kernel.

Phase 1 of the bitplane scan is VPU-extraction-bound after the int8-MXU
dot (exp_bitplane_int8.py): the shipped kernel spends 3 full-width VPU ops
per plane (u32 shift, and, int8 cast) x 32 planes per 4096-row slab. If
Mosaic lowers SUB-WORD shift/and (u8 or u16 lanes), the same planes fall
out of 8 (u8) or 16 (u16) shift+and+cast triples over a REINTERPRETED
tile whose sublane count grew 4x / 2x — i.e. the same extracted bits for
1/4 / 1/2 the per-element op count, because each op now extracts 4 / 2
planes' worth of bits at once.

The stored twin must be re-permuted for this: after `(tile >> s) & 1` on
the u8 view, sublane range [256*b, 256*(b+1)) must expose a CONTIGUOUS
(256 bits x 128 lanes) plane. Layout (per 4096-row group, u8 variant):

    A[256*b + u, j] bit s  =  bit u of original row o(s, b, j)
    o(s, b, j) = (j % 32) * 128 + s*16 + b*4 + j // 32
    (s in [0,8), b in [0,4), j in [0,128); bit u in unpack_pm1 order)

Dot-column order c = s*512 + b*128 + j gives c % 32 == o // 128, so the
halving-tree epilogue groups columns into original 128-row blocks exactly
as the shipped kernel does, and phase 2/3 stay unchanged (the layout
permutes rows only WITHIN each 128-row block).

Prior art / risk: exp_bitplane_int8.py variant E (pre-narrowed int8
shift/and on a different layout) FAILED to lower in Mosaic at the time.
This experiment retries through the cleaner reinterpret-layout route and
falls back to u16 if 8-bit ALU ops still don't lower.

RESULT (v5e, 2026-08-18): both u8 AND u16 shift/and fail to lower
(remote Mosaic compile exit 1); correctness of both layouts verified in
interpret mode, so the blocker is purely the sub-word ALU lowering, not
the layout math. The VPU-extraction tail of the bitplane kernel is not
reachable through narrower extraction arithmetic with today's Mosaic —
kept as the recorded negative result.

Correctness is asserted against the shipped bitplane kernel (interpret
mode on CPU, exact match required) before any timing.

Run: PYTHONPATH=.:/root/.axon_site python benchmarks/exp_bitplane_u8.py
Env: EXP_N (rows, default 8388608), EXP_Q (default 256), EXP_CHUNK (32768)
     EXP_INTERPRET=1 (CPU correctness only)
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from iscc_search_tpu.ops.pallas_scan import (
    BLOCK,
    _HAS_PLTPU,
    _block_spec,
    bit_transpose_packed,
    pallas_blockmax,
)
from iscc_search_tpu.ops.pm1_scan import prepare_queries

if _HAS_PLTPU:
    from jax.experimental.pallas import tpu as pltpu

GROUP = 4096


def _o_map(width_bits):
    # type: (int) -> np.ndarray
    """(S, B, 128) original-row index per (shift s, sublane band b, lane j)."""
    s_count = width_bits
    b_count = 32 // width_bits
    s_i, b_i, j_i = np.meshgrid(
        np.arange(s_count), np.arange(b_count), np.arange(128), indexing="ij"
    )
    return (j_i % 32) * 128 + s_i * (128 // s_count) + b_i * 4 + j_i // 32


def build_twin(packed, width_bits):
    # type: (jnp.ndarray, int) -> jnp.ndarray
    """Sub-word bitplane twin: (N * width_bits // 128, 128) u8/u16 array."""
    n, lanes = packed.shape
    assert lanes == 8 and n % GROUP == 0
    o_flat = _o_map(width_bits).reshape(-1)  # (4096,)
    dtype = jnp.uint8 if width_bits == 8 else jnp.uint16
    s_count = width_bits

    def _groups(chunk_rows):
        m = chunk_rows.shape[0]
        g = m // GROUP
        shifts = (31 - np.arange(32, dtype=np.uint32))[None, None, :]
        bits = ((chunk_rows[:, :, None] >> shifts) & jnp.uint32(1)).reshape(g, GROUP, 256)
        sel = bits[:, o_flat, :].reshape(g, s_count, 4096 // s_count, 256)  # [g, s, b*128+j, u]
        w = (jnp.uint32(1) << jnp.arange(s_count, dtype=jnp.uint32))[None, :, None, None]
        acc = (sel * w).sum(axis=1, dtype=jnp.uint32)  # (g, (32/width)*128, 256)
        # sublane order within a group: 256*b + u; lanes j
        a = acc.reshape(g, 32 // width_bits, 128, 256).transpose(0, 1, 3, 2)
        return a.astype(dtype).reshape(-1, 128)

    step = 1 << 19
    while n % step:
        step >>= 1
    if n <= step:
        return _groups(packed)
    out = jax.lax.map(_groups, packed.reshape(n // step, step, 8))
    return out.reshape(-1, 128)


def penalty_perm(pen_flat, width_bits):
    # type: (jnp.ndarray, int) -> jnp.ndarray
    """Reorder a per-row (N,) penalty into dot-column order c = (s, b, j)."""
    n = pen_flat.shape[0]
    o_flat = _o_map(width_bits).reshape(-1)
    return pen_flat.reshape(n // GROUP, GROUP)[:, o_flat].reshape(n)


def _kernel(q_ref, qs_ref, db_ref, pen_ref, out_ref, *, chunk, width_bits):
    qv = q_ref[:]
    qsum = jnp.sum(qv.astype(jnp.int32), axis=1, keepdims=True)
    slab = min(GROUP, chunk)
    nb = slab // BLOCK
    bands = 32 // width_bits
    vr = bands * 256 * (slab // GROUP)  # view rows per slab for this dtype
    dt = db_ref.dtype
    for t in range(chunk // slab):
        tile = db_ref[t * vr : (t + 1) * vr, :]
        dots = []
        for s in range(width_bits):
            bits = ((tile >> dt.type(s)) & dt.type(1)).astype(jnp.int8)
            for b in range(bands):
                plane = bits[256 * b : 256 * (b + 1), :]  # (256, 128)
                dots.append(
                    jax.lax.dot_general(
                        qv, plane, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
                    )
                )
        x = jnp.concatenate(dots, axis=1) + pen_ref[0:1, t * slab : (t + 1) * slab]
        w = slab
        while w > nb:
            x = jnp.maximum(x[:, : w // 2], x[:, w // 2 : w])
            w //= 2
        pm1 = (2 * x - qsum).astype(jnp.float32)
        out_ref[:, t * nb : (t + 1) * nb] = 0.5 + pm1 * qs_ref[:]


def blockmax_subword_impl(q_pm1, q_scale, twin, db_valid, width_bits, chunk_size, interpret=False):
    # twin rows per original row: (width_bits/8) * 4096*? — derive directly:
    # per GROUP of 4096 rows the twin holds (32/width)*256 view rows.
    view_per_group = (32 // width_bits) * 256
    n = twin.shape[0] // view_per_group * GROUP
    q = q_pm1.shape[0]
    pen = jnp.where(db_valid, 0, -32768).astype(jnp.int32)
    pen = penalty_perm(pen, width_bits).reshape(1, n)
    q_in = q_pm1.astype(jnp.int8)
    qs = q_scale.astype(jnp.float32)[:, None]
    kernel = functools.partial(_kernel, chunk=chunk_size, width_bits=width_bits)
    vb = chunk_size * (32 // width_bits) // 16  # twin view rows per chunk
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
    return pl.pallas_call(
        kernel,
        grid=(n // chunk_size,),
        in_specs=[
            _block_spec((q, 256), lambda i: (0, 0)),
            _block_spec((q, 1), lambda i: (0, 0)),
            _block_spec((vb, 128), lambda i: (i, 0)),
            _block_spec((1, chunk_size), lambda i: (0, i)),
        ],
        out_specs=_block_spec((q, chunk_size // BLOCK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((q, n // BLOCK), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(q_in, qs, twin, pen)


def correctness(width_bits, interpret=True):
    rng = np.random.default_rng(83)
    n = 8192
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, 400)] = False
    q_packed = packed[:8]
    q_lanes = np.array([8, 8, 4, 2, 8, 6, 8, 8], np.int32)
    q_pm1, q_scale = prepare_queries(q_packed, q_lanes, 256)
    ref = np.asarray(
        pallas_blockmax(
            jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed),
            jnp.asarray(valid), 256, chunk_size=4096, interpret=True,
        )
    )
    twin = build_twin(jnp.asarray(packed), width_bits)
    got = np.asarray(
        blockmax_subword_impl(
            jnp.asarray(q_pm1), jnp.asarray(q_scale), twin, jnp.asarray(valid),
            width_bits, 4096, interpret=interpret,
        )
    )
    assert np.allclose(got, ref, atol=2e-3), f"u{width_bits} mismatch: {np.abs(got-ref).max()}"
    print(f"u{width_bits}: exact vs shipped bitplane blockmax (interpret={interpret})")


def device_time(width_bits, n, q, chunk):
    rng = np.random.default_rng(7)
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    q_packed = packed[(np.arange(q) * (n // q))]
    q_pm1, q_scale = prepare_queries(q_packed, np.full(q, 8, np.int32), 256)
    twin = jax.device_put(build_twin(jnp.asarray(packed), width_bits))
    qd, qsd, vd = map(jax.device_put, (jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(valid)))
    fn = jax.jit(functools.partial(blockmax_subword_impl, width_bits=width_bits, chunk_size=chunk))
    try:
        out = fn(qd, qsd, twin, vd)
        out.block_until_ready()
    except Exception as e:  # Mosaic lowering failure is the expected risk
        print(f"u{width_bits}: COMPILE FAILED: {type(e).__name__}: {str(e)[:300]}")
        return None
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn(qd, qsd, twin, vd).block_until_ready()
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1e3
    print(f"u{width_bits}: {ms:.2f} ms per blockmax sweep (N={n}, Q={q}, chunk={chunk})")
    return ms


def device_time_shipped(n, q, chunk):
    rng = np.random.default_rng(7)
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    q_packed = packed[(np.arange(q) * (n // q))]
    q_pm1, q_scale = prepare_queries(q_packed, np.full(q, 8, np.int32), 256)
    twin = jax.device_put(bit_transpose_packed(jnp.asarray(packed)))
    qd, qsd, vd = map(jax.device_put, (jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(valid)))
    fn = jax.jit(
        functools.partial(pallas_blockmax, nbits=256, chunk_size=chunk, bitplane=True)
    )
    out = fn(qd, qsd, twin, vd)
    out.block_until_ready()
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn(qd, qsd, twin, vd).block_until_ready()
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1e3
    print(f"u32 shipped (int epilogue): {ms:.2f} ms per blockmax sweep (N={n}, Q={q}, chunk={chunk})")
    return ms


def main():
    correctness(8)
    correctness(16)
    if os.environ.get("EXP_INTERPRET"):
        return
    n = int(os.environ.get("EXP_N", 8_388_608))
    q = int(os.environ.get("EXP_Q", 256))
    chunk = int(os.environ.get("EXP_CHUNK", 32768))
    base = device_time_shipped(n, q, chunk)
    for wb in (8, 16):
        ms = device_time(wb, n, q, chunk)
        if ms and base:
            print(f"  u{wb} vs shipped: {base / ms:.2f}x")


if __name__ == "__main__":
    main()
