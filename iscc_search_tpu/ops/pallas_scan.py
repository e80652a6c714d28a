"""
Pallas TPU kernel: fused NPHD scan phase-1 (unpack + MXU matmul + block-max).

The XLA scan materializes the unpacked ±1 codes (and per-chunk scores)
through HBM between the unpack, the matmul, and the reduction. This kernel
keeps the whole per-chunk pipeline in VMEM:

    HBM --DMA--> packed (C, 8) uint32 in VMEM
              -> unpack to (C, 256) ±1 bf16        (VPU)
              -> dot(q (Q, 256), unpacked^T)       (MXU)
              -> + validity penalty (dot domain)   (VPU)
              -> max over 128-row blocks           (VPU)
              -> score = 0.5 + max * q_scale       (VPU, 128x smaller tile)
    VMEM --> (Q, C/128) block maxima --> HBM

pallas pipelines the packed-block DMA against compute (grid over chunks with
double-buffered BlockSpecs). The exact top-k then finishes in XLA exactly as
in ops.pm1_scan.pm1_blockmax_topk (top-k blocks -> gather -> rescore).

A second variant skips the unpack by reading pre-unpacked ±1 int8 codes
(8x HBM footprint, lower VPU load) — a memory/speed trade exposed to the
engine as a layout knob.

Caveat (measured on v5e): the packed variant's custom-call operand layout
forces a 16x lane-padded device copy of the u32[N, 8] database (the minor
dim pads to 128 lanes), so at very large N prefer the XLA packed scan
(ops.pm1_scan.pm1_blockmax_topk reads the compact resting layout and also
measures faster) — the engine's auto routing already does this.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pragma: no cover - exercised only on TPU backends
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from iscc_search_tpu.ops.pm1_scan import NEG_SCORE, topk_blocks_hier, unpack_pm1

BLOCK = 128  # rows per block-max cell (matches pm1_blockmax_topk)


def _vmem():
    return pltpu.VMEM if _HAS_PLTPU else None


def _block_spec(shape, index_map):
    if _HAS_PLTPU:
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)
    return pl.BlockSpec(shape, index_map)  # pragma: no cover - interpret mode


def _unpack_pm1_2d(chunk_codes, nbits, dtype, interpret):
    """
    Mosaic-friendly unpack: (C, L) uint32 -> (C, nbits) ±1 using only 2D ops.

    Each lane value is element-repeated 32x along the lane axis (column c
    then holds lane c//32), shifted by a per-column iota amount, and masked —
    no 3D intermediates or shape casts, which Mosaic's layout inference
    rejects.
    """
    c = chunk_codes.shape[0]
    lanes = nbits // 32
    # Work in up-to-128-column segments (full VPU lane width). Each segment
    # spans up to 4 uint32 lanes; the per-column lane value is gathered with
    # masked broadcasts (uint32 multiply by a 0/1 mask), then shifted by a
    # per-column iota. Column order stays canonical big-endian, matching the
    # host-side query layout (pltpu.repeat is unusable here: it tiles rather
    # than element-repeats, permuting columns). Widths that are not multiples
    # of 128 (e.g. 192-bit units) get a trailing narrower segment.
    pieces = []
    for lane_base in range(0, lanes, 4):
        seg_lanes = min(4, lanes - lane_base)
        seg_w = seg_lanes * 32
        col = jax.lax.broadcasted_iota(jnp.int32, (c, seg_w), 1)
        lane_of_col = col >> 5  # 0..seg_lanes-1 within the segment
        shift = (31 - (col & 31)).astype(jnp.uint32)
        acc = chunk_codes[:, lane_base : lane_base + 1] * (lane_of_col == 0).astype(jnp.uint32)
        for j in range(1, seg_lanes):
            acc += chunk_codes[:, lane_base + j : lane_base + j + 1] * (lane_of_col == j).astype(jnp.uint32)
        bits = (acc >> shift) & jnp.uint32(1)
        # Select in f32 (same 32-bit tiling as the i1 mask — no relayout),
        # then cast down; Mosaic rejects i1 -> 16-bit-tiled selects.
        pieces.append(jnp.where(bits > 0, jnp.float32(1.0), jnp.float32(-1.0)))
    out = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
    return out.astype(dtype)


_SUBTILE = 4096  # rows unpacked+scored per inner step (bounds VMEM temporaries)


def _scan_kernel_packed(q_ref, qs_ref, db_ref, pen_ref, out_ref, *, nbits, chunk, interpret):
    """
    One grid step: fused unpack + dot + scale + mask + 128-block max.

    The chunk is processed in sub-tiles: every jnp op materializes a VMEM
    temporary, so a full-chunk unpack would need ~8x the chunk in VMEM;
    the statically unrolled sub-tile loop caps the live set.
    """
    q = q_ref[:]  # (Q, nbits) bf16
    qn = q.shape[0]
    sub = min(_SUBTILE, chunk)
    for t in range(chunk // sub):
        codes = db_ref[t * sub : (t + 1) * sub, :]  # (sub, nbits//32) uint32
        d = _unpack_pm1_2d(codes, nbits, jnp.bfloat16, interpret)  # (sub, nbits)
        dot = jax.lax.dot_general(
            q, d, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Q, sub) — exact small integers
        # Penalty + block-max in the dot domain (score is monotone in dot per
        # query since q_scale > 0); convert+scale runs on the 128x-smaller
        # maxima tile instead of the full score matrix.
        dot = dot + pen_ref[0:1, t * sub : (t + 1) * sub]  # 0 valid / -65536 invalid
        m = jnp.max(dot.reshape(qn, sub // BLOCK, BLOCK), axis=2)
        out_ref[:, t * (sub // BLOCK) : (t + 1) * (sub // BLOCK)] = 0.5 + m * qs_ref[:]


def _scan_kernel_unpacked(q_ref, qs_ref, db_ref, pen_ref, out_ref, *, chunk):
    """Same, reading pre-unpacked ±1 int8 codes: pure int8 MXU dot.

    Sub-slabbed like the packed kernel: a full-chunk (Q, chunk) f32 dot tile
    keeps a 32 MB live set in VMEM; smaller slabs overlap MXU and DMA a
    little better (~5% measured on v5e).
    """
    qv = q_ref[:]
    qn = qv.shape[0]
    slab = min(_SUBTILE, chunk)
    for t in range(chunk // slab):
        dot = jax.lax.dot_general(
            qv, db_ref[t * slab : (t + 1) * slab, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # Penalty + block-max in the (f32) dot domain: int32 reductions lower
        # to a spill-heavy Mosaic path, so convert first, then scale only the
        # 128x-smaller maxima tile.
        dotf = dot.astype(jnp.float32) + pen_ref[0:1, t * slab : (t + 1) * slab]
        m = jnp.max(dotf.reshape(qn, slab // BLOCK, BLOCK), axis=2)
        out_ref[:, t * (slab // BLOCK) : (t + 1) * (slab // BLOCK)] = 0.5 + m * qs_ref[:]


PERM_GROUP = 4096  # rows per permutation group (== _SUBTILE)
PERM_CLASSES = PERM_GROUP // BLOCK  # 32 blocks interleaved per group


def permute_packed_rows(packed, lanes):
    # type: (jnp.ndarray, int) -> jnp.ndarray
    """
    Row permutation for the PACKED perm twin (same 32 B/row footprint).

    Stored so that the natural (N*lanes//128, 128) uint32 view — minor dim
    128, hence a native Mosaic operand layout with NO padded device copy —
    unpacks in-kernel into dot columns ordered exactly as the halving-tree
    epilogue requires (p = c*32 + v  <->  original row v*128 + c per
    4096-row group; see _scan_kernel_packed_perm).

    Derivation: with R = 128//lanes stored rows per view row, view row u,
    group g = col//lanes puts stored row R*u + g at dot column
    p = g*(4096//R) + u. Requiring p = c*32 + v with original row v*128 + c
    gives stored[c2*32R + v*R + g] = orig[v*128 + g*(128//R) + c2]
    (c2 < 128//R, v < 32, g < R) — a per-group reshape/transpose.

    Requires lanes | 128 (lanes in {1, 2, 4, 8}) and N % 4096 == 0.
    """
    n = packed.shape[0]
    r = 128 // lanes
    if 128 % lanes or n % PERM_GROUP:
        raise ValueError("perm-packed layout needs lanes | 128 and N % 4096 == 0")
    rest = packed.shape[1:]
    x = packed.reshape((n // PERM_GROUP, 32, r, 128 // r) + rest)
    return x.transpose((0, 3, 1, 2) + tuple(range(4, x.ndim))).reshape(packed.shape)


def permute_rows(x, group=PERM_GROUP, classes=PERM_CLASSES):
    # type: (jnp.ndarray, int, int) -> jnp.ndarray
    """
    Block-interleave rows within each ``group``: stored[g*G + C*i + b] =
    x[g*G + b*(G//C) + i], i.e. a (classes, G//C) transpose per group.

    With this layout the scan kernel's 2D halving maximum tree (which reduces
    stride-``classes`` column classes) computes exactly the per-consecutive-
    128-row block maxima of the ORIGINAL row order — measured 2.5x faster
    than the 3D-reshape lane reduction, which forces a Mosaic relayout.
    """
    n = x.shape[0]
    rest = x.shape[1:]
    return x.reshape((n // group, classes, group // classes) + rest).swapaxes(1, 2).reshape(x.shape)


def bit_transpose_packed(packed):
    # type: (jnp.ndarray) -> jnp.ndarray
    """
    Bit-transposed packed twin for the Pallas bitplane scan (32 B/row).

    Within each 4096-row group, stored u32 word at view position (u, j) of
    the natural (N//16, 128) view holds, at BIT s, bit u of original row
    ``o = j0*128 + s*4 + j1`` (j = j1*32 + j0). The scan kernel then needs
    only per-lane shift+mask to expose a full (256 bits, 128 rows) ±1 plane
    per s — zero cross-lane data movement, the unpack cost that disqualified
    the in-kernel row-major unpack (measured 3.7x slower per row than even
    the XLA packed scan). Bit index u follows unpack_pm1 order (lanes in
    order, MSB-first), so queries need no re-ordering.

    128- and 256-bit partitions (lanes 4 or 8 — the SIMPRINT and NPHD
    widths); N % 4096 == 0. The row regrouping is width-independent; only
    the per-row bit count changes, so the stored view is
    (N * lanes // 128, 128). Pure reshape/transpose/shift ops — cheap to
    (re)build on device, jit-safe. The bit-expansion intermediate costs 32x
    the packed bytes, so large inputs stream through ``lax.map`` in bounded
    row steps (peak extra HBM ~= rows_per_step KiB) instead of
    materializing an (N, nbits) u32 tensor (68 GiB at 16M x 256-bit — over
    any single-chip HBM).
    """
    n, lanes = packed.shape
    if lanes not in (4, 8) or n % PERM_GROUP:
        raise ValueError("bitplane layout needs 128/256-bit rows and N % 4096 == 0")
    nbits = lanes * 32

    def _transpose_groups(chunk_rows):
        g = chunk_rows.shape[0] // PERM_GROUP
        m = chunk_rows.shape[0]
        # bits[o, u] ∈ {0,1}: bit u of row o, unpack_pm1 order (MSB-first/lane)
        shifts = (31 - np.arange(32, dtype=np.uint32))[None, None, :]
        bits = ((chunk_rows[:, :, None] >> shifts) & jnp.uint32(1)).reshape(m, nbits)
        # regroup rows o = j0*128 + s*4 + j1 -> (j = j1*32 + j0, member s):
        # source axes (g, j0, s, j1, u) -> (g, j1, j0, s, u)
        b2 = bits.reshape(g, 32, 32, 4, nbits).transpose(0, 3, 1, 2, 4).reshape(g, 128, 32, nbits)
        # pack member axis s into bit s of a u32 word; T[u, j] layout (g, nbits, 128)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :, None]
        t = (b2 * weights).sum(axis=2, dtype=jnp.uint32).transpose(0, 2, 1)  # (g, nbits, 128)
        # Keep the NATIVE (rows*lanes//128, 128) view as the stored shape: a
        # minor dim of 128 tiles compactly in HBM. Storing the logically-
        # equivalent (m, lanes) shape instead lane-pads lanes -> 128 on the
        # Pallas operand path — a measured 16x HBM copy (51 GiB at 100M
        # 256-bit rows, an instant OOM).
        return t.reshape(m * lanes // 128, 128)

    # 512Ki rows/step (~512 MiB bit-expansion working set), shrunk to the
    # largest power-of-2 divisor of n; groups stay 4096-aligned (n % 4096 == 0
    # guaranteed above, so n & -n >= 4096).
    step = min(1 << 19, n & -n)
    if n <= step:
        return _transpose_groups(packed)
    out = jax.lax.map(_transpose_groups, packed.reshape(n // step, step, lanes))
    return out.reshape(n * lanes // 128, 128)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("length",))
def _view_step(out, packed, start, length):
    # start is TRACED (one compile for all steps); length static (shapes)
    ch = jax.lax.dynamic_slice_in_dim(packed, start, length, axis=0)
    lanes = packed.shape[1]
    return jax.lax.dynamic_update_slice(
        out, ch.reshape(length * lanes // 128, 128), (start * lanes // 128, 0)
    )


def packed_to_view(packed, step=1 << 20):
    # type: (jnp.ndarray, int) -> jnp.ndarray
    """(N, lanes) u32 -> its (N*lanes//128, 128) view (same bytes, same
    linear order) as a DEVICE-RESIDENT array for segmented_view_dots.

    The minor-dim reshape is a physical relayout on TPU, and doing it on the
    whole (N, 8) array materializes the 16x lane-padded source tiling first
    (51 GiB at 100M rows — instant OOM); a ``lax.map`` of per-step reshapes
    collapses back into that one reshape in the simplifier, and a
    ``fori_loop`` carry double-buffers the 3.2 GB output (measured runtime
    OOM at 100M next to the db + bitplane twins). So large inputs stream
    through an EAGER step loop whose jitted step DONATES the output buffer
    (true in-place update, one bounded relayout per step). Eager-only for
    large inputs — do not wrap in an outer jit; small inputs are a plain
    (jit-safe) reshape.
    """
    n, lanes = packed.shape
    if (n * lanes) % 128:
        raise ValueError("packed view needs N*lanes % 128 == 0")
    rows = n * lanes // 128
    # Largest power-of-2 divisor of n within the budget (a non-pow2 caller
    # step is floored to a pow2 first so the chosen step always divides n).
    step = min(1 << (max(int(step), 1).bit_length() - 1), n & -n)
    if n <= step:
        return packed.reshape(rows, 128)
    if (step * lanes) % 128:
        # n's odd factor drove the halving below a whole view row (callers
        # pass pow2 capacities / chunk multiples, so this is a misuse guard)
        raise ValueError(f"no 128-aligned step divides N={n} (reached {step})")
    out = jnp.zeros((rows, 128), jnp.uint32)
    for start in range(0, n, step):
        out = _view_step(out, packed, jnp.int32(start), length=step)
    return out


def bitplane_penalty_perm(penalty_flat):
    # type: (jnp.ndarray) -> jnp.ndarray
    """Reorder a per-row (N,) penalty into bitplane dot-column order
    (p = s*128 + j1*32 + j0  <->  o = j0*128 + s*4 + j1 per 4096 group)."""
    n = penalty_flat.shape[0]
    g = n // PERM_GROUP
    return penalty_flat.reshape(g, 32, 32, 4).transpose(0, 2, 3, 1).reshape(n)


def _scan_kernel_bitplane(q_ref, qs_ref, db_ref, pen_ref, out_ref, *, nbits, chunk, planes_per_dot):
    """Fused bitplane scan: per-lane shift/mask unpack + int8 MXU dot + tree max.

    db arrives as the (chunk//16, 128) u32 view of bit_transpose_packed().
    For each bit s of a (256, 128) view tile, shift+mask exposes d_s — the
    (256 bits x 128 rows) 0/1 matrix of 128 original rows — which dots
    against the queries directly (contract over sublanes). ±1 conversion is
    folded into the epilogue: dot_pm1 = 2*dot01 - sum(q). Dot columns land
    in (s, j1, j0) order, which the halving tree reduces to per-original-
    block maxima exactly as in the int8 perm kernel.

    Planes are int8 (0/1 via u32 astype — Mosaic supports the narrowing;
    u32->bf16 does NOT lower, which forced the original f32-select) so the
    dot runs on the int8 MXU path: measured 11.46 -> 6.93 ms per sweep at
    8.4M x 256-bit / Q=256 vs the bf16-select variant, exact
    (benchmarks/exp_bitplane_int8.py) — the ~2x int8-vs-bf16 MXU peak,
    less unchanged unpack/epilogue cost.

    Epilogue: penalty arrives pre-halved (0 / -32768 bf16) so
    max(dot01 + pen/2) commutes with the final affine 2*m - qsum, which is
    deferred to the (Q, 32) block maxima. That drops two full-width VPU
    passes per slab (the 2*x mul and the -qsum sub on the (Q, 4096) tile)
    vs applying the affine pre-max. The max tree itself runs in bf16, NOT
    int32: bf16 packs 2/lane on the VPU, and an int32 tree measured 9.78 ms
    vs 6.42 ms for this layout (A/B at 8.4M x 256-bit / Q=256) — the tree
    dominates the epilogue, so its element width is the knob that matters.
    Exact: dot01 in [-256, 256] is exactly representable in bf16, and the
    -32768 penalty only needs to order below every valid value.
    """
    qv = q_ref[:]  # (Q, nbits) int8 ±1/0
    qsum = jnp.sum(qv.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)  # (Q, 1)
    slab = min(_SUBTILE, chunk)
    nb = slab // BLOCK
    vr = slab * (nbits // 32) // 128  # nbits view rows per 4096-row slab
    for t in range(chunk // slab):
        tile = db_ref[t * vr : (t + 1) * vr, :]  # (nbits, 128) uint32
        dots = []
        for s0 in range(0, 32, planes_per_dot):
            planes = []
            for s in range(s0, s0 + planes_per_dot):
                bits = (tile >> jnp.uint32(s)) & jnp.uint32(1)
                planes.append(bits.astype(jnp.int8))
            d = planes[0] if len(planes) == 1 else jnp.concatenate(planes, axis=1)
            dots.append(
                jax.lax.dot_general(
                    qv,
                    d,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            )
        dot01 = jnp.concatenate(dots, axis=1)  # (Q, slab) in (s, j1, j0) order
        # bf16 + pre-halved penalty: 0 / -32768 (see docstring)
        x = dot01.astype(jnp.bfloat16) + pen_ref[0:1, t * slab : (t + 1) * slab]
        w = slab
        for _ in range((slab // nb).bit_length() - 1):  # slab/nb is a pow2
            x = jnp.maximum(x[:, : w // 2], x[:, w // 2 : w])
            w //= 2
        pm1 = 2.0 * x.astype(jnp.float32) - qsum  # (Q, nb): ±1-dot block maxima
        out_ref[:, t * nb : (t + 1) * nb] = 0.5 + pm1 * qs_ref[:]


def _scan_kernel_packed_perm(q_ref, qs_ref, db_ref, pen_ref, out_ref, *, nbits, chunk, interpret):
    """Fused unpack + MXU dot + tree-max straight from the PACKED perm twin.

    db arrives as the natural (chunk*lanes//128, 128) uint32 view of the
    permute_packed_rows() layout — minor dim 128, so XLA hands the custom
    call the resting HBM bytes with no padded operand copy (the disqualifier
    of the plain packed kernel, see module docstring). Column group g of the
    view tile is a (view_rows, lanes) code matrix of stored rows R*u + g;
    unpacking the R groups and stacking yields dot columns in exactly the
    halving-tree order (p = c*32 + v per 4096-row group), so the epilogue
    and penalty layout are identical to the int8 perm kernel — 32 B/row HBM
    traffic with no int8 twin, the 100M-scale phase-1 path.
    """
    lanes = nbits // 32
    r = 128 // lanes
    qv = q_ref[:]
    slab = min(_SUBTILE, chunk)
    nb = slab // BLOCK
    vr = slab // r  # view rows per slab
    for t in range(chunk // slab):
        tile = db_ref[t * vr : (t + 1) * vr, :]  # (vr, 128) uint32
        pieces = [
            _unpack_pm1_2d(tile[:, g * lanes : (g + 1) * lanes], nbits, jnp.bfloat16, interpret)
            for g in range(r)
        ]
        d = jnp.concatenate(pieces, axis=0)  # (slab, nbits), dot-column order
        dot = jax.lax.dot_general(
            qv, d, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        # bf16 tree is exact: dots are integers <= 256, penalty -65536
        x = dot.astype(jnp.bfloat16) + pen_ref[0:1, t * slab : (t + 1) * slab]
        w = slab
        for _ in range((slab // nb).bit_length() - 1):  # slab/nb is a pow2
            x = jnp.maximum(x[:, : w // 2], x[:, w // 2 : w])
            w //= 2
        out_ref[:, t * nb : (t + 1) * nb] = 0.5 + x.astype(jnp.float32) * qs_ref[:]


def _scan_kernel_unpacked_perm(q_ref, qs_ref, db_ref, pen_ref, out_ref, *, chunk):
    """int8 MXU dot + bf16 2D halving maximum tree over the permuted layout.

    db/pen arrive in permute_rows() order, so halving the (Q, slab) dot tile
    column-wise log2(slab/32) times yields the per-original-128-row-block
    maxima directly in block order — no 3D reshape, no relayout. Exact: dot
    values and the -65536 penalty are bf16-representable integers.
    """
    qv = q_ref[:]
    slab = min(_SUBTILE, chunk)
    nb = slab // BLOCK
    for t in range(chunk // slab):
        dot = jax.lax.dot_general(
            qv, db_ref[t * slab : (t + 1) * slab, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        x = dot.astype(jnp.bfloat16) + pen_ref[0:1, t * slab : (t + 1) * slab]
        w = slab
        for _ in range((slab // nb).bit_length() - 1):  # slab/nb is a pow2
            x = jnp.maximum(x[:, : w // 2], x[:, w // 2 : w])
            w //= 2
        out_ref[:, t * nb : (t + 1) * nb] = 0.5 + x.astype(jnp.float32) * qs_ref[:]


def penalty_mode(unpacked=False, permuted=False, packed_perm=False, bitplane=False):
    # type: (bool, bool, bool, bool) -> str
    """The make_blockmax_penalty mode pallas_blockmax would use for these
    path flags (same precedence as its layout dispatch)."""
    if bitplane:
        return "bitplane"
    if permuted or packed_perm:
        return "perm"
    return "plain"


def make_blockmax_penalty(db_valid, mode):
    # type: (jnp.ndarray, str) -> jnp.ndarray
    """
    Build the (1, N) additive validity-penalty row for a phase-1 path.

    The permuting modes lower to a scattered transpose that measures ~3-6 ms
    at 10M rows on v5e — HALF a whole sweep — so callers that scan the same
    validity repeatedly should build this once per validity generation and
    pass it to pallas_blockmax(db_penalty=...) instead of paying the
    permute inside every jitted sweep.

    :param mode: "plain" (original row order, f32 0/-65536 — packed and
        plain-unpacked kernels), "perm" (permute_rows() interleave, bf16
        0/-65536 — perm int8 + packed_perm kernels), or "bitplane"
        (bit-column interleave, bf16 0/-32768 PRE-HALVED — the bitplane
        kernel applies it to the 0/1 dot before the 2*m - qsum affine).
    """
    n = db_valid.shape[0]
    if mode == "plain":
        return jnp.where(db_valid, 0, -65536).astype(jnp.float32)[None, :]
    if mode == "perm":
        pen = jnp.where(db_valid, 0, -65536).astype(jnp.float32)
        return permute_rows(pen.reshape(n, 1)).reshape(1, n).astype(jnp.bfloat16)
    if mode == "bitplane":
        pen = jnp.where(db_valid, 0.0, -32768.0).astype(jnp.bfloat16)
        return bitplane_penalty_perm(pen).reshape(1, n)
    raise ValueError(f"unknown penalty mode {mode!r}")


def _validate_blockmax(n, chunk_size, interpret, unpacked, permuted, packed_perm, bitplane, nbits):
    # type: (int, int, bool, bool, bool, bool, bool, int) -> None
    """Argument-combination contract for pallas_blockmax, factored out so
    every arm — including the TPU-only (interpret=False) Mosaic constraint —
    is testable without lowering a kernel."""
    if n % chunk_size or chunk_size % BLOCK:
        raise ValueError("db rows must divide by chunk_size, chunk_size by 128")
    if not interpret and chunk_size < BLOCK * 128 and chunk_size != n:
        # Mosaic requires the (Q, chunk/128) output block's lane dim to be a
        # multiple of 128 (or the whole array): chunk_size >= 16384.
        raise ValueError(f"chunk_size must be >= {BLOCK * 128} on TPU (got {chunk_size})")
    if permuted and (not unpacked or chunk_size % PERM_GROUP):
        raise ValueError("permuted scan needs the unpacked layout and chunk_size % 4096 == 0")
    # Below here `permuted` implies `unpacked` (the check above), so testing
    # `unpacked` alone already excludes every permuted combination.
    if packed_perm and (unpacked or chunk_size % PERM_GROUP or 128 % (nbits // 32)):
        raise ValueError("packed_perm needs the packed layout, chunk_size % 4096 == 0, lanes | 128")
    if bitplane and (unpacked or packed_perm or chunk_size % PERM_GROUP or nbits not in (128, 256)):
        raise ValueError("bitplane needs a 128/256-bit packed layout and chunk_size % 4096 == 0")


@functools.partial(
    jax.jit,
    static_argnames=(
        "nbits", "chunk_size", "interpret", "unpacked", "permuted", "packed_perm", "bitplane", "planes_per_dot",
    ),
)
def pallas_blockmax(
    q_pm1,
    q_scale,
    db,
    db_valid,
    nbits,
    chunk_size=16384,
    interpret=False,
    unpacked=False,
    permuted=False,
    packed_perm=False,
    bitplane=False,
    planes_per_dot=4,
    db_penalty=None,
):
    # type: (...) -> jnp.ndarray
    """
    Fused phase-1 block maxima over the whole database.

    :param q_pm1: (Q, nbits) ±1 float queries (prefix-masked)
    :param q_scale: (Q,) float32 1/(2*min_bits)
    :param db: (N, nbits//32) uint32 packed codes, or (N, nbits) int8 ±1 when
        ``unpacked=True``; N % chunk_size == 0
    :param db_valid: (N,) bool, in ORIGINAL row order (permuted internally)
    :param interpret: run the kernel in interpreter mode (CPU testing)
    :param permuted: ``db`` is the permute_rows() int8 layout; uses the fast
        2D halving-tree epilogue (requires unpacked and chunk_size % 4096 == 0)
    :param packed_perm: ``db`` is the permute_packed_rows() PACKED twin
        (32 B/row); fused in-kernel unpack + tree epilogue with no padded
        operand copy — the 100M-scale path (requires chunk_size % 4096 == 0)
    :param bitplane: ``db`` is the bit_transpose_packed() twin (32 B/row);
        per-lane shift/mask unpack (no cross-lane movement) + plane dots —
        the fast packed-resident kernel (256-bit, chunk_size % 4096 == 0)
    :param db_penalty: precomputed make_blockmax_penalty(db_valid, mode) row
        for this path's penalty_mode(). The in-jit fallback permute costs
        ~half a sweep at 10M rows — hot callers must pass this.
    :return: (Q, N // 128) float32 block maxima (invalid rows excluded),
        block b = original rows [b*128, (b+1)*128) in both modes
    """
    # Logical db rows: the bitplane twin is stored as its native
    # (rows * lanes // 128, 128) u32 view (see bit_transpose_packed).
    n = db.shape[0] * 4096 // nbits if bitplane else db.shape[0]
    q = q_pm1.shape[0]
    _validate_blockmax(n, chunk_size, interpret, unpacked, permuted, packed_perm, bitplane, nbits)
    nch = n // chunk_size

    # Validity as an additive penalty row in the DOT domain (broadcasts over
    # queries in-kernel). |dot| <= nbits <= 256, so -65536 puts any invalid
    # row's block max far below every valid score after scaling.
    if db_penalty is None:
        db_penalty = make_blockmax_penalty(
            db_valid, penalty_mode(unpacked, permuted, packed_perm, bitplane)
        )
    else:
        # A caller-supplied penalty must match this path's layout. NOTE: a
        # STALE penalty (built from a previous validity generation) cannot be
        # detected here and silently masks newly-valid rows — callers must
        # rebuild it whenever db_valid changes (the engine keys its cache on
        # valid_dev identity), and the perm/bitplane layouts share a dtype,
        # so the mode discipline is also on the caller.
        want = (
            jnp.float32
            if penalty_mode(unpacked, permuted, packed_perm, bitplane) == "plain"
            else jnp.bfloat16
        )
        if db_penalty.shape != (1, n) or db_penalty.dtype != want:
            raise ValueError(
                f"db_penalty must be a (1, {n}) {jnp.dtype(want).name} "
                f"make_blockmax_penalty row for this path, got {db_penalty.shape} {db_penalty.dtype}"
            )
    penalty = db_penalty  # (1, N), layout/dtype per penalty_mode()

    # int8 queries for the int8 MXU paths (values ∈ {-1, 0, 1}): the
    # pre-unpacked twins and the bitplane kernel (int8 0/1 planes). bf16 for
    # the in-kernel row-unpack paths (their select produces f32 -> bf16).
    q_in = q_pm1.astype(jnp.int8) if (unpacked or bitplane) else q_pm1.astype(jnp.bfloat16)
    qs = q_scale.astype(jnp.float32)[:, None]  # (Q, 1)

    if bitplane:
        if db.shape != (n * nbits // 32 // 128, 128):  # the native stored view
            raise ValueError(f"bitplane twin must be (rows*lanes//128, 128), got {db.shape}")
        kernel = functools.partial(
            _scan_kernel_bitplane, nbits=nbits, chunk=chunk_size, planes_per_dot=planes_per_dot
        )
        db_block = (chunk_size * nbits // 32 // 128, 128)
    elif packed_perm:
        lanes = nbits // 32
        db = db.reshape(n * lanes // 128, 128)  # free view: row-major bytes
        kernel = functools.partial(
            _scan_kernel_packed_perm, nbits=nbits, chunk=chunk_size, interpret=interpret
        )
        db_block = (chunk_size * lanes // 128, 128)
    elif permuted:
        kernel = functools.partial(_scan_kernel_unpacked_perm, chunk=chunk_size)
        db_block = (chunk_size, db.shape[1])
    elif unpacked:
        kernel = functools.partial(_scan_kernel_unpacked, chunk=chunk_size)
        db_block = (chunk_size, db.shape[1])
    else:
        kernel = functools.partial(_scan_kernel_packed, nbits=nbits, chunk=chunk_size, interpret=interpret)
        db_block = (chunk_size, db.shape[1])

    kwargs = {}
    if _HAS_PLTPU and not interpret:  # pragma: no cover - real-TPU compile path
        # The sub-tiled kernel's live set (unpack temporaries + score tile +
        # double-buffered input blocks) exceeds the default 16 MiB scoped-VMEM
        # budget; grant it most of the chip's VMEM.
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)

    out = pl.pallas_call(
        kernel,
        grid=(nch,),
        in_specs=[
            _block_spec((q, nbits), lambda i: (0, 0)),
            _block_spec((q, 1), lambda i: (0, 0)),
            _block_spec(db_block, lambda i: (i, 0)),
            _block_spec((1, chunk_size), lambda i: (0, i)),
        ],
        out_specs=_block_spec((q, chunk_size // BLOCK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((q, n // BLOCK), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(q_in, qs, db, penalty)
    return out


def segmented_view_dots(q_d, db_view, top_blocks, nbits=256, seg_budget_bytes=1 << 30):
    # type: (jnp.ndarray, jnp.ndarray, jnp.ndarray, int, int) -> jnp.ndarray
    """±1 dots of each query against its top blocks, gathered from the
    (N*lanes//128, 128) u32 packed VIEW in bounded segments.

    The view holds the same bytes as (N, lanes) in the same linear order, so
    block b's 128 rows are exactly view rows [b*lanes, (b+1)*lanes) —
    contiguous 512 B takes, 16x fewer than per-row takes (measured 2.5x
    faster end-to-end at 8.4M rows / Q=256 / kk=16 on v5e; see
    benchmarks/exp_view_rescore in the commit log). Segments bound the
    unpacked working set to ~1 GiB f32-equivalent exactly like
    pm1_scan.segmented_unpack_dots (padding re-gathers block 0; padded
    columns are sliced off).

    :param q_d: (Q, nbits) ±1/0 prefix-masked queries (bf16/int8)
    :param db_view: (N * nbits//32 // 128, 128) uint32 resident packed view
    :param top_blocks: (Q, kk) int32 block ids from phase 2
    :return: (Q, kk * BLOCK) float32 dots in block-major original row order
    """
    q, kk = top_blocks.shape
    lanes = nbits // 32
    seg_blocks = max(1, seg_budget_bytes // (q * nbits * 4 * BLOCK))

    def dots_for(blocks_part):
        w = blocks_part.shape[-1]
        vrows = (
            blocks_part[:, :, None] * lanes + jnp.arange(lanes, dtype=jnp.int32)[None, None, :]
        ).reshape(-1)
        cand = jnp.take(db_view, vrows, axis=0).reshape(q * w * BLOCK, lanes)
        pm1 = unpack_pm1(cand, nbits, q_d.dtype).reshape(q, w * BLOCK, nbits)
        return jax.lax.dot_general(
            q_d[:, None, :], pm1, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(q, w * BLOCK)

    if kk <= seg_blocks:
        return dots_for(top_blocks)
    n_seg = -(-kk // seg_blocks)
    padded = n_seg * seg_blocks
    tb_p = jnp.pad(top_blocks, ((0, 0), (0, padded - kk))) if padded > kk else top_blocks
    segs = tb_p.reshape(q, n_seg, seg_blocks).transpose(1, 0, 2)
    dots = jax.lax.map(dots_for, segs).transpose(1, 0, 2).reshape(q, padded * BLOCK)
    return dots[:, : kk * BLOCK]


def pallas_blockmax_topk_impl(
    q_pm1,
    q_scale,
    db_packed,
    db_valid,
    k,
    nbits,
    chunk_size=16384,
    interpret=False,
    db_unpacked=None,
    unpacked=False,
    db_perm=None,
    db_packed_perm=None,
    db_bitplane=None,
    db_penalty=None,
    db_packed_view=None,
    planes_per_dot=4,
):
    # type: (...) -> tuple[jnp.ndarray, jnp.ndarray]
    """
    Exact top-k using the fused Pallas phase 1 + hierarchical block select +
    Pallas gather rescore. Plain function (composable under shard_map).

    Same contract as ops.pm1_scan.pm1_blockmax_topk. ``db_packed`` is always
    required (phase-3 rescoring gathers packed rows); pass ``db_unpacked``
    with ``unpacked=True`` to run phase 1 from the ±1 int8 layout. Pass
    ``db_perm`` (the permute_rows() int8 twin) to run phase 1 through the
    ~2.5x-faster tree-epilogue kernel; all returned indices are in ORIGINAL
    row order. Phase 3 gathers from ``db_unpacked`` when present (fastest),
    else falls back to packed-row takes + XLA unpack — so a perm-only twin
    (HBM budget for one int8 layout) still gets the fast phase 1.

    At scales where no int8 twin fits (100M-class partitions), pass
    ``db_bitplane`` (the bit_transpose_packed() twin, 32 B/row): phase 1
    runs the bitplane kernel over it, phase 3 rescores from packed-row
    takes — the fast path with only 2x the packed footprint.
    (``db_packed_perm`` keeps the slower in-kernel row-unpack variant for
    comparison; bitplane wins when both are given.)

    ``db_packed_view``: optional device-RESIDENT (N*lanes//128, 128) u32
    reshape of ``db_packed`` (same bytes, same linear order). When no int8
    twin is present, phase 3 gathers 8 contiguous view rows per block
    instead of 128 scattered packed rows — 2.5x faster (segmented_view_dots).
    """
    n = db_packed.shape[0]
    q = q_pm1.shape[0]
    total_blocks = n // BLOCK

    if unpacked and db_unpacked is None and db_perm is None:
        raise ValueError("unpacked=True requires db_unpacked and/or db_perm")
    if db_packed_view is not None and db_packed_view.shape != (
        n * db_packed.shape[1] // 128,
        128,
    ):
        raise ValueError(
            f"db_packed_view must be the (N*lanes//128, 128) view of db_packed, "
            f"got {db_packed_view.shape} for packed {db_packed.shape}"
        )
    permuted = db_perm is not None
    bitplane = db_bitplane is not None and not permuted and not unpacked
    packed_perm = db_packed_perm is not None and not permuted and not unpacked and not bitplane
    if bitplane:
        phase1_db = db_bitplane
    elif packed_perm:
        phase1_db = db_packed_perm
    else:
        phase1_db = db_perm if permuted else (db_unpacked if unpacked else db_packed)
    block_max = pallas_blockmax(
        q_pm1,
        q_scale,
        phase1_db,
        db_valid,
        nbits,
        chunk_size=chunk_size,
        interpret=interpret,
        unpacked=unpacked,
        permuted=permuted,
        packed_perm=packed_perm,
        bitplane=bitplane,
        planes_per_dot=planes_per_dot,
        db_penalty=db_penalty,
    )

    kk = min(k, total_blocks)
    top_blocks = topk_blocks_hier(block_max, kk)

    rows = top_blocks[:, :, None] * BLOCK + jnp.arange(BLOCK, dtype=jnp.int32)[None, None, :]
    rows = rows.reshape(q, kk * BLOCK)
    # Validity per BLOCK row-gather ((N/128, 128) view, kk descriptors/query)
    # instead of kk*128 scattered element takes from the flat (N,) array —
    # the element-wise lowering measured ~2.5 ms of the 9.5 ms sweep at
    # 10M rows / Q=256 (same random-access pathology as the old phase-3).
    cand_valid = jnp.take(
        db_valid.reshape(n // BLOCK, BLOCK), top_blocks.reshape(-1), axis=0
    ).reshape(q, kk * BLOCK)
    if db_unpacked is not None:
        # Rescore straight from the ±1 int8 layout inside a Pallas kernel:
        # the block ids drive a scalar-prefetched BlockSpec gather (32 KB
        # contiguous DMAs double-buffered against the dots). The previous XLA
        # row-take + batched dot measured ~6.6 ms at 10M rows/Q=256 — the
        # random-access take lowering, not the dot, dominated.
        dots = pallas_gather_rescore(
            q_pm1.astype(jnp.int8), top_blocks, db_unpacked, kk, interpret=interpret
        )
    elif db_packed_view is not None:
        # View-row gather: a 128-row block is 8 CONTIGUOUS rows of the
        # (N/16, 128) packed view (identical bytes, same linear order), so
        # the gather is 16x fewer takes at 512 B each — 8.1 ms vs 20 ms for
        # the per-row takes at 8.4M rows / Q=256 / kk=16 on v5e. The view
        # must be device-RESIDENT: reshaping (N, 8) in-jit is a physical
        # relayout copy that costs more than it saves (measured 21 ms).
        dots = segmented_view_dots(
            q_pm1.astype(jnp.bfloat16), db_packed_view, top_blocks, nbits=nbits
        )
    else:
        # Per-ROW takes, deliberately: XLA fuses them into the unpack+dot
        # consumer, while a blocked take of a reshaped (N/128, 128*L) view
        # materializes a full physical copy of db_packed (layout change) —
        # measured slower in exp_pm1_gather.py and an OOM at 33M rows.
        # This is the PRODUCTION rescore for the bitplane (beyond-int8-
        # budget) tier, so it streams in bounded segments like pm1_scan's:
        # the all-at-once unpack is (Q, kk*128, nbits) HBM — ~4.3 GiB bf16
        # at Q=256, k=256 on a chip already holding the 100M packed +
        # bitplane layouts.
        from iscc_search_tpu.ops.pm1_scan import segmented_unpack_dots

        dots = segmented_unpack_dots(
            q_pm1.astype(jnp.bfloat16), db_packed, rows, nbits, jnp.bfloat16, jnp.float32
        )
    scores = 0.5 + dots.astype(jnp.float32) * q_scale[:, None]
    scores = jnp.where(cand_valid, scores, NEG_SCORE)

    out_k = min(k, scores.shape[1])
    fs, pos = jax.lax.top_k(scores, out_k)
    fi = jnp.take_along_axis(rows, pos, axis=1)
    fi = jnp.where(fs > NEG_SCORE, fi, -1)
    if out_k < k:  # pragma: no cover
        fs = jnp.pad(fs, ((0, 0), (0, k - out_k)), constant_values=NEG_SCORE)
        fi = jnp.pad(fi, ((0, 0), (0, k - out_k)), constant_values=-1)
    return fs, fi


pallas_blockmax_topk = jax.jit(
    pallas_blockmax_topk_impl,
    static_argnames=("k", "nbits", "chunk_size", "interpret", "unpacked", "planes_per_dot"),
)


def pallas_blockmax_topk_packedq_impl(q_packed, q_lanes, db_packed, db_valid, k, nbits, **kw):
    """Fused packed-query variant: device query prep + the full scan in ONE
    jitted program (one upload, one dispatch — the serving path)."""
    from iscc_search_tpu.ops.pm1_scan import prepare_queries_impl

    q_pm1, q_scale = prepare_queries_impl(q_packed, q_lanes, nbits)
    return pallas_blockmax_topk_impl(q_pm1, q_scale, db_packed, db_valid, k, nbits, **kw)


pallas_blockmax_topk_packedq = jax.jit(
    pallas_blockmax_topk_packedq_impl,
    static_argnames=("k", "nbits", "chunk_size", "interpret", "unpacked", "planes_per_dot"),
)


def _gather_rescore_kernel(ids_ref, q_ref, db_ref, out_ref, *, k):
    """One grid step: exact rescore of one query against one candidate block.

    The candidate block arrives via the pipelined BlockSpec gather (its row id
    comes from the scalar-prefetched ``ids_ref``), so the 32 KB block DMAs are
    double-buffered against the MXU dots — this replaces an XLA row gather
    that ran ~6x slower at 10M rows (random-access take lowering).
    """
    i = pl.program_id(0)
    nq = q_ref.shape[0]
    qi = i // k
    # Dot the gathered block against ALL queries (the extra MXU work is tiny:
    # ~21 GMACs total at Q=256/k=10), then one-hot-select this step's query
    # row — Mosaic cannot statically align a dynamic int8 sublane load, and
    # the dot+select formulation needs no dynamic indexing at all.
    dots = jax.lax.dot_general(
        q_ref[:], db_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )  # (Q, BLOCK)
    sel = jax.lax.broadcasted_iota(jnp.int32, (1, nq), 1) == qi
    row = jax.lax.dot_general(
        jnp.where(sel, 1.0, 0.0).astype(jnp.float32),
        dots.astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, BLOCK)
    # The (8, BLOCK) output block is revisited by 8 consecutive grid steps
    # (Mosaic requires >= (8, 128) blocks); each step merges in its own row.
    own = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == (i % 8)
    out_ref[:] = jnp.where(own, row, out_ref[:])


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def pallas_gather_rescore(q_int8, block_ids, db_unpacked, k, interpret=False):
    # type: (...) -> jnp.ndarray
    """
    Phase-3 candidate rescore: gather top-k 128-row blocks per query straight
    from the PLAIN (unpermuted) ±1 int8 layout and dot them against the
    queries, fused in one Pallas pass.

    The gather must stay on the plain layout: fetching an original block from
    the permuted layout is a (BLOCK, nbits) tile of its (N/32, 32*nbits) view
    — correct, but its 256 B-per-row strided DMA measured 13 ms at 10M/Q=256
    vs ~1 ms for these contiguous 32 KB block reads.

    :param q_int8: (Q, nbits) int8 ±1/0 prefix-masked queries
    :param block_ids: (Q, k) int32 block ids from phase 2 (original numbering)
    :param db_unpacked: (N, nbits) int8 ±1 codes, N % 128 == 0, original order
    :return: (Q, k * 128) float32 raw dots, candidate order matching
        ``block_ids[q, c // 128] * 128 + c % 128``
    """
    q, nbits = q_int8.shape
    total = q * k
    pad = (-total) % 8  # out blocks are (8, BLOCK); pad steps re-gather id 0
    ids_flat = block_ids.reshape(total).astype(jnp.int32)
    if pad:
        ids_flat = jnp.pad(ids_flat, (0, pad))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total + pad,),
        in_specs=[
            pl.BlockSpec((q, nbits), lambda i, ids: (0, 0), memory_space=_vmem()),
            pl.BlockSpec((BLOCK, nbits), lambda i, ids: (ids[i], 0), memory_space=_vmem()),
        ],
        out_specs=pl.BlockSpec((8, BLOCK), lambda i, ids: (i // 8, 0), memory_space=_vmem()),
    )
    out = pl.pallas_call(
        functools.partial(_gather_rescore_kernel, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((total + pad, BLOCK), jnp.float32),
        interpret=interpret,
    )(ids_flat, q_int8, db_unpacked)
    return out[:total].reshape(q, k * BLOCK)


def _gather_rescore_packed_kernel(ids_ref, q_ref, db_ref, out_ref, *, k, nbits, interpret):
    """EXPERIMENTAL — measured and NOT wired into any engine path: this
    in-kernel unpack runs ~9x slower than the int8-twin gather at 10M rows
    (benchmarks/exp_packed_gather.py); it stays in-tree, with its exactness
    test, as the recorded negative result for the 'reclaim the int8 twin'
    idea (docs/ROADMAP.md).

    Packed-block rescore: gather one (L, 128)-u32 tile (= one 128-row
    packed block viewed as 16-rows-per-view-row), unpack it IN KERNEL, and
    dot against all queries.

    Unpack without any sublane expand: for column group g (db rows with
    row % 16 == g... specifically view col j belongs to db row j // 8), the
    static slice T[:, 8g:8g+8] is a (L, 8)-u32 code matrix whose rows are db
    rows {v*16 + g}, which _unpack_pm1_2d handles with lane ops only. The
    concatenated output rows therefore come out in the STATIC permutation
    r' = g*8 + v  <->  db row offset (r' % 8) * 16 + r' // 8; the caller
    compensates in the returned row-id arithmetic (exactness unaffected).
    """
    i = pl.program_id(0)
    nq = q_ref.shape[0]
    qi = i // k
    tile = db_ref[:]  # (nbits//32, 128) uint32
    lanes = nbits // 32
    pieces = [
        _unpack_pm1_2d(tile[:, 8 * g : 8 * g + 8][:, :lanes], nbits, jnp.bfloat16, interpret)
        for g in range(16)
    ]
    d = jnp.concatenate(pieces, axis=0)  # (128, nbits) ±1, permuted row order
    dots = jax.lax.dot_general(
        q_ref[:].astype(jnp.bfloat16), d, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, BLOCK) — exact small integers in f32
    sel = jax.lax.broadcasted_iota(jnp.int32, (1, nq), 1) == qi
    row = jax.lax.dot_general(
        jnp.where(sel, 1.0, 0.0).astype(jnp.float32),
        dots,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, BLOCK)
    own = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == (i % 8)
    out_ref[:] = jnp.where(own, row, out_ref[:])


def gather_perm_offsets(block=BLOCK):
    # type: (int) -> np.ndarray
    """Row offsets matching _gather_rescore_packed_kernel's output order:
    candidate position r' holds db row offset (r' % 8) * 16 + r' // 8."""
    rp = np.arange(block)
    return ((rp % 8) * 16 + rp // 8).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("k", "nbits", "interpret"))
def pallas_gather_rescore_packed(q_pm1, block_ids, db_packed, k, nbits, interpret=False):
    # type: (...) -> jnp.ndarray
    """
    Phase-3 candidate rescore straight from the PACKED layout (no int8 twin
    needed): gathers 128-row packed blocks as (nbits//32, 128)-u32 tiles and
    unpacks them in kernel (~4 KB DMA + ~32K VPU ops per step).

    Requires nbits == 256 (the (8, 128) tile is exactly one Mosaic u32 tile;
    narrower partitions keep the int8-twin path — their twins are small).

    :param q_pm1: (Q, nbits) ±1/0 prefix-masked queries (any float/int dtype)
    :param block_ids: (Q, k) int32 block ids from phase 2
    :param db_packed: (N, nbits//32) uint32, N % 128 == 0
    :return: (Q, k * 128) float32 raw dots; candidate c corresponds to db row
        ``block_ids[q, c // 128] * 128 + gather_perm_offsets()[c % 128]``
    """
    q, _ = q_pm1.shape
    lanes = nbits // 32
    if lanes != 8:
        raise ValueError("packed gather-rescore requires 256-bit partitions")
    n = db_packed.shape[0]
    view = db_packed.reshape(n // 16, 128)  # row v = db rows [16v, 16v+16)
    total = q * k
    pad = (-total) % 8
    ids_flat = block_ids.reshape(total).astype(jnp.int32)
    if pad:
        ids_flat = jnp.pad(ids_flat, (0, pad))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total + pad,),
        in_specs=[
            pl.BlockSpec((q, nbits), lambda i, ids: (0, 0), memory_space=_vmem()),
            pl.BlockSpec((lanes, 128), lambda i, ids: (ids[i], 0), memory_space=_vmem()),
        ],
        out_specs=pl.BlockSpec((8, BLOCK), lambda i, ids: (i // 8, 0), memory_space=_vmem()),
    )
    out = pl.pallas_call(
        functools.partial(_gather_rescore_packed_kernel, k=k, nbits=nbits, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((total + pad, BLOCK), jnp.float32),
        interpret=interpret,
    )(ids_flat, q_pm1.astype(jnp.bfloat16), view)
    return out[:total].reshape(q, k * BLOCK)


_UNPACK_APPEND = None


def build_unpacked_db(db_packed, nbits, chunk_rows=65536, permute=False):
    # type: (jnp.ndarray, int, int, bool) -> jnp.ndarray
    """
    Device-side ±1 int8 layout builder.

    Writes chunk-wise into one preallocated buffer with donation, so peak HBM
    is the output plus one chunk's intermediates (a lax.map would transiently
    hold a second full copy of the output). With ``permute=True`` rows are
    block-interleaved per 4096-row group (see permute_rows) for the fast
    tree-epilogue scan; requires N % 4096 == 0.
    """
    global _UNPACK_APPEND
    n = db_packed.shape[0]
    chunk_rows = min(chunk_rows, n)
    if permute and (n % PERM_GROUP or chunk_rows % PERM_GROUP):
        raise ValueError("permuted layout needs N and chunk_rows % 4096 == 0")
    if _UNPACK_APPEND is None:

        def _append(buf, chunk, start, nb, perm):
            rows = unpack_pm1(chunk, nb, jnp.int8)
            if perm:
                rows = permute_rows(rows)
            return jax.lax.dynamic_update_slice(buf, rows, (start, 0))

        _UNPACK_APPEND = jax.jit(_append, static_argnums=(3, 4), donate_argnums=0)
    buf = jnp.zeros((n, nbits), jnp.int8)
    for start in range(0, n, chunk_rows):
        end = min(start + chunk_rows, n)
        chunk = jax.lax.dynamic_slice_in_dim(db_packed, start, end - start, axis=0)
        buf = _UNPACK_APPEND(buf, chunk, start, nbits, permute)
    return buf
