"""
Device-resident packed-code indexes — the TPU-native replacement for the
reference's HNSW engine (iscc-usearch ShardedNphdIndex / ShardedIndex128,
SURVEY §2.2).

Design (TPU-first, not a graph translation):

- Codes live as a bit-packed ``(N, 8) uint32`` lane matrix. Index *build* is
  streaming pack-and-append (no graph construction), so ingest throughput is
  memcpy-bound instead of HNSW-insert-bound.
- *Search* is an exhaustive scan via the ±1 matmul identity
  (:mod:`iscc_search_tpu.ops.pm1_scan`) with exact two-phase block-max
  top-k — fused Pallas kernel over the int8 layout where it fits, the XLA
  packed path beyond — giving exact results (recall 1.0); the reference's
  expansion/connectivity quality knobs become unnecessary.
- *Mutability*: updates tombstone the old row and append a new one (mirrors
  the remove-before-add semantics at reference usearch/index.py:417-445);
  a validity bitmap masks tombstones inside the kernel. Compaction reclaims
  space once tombstones dominate.
- *Persistence*: sealed immutable segments at ``shard_size`` bytes plus a
  rewritable active segment and a global validity bitmap, each written
  atomically (tmp + fsync + rename), mirroring the reference's bounded
  crash-loss model (flush_interval + shard rotation, SURVEY §5). ``dirty``
  counts unsaved key mutations like the upstream engine. Saves snapshot the
  arrays under the lock and write on a background worker (the reference's
  background shard rotation, CHANGELOG 0.2.2: no multi-second ingest stalls
  at flush boundaries); queued snapshots coalesce so at most one write is
  pending behind the one in flight, and ``drain_rotations()``/``close()``
  join the worker.

Keys are fixed-width byte strings: 8 bytes (uint64 ISCC-ID body) for the NPHD
index, 16 bytes (iscc_id_body + offset + size) for the simprint index.
"""

from __future__ import annotations

import itertools
import json
import os
import tempfile
import threading
from pathlib import Path

import numpy as np

from iscc_search_tpu.ops.packing import MAX_LANES, pack_codes, unpack_code
from iscc_search_tpu.utils import get_logger

logger = get_logger(__name__)

_PALLAS_MIN_CHUNK = 16384  # Mosaic output-block constraint (see ops/pallas_scan.py)

_MIN_DEVICE_ROWS = 8192  # device partition capacity floor
_DEFAULT_CHUNK_ROWS = 32768  # top-k scan chunk size (rows per matmul tile)


def _pow2ceil(n):
    # type: (int) -> int
    p = 1
    while p < n:
        p <<= 1
    return p


_CAP_QUANTUM = 65536  # single-device partition capacity granularity

# Row-space generations are unique ACROSS instances (not per-instance
# counters): a rebuild that swaps in a fresh index must also invalidate row
# ids captured against the old object, not just compactions of the same one.
_ROW_GEN_COUNTER = itertools.count(1)


def _cap_rows(n):
    # type: (int) -> int
    """Single-device partition capacity for ``n`` rows.

    Small partitions keep the pow2 sizing; large ones round 12.5% headroom up
    to a 65536 multiple instead of the next power of two — pow2ceil doubled
    the scan work of a 4.2M-row partition (cap 8.4M), and with four mixed
    length partitions (BASELINE config 3) the padding alone cost ~1.7x the
    live rows. 65536 keeps every divisibility the kernels need: the 32768
    scan chunk, the 4096 permute/bitplane group, and the 128 block."""
    if n <= _CAP_QUANTUM:
        return max(_MIN_DEVICE_ROWS, _pow2ceil(n))
    return -(-(n + n // 8) // _CAP_QUANTUM) * _CAP_QUANTUM


def _mesh_size(mesh):
    # type: (...) -> int
    return int(np.prod(list(mesh.shape.values())))


def _unpacked_budget_bytes():
    # type: () -> int
    """
    HBM budget for the ±1 int8 layout (8x the packed footprint; built
    in-place with donation so the transient overhead is one chunk). Partitions
    beyond it serve from the packed layout via the XLA block-max path instead
    of OOMing — ~37M 256-bit codes at the 9 GiB default on a 16 GB chip.
    """
    return int(os.environ.get("ISCC_SEARCH_UNPACKED_MAX_BYTES", 9 * 1024**3))


class _Partition:
    """Device mirror of one code-length partition."""

    __slots__ = (
        "packed_dev", "valid_dev", "unpacked_dev", "perm_dev", "bitplane_dev",
        "view_dev", "row_map", "cap", "count", "pen_memo",
    )

    def __init__(self, packed_dev, valid_dev, unpacked_dev, row_map, cap, count, perm_dev=None, bitplane_dev=None, view_dev=None):
        self.packed_dev = packed_dev
        self.valid_dev = valid_dev
        self.unpacked_dev = unpacked_dev  # plain ±1 int8 (phase-3 gather)
        self.perm_dev = perm_dev  # permute_rows() twin (fast phase-1 tree kernel)
        self.bitplane_dev = bitplane_dev  # bit_transpose_packed() twin (beyond-int8-budget phase 1)
        self.view_dev = view_dev  # resident (cap*lanes//128, 128) packed view (bitplane-tier phase 3)
        self.row_map = row_map  # (cap,) int32 global row per device row (junk rows -> 0, invalid)
        self.cap = cap
        self.count = count  # real rows uploaded
        self.pen_memo = {}  # mode -> [(valid_dev it was built from, penalty row), ...]

    def penalty_for(self, valid_dev, mode, builder=None):
        """Phase-1 penalty row for ``valid_dev``, cached per validity
        generation: the permuting penalty layouts cost ~half a sweep at 10M
        rows when rebuilt inside the jitted scan (see make_blockmax_penalty),
        and validity only changes on tombstone/append syncs, which rebind
        ``self.valid_dev`` to a fresh array (identity tracks generations).

        Two generations are kept per mode: a slow in-flight search holding
        the pre-sync snapshot must not evict the current generation's entry
        (single-slot eviction ping-ponged rebuilds under concurrency)."""
        entries = self.pen_memo.get(mode, [])
        for ref, pen in entries:
            if ref is valid_dev:
                return pen
        pen = (builder or _penalty_builder(mode))(valid_dev)
        self.pen_memo[mode] = [(valid_dev, pen)] + entries[:1]
        return pen


_PEN_BUILDERS = {}


def _penalty_builder(mode):
    """One jitted make_blockmax_penalty per layout mode (module-level cache
    so every partition shares the compiled program per shape)."""
    fn = _PEN_BUILDERS.get(mode)
    if fn is None:
        import functools

        import jax

        from iscc_search_tpu.ops.pallas_scan import make_blockmax_penalty

        fn = jax.jit(functools.partial(make_blockmax_penalty, mode=mode))
        _PEN_BUILDERS[mode] = fn
    return fn


_FUSED_SCAN = None


def _fused_scan_fn():
    """ONE jitted program scanning every length partition back-to-back.

    The per-partition dispatch loop paid one host->device program chain per
    partition; on a fixed-latency link (the serving harness tunnels the chip)
    four mixed-length partitions cost ~4x the dispatch overhead of one even
    with async dispatch. Tracing all partitions into a single program makes
    the whole variable-length sweep one dispatch + one readback — XLA
    schedules the partition scans back-to-back on device. Static cache key:
    the spec tuple (kind, nbits, k, chunk, has_int8, recall_target) per
    partition plus the buffer shapes/treedef jit already keys on.
    """
    global _FUSED_SCAN
    if _FUSED_SCAN is None:
        import jax

        from iscc_search_tpu.ops.pallas_scan import pallas_blockmax_topk_packedq_impl
        from iscc_search_tpu.ops.pm1_scan import (
            pm1_blockmax_topk_packedq_impl,
            pm1_topk_packedq_impl,
        )

        def run(q_codes, q_lanes, buffers, specs, interpret):
            outs = []
            for spec, bufs in zip(specs, buffers):
                kind, nbits, k, chunk, has_int8, recall = spec
                packed, valid, pen, unpacked, perm, bitplane, view = bufs
                if kind == "pallas":
                    s, i = pallas_blockmax_topk_packedq_impl(
                        q_codes,
                        q_lanes,
                        packed,
                        valid,
                        k,
                        nbits,
                        chunk_size=chunk,
                        interpret=interpret,
                        db_unpacked=unpacked,
                        unpacked=has_int8,
                        db_perm=perm,
                        db_bitplane=bitplane,
                        db_penalty=pen,
                        db_packed_view=view,
                    )
                elif kind == "blockmax":
                    s, i = pm1_blockmax_topk_packedq_impl(
                        q_codes, q_lanes, packed, valid, k, nbits, chunk_size=chunk
                    )
                else:
                    s, i = pm1_topk_packedq_impl(
                        q_codes,
                        q_lanes,
                        packed,
                        valid,
                        k,
                        nbits,
                        chunk_size=chunk,
                        recall_target=recall,
                    )
                outs.append((s, i))
            return tuple(outs)

        _FUSED_SCAN = jax.jit(run, static_argnames=("specs", "interpret"))
    return _FUSED_SCAN


def _to_view(packed_dev):
    # type: (...) -> ...
    """Device reshape of a (cap, lanes) packed mirror to its (cap*lanes//128,
    128) view (same bytes, same linear order). A one-time relayout copy,
    streamed in bounded steps (the whole-array reshape materializes the 16x
    lane-padded source tiling — 51 GiB at 100M rows); doing it inside the
    per-sweep jit costs more than the view saves (measured 21 ms vs 8 ms at
    8.4M rows)."""
    from iscc_search_tpu.ops.pallas_scan import packed_to_view

    return packed_to_view(packed_dev)


def _view_range_rewrite(view_dev, packed_dev, start, end):
    # type: (..., ..., int, int) -> ...
    """Refresh the packed view for original rows [start, end): re-slice the
    covering 128-element-aligned span from the (already updated) packed
    mirror and write its view rows back (functional update — concurrent
    search snapshots stay valid)."""
    import jax

    lanes = packed_dev.shape[1]
    if 128 % lanes:  # pragma: no cover - view twins exist only for lanes==8
        raise ValueError("view rewrite requires lanes | 128 (whole rows per view row)")
    rows_per_view = 128 // lanes
    r0 = (start // rows_per_view) * rows_per_view
    r1 = -(-end // rows_per_view) * rows_per_view
    if not hasattr(_view_range_rewrite, "_fn"):

        def _rewrite(view, packed_slice, view_offset):
            rows = packed_slice.reshape(
                packed_slice.shape[0] * packed_slice.shape[1] // 128, 128
            )
            return jax.lax.dynamic_update_slice(view, rows, (view_offset, 0))

        _view_range_rewrite._fn = jax.jit(_rewrite)
    packed_slice = jax.lax.dynamic_slice_in_dim(packed_dev, r0, r1 - r0, axis=0)
    return _view_range_rewrite._fn(view_dev, packed_slice, r0 * lanes // 128)


def _perm_group_rewrite(perm_dev, packed_dev, nbits, start, end):
    # type: (..., ..., int, int, int) -> ...
    """
    Refresh the permuted ±1 int8 layout for rows [start, end): unpack the
    covering 4096-row groups from the packed mirror, re-interleave, and write
    them back (functional update — concurrent search snapshots stay valid).
    """
    import jax
    import jax.numpy as jnp

    from iscc_search_tpu.ops.pallas_scan import PERM_GROUP, permute_rows
    from iscc_search_tpu.ops.pm1_scan import unpack_pm1

    g0 = (start // PERM_GROUP) * PERM_GROUP
    g1 = -(-end // PERM_GROUP) * PERM_GROUP
    if not hasattr(_perm_group_rewrite, "_fn"):

        def _rewrite(perm, packed_slice, offset, nb):
            rows = permute_rows(unpack_pm1(packed_slice, nb, jnp.int8))
            return jax.lax.dynamic_update_slice(perm, rows, (offset, 0))

        _perm_group_rewrite._fn = jax.jit(_rewrite, static_argnums=(3,))
    packed_slice = jax.lax.dynamic_slice_in_dim(packed_dev, g0, g1 - g0, axis=0)
    return _perm_group_rewrite._fn(perm_dev, packed_slice, g0, nbits)


def _bitplane_group_rewrite(bt_dev, packed_dev, start, end):
    # type: (..., ..., int, int) -> ...
    """
    Refresh the bitplane twin for original rows [start, end): re-transpose
    the covering 4096-row groups from the packed mirror and write their
    (group*256, 128) view rows back (functional update — concurrent search
    snapshots stay valid).
    """
    import jax

    from iscc_search_tpu.ops.pallas_scan import PERM_GROUP, bit_transpose_packed

    g0 = (start // PERM_GROUP) * PERM_GROUP
    g1 = -(-end // PERM_GROUP) * PERM_GROUP
    if not hasattr(_bitplane_group_rewrite, "_fn"):

        def _rewrite(bt, packed_slice, view_offset):
            view_rows = bit_transpose_packed(packed_slice)
            return jax.lax.dynamic_update_slice(bt, view_rows, (view_offset, 0))

        _bitplane_group_rewrite._fn = jax.jit(_rewrite)
    lanes = packed_dev.shape[1]  # view rows per original row = lanes/128
    packed_slice = jax.lax.dynamic_slice_in_dim(packed_dev, g0, g1 - g0, axis=0)
    return _bitplane_group_rewrite._fn(bt_dev, packed_slice, g0 * lanes // 128)


def _device_append(buf, new, start):
    # type: (...) -> ...
    """
    Functional device append (device-side copy, NO donation): a concurrent
    search snapshot may still reference the old buffer, and donation would
    invalidate it mid-flight. The copy runs at HBM speed (~ms for 10M rows).
    """
    import jax

    if not hasattr(_device_append, "_fn"):
        _device_append._fn = jax.jit(lambda b, n, s: jax.lax.dynamic_update_slice(b, n, (s, 0)))
    return _device_append._fn(buf, new, start)


def _fsync_dir(path):
    # type: (Path) -> None
    dfd = os.open(str(path), os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _atomic_write(path, data, sync_dir=True):
    # type: (Path, bytes, bool) -> None
    """Write bytes durably: temp file + fsync + rename + DIRECTORY fsync.

    Without the directory fsync the rename itself is neither durable nor
    ordered across power loss — a later rename (the manifest) could survive
    while an earlier one (a segment) is lost, leaving the manifest
    referencing a missing file. Batch writers pass sync_dir=False per file
    and issue ONE directory fsync before the manifest instead (the required
    ordering is only data-renames-durable-before-manifest-rename)."""
    fd, tmp = tempfile.mkstemp(dir=str(path.parent), prefix=path.name, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)
        if sync_dir:
            _fsync_dir(path.parent)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def _npz_bytes(**arrays):
    # type: (...) -> bytes
    import io

    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


class PackedCodeIndex:
    """
    Shared core: packed host arrays + device mirror + segment persistence.

    Subclasses fix the metric ("nphd" or "hamming") and key width.
    """

    metric = "nphd"
    key_bytes = 8

    @property
    def ROW_BYTES(self):
        # type: () -> int
        """Per-row storage estimate for shard sizing: key + lanes + nlanes + valid.

        Derived from key_bytes — DeviceHammingIndex rows carry 16-byte
        composite keys, not 8."""
        return self.key_bytes + MAX_LANES * 4 + 4 + 1

    def __init__(
        self,
        path,
        max_dim=256,
        shard_size=512 * 1024 * 1024,
        ndim=None,
        recall_target=None,
        scan_kernel="auto",
        mesh=None,
    ):
        # type: (str | Path, int, int, int | None, float | None, str, ...) -> None
        """
        Create or open a packed-code index directory.

        :param path: Segment directory (created on demand)
        :param max_dim: Maximum code width in bits (NPHD variable-length cap)
        :param shard_size: Seal an immutable segment after this many bytes
        :param ndim: Fixed code width in bits for the hamming metric
        :param recall_target: None = exact per-chunk top-k; float in (0,1) =
            TPU approx_max_k with that recall (throughput knob)
        :param scan_kernel: "auto" (fused Pallas kernel with a ±1 int8 HBM
            layout on TPU backends — ~1.5x the XLA path at 8x HBM footprint;
            XLA elsewhere), "pallas", or "xla"
        :param mesh: optional jax.sharding.Mesh — partitions row-shard over
            its single axis and searches run the sharded scan with an
            all-gather top-k merge (multi-chip capacity scaling)
        """
        self.path = Path(path)
        self.max_dim = max_dim
        self.ndim = ndim
        self.max_lanes = MAX_LANES
        self.shard_rows = max(1024, shard_size // self.ROW_BYTES)
        self.recall_target = recall_target if (recall_target is None or recall_target < 1.0) else None
        self.scan_kernel = scan_kernel
        self.mesh = mesh if mesh is not None and _mesh_size(mesh) > 1 else None
        # Multi-host SPMD hook (parallel/service.py): set on the coordinator's
        # indexes to fan device-relevant ops out to follower processes; None
        # everywhere else (single-process) and on follower replicas.
        self.control_hook = None
        # Followers never persist — the coordinator's directory is the truth.
        self.save_enabled = True
        self._lock = threading.RLock()

        cap = _MIN_DEVICE_ROWS
        self._keys = np.zeros((cap, self.key_bytes), dtype=np.uint8)
        self._codes = np.zeros((cap, self.max_lanes), dtype=np.uint32)
        self._nlanes = np.zeros((cap,), dtype=np.int32)
        self._valid = np.zeros((cap,), dtype=bool)
        self._rows = 0  # appended rows (including tombstoned)
        # Row-space generation: bumped whenever existing row ids are
        # renumbered or dropped (_compact_locked/_load/reset). Rows are
        # otherwise append-only, so a matching generation proves a captured
        # row id still names the same key.
        self._row_gen = next(_ROW_GEN_COUNTER)
        self._key_to_row = {}  # type: dict[bytes, int] | None  # None = lazy (built by _keymap)
        self._live = 0  # live (non-tombstoned) key count; size/search need no map
        self.dirty = 0  # unsaved key mutations since last save
        self._segments = []  # type: list[dict]  # {"file", "start", "rows"} sealed on disk
        # Device mirror: rows partitioned by code length (lane count) so the
        # NPHD prefix scale is a per-query broadcast inside each partition
        # (see ops/pm1_scan.py). {lanes: (packed_dev, valid_dev, row_map_np, cap, unpacked_dev)}
        self._partitions = None  # type: dict[int, tuple] | None
        self._device_stale = True
        # Incremental sync bookkeeping: host rows already mirrored on device
        # and whether tombstones changed since the last sync.
        self._synced_rows = 0
        self._valid_dirty = False
        self._closed = False
        # Background save worker: latest snapshot pending (coalesced) + the
        # one in flight; drain_rotations()/close() join both.
        self._save_cv = threading.Condition()
        self._save_queue = None  # type: dict | None
        self._save_inflight = False
        self._save_stop = False
        self._save_thread = None  # type: threading.Thread | None
        self._written_seq = 0  # highest snapshot seq successfully on disk
        self._resave_all = False  # a failed write must re-emit sealed files
        # Sealed segments not yet confirmed written (queued snapshots can be
        # coalesced away; their seals must ride the NEXT snapshot instead).
        self._unconfirmed_seals = set()  # type: set[str]
        # Monotonic counters: every snapshot gets a sequence number (older
        # snapshots must never replace newer ones in the coalescing queue)
        # and every emitted data file gets a unique name (the old manifest
        # keeps referencing the OLD files until the new manifest commits).
        self._save_seq = 0
        self._file_seq = 0
        # Files no manifest-to-be references anymore; unlinked by the save
        # worker only AFTER a newer manifest commits (never eagerly — the
        # on-disk manifest may still reference them).
        self._pending_deletes = set()  # type: set[str]

        if (self.path / "state.json").exists():
            self._load()

    # -- public API (parity surface with ShardedNphdIndex/ShardedIndex128) ---

    def __len__(self):
        # type: () -> int
        return self._live

    @property
    def size(self):
        # type: () -> int
        """Number of live (non-tombstoned) keys."""
        return self._live

    def __contains__(self, key):
        # type: (bytes | int) -> bool
        return self._key(key) in self._keymap

    @property
    def _keymap(self):
        # type: () -> dict[bytes, int]
        """
        key -> row map, built lazily after a snapshot load.

        Opening a 10M snapshot spent ~10 s in the eager build loop, yet a
        restarted *serving* process only searches — which never consults the
        map (``_live`` answers the emptiness/size questions). Mutation paths
        (add/remove/get/contains) pay the one-time build on first use.
        """
        km = self._key_to_row
        if km is None:
            with self._lock:
                km = self._key_to_row
                if km is None:
                    rows = self._rows
                    width = self.key_bytes
                    buf = self._keys[:rows].tobytes()
                    km = {}
                    for i in np.flatnonzero(self._valid[:rows]).tolist():
                        off = i * width
                        km[buf[off : off + width]] = i
                    self._key_to_row = km
        return km

    @property
    def shard_count(self):
        # type: () -> int
        active_rows = self._rows - (self._segments[-1]["start"] + self._segments[-1]["rows"] if self._segments else 0)
        return len(self._segments) + (1 if active_rows > 0 or not self._segments else 0)

    @property
    def serialized_length(self):
        # type: () -> int
        """Estimated serialized bytes of live state (monitoring)."""
        return self._rows * self.ROW_BYTES

    @property
    def tombstone_fraction(self):
        # type: () -> float
        if self._rows == 0:
            return 0.0
        return 1.0 - self._live / self._rows

    def add(self, keys, vectors):
        # type: (list, list[bytes]) -> None
        """
        Append codes; an existing key is updated (old row tombstoned).

        :param keys: row keys (int for 8-byte indexes, bytes otherwise)
        :param vectors: code bodies (bytes, multiples of 4 bytes)
        """
        if not keys:
            return
        if self.control_hook is not None:
            # Mirror the EXACT engine-level call on every cluster process so
            # replicas append identical rows in identical order (bytes are
            # pickle-friendly; ndarray vectors normalize to bytes first).
            vectors = [self._vector_bytes(v) for v in vectors]
            return self.control_hook("add", (list(keys), vectors), lambda: self._add_impl(keys, vectors))
        return self._add_impl(keys, vectors)

    def _add_impl(self, keys, vectors):
        # type: (list, list[bytes]) -> None
        with self._lock:
            kbs = [self._key(k) for k in keys]
            packed, nlanes = pack_codes([self._vector_bytes(v) for v in vectors], self.max_lanes)
            n = len(kbs)
            self._ensure_capacity(self._rows + n)
            start = self._rows
            keymap = self._keymap
            batch_dup_rows = []  # rows within THIS batch superseded by a later duplicate key
            for i, kb in enumerate(kbs):
                old = keymap.get(kb)
                if old is None:
                    self._live += 1
                else:
                    self._valid[old] = False
                    self._valid_dirty = True  # tombstone must reach the device mirror
                    if old >= start:
                        # Intra-batch duplicate: the blanket validity assignment
                        # below would resurrect this row — re-tombstone it after.
                        batch_dup_rows.append(old)
                row = start + i
                self._keys[row] = np.frombuffer(kb, dtype=np.uint8)
                keymap[kb] = row
            self._codes[start : start + n] = packed
            self._nlanes[start : start + n] = nlanes
            self._valid[start : start + n] = True
            for row in batch_dup_rows:
                self._valid[row] = False
            self._rows += n
            self.dirty += n
            self._device_stale = True

    def add_packed(self, keys, packed, nlanes):
        # type: (np.ndarray, np.ndarray, np.ndarray | int) -> None
        """
        Vectorized bulk append of pre-packed rows (the bulk-ingest fast path).

        The per-item ``add()`` loop (key normalization + dict upsert per row)
        dominates bulk builds — ~28K rows/s at SIMPRINT scale, an hour for
        the 100M-chunk BASELINE config 4. This path appends whole arrays.

        CONTRACT: ``keys`` must be unique within the batch AND not already
        present in the index — the dedup/update semantics of ``add()`` are
        skipped (a violated contract leaves duplicate live rows, exactly as
        documented for the reference's raw batch loaders,
        /root/reference/iscc_search/indexes/simprint/usearch_core.py:85-108
        — its in-batch dedup also trusts the store for cross-batch keys).
        Rebuild-from-truth and bulk benchmark loaders satisfy this by
        construction.

        :param keys: (n, key_bytes) uint8 key matrix
        :param packed: (n, L) uint32 packed codes, L <= max_lanes
        :param nlanes: (n,) int32 lane counts, or a scalar applied to all rows
        """
        keys = np.ascontiguousarray(keys, dtype=np.uint8)
        packed = np.ascontiguousarray(packed, dtype=np.uint32)
        n = keys.shape[0]
        if n == 0:
            return
        if keys.ndim != 2 or keys.shape[1] != self.key_bytes:
            raise ValueError(f"keys must be (n, {self.key_bytes}) uint8, got {keys.shape}")
        if packed.shape[0] != n or packed.ndim != 2 or packed.shape[1] > self.max_lanes:
            raise ValueError(f"packed must be (n, <= {self.max_lanes}) uint32, got {packed.shape}")
        if np.isscalar(nlanes) or getattr(nlanes, "ndim", 1) == 0:
            nlanes = np.full(n, int(nlanes), np.int32)
        else:
            nlanes = np.ascontiguousarray(nlanes, dtype=np.int32)
            if nlanes.shape != (n,):
                raise ValueError(f"nlanes must be (n,), got {nlanes.shape}")
        # Bound by the PROVIDED width, not just max_lanes: a row claiming
        # more lanes than packed carries would silently treat the zero-filled
        # trailing lanes as real code bits (corrupt stored body + wrong NPHD
        # scores) instead of raising.
        if int(nlanes.max(initial=0)) > packed.shape[1] or int(nlanes.min(initial=1)) < 1:
            raise ValueError("nlanes out of range")
        if self.control_hook is not None:
            return self.control_hook(
                "add_packed", (keys, packed, nlanes), lambda: self._add_packed_impl(keys, packed, nlanes)
            )
        return self._add_packed_impl(keys, packed, nlanes)

    def _add_packed_impl(self, keys, packed, nlanes):
        # type: (np.ndarray, np.ndarray, np.ndarray) -> None
        n = keys.shape[0]
        with self._lock:
            self._ensure_capacity(self._rows + n)
            start = self._rows
            self._keys[start : start + n] = keys
            self._codes[start : start + n, : packed.shape[1]] = packed
            if packed.shape[1] < self.max_lanes:
                self._codes[start : start + n, packed.shape[1] :] = 0
            self._nlanes[start : start + n] = nlanes
            self._valid[start : start + n] = True
            km = self._key_to_row
            if km is not None:
                # Keep the materialized map coherent (mutation paths rely on
                # it); when it is still lazy (None) the bulk rows ride the
                # one-time rebuild instead — the common bulk-load case.
                width = self.key_bytes
                buf = keys.tobytes()
                for i in range(n):
                    km[buf[i * width : (i + 1) * width]] = start + i
            self._rows += n
            self._live += n
            self.dirty += n
            self._device_stale = True

    def remove(self, keys):
        # type: (list) -> int
        """Tombstone keys; returns the number of keys actually removed."""
        if self.control_hook is not None:
            return self.control_hook("remove", (list(keys),), lambda: self._remove_impl(keys))
        return self._remove_impl(keys)

    def _remove_impl(self, keys):
        # type: (list) -> int
        removed = 0
        with self._lock:
            keymap = self._keymap
            for k in keys:
                kb = self._key(k)
                row = keymap.pop(kb, None)
                if row is not None:
                    self._valid[row] = False
                    self._live -= 1
                    removed += 1
                    self.dirty += 1
            if removed:
                self._device_stale = True
                self._valid_dirty = True
        return removed

    def get(self, key):
        # type: (bytes | int) -> bytes | None
        """Stored code body for a key, or None."""
        with self._lock:
            row = self._keymap.get(self._key(key))
            if row is None:
                return None
            return unpack_code(self._codes[row], int(self._nlanes[row]))

    @property
    def row_generation(self):
        # type: () -> int
        """Current row-space generation (see :meth:`body_at`). Capture it
        BEFORE a ``search(return_rows=True)`` sweep; any compact/reload/reset
        between the capture and the ``body_at`` reads bumps it, so a mismatch
        proves the captured row ids are stale."""
        with self._lock:
            return self._row_gen

    def body_at(self, row, gen=None):
        # type: (int, int | None) -> bytes | None
        """Stored code body at a ROW returned by ``search(return_rows=True)``,
        or None when the row no longer exists (a rebuild/reset raced the
        search snapshot — callers keep the query bytes as fallback, matching
        the historical get()-miss behavior).

        :param gen: row-space generation captured via :attr:`row_generation`
            before the search that produced ``row``. A compact() racing the
            search renumbers the row space — an in-range stale row would
            silently return a DIFFERENT key's body; the generation check
            (atomic with the read, both under the lock) turns that into the
            safe None fallback.

        O(1) array access — unlike :meth:`get`, this never materializes the
        key->row map (a 100M-row map costs ~15 GB host RAM and minutes to
        build; per-candidate ``get`` calls in the simprint scoring loop were
        the host-side ping-pong SURVEY §7 warns about)."""
        with self._lock:
            if gen is not None and gen != self._row_gen:
                return None
            if row < 0 or row >= self._rows or self._nlanes[row] <= 0:
                return None
            return unpack_code(self._codes[row], int(self._nlanes[row]))

    def search(self, query_bodies, count, return_rows=False):
        # type: (list[bytes], int, bool) -> list[tuple]
        """
        Top-``count`` scan for a batch of queries (exact unless a
        recall_target was configured).

        Each length partition is scanned with the ±1 matmul kernel; per-query
        candidates from all partitions merge on the host (<= 4 partitions x k
        candidates each).

        :param query_bodies: query code bodies
        :param count: results per query
        :param return_rows: also return each candidate's host row id (for
            O(1) ``body_at`` lookups in scoring loops)
        :return: per query a (keys (m, key_bytes) uint8 array, scores (m,)
            float32 array) pair — plus a rows (m,) int array when
            ``return_rows`` — sorted by score descending; m <= count
        """
        if not query_bodies or self._rows == 0 or self._live == 0:
            empty = [
                (np.zeros((0, self.key_bytes), np.uint8), np.zeros(0, np.float32), np.zeros(0, np.int64))
                for _ in query_bodies
            ]
            return empty if return_rows else [e[:2] for e in empty]
        if self.control_hook is not None:
            bodies = [self._vector_bytes(b) for b in query_bodies]
            return self.control_hook(
                "search", (bodies, count), lambda: self._search_impl(bodies, count, return_rows)
            )
        return self._search_impl(query_bodies, count, return_rows)

    def _search_impl(self, query_bodies, count, return_rows=False):
        # type: (list[bytes], int, bool) -> list[tuple]
        import jax.numpy as jnp

        with self._lock:
            synced = self._sync_device()
            # Snapshot partition buffers under the lock: a concurrent sync may
            # rebind partition attributes, and a consistent (buffer, validity,
            # row_map) triple must be used per partition.
            partitions = {
                lanes: (p.packed_dev, p.valid_dev, p.row_map, p.cap, p.unpacked_dev, p.perm_dev, p.bitplane_dev, p.view_dev, p)
                for lanes, p in synced.items()
            }
            # Reference snapshot is race-safe: rows are append-only (keys of
            # existing rows never mutate; capacity growth rebinds self._keys
            # to a new array, leaving this reference intact).
            keys_snapshot = self._keys[: self._rows]

        q_codes, q_lanes = pack_codes([self._vector_bytes(b) for b in query_bodies], self.max_lanes)
        nq = len(query_bodies)
        q_pad = max(8, _pow2ceil(nq))
        if q_pad > nq:
            q_codes = np.pad(q_codes, ((0, q_pad - nq), (0, 0)))
            q_lanes = np.pad(q_lanes, (0, q_pad - nq), constant_values=1)
        # One upload of the 32 B/query packed codes; per-partition unpack +
        # prefix-mask + scale run on device (prepare_queries_device) instead
        # of shipping a host-built (Q, nbits) float matrix per partition.
        q_codes_dev = jnp.asarray(q_codes)
        q_lanes_dev = jnp.asarray(q_lanes)

        # Scan every partition. Single device: ALL partitions trace into ONE
        # jitted program (one dispatch + one readback for the whole
        # variable-length sweep — see _fused_scan_fn). Mesh: per-partition
        # sharded dispatches, still issued asynchronously before collecting.
        pending = []  # type: list[tuple[np.ndarray, object, object]]
        if self.mesh is None:
            from iscc_search_tpu.ops.pallas_scan import penalty_mode

            specs = []  # type: list[tuple]
            buffers = []  # type: list[tuple]
            row_maps = []  # type: list[np.ndarray]
            for lanes in sorted(partitions):
                packed_dev, valid_dev, row_map, cap, unpacked_dev, perm_dev, bitplane_dev, view_dev, part = partitions[lanes]
                nbits = lanes * 32
                chunk = min(cap, _DEFAULT_CHUNK_ROWS)
                # Bucket k to a power of two so user-supplied limits don't
                # each trigger a fresh compile; trim to `count` below.
                k = _pow2ceil(max(1, count))
                if k > chunk:
                    # Honor large counts exactly: the per-chunk top-k must
                    # hold k candidates, so grow the scan chunk. A chunk that
                    # no longer divides the (65536-quantized) capacity scans
                    # the whole partition as one chunk; chunks past the
                    # Pallas-friendly size route to the XLA path below.
                    chunk = min(cap, k)
                    if cap % chunk:
                        chunk = cap
                    k = min(k, chunk)
                pallas_ok = chunk <= max(_DEFAULT_CHUNK_ROWS, _PALLAS_MIN_CHUNK)
                if self.recall_target is None and pallas_ok and (
                    unpacked_dev is not None or perm_dev is not None or bitplane_dev is not None
                ):
                    # Exact fused Pallas phase 1 (bitplane twin first — 32
                    # B/row HBM reads; else perm/plain int8), Pallas gather
                    # or resident-view phase 3 (same preference order as the
                    # pre-fusion dispatch, benchmarks/EXP_BITPLANE_10M.json).
                    use_bt = bitplane_dev is not None
                    has_int8 = (unpacked_dev is not None or perm_dev is not None) and not use_bt
                    pmode = penalty_mode(
                        unpacked=has_int8,
                        permuted=perm_dev is not None and not use_bt,
                        bitplane=use_bt,
                    )
                    specs.append(("pallas", nbits, k, max(chunk, _PALLAS_MIN_CHUNK), has_int8, None))
                    buffers.append((
                        packed_dev,
                        valid_dev,
                        part.penalty_for(valid_dev, pmode),
                        unpacked_dev,
                        None if use_bt else perm_dev,
                        bitplane_dev,
                        None if unpacked_dev is not None else view_dev,
                    ))
                elif self.recall_target is None:
                    # Exact two-phase block-max selection (no per-chunk sort)
                    specs.append(("blockmax", nbits, k, chunk, False, None))
                    buffers.append((packed_dev, valid_dev, None, None, None, None, None))
                else:
                    specs.append(("approx", nbits, k, chunk, False, self.recall_target))
                    buffers.append((packed_dev, valid_dev, None, None, None, None, None))
                row_maps.append(row_map)
            outs = _fused_scan_fn()(
                q_codes_dev, q_lanes_dev, tuple(buffers), tuple(specs), self._pallas_interpret()
            )
            pending = [(rm, s, i) for rm, (s, i) in zip(row_maps, outs)]
            return self._collect_results(
                pending, nq, count, keys_snapshot, return_rows
            )

        n_shards = _mesh_size(self.mesh)
        for lanes, (packed_dev, valid_dev, row_map, cap, unpacked_dev, perm_dev, bitplane_dev, view_dev, part) in partitions.items():
            nbits = lanes * 32
            chunk = min(cap // n_shards, _DEFAULT_CHUNK_ROWS)
            # Bucket k to a power of two so user-supplied limits don't each
            # trigger a fresh kernel compile; trim to `count` below.
            k = _pow2ceil(max(1, count))
            if k > chunk:
                # Honor large counts exactly: the per-chunk top-k must hold k
                # candidates, so grow the scan chunk (bounded by the per-shard
                # capacity — k == all rows is then still exact). Chunks past
                # the Pallas-friendly size route to the XLA path below.
                chunk = min(cap // n_shards, k)
                k = min(k, chunk)
            pallas_ok = chunk <= max(_DEFAULT_CHUNK_ROWS, _PALLAS_MIN_CHUNK)
            # Mesh merges gather n_shards * k candidates; a count above the
            # per-shard k needs a WIDER global top-k or rows that exist
            # across shards are silently dropped from the merged result.
            merge_k = min(_pow2ceil(max(1, count)), k * n_shards)
            # Mesh paths take prepared queries (replicated); prep runs as
            # its own device program.
            from iscc_search_tpu.ops.pm1_scan import prepare_queries_device

            q_pm1, q_scale = prepare_queries_device(q_codes_dev, q_lanes_dev, nbits)
            if self.recall_target is None and pallas_ok and (
                unpacked_dev is not None or perm_dev is not None
            ):
                # Exact: the fused Pallas kernel per shard + ICI merge — the
                # mesh keeps the single-chip fast path instead of regressing
                # to the XLA packed scan.
                from iscc_search_tpu.ops.pallas_scan import penalty_mode
                from iscc_search_tpu.parallel.pallas_sharded import (
                    shard_blockmax_penalty,
                    sharded_pallas_topk,
                )

                per_shard = cap // n_shards
                # Mosaic needs chunks >= 16384 unless the chunk IS the whole
                # per-shard array (per_shard is a pow2, so both divide).
                pchunk = per_shard if per_shard < _PALLAS_MIN_CHUNK else max(chunk, _PALLAS_MIN_CHUNK)
                pmode = penalty_mode(unpacked=True, permuted=perm_dev is not None)
                pen = part.penalty_for(
                    valid_dev,
                    "mesh:" + pmode,
                    builder=lambda v: shard_blockmax_penalty(self.mesh, v, pmode),
                )
                scores, idx = sharded_pallas_topk(
                    self.mesh,
                    jnp.asarray(q_pm1),
                    jnp.asarray(q_scale),
                    packed_dev,
                    unpacked_dev,
                    valid_dev,
                    k,
                    nbits,
                    chunk_size=pchunk,
                    merge_k=merge_k,
                    interpret=self._pallas_interpret(),
                    db_perm=perm_dev,
                    db_penalty=pen,
                )
            else:
                from iscc_search_tpu.parallel.pm1_sharded import sharded_pm1_topk

                scores, idx = sharded_pm1_topk(
                    self.mesh,
                    jnp.asarray(q_pm1),
                    jnp.asarray(q_scale),
                    packed_dev,
                    valid_dev,
                    k,
                    nbits,
                    chunk_size=chunk,
                    recall_target=self.recall_target,
                    merge_k=merge_k,
                )
            pending.append((row_map, scores, idx))
        return self._collect_results(pending, nq, count, keys_snapshot, return_rows)

    def _collect_results(self, pending, nq, count, keys_snapshot, return_rows):
        # type: (list, int, int, np.ndarray, bool) -> list[tuple]
        """Read back every partition's (scores, idx), map device rows to
        global rows, and merge the per-query candidates on the host."""
        # Start every device->host copy before blocking on any of them: the
        # transfers overlap each other and the tail of the device work, so the
        # whole collect pays ONE link round-trip instead of 2 x partitions
        # serial ones (dominant when the device link has fixed latency).
        # Every pending entry comes out of a jitted program (_fused_scan_fn or
        # the sharded mesh ops), so these are always jax Arrays and the async
        # copy API is part of their contract — no hasattr guard needed.
        for _, scores_dev, idx_dev in pending:
            scores_dev.copy_to_host_async()
            idx_dev.copy_to_host_async()

        cand_scores = [[] for _ in range(nq)]  # type: list[list[np.ndarray]]
        cand_rows = [[] for _ in range(nq)]  # type: list[list[np.ndarray]]
        for row_map, scores_dev, idx_dev in pending:
            scores = np.asarray(scores_dev)[:nq, :count]
            idx = np.asarray(idx_dev)[:nq, :count]
            for qi in range(nq):
                sel = idx[qi] >= 0
                cand_scores[qi].append(scores[qi][sel])
                cand_rows[qi].append(row_map[idx[qi][sel]])

        results = []
        for qi in range(nq):
            if not cand_scores[qi]:  # pragma: no cover - every live partition appends per query
                empty = (np.zeros((0, self.key_bytes), np.uint8), np.zeros(0, np.float32), np.zeros(0, np.int64))
                results.append(empty if return_rows else empty[:2])
                continue
            s = np.concatenate(cand_scores[qi])
            r = np.concatenate(cand_rows[qi])
            order = np.argsort(-s, kind="stable")[:count]
            rr = r[order]
            if return_rows:
                results.append((keys_snapshot[rr], s[order].astype(np.float32), rr))
            else:
                results.append((keys_snapshot[rr], s[order].astype(np.float32)))
        return results

    def save(self, wait=True):
        # type: (bool) -> None
        """
        Persist sealed segments (write-once), the active segment, the validity
        bitmap, and the state manifest. Atomic per file; the manifest rename is
        the commit point. Compacts first when tombstones dominate.

        The arrays are snapshotted under the lock (a memcpy) and written by a
        background worker, so concurrent ``add``/``search`` never stall on
        file I/O. ``wait=False`` returns after scheduling; queued snapshots
        coalesce (a newer snapshot's manifest supersedes an older one), so at
        most one write queues behind the one in flight.
        """
        if not self.save_enabled:
            return
        with self._lock:
            if self.tombstone_fraction > 0.5 and self._rows > _MIN_DEVICE_ROWS:
                self._compact_locked()
            snapshot = self._snapshot_locked()
            self.dirty = 0
        self._enqueue_save(snapshot, wait=wait)

    def _snapshot_locked(self):
        # type: () -> dict
        """Copy everything one save needs; caller holds the lock.

        Every sealed segment whose write has not been CONFIRMED on disk is
        (re-)included: a queued snapshot may be superseded by a newer one
        before the worker writes it (coalescing), and a manifest must never
        reference a seg file that only a dropped or failed snapshot carried.
        """
        writes = []  # (descriptor, keys, codes, nlanes) per segment file
        emitted = set()
        sealed_rows = self._segments[-1]["start"] + self._segments[-1]["rows"] if self._segments else 0
        if self._resave_all:
            # A previous write failed after sealing in memory: re-emit every
            # sealed file so the next manifest never references a missing one.
            for seg in self._segments:
                writes.append(self._segment_snapshot(seg))
                emitted.add(seg["file"])
            self._resave_all = False
        else:
            # emitted is empty on this branch and segment files are unique,
            # so membership in _unconfirmed_seals alone decides re-emission.
            for seg in self._segments:
                if seg["file"] in self._unconfirmed_seals:
                    writes.append(self._segment_snapshot(seg))
                    emitted.add(seg["file"])
        while self._rows - sealed_rows >= self.shard_rows:
            self._file_seq += 1
            seg = {
                "file": f"seg-{self._file_seq:08d}.npz",  # unique, never reused
                "start": sealed_rows,
                "rows": self.shard_rows,
            }
            self._segments.append(seg)
            writes.append(self._segment_snapshot(seg))
            emitted.add(seg["file"])
            sealed_rows += self.shard_rows
        self._unconfirmed_seals.update(emitted)
        # Fresh names for the rewritable files on EVERY save: overwriting
        # active.npz/valid.npy in place would invalidate the data the
        # still-committed OLD manifest references — a crash between the data
        # write and the manifest rename must leave the old state loadable.
        self._save_seq += 1
        seq = self._save_seq
        active = {"file": f"active-{seq:08d}.npz", "start": sealed_rows, "rows": self._rows - sealed_rows}
        valid_file = f"valid-{seq:08d}.npz"
        writes.append(self._segment_snapshot(active))
        state = {
            "rows": self._rows,
            "max_dim": self.max_dim,
            "ndim": self.ndim,
            "key_bytes": self.key_bytes,
            "segments": list(self._segments),
            "active": active,
            "valid_file": valid_file,
            "save_seq": seq,
            "file_seq": self._file_seq,
        }
        # Previous active/valid files are unreferenced once THIS manifest
        # commits; queue them for post-commit deletion (the worker unlinks
        # only after the rename, and a superseding snapshot inherits them).
        self._pending_deletes.add(f"active-{seq - 1:08d}.npz")
        self._pending_deletes.add(f"valid-{seq - 1:08d}.npz")
        self._pending_deletes.update({"active.npz", "valid.npy"})  # legacy fixed names
        self._pending_deletes.discard(active["file"])
        self._pending_deletes.discard(valid_file)
        return {
            "seq": seq,
            "writes": writes,
            "valid": self._valid[: self._rows].copy(),
            "valid_file": valid_file,
            "state": state,
            "sealed_files": sorted(emitted),
            "delete_after": sorted(self._pending_deletes),
        }

    def _segment_snapshot(self, seg):
        # type: (dict) -> tuple
        s, n = seg["start"], seg["rows"]
        return (
            seg,
            self._keys[s : s + n].copy(),
            self._codes[s : s + n].copy(),
            self._nlanes[s : s + n].copy(),
        )

    def _enqueue_save(self, snapshot, wait):
        # type: (dict, bool) -> None
        with self._save_cv:
            if self._save_thread is None or not self._save_thread.is_alive():
                self._save_stop = False
                self._save_thread = threading.Thread(
                    target=self._save_worker, name=f"save-{self.path.name}", daemon=True
                )
                self._save_thread.start()
            # Coalesce by SEQUENCE: an older snapshot (taken before, enqueued
            # after — snapshot and enqueue are not atomic) must never replace
            # a newer one in the queue, NOR be written after a newer one that
            # the worker already dequeued/committed (the written-seq
            # watermark): snapshots are full-state, so newer subsumes older.
            if snapshot["seq"] > self._written_seq and (
                self._save_queue is None or snapshot["seq"] > self._save_queue["seq"]
            ):
                self._save_queue = snapshot
            self._save_cv.notify_all()
            if wait:
                # wait_for keeps the retest-after-wakeup loop in threading.py
                # (a hand-written while compiles an extra loop-bottom test
                # copy that only a spurious wakeup could exercise).
                self._save_cv.wait_for(lambda: self._save_queue is None and not self._save_inflight)

    def _save_worker(self):
        # type: () -> None
        while True:
            with self._save_cv:
                self._save_cv.wait_for(lambda: self._save_queue is not None or self._save_stop)
                if self._save_queue is None:
                    return
                snapshot = self._save_queue
                self._save_queue = None
                if snapshot["seq"] <= self._written_seq:  # pragma: no cover - enqueue guard
                    self._save_cv.notify_all()
                    continue
                self._save_inflight = True
            try:
                self._write_snapshot(snapshot)
                with self._save_cv:
                    self._written_seq = max(self._written_seq, snapshot["seq"])
                with self._lock:
                    if snapshot.get("sealed_files"):
                        self._unconfirmed_seals.difference_update(snapshot["sealed_files"])
                    self._pending_deletes.difference_update(snapshot.get("delete_after", ()))
            except Exception:
                logger.exception(f"background save failed for {self.path}")
                with self._lock:
                    self._resave_all = True
                    self.dirty += 1  # state on disk is stale again
            finally:
                with self._save_cv:
                    self._save_inflight = False
                    self._save_cv.notify_all()

    def _write_snapshot(self, snapshot):
        # type: (dict) -> None
        self.path.mkdir(parents=True, exist_ok=True)
        for seg, keys, codes, nlanes in snapshot["writes"]:
            payload = _npz_bytes(keys=keys, codes=codes, nlanes=nlanes)
            _atomic_write(self.path / seg["file"], payload, sync_dir=False)
        _atomic_write(self.path / snapshot["valid_file"], _npz_bytes(valid=snapshot["valid"]), sync_dir=False)
        # ONE directory fsync makes all the data renames above durable
        # BEFORE the manifest rename can be (ordering is all that matters;
        # per-file dir fsyncs would pay N+2 disk barriers for the same
        # guarantee).
        _fsync_dir(self.path)
        # The manifest rename is the commit point: every file above has a
        # fresh name, so a crash anywhere before this line leaves the OLD
        # manifest with all of ITS files intact.
        _atomic_write(self.path / "state.json", json.dumps(snapshot["state"]).encode())
        # Only now are the superseded files unreferenced by the on-disk state.
        for name in snapshot.get("delete_after", ()):
            try:
                (self.path / name).unlink()
            except OSError:
                pass

    def compact(self):
        # type: () -> None
        """Drop tombstoned rows and rewrite all segments on next save."""
        with self._lock:
            self._compact_locked()

    def reset(self):
        # type: () -> None
        """Release in-memory and device resources (files untouched)."""
        with self._lock:
            cap = _MIN_DEVICE_ROWS
            self._keys = np.zeros((cap, self.key_bytes), dtype=np.uint8)
            self._codes = np.zeros((cap, self.max_lanes), dtype=np.uint32)
            self._nlanes = np.zeros((cap,), dtype=np.int32)
            self._valid = np.zeros((cap,), dtype=bool)
            self._rows = 0
            self._row_gen = next(_ROW_GEN_COUNTER)
            self._key_to_row = {}
            self._live = 0
            self._segments = []
            self._unconfirmed_seals = set()
            self._partitions = None
            self._device_stale = True
            self._synced_rows = 0
            self._valid_dirty = False
            self.dirty = 0

    def drain_rotations(self):
        # type: () -> None
        """Block until every queued/in-flight background save is on disk."""
        with self._save_cv:
            self._save_cv.wait_for(lambda: self._save_queue is None and not self._save_inflight)

    def close(self):
        # type: () -> None
        """Drain background saves, save if dirty, release device memory. Idempotent."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
        self.drain_rotations()
        # Read dirty only AFTER the drain: a background write that failed
        # during the drain re-marks the index dirty (_resave_all), and that
        # state must not be lost at shutdown.
        with self._lock:
            dirty = self.dirty
        if dirty:
            self.save(wait=True)
        with self._save_cv:
            self._save_stop = True
            self._save_cv.notify_all()
        if self._save_thread is not None:
            self._save_thread.join(timeout=60)
        with self._lock:
            self._partitions = None

    # -- internals ------------------------------------------------------------

    def _key(self, key):
        # type: (bytes | int) -> bytes
        if isinstance(key, (int, np.integer)):
            return int(key).to_bytes(self.key_bytes, "big")
        key = bytes(key)
        if len(key) != self.key_bytes:
            raise ValueError(f"key must be {self.key_bytes} bytes, got {len(key)}")
        return key

    def _vector_bytes(self, vec):
        # type: (bytes | np.ndarray) -> bytes
        if isinstance(vec, np.ndarray):
            vec = vec.tobytes()
        return bytes(vec)

    def _ensure_capacity(self, needed):
        # type: (int) -> None
        cap = self._keys.shape[0]
        if needed <= cap:
            return
        new_cap = _pow2ceil(needed)

        # Grow by allocate+copy, NOT np.resize: np.resize fills the tail by
        # *tiling* the old data (then we'd zero it again) — measured 9.5 s of
        # pure waste opening a 10M snapshot.
        def grow(arr, shape):
            out = np.zeros(shape, dtype=arr.dtype)
            out[: self._rows] = arr[: self._rows]
            return out

        self._keys = grow(self._keys, (new_cap, self.key_bytes))
        self._codes = grow(self._codes, (new_cap, self.max_lanes))
        self._nlanes = grow(self._nlanes, (new_cap,))
        self._valid = grow(self._valid, (new_cap,))

    def _sync_device(self):
        # type: () -> dict[int, tuple]
        """
        Upload host arrays to the device as per-length partitions.

        Rows group by lane count; each partition is padded to a pow2 capacity
        (invalid padding rows) and carries a row_map back to global rows.
        """
        import jax
        import jax.numpy as jnp

        if not self._device_stale and self._partitions is not None:
            return self._partitions

        rows = self._rows
        try:
            # Full (re)build on first sync or mesh placement (sharded arrays
            # are rebuilt whole). Row-space SHRINKS need no clause of their
            # own: every shrinking path (_compact_locked, _load, reset) nulls
            # _partitions, so a live partitions dict implies rows only grew
            # since _synced_rows (appends are the sole other mutation).
            if self._partitions is None or self.mesh is not None:
                self._partitions = {}
                nlanes = self._nlanes[:rows]
                for lanes in np.unique(nlanes):
                    lanes = int(lanes)
                    row_map = np.flatnonzero(nlanes == lanes).astype(np.int32)
                    self._partitions[lanes] = self._build_partition(lanes, row_map)
            else:
                # Incremental: append only rows added since the last sync; a
                # partition whose capacity overflows is rebuilt alone.
                new_lanes = self._nlanes[self._synced_rows : rows]
                for lanes in np.unique(new_lanes):
                    lanes = int(lanes)
                    new_rows = (
                        self._synced_rows + np.flatnonzero(new_lanes == lanes)
                    ).astype(np.int32)
                    part = self._partitions.get(lanes)
                    if part is None or part.count + len(new_rows) > part.cap:
                        row_map = np.flatnonzero(self._nlanes[:rows] == lanes).astype(np.int32)
                        self._partitions[lanes] = self._build_partition(lanes, row_map)
                    else:
                        self._append_to_partition(part, lanes, new_rows)
                if self._valid_dirty:
                    for lanes, part in self._partitions.items():
                        valid = np.zeros((part.cap,), bool)
                        live = part.row_map[: part.count]
                        valid[: part.count] = self._valid[live]
                        part.valid_dev = jax.device_put(jnp.asarray(valid))
        except BaseException:
            # A partial incremental sync (one partition appended, another
            # failed) with stale _synced_rows would re-append the same rows
            # on retry — duplicate valid device rows. Force a full rebuild.
            self._partitions = None
            self._synced_rows = 0
            self._device_stale = True
            raise

        self._synced_rows = rows
        self._valid_dirty = False
        self._device_stale = False
        return self._partitions

    def _build_partition(self, lanes, row_map):
        # type: (int, np.ndarray) -> _Partition
        """Upload one partition from scratch (pow2 capacity + headroom)."""
        import jax
        import jax.numpy as jnp

        n_shards = _mesh_size(self.mesh) if self.mesh is not None else 1
        n = len(row_map)
        if n_shards > 1:
            # Mesh partitions stay pow2 per shard (equal shard_map blocks).
            per_shard = max(_MIN_DEVICE_ROWS, _pow2ceil(-(-n // n_shards)))
            cap = per_shard * n_shards
        else:
            cap = _cap_rows(n)
        packed = np.zeros((cap, lanes), np.uint32)
        packed[:n] = self._codes[row_map][:, :lanes]
        valid = np.zeros((cap,), bool)
        valid[:n] = self._valid[row_map]
        full_map = np.zeros((cap,), np.int32)
        full_map[:n] = row_map
        unpacked_dev = perm_dev = None
        if self.mesh is not None:
            from iscc_search_tpu.parallel.pm1_sharded import shard_pm1_database

            # numpy in: place_rows uploads each process's own block directly
            # (a jnp.asarray here would commit the FULL array to local device 0
            # first — wrong under multi-process, wasteful on a single chip).
            packed_dev, valid_dev = shard_pm1_database(self.mesh, packed, valid)
            # The ±1 int8 layouts shard row-wise too, so the per-chip HBM
            # budget applies to the per-shard slice. Per-shard rows are a
            # pow2 >= 8192, so both the Mosaic chunk sizing and the 4096-row
            # permutation groups always fit.
            per_shard_bytes = cap // n_shards * lanes * 32
            if self._use_pallas() and per_shard_bytes <= _unpacked_budget_bytes():
                from iscc_search_tpu.parallel.pallas_sharded import shard_unpacked_db

                # Same preference as the single-device branch: perm twin
                # first (fast phase 1); plain twin only when both fit.
                if 2 * per_shard_bytes <= _unpacked_budget_bytes():
                    unpacked_dev = shard_unpacked_db(self.mesh, packed_dev, lanes * 32)
                perm_dev = shard_unpacked_db(self.mesh, packed_dev, lanes * 32, permute=True)
        else:
            packed_dev = jax.device_put(jnp.asarray(packed))
            valid_dev = jax.device_put(jnp.asarray(valid))
            layout_bytes = cap * lanes * 32
            bitplane_dev = view_dev = None
            if (
                self._use_pallas()
                and cap >= _PALLAS_MIN_CHUNK
                and layout_bytes <= _unpacked_budget_bytes()
            ):
                # Single-device caps are _cap_rows outputs: pow2 >= 8192 or a
                # 65536 multiple — always divisible by PERM_GROUP (4096), so
                # the permute/bitplane group constraint holds by construction
                # here (the mesh path sizes per-shard blocks separately).
                from iscc_search_tpu.ops.pallas_scan import bit_transpose_packed, build_unpacked_db

                if lanes in (4, 8):
                    # 128/256-bit partitions: bitplane twin (2x packed bytes)
                    # for phase 1 + plain int8 twin for the Pallas gather
                    # phase 3. Replaces perm+plain: the bitplane phase 1
                    # reads 32 B/row instead of the perm twin's 256 B/row —
                    # measured 3.15 vs 4.95 ms/sweep at 10M x 256-bit Q=64
                    # (+57% QPS) and a tie at Q=512 (MXU-bound), while
                    # freeing a whole int8 layout of HBM
                    # (benchmarks/EXP_BITPLANE_10M.json).
                    unpacked_dev = build_unpacked_db(packed_dev, lanes * 32)
                    bitplane_dev = jax.jit(bit_transpose_packed)(packed_dev)
                else:
                    # Narrow/odd widths (64/192-bit): budget for both int8
                    # twins — permuted (fast tree-epilogue phase 1) + plain
                    # (Pallas gather phase 3). With room for only ONE layout,
                    # prefer the PERM twin — phase 1 dominates the sweep and
                    # phase 3 falls back to packed takes + XLA unpack, which
                    # beats forfeiting the tree epilogue (in-kernel packed
                    # unpack was measured 9x slower; see exp_packed_gather.py).
                    if 2 * layout_bytes <= _unpacked_budget_bytes():
                        unpacked_dev = build_unpacked_db(packed_dev, lanes * 32)
                    perm_dev = build_unpacked_db(packed_dev, lanes * 32, permute=True)
            elif self._use_pallas() and cap >= _PALLAS_MIN_CHUNK and lanes in (4, 8):
                # Beyond the int8 budget (100M-class partitions): the
                # bit-transposed packed twin costs only 2x the packed bytes
                # and keeps phase 1 on the MXU — measured 145.3 ms vs the XLA
                # packed scan's 293.9 ms at 100.7M x 256-bit / Q=256 on v5e
                # (2.0x, exact-verified; benchmarks/exp_packed_perm.py).
                # lanes=4 (128-bit SIMPRINT partitions) uses the same layout
                # at (rows*lanes//128, 128) — the config-4 100M-chunk path.
                from iscc_search_tpu.ops.pallas_scan import bit_transpose_packed

                # Resident packed view (same bytes, (cap*lanes//128, 128)
                # shape): phase 3 gathers 8 contiguous view rows per
                # candidate block — 2.5x faster than per-row packed takes.
                # One extra packed-sized layout: the tier's HBM budget is
                # 3x packed (~9.6 GB at 100M x 256-bit on a 16 GB chip).
                # Build the view BEFORE the bitplane twin: the reverse
                # order measured a runtime OOM at 100M (the view step's
                # donated buffer could not reuse freed space next to an
                # already-resident bitplane twin). cap % PERM_GROUP holds by
                # construction (_cap_rows, see the int8-tier branch above).
                view_dev = _to_view(packed_dev)
                bitplane_dev = jax.jit(bit_transpose_packed)(packed_dev)
            return _Partition(
                packed_dev, valid_dev, unpacked_dev, full_map, cap, n,
                perm_dev=perm_dev, bitplane_dev=bitplane_dev, view_dev=view_dev,
            )
        return _Partition(packed_dev, valid_dev, unpacked_dev, full_map, cap, n, perm_dev=perm_dev)

    def _append_to_partition(self, part, lanes, new_rows):
        # type: (_Partition, int, np.ndarray) -> None
        """Donated in-place device append of new rows (no full re-upload)."""
        import jax.numpy as jnp

        m = len(new_rows)
        start = part.count
        new_packed = jnp.asarray(self._codes[new_rows][:, :lanes])
        part.packed_dev = _device_append(part.packed_dev, new_packed, start)
        valid = np.zeros((part.cap,), bool)
        # In-place row_map growth is reader-safe: a concurrent search snapshot
        # pairs this map with the OLD validity mask, which marks rows >= its
        # count invalid, so the mutated tail is never dereferenced by it.
        live_map = part.row_map
        live_map[start : start + m] = new_rows
        part.count = start + m
        valid[: part.count] = self._valid[live_map[: part.count]]
        import jax

        part.valid_dev = jax.device_put(jnp.asarray(valid))
        if part.unpacked_dev is not None:
            from iscc_search_tpu.ops.pallas_scan import build_unpacked_db

            new_unpacked = build_unpacked_db(new_packed, lanes * 32)
            part.unpacked_dev = _device_append(part.unpacked_dev, new_unpacked, start)
        if part.perm_dev is not None:
            # The permuted twin interleaves rows within 4096-row groups, so an
            # append rewrites every touched group from the (already updated)
            # packed mirror instead of appending rows.
            part.perm_dev = _perm_group_rewrite(
                part.perm_dev, part.packed_dev, lanes * 32, start, part.count
            )
        if part.bitplane_dev is not None:
            # Same group locality: the bitplane transform mixes rows only
            # within their 4096-row group.
            part.bitplane_dev = _bitplane_group_rewrite(
                part.bitplane_dev, part.packed_dev, start, part.count
            )
        if part.view_dev is not None:
            part.view_dev = _view_range_rewrite(
                part.view_dev, part.packed_dev, start, part.count
            )

    def _use_pallas(self):
        # type: () -> bool
        """Fused Pallas kernel on real TPU backends (or when forced)."""
        if self.scan_kernel == "pallas":
            return True
        if self.scan_kernel != "auto":
            return False
        return not self._pallas_interpret()

    def _pallas_interpret(self):
        # type: () -> bool
        """Pallas interpreter mode on CPU/GPU backends (tests, CPU meshes)."""
        import jax

        try:
            platform = jax.devices()[0].platform
        except Exception:  # pragma: no cover - no devices
            return True
        return platform in ("cpu", "gpu")

    def _compact_locked(self):
        # type: () -> None
        live = np.flatnonzero(self._valid[: self._rows])
        n = len(live)
        cap = max(_MIN_DEVICE_ROWS, _pow2ceil(max(1, n)))
        keys = np.zeros((cap, self.key_bytes), dtype=np.uint8)
        codes = np.zeros((cap, self.max_lanes), dtype=np.uint32)
        nlanes = np.zeros((cap,), dtype=np.int32)
        valid = np.zeros((cap,), dtype=bool)
        keys[:n] = self._keys[live]
        codes[:n] = self._codes[live]
        nlanes[:n] = self._nlanes[live]
        valid[:n] = True
        self._keys, self._codes, self._nlanes, self._valid = keys, codes, nlanes, valid
        self._rows = n
        self._row_gen = next(_ROW_GEN_COUNTER)  # live rows renumbered
        self._key_to_row = {self._keys[i].tobytes(): i for i in range(n)}
        self._live = n
        # All previously sealed segments are invalidated by the rewrite —
        # but the committed manifest still references them, so deletion must
        # wait until a NEW manifest lands (a crash before that must reload
        # the old, pre-compaction state intact).
        for seg in self._segments:
            self._pending_deletes.add(seg["file"])
        self._segments = []
        self._unconfirmed_seals = set()
        self._partitions = None  # row space rewritten: full device rebuild
        self._synced_rows = 0
        self._valid_dirty = False
        self._device_stale = True
        self.dirty += 1  # force persistence of the rewritten layout

    def _load(self):
        # type: () -> None
        state = json.loads((self.path / "state.json").read_text())
        if state.get("key_bytes") != self.key_bytes:
            raise ValueError(
                f"index at {self.path} has key_bytes={state.get('key_bytes')}, expected {self.key_bytes}"
            )
        self.max_dim = state["max_dim"]
        self.ndim = state.get("ndim")
        rows = state["rows"]
        self._save_seq = state.get("save_seq", 0)
        self._file_seq = state.get("file_seq", 0)
        active_name = state["active"]["file"]
        self._ensure_capacity(max(rows, 1))
        pos = 0
        self._segments = []
        for seg in state["segments"] + [state["active"]]:
            f = self.path / seg["file"]
            if not f.exists():
                # Crash between segment write and manifest commit can't happen
                # (manifest is written last), but a deleted file is tolerated
                # by truncating the load at the gap.
                break
            with np.load(f) as z:
                n = z["keys"].shape[0]
                self._keys[pos : pos + n] = z["keys"]
                self._codes[pos : pos + n] = z["codes"]
                self._nlanes[pos : pos + n] = z["nlanes"]
            if seg["file"] != active_name:
                self._segments.append(seg)
            pos += n
        self._rows = pos
        self._row_gen = next(_ROW_GEN_COUNTER)  # row space rebuilt from disk
        # Versioned valid file (legacy stores used a fixed "valid.npy")
        valid_f = self.path / state.get("valid_file", "valid.npy")
        if valid_f.exists():
            with np.load(valid_f) as z:
                v = z["valid"]
                self._valid[: min(len(v), pos)] = v[: min(len(v), pos)]
        else:  # pragma: no cover - the valid file is written with state.json
            self._valid[:pos] = True
        # Key map is rebuilt lazily (first mutation/get) — see _keymap. The
        # persisted validity bitmap already encodes supersession, so the live
        # count is just its popcount.
        self._key_to_row = None
        self._live = int(np.count_nonzero(self._valid[:pos]))
        self._partitions = None
        self._synced_rows = 0
        self._valid_dirty = False
        self._device_stale = True
        self._gc_unreferenced(state)

    def _gc_unreferenced(self, state):
        # type: (dict) -> None
        """Delete data files the committed manifest does not reference.

        A crash after the manifest rename but before the worker's deferred
        deletions leaves superseded files (and *.tmp residue) behind; they
        are garbage and reclaimed here. SEQUENCE GUARD: only files whose
        parsed sequence is <= the committed counters are deleted — files
        with a HIGHER sequence belong to another live instance's in-flight
        save (a probe opening the directory mid-save must not delete the
        writer's fresh data before its manifest commits)."""
        referenced = {seg["file"] for seg in state["segments"]}
        referenced.add(state["active"]["file"])
        referenced.add(state.get("valid_file", "valid.npy"))
        save_seq = state.get("save_seq", 0)
        file_seq = state.get("file_seq", 0)

        def committed_seq(name):
            # "active-00000007.npz" -> (7, save counter); "seg-00000003.npz"
            # -> (3, file counter); unparseable -> None (never deleted here)
            stem = name.split(".", 1)[0]
            prefix, _, digits = stem.partition("-")
            if not digits.isdigit():
                return None
            n = int(digits)
            if prefix in ("active", "valid"):
                return n <= save_seq
            if prefix == "seg" and len(digits) == 8:
                return n <= file_seq
            return None

        for f in self.path.iterdir():
            name = f.name
            if name in referenced or not f.is_file():
                continue
            if name.endswith(".tmp"):
                # Crash residue from _atomic_write. Data-file tmps are
                # seq-guarded via their target-name prefix (an in-flight
                # writer's files carry a higher seq); manifest tmps
                # (state.jsonXXX.tmp) are always safe to reclaim — deleting
                # an in-flight one merely fails that save, which retries.
                if committed_seq(name) is True or name.startswith("state.json"):
                    try:
                        f.unlink()
                    except OSError:  # pragma: no cover
                        pass
                continue
            if name.endswith(".npz") and committed_seq(name) is True:
                try:
                    f.unlink()
                except OSError:  # pragma: no cover
                    pass


class DeviceNphdIndex(PackedCodeIndex):
    """
    Variable-length NPHD index over uint64 keys.

    Replaces iscc-usearch ShardedNphdIndex (constructor parity with reference
    usearch/index.py:1617-1625; add/remove/search/contains parity with
    usearch/index.py:417-445, 2024-2045). Search is exact.
    """

    metric = "nphd"
    key_bytes = 8

    def search_one(self, query_body, count):
        # type: (bytes, int) -> dict[int, float]
        """Top-``count`` matches for one query as {uint64 key: score}."""
        (keys, scores), = self.search([query_body], count)
        return {int.from_bytes(keys[i].tobytes(), "big"): float(scores[i]) for i in range(len(scores))}


class DeviceHammingIndex(PackedCodeIndex):
    """
    Fixed-width Hamming index over 16-byte composite keys
    (iscc_id_body(8) + offset(4) + size(4)).

    Replaces iscc-usearch ShardedIndex128 as used by the simprint engine
    (reference indexes/simprint/usearch_core.py:73-83).
    """

    metric = "hamming"
    key_bytes = 16

    def __init__(self, path, ndim=128, shard_size=512 * 1024 * 1024, scan_kernel="auto"):
        # type: (str | Path, int, int, str) -> None
        super().__init__(path, max_dim=ndim, shard_size=shard_size, ndim=ndim, scan_kernel=scan_kernel)
