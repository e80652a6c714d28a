"""Regression tests for the round-2 ops/parallel/codec/backend review findings.

Each test pins one fixed defect:
1. A malformed engine return killed the batcher collector thread, hanging
   the in-flight caller and every future search forever.
2. The batcher unconditionally slept window_ms before every dispatch; an
   idle-server lone request now dispatches immediately.
3. gen_iscc_code_v0 emitted a composite whose header disagreed with the
   body when a DATA/INSTANCE unit was shorter than 64 bits.
4. decode_base32's fast path accepted non-canonical spellings (non-zero
   trailing pad bits) and impossible RFC4648 lengths.
5. IsccCode.units silently decomposed truncated composites via unchecked
   negative slices.
6. kv/tpu add_assets committed earlier assets when a later asset in the
   batch failed validation (reference rolls back the whole batch).
7. parallel/sharded rebuilt + recompiled the shard_map program on every
   call instead of memoizing like its sibling modules.
"""

import threading
import time

import numpy as np
import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.engine.batcher import SearchBatcher
from iscc_search_tpu.models import IsccCode
from iscc_search_tpu.schema import IsccEntry

from tests.conftest import make_iscc_id, make_unit


# 1/2. --------------------------------------------------------------------


class _GoodIndex:
    def search(self, bodies, count):
        return [(np.zeros((1, 8), np.uint8), np.ones(1, np.float32)) for _ in bodies]


class _FlakyIndex(_GoodIndex):
    def __init__(self):
        self.bad = True

    def search(self, bodies, count):
        if self.bad:
            self.bad = False
            return None  # malformed: not a per-query list
        return super().search(bodies, count)


def test_batcher_survives_malformed_engine_return():
    batcher = SearchBatcher(_FlakyIndex(), max_batch=8, window_ms=0)
    try:
        with pytest.raises(TypeError):
            batcher.search([b"\x00" * 8], 5)
        # The collector thread must still be alive and serving
        res = batcher.search([b"\x00" * 8], 5)
        assert len(res) == 1 and res[0][1][0] == 1.0
    finally:
        batcher.close()


def test_batcher_idle_fast_path_skips_window():
    # With a 500 ms window, a lone request on an idle batcher must NOT pay
    # the window (the old code slept unconditionally).
    batcher = SearchBatcher(_GoodIndex(), max_batch=8, window_ms=500.0)
    try:
        t0 = time.perf_counter()
        batcher.search([b"\x00" * 8], 5)
        assert time.perf_counter() - t0 < 0.4
    finally:
        batcher.close()


def test_batcher_error_wakes_all_waiters():
    class _Boom:
        def search(self, bodies, count):
            raise RuntimeError("boom")

    batcher = SearchBatcher(_Boom(), max_batch=8, window_ms=0)
    errors = []

    def worker():
        try:
            batcher.search([b"\x00" * 8], 5)
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    batcher.close()
    assert len(errors) == 4
    assert all("boom" in str(e) for e in errors)


# 3. ---------------------------------------------------------------------


def test_gen_iscc_code_rejects_short_data_instance():
    # Build a 32-bit DATA unit by hand (make_unit only emits valid sizes)
    header = ic.encode_header(ic.MT.DATA, 0, ic.VS.V0, ic.encode_length(ic.MT.DATA, 32))
    data_32 = "ISCC:" + ic.encode_base32(header + b"\xaa" * 4)
    inst_64 = make_unit(ic.MT.INSTANCE, 0, 64)
    with pytest.raises(ValueError, match="too short"):
        ic.gen_iscc_code_v0([data_32, inst_64])


# 4. ---------------------------------------------------------------------


def test_decode_base32_rejects_non_canonical():
    digest = bytes(range(18))
    canonical = ic.encode_base32(digest)
    assert ic.decode_base32(canonical) == digest
    # Flip the lowest pad bit of the final character: same prefix bits,
    # different spelling — must be rejected, not aliased.
    alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    last = alphabet.index(canonical[-1])
    non_canonical = canonical[:-1] + alphabet[last | 1]
    if non_canonical != canonical:
        with pytest.raises(ValueError, match="base32"):
            ic.decode_base32(non_canonical)
    # Impossible RFC4648 length (1 char = 5 bits < 1 byte)
    with pytest.raises(ValueError, match="base32"):
        ic.decode_base32("A")


# 5. ---------------------------------------------------------------------


def test_iscc_code_units_rejects_truncated_composite():
    units = [make_unit(ic.MT.DATA, 0, 64), make_unit(ic.MT.INSTANCE, 0, 64)]
    code = ic.gen_iscc_code_v0(units)["iscc"]
    digest = ic.decode_base32(code.removeprefix("ISCC:"))
    truncated = "ISCC:" + ic.encode_base32(digest[:-4])  # drop 4 body bytes
    with pytest.raises(ValueError, match="length wrong"):
        IsccCode(truncated).units


# 6. ---------------------------------------------------------------------


def _mk_entry(n, realm_id=0):
    return IsccEntry(
        iscc_id=make_iscc_id(n, realm_id=realm_id),
        units=[make_unit(ic.MT.DATA, 0, 64), make_unit(ic.MT.INSTANCE, 0, 64)],
    )


def test_kv_add_assets_all_or_nothing(tmp_path):
    from iscc_search_tpu.indexes.kv.index import KvIndex

    idx = KvIndex(tmp_path / "kv")
    try:
        idx.add_assets([_mk_entry(1)])  # pins realm 0
        with pytest.raises(ValueError, match="Realm ID mismatch"):
            idx.add_assets([_mk_entry(2), _mk_entry(3, realm_id=1)])
        # Asset 2 must NOT have been committed
        with pytest.raises(FileNotFoundError):
            idx.get_asset(make_iscc_id(2))
    finally:
        idx.close()


def test_tpu_add_assets_all_or_nothing(tmp_path):
    from iscc_search_tpu.indexes.tpu import TpuIndex

    idx = TpuIndex(tmp_path / "idx")
    try:
        idx.add_assets([_mk_entry(1)])
        with pytest.raises(ValueError, match="Realm ID mismatch"):
            idx.add_assets([_mk_entry(2), _mk_entry(3, realm_id=1)])
        with pytest.raises(FileNotFoundError):
            idx.get_asset(make_iscc_id(2))
        assert len(idx) == 1
    finally:
        idx.close()


# 7. ---------------------------------------------------------------------


def test_sharded_topk_builder_memoized():
    from iscc_search_tpu.parallel.sharded import _sharded_topk_fn

    assert _sharded_topk_fn.cache_info is not None  # lru_cache applied
