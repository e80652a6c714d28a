"""Regression tests for the delta-review findings on the round-2 fixes.

1. putmulti applied earlier pairs before a mid-buffer size rejection,
   breaking the all-or-nothing batch contract.
2. Realm ID was inferred and persisted BEFORE batch validation, so a fully
   rejected first batch still pinned the realm of an empty index.
3. A batcher closed by a concurrent rebuild hung/500'd searches; they now
   fall back to an unbatched sweep on the live index.
4. The empty-inverse fallback scanned the whole forward db even on stores
   that always maintained the inverse db (e.g. empty simprint lists);
   a per-type trust marker disambiguates legacy stores.
5. Non-ASCII api_secret could never authenticate (UTF-8 re-encode of the
   latin-1-decoded WSGI header).
6. HostStore._last_error ran outside the in-flight gate (close TOCTOU).
"""

from types import SimpleNamespace

import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.engine import simprint_ops as sp_ops
from iscc_search_tpu.indexes.tpu import TpuIndex
from iscc_search_tpu.schema import IsccEntry
from iscc_search_tpu.store import HostStore

from tests.conftest import make_iscc_id, make_unit


# 1. ---------------------------------------------------------------------


def test_putmulti_all_or_nothing_on_size_rejection(tmp_path):
    store = HostStore(tmp_path / "s")
    try:
        pairs = [(b"a", b"1"), (b"k" * (2 * 1024 * 1024), b"2"), (b"c", b"3")]
        with pytest.raises(ValueError, match="rejected"):
            store.putmulti("db", pairs)
        assert store.get("db", b"a") is None  # nothing applied
        with pytest.raises(ValueError, match="rejected"):
            store.dup_putmulti("ddb", pairs)
        assert store.get_dups("ddb", b"a") == []
    finally:
        store.close()


# 2. ---------------------------------------------------------------------


def test_failed_first_batch_does_not_pin_realm(tmp_path):
    idx = TpuIndex(tmp_path / "idx")
    try:
        bad_batch = [
            IsccEntry(iscc_id=make_iscc_id(1, realm_id=1), units=[make_unit(3, 0, 64), make_unit(4, 0, 64)]),
            IsccEntry(iscc_id=make_iscc_id(2, realm_id=0), units=[make_unit(3, 0, 64), make_unit(4, 0, 64)]),
        ]
        with pytest.raises(ValueError, match="Realm ID mismatch"):
            idx.add_assets(bad_batch)
        assert idx._realm_id is None  # empty index: realm NOT pinned
        # A clean realm-0 batch must now succeed
        ok = IsccEntry(iscc_id=make_iscc_id(3, realm_id=0), units=[make_unit(3, 0, 64), make_unit(4, 0, 64)])
        assert idx.add_assets([ok])[0].status.value == "created"
        assert idx._realm_id == 0
    finally:
        idx.close()


# 3. ---------------------------------------------------------------------


def test_search_falls_back_when_batcher_closed(tmp_path):
    idx = TpuIndex(tmp_path / "idx", search_batching=True)
    try:
        body = bytes(range(8))
        unit = "ISCC:" + ic.encode_base32(
            ic.encode_header(ic.MT.DATA, 0, ic.VS.V0, ic.encode_length(ic.MT.DATA, 64)) + body
        )
        e = IsccEntry(iscc_id=make_iscc_id(1), units=[unit, make_unit(ic.MT.INSTANCE, 0, 64)])
        idx.add_assets([e])
        found = idx._search_similarity_unit("DATA_NONE_V0", body, 10)
        assert found  # batched path works
        # Simulate a rebuild closing the cached batcher mid-flight
        idx._batchers["DATA_NONE_V0"].close()
        found = idx._search_similarity_unit("DATA_NONE_V0", body, 10)
        assert found  # unbatched fallback, not a RuntimeError
    finally:
        idx.close()


# 4. ---------------------------------------------------------------------


def test_trusted_inverse_skips_forward_scan(tmp_path):
    """With the trust marker, an empty inverse lookup is authoritative —
    the forward db (which may hold millions of OTHER assets' chunks) must
    not be scanned at all."""
    store = HostStore(tmp_path / "s")
    try:
        other = b"B" * 8
        store.dup_put("sp", b"\x01" * 16, sp_ops.pack_chunk_pointer(other, 0, 10))

        calls = {"n": 0}
        real_iter = store.iter_range

        def counting_iter(*a, **kw):
            calls["n"] += 1
            return real_iter(*a, **kw)

        store.iter_range = counting_iter
        pairs = sp_ops._asset_pairs(store, "sp", b"A" * 8, inv_db="spi", trust_inverse=True)
        assert pairs == []
        assert calls["n"] == 0  # no forward scan
        # Legacy (untrusted): empty inverse falls back to the forward stream
        pairs = sp_ops._asset_pairs(store, "sp", other, inv_db="spi", trust_inverse=False)
        assert len(pairs) == 1
        assert calls["n"] == 1
    finally:
        store.close()


def test_new_store_marks_inverse_trusted(tmp_path):
    idx = TpuIndex(tmp_path / "idx")
    try:
        sp = {"text": [{"simprint": ic.encode_base64(bytes(16)), "offset": 0, "size": 9}]}
        e = IsccEntry(
            iscc_id=make_iscc_id(1),
            units=[make_unit(3, 0, 64), make_unit(4, 0, 64)],
            simprints=sp,
        )
        idx.add_assets([e])
        assert idx._spi_trusted("text")
    finally:
        idx.close()


# 5. ---------------------------------------------------------------------


def test_non_ascii_secret_authenticates_with_correct_key(memory_opts=None):
    from iscc_search_tpu.options import SearchOptions
    from iscc_search_tpu.server import auth
    from iscc_search_tpu.server.wsgi import HTTPError

    opts = SearchOptions(index_uri="memory://", api_secret="café")
    # WSGI decodes the client's UTF-8 header bytes as latin-1 (PEP 3333)
    wsgi_value = "café".encode("utf-8").decode("latin-1")
    auth.verify_api_key(SimpleNamespace(headers={"x-api-key": wsgi_value}), opts)  # no raise
    with pytest.raises(HTTPError):
        auth.verify_api_key(SimpleNamespace(headers={"x-api-key": "cafe"}), opts)


# 6. ---------------------------------------------------------------------


def test_last_error_safe_through_gate(tmp_path):
    store = HostStore(tmp_path / "s")
    with pytest.raises(ValueError):  # oversized mutation now raises
        store.put("d" * 70000, b"k", b"v")  # sets last_error
    assert "size limits" in store._last_error()
    store.close()
    assert store._last_error() == ""  # closed: gate raises internally -> ""
