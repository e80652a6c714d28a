"""Native-store error-path coverage via a _lib proxy.

The C API signals I/O errors with sentinels (negative return for ts_get,
out_len == 2**64-1 for batched reads/scans). Every Python wrapper must
surface those as OSError — NEVER as key-absent / empty-result, which would
silently lose data (see the round-2 hardening pass). These tests inject the
sentinels through a delegating lib proxy and also pin the close()-vs-inflight
handshake and the natural empty-result edges.
"""

import ctypes
import threading
import time

import pytest

from iscc_search_tpu.store.kv import HostStore


class LibProxy:
    """Delegate to the real ctypes lib, overriding selected functions."""

    def __init__(self, real, **overrides):
        self._real = real
        self._overrides = overrides

    def __getattr__(self, name):
        if name in self._overrides:
            return self._overrides[name]
        return getattr(self._real, name)


@pytest.fixture
def store(tmp_path):
    s = HostStore(tmp_path / "s")
    s.put("db", b"key1", b"val1")
    yield s
    s.close()


def _err_scan(*args):
    """Fake scan-shaped native call: null pointer + SCAN_ERROR sentinel."""
    for a in args:
        if isinstance(a, ctypes.c_uint64) or (hasattr(a, "_obj") and isinstance(a._obj, ctypes.c_uint64)):
            obj = a._obj if hasattr(a, "_obj") else a
            obj.value = HostStore._SCAN_ERROR
    return None


def test_get_error_raises_not_absent(store):
    store._lib = LibProxy(store._lib, ts_get=lambda *a: -1)
    with pytest.raises(OSError, match="store read failed"):
        store.get("db", b"key1")


def test_get_many_error_raises(store):
    store._lib = LibProxy(store._lib, ts_get_many=_err_scan)
    with pytest.raises(OSError, match="store read failed"):
        store.get_many("db", [b"key1", b"key2"])


def test_get_many_null_without_error_is_all_absent(store):
    def null_ok(*args):
        for a in args:
            if hasattr(a, "_obj") and isinstance(a._obj, ctypes.c_uint64):
                a._obj.value = 0
        return None

    store._lib = LibProxy(store._lib, ts_get_many=null_ok)
    assert store.get_many("db", [b"key1", b"key2"]) == [None, None]


def test_prefix_scan_error_raises(store):
    store._lib = LibProxy(store._lib, ts_prefix_scan=_err_scan)
    with pytest.raises(OSError, match="store scan failed"):
        store.prefix_scan("db", b"key")


def test_range_scan_after_error_raises(store):
    store._lib = LibProxy(store._lib, ts_range_scan_after=_err_scan)
    with pytest.raises(OSError, match="store scan failed"):
        store.range_scan_after("db", b"key1", b"val1")


def test_get_dups_error_raises(store):
    store._lib = LibProxy(store._lib, ts_get_dups=_err_scan)
    with pytest.raises(OSError, match="store scan failed"):
        store.get_dups("db", b"key1")


def test_fresh_store_lists_no_dbs(tmp_path):
    s = HostStore(tmp_path / "empty")
    try:
        assert s.list_dbs() == []
    finally:
        s.close()


def test_iter_range_exact_page_multiple(store):
    """A database holding exactly `batch` pairs ends iteration via an empty
    continuation page (the range_scan_after empty-result branch)."""
    for i in range(4):
        store.put("paged", f"k{i}".encode(), b"v")
    got = list(store.iter_range("paged", batch=4))  # one full page, then []
    assert [k for k, _ in got] == [b"k0", b"k1", b"k2", b"k3"]
    # and a second sweep with a larger batch matches (short-page early return)
    assert list(store.iter_range("paged", batch=64)) == got


def test_close_waits_for_inflight_reader(tmp_path):
    """close() nulls the handle immediately for NEW callers but waits for
    in-flight native calls to drain before freeing the store."""
    s = HostStore(tmp_path / "inflight")
    s.put("db", b"k", b"v")
    entered = threading.Event()
    release = threading.Event()
    done = threading.Event()

    def slow_reader():
        with s._use():
            entered.set()
            release.wait(5)
        done.set()

    t = threading.Thread(target=slow_reader)
    t.start()
    assert entered.wait(5)

    closer = threading.Thread(target=s.close)
    closer.start()
    time.sleep(0.05)
    assert closer.is_alive()  # close blocked on the in-flight pin
    with pytest.raises(RuntimeError, match="closed"):
        s.get("db", b"k")  # new callers fail immediately
    release.set()
    closer.join(5)
    assert not closer.is_alive() and done.wait(5)
    t.join(5)
