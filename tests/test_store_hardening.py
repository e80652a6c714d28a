"""Regression tests for the native-store durability review findings."""

import threading

import pytest

from iscc_search_tpu.store import HostStore


def test_corrupt_snapshot_fails_open_loudly(tmp_path, monkeypatch):
    """Snapshots are written atomically, so corruption is real corruption:
    the open must FAIL (LMDB MDB_CORRUPTED parity), not silently serve a
    store missing an arbitrary suffix of compacted keys."""
    monkeypatch.setenv("TRUCTSTORE_EXT_MIN", "8")
    store = HostStore(tmp_path / "s")
    for i in range(50):
        store.put("db", f"k{i:03d}".encode(), b"v" * 64)  # externalized
    store.compact()
    store.close()

    snap = tmp_path / "s" / "store.snap"
    raw = bytearray(snap.read_bytes())
    assert len(raw) > 100
    raw[len(raw) // 2] ^= 0xFF  # bit rot mid-snapshot
    snap.write_bytes(bytes(raw))

    with pytest.raises(OSError, match="failed to open"):
        HostStore(tmp_path / "s")


def test_truncated_snapshot_fails_open(tmp_path, monkeypatch):
    monkeypatch.setenv("TRUCTSTORE_EXT_MIN", "0")
    store = HostStore(tmp_path / "s")
    for i in range(50):
        store.put("db", f"k{i:03d}".encode(), b"v" * 32)
    store.compact()
    store.close()
    snap = tmp_path / "s" / "store.snap"
    raw = snap.read_bytes()
    snap.write_bytes(raw[: len(raw) - 7])  # chop mid-record
    with pytest.raises(OSError, match="failed to open"):
        HostStore(tmp_path / "s")


def test_torn_log_tail_still_recovers(tmp_path):
    """A torn LOG tail (crash mid-append) is expected and must still recover
    cleanly — only snapshots are held to the all-or-nothing standard."""
    store = HostStore(tmp_path / "s")
    for i in range(20):
        store.put("db", f"k{i:03d}".encode(), b"x" * 16)
    store.sync()
    store.close()
    log = tmp_path / "s" / "store.log"
    raw = log.read_bytes()
    log.write_bytes(raw + b"\x55\x00\x12")  # garbage partial record
    store = HostStore(tmp_path / "s")
    try:
        assert store.get("db", b"k000") == b"x" * 16
        assert store.entries("db") == 20
    finally:
        store.close()


def test_oversized_mutations_rejected_not_truncated(tmp_path):
    """A db name over u16 (or oversized key/value) would be silently
    truncated by the record framing, producing an unparseable log record
    that recovery treats as a torn tail — dropping every LATER committed
    record. Rejection must also leave the store fully usable."""
    store = HostStore(tmp_path / "s")
    try:
        assert store.put("db", b"before", b"1")
        long_db = "d" * 70000
        # single-op rejections now RAISE (silent False conflated a dropped
        # write with a benign no-op; callers ignored the bool)
        with pytest.raises(ValueError, match="rejected"):
            store.put(long_db, b"k", b"v")
        with pytest.raises(ValueError, match="rejected"):
            store.put("db", b"k" * (2 * 1024 * 1024), b"v")
        with pytest.raises(ValueError, match="rejected"):
            store.dup_put(long_db, b"k", b"v")
        with pytest.raises(ValueError, match="rejected"):
            store.putmulti(long_db, [(b"k", b"v")])
        with pytest.raises(ValueError, match="rejected"):
            store.dup_putmulti(long_db, [(b"k", b"v")])
        assert store.put("db", b"after", b"2")  # store unharmed
    finally:
        store.close()
    # The log replays cleanly: both committed records survive
    store = HostStore(tmp_path / "s")
    try:
        assert store.get("db", b"before") == b"1"
        assert store.get("db", b"after") == b"2"
    finally:
        store.close()


def test_close_waits_for_inflight_calls(tmp_path):
    """close() must drain in-flight native calls before freeing the store
    (the bare closed-flag check was TOCTOU: a racing reader could pass a
    freed pointer into the C library)."""
    store = HostStore(tmp_path / "s")
    for i in range(2000):
        store.dup_put("db", b"k", i.to_bytes(8, "big"))
    errors = []
    done = threading.Event()

    def reader():
        try:
            while not done.is_set():
                try:
                    store.get_dups("db", b"k")
                    store.get("meta", b"absent")
                except RuntimeError:
                    return  # closed — expected
        except Exception as e:  # segfault would kill the process outright
            errors.append(repr(e))

    threads = [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    store.close()
    done.set()
    for t in threads:
        t.join(timeout=10)
    assert errors == []
    with pytest.raises(RuntimeError, match="closed"):
        store.get("db", b"k")


def test_last_error_reports_detail(tmp_path):
    store = HostStore(tmp_path / "s")
    try:
        with pytest.raises(ValueError):
            store.put("d" * 70000, b"k", b"v")
        assert "size limits" in store._last_error()
    finally:
        store.close()
    assert store._last_error() == ""  # closed store: empty, no crash


def test_session_pins_store_against_close(tmp_path):
    """A session() holds the in-flight gate across many calls (one
    acquisition total); close() must wait for it, and entering a session
    on a closed store must raise."""
    import threading
    import time

    store = HostStore(tmp_path / "s")
    entered = threading.Event()
    release = threading.Event()
    errors = []

    def worker():
        try:
            with store.session():
                entered.set()
                store.put("db", b"k", b"v")
                release.wait(timeout=10)
                store.put("db", b"k2", b"v2")  # still pinned: must not UAF
        except Exception as e:
            errors.append(repr(e))

    t = threading.Thread(target=worker)
    t.start()
    entered.wait(timeout=10)
    closer = threading.Thread(target=store.close)
    closer.start()
    time.sleep(0.1)
    assert closer.is_alive()  # close blocked on the session
    release.set()
    t.join(timeout=10)
    closer.join(timeout=10)
    assert errors == []
    with pytest.raises(RuntimeError, match="closed"):
        with store.session():
            pass


def test_store_concurrent_compaction_soak(tmp_path):
    """Concurrent writers + readers + explicit compactions; durable state
    after close/reopen must match the pre-close state exactly."""
    import random
    import time

    store = HostStore(tmp_path / "s")
    errors = []
    stop = threading.Event()

    def writer(tid):
        rng = random.Random(tid)
        try:
            while not stop.is_set():
                k = f"k{rng.randrange(60):03d}".encode()
                r = rng.random()
                if r < 0.5:
                    store.put("plain", k, bytes(rng.getrandbits(8) for _ in range(rng.choice([8, 120]))))
                elif r < 0.8:
                    store.dup_put("dup", k, rng.randrange(20).to_bytes(8, "big"))
                elif r < 0.9:
                    store.delete("plain", k)
                else:
                    store.dup_delete("dup", k, rng.randrange(20).to_bytes(8, "big"))
        except Exception as e:
            errors.append(repr(e))

    def reader():
        try:
            while not stop.is_set():
                store.get("plain", b"k001")
                store.get_dups("dup", b"k001")
                list(store.iter_range("dup", batch=32))
        except Exception as e:
            errors.append(repr(e))

    def compactor():
        try:
            while not stop.is_set():
                time.sleep(0.4)
                store.compact()
        except Exception as e:
            errors.append(repr(e))

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(2)]
    threads += [threading.Thread(target=reader), threading.Thread(target=compactor)]
    for t in threads:
        t.start()
    time.sleep(4)
    stop.set()
    for t in threads:
        t.join(timeout=30)
    assert errors == []
    before_plain = dict(store.iter_range("plain"))
    before_dup = sorted(store.iter_range("dup"))
    store.close()
    s2 = HostStore(tmp_path / "s")
    try:
        assert dict(s2.iter_range("plain")) == before_plain
        assert sorted(s2.iter_range("dup")) == before_dup
    finally:
        s2.close()
