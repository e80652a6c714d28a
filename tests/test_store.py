"""Native host store (tructstore) tests: KV semantics, dupsort, prefix scans,
crash recovery (torn-tail truncation), compaction."""

import os
import struct

import pytest

from iscc_search_tpu.store import HostStore


@pytest.fixture
def store(tmp_path):
    s = HostStore(tmp_path / "db")
    yield s
    s.close()


def test_put_get_roundtrip(store):
    assert store.get("assets", b"k1") is None
    store.put("assets", b"k1", b"v1")
    assert store.get("assets", b"k1") == b"v1"
    store.put("assets", b"k1", b"v2")  # replace
    assert store.get("assets", b"k1") == b"v2"
    assert store.entries("assets") == 1


def test_delete(store):
    store.put("a", b"k", b"v")
    assert store.delete("a", b"k") is True
    assert store.get("a", b"k") is None
    assert store.delete("a", b"k") is False
    assert store.entries("a") == 0


def test_dupsort_semantics(store):
    assert store.dup_put("inst", b"code", b"id1") is True
    assert store.dup_put("inst", b"code", b"id2") is True
    assert store.dup_put("inst", b"code", b"id1") is False  # dupdata=False
    assert store.get_dups("inst", b"code") == [b"id1", b"id2"]  # sorted
    assert store.entries("inst") == 2
    assert store.dup_delete("inst", b"code", b"id1") is True
    assert store.get_dups("inst", b"code") == [b"id2"]
    store.dup_delete("inst", b"code", b"id2")
    assert store.get_dups("inst", b"code") == []
    assert store.key_count("inst") == 0


def test_dup_putmulti(store):
    pairs = [(bytes([i]), struct.pack(">I", j)) for i in range(5) for j in range(3)]
    n = store.dup_putmulti("sp", pairs)
    assert n == 15
    assert store.dup_putmulti("sp", pairs) == 0  # all duplicates
    assert store.entries("sp") == 15
    assert len(store.get_dups("sp", b"\x02")) == 3


def test_dup_putmulti_arrays(store):
    import numpy as np

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 256, (100, 16), dtype=np.uint8)
    vals = rng.integers(0, 256, (100, 16), dtype=np.uint8)
    assert store.dup_putmulti_arrays("sp", keys, vals) == 100
    assert store.dup_putmulti_arrays("sp", keys, vals) == 0  # all duplicates
    assert store.entries("sp") == 100
    # Bit-exact with the pair-list path's wire format
    assert store.get_dups("sp", keys[7].tobytes()) == [vals[7].tobytes()]
    assert store.dup_putmulti_arrays("sp", keys[:0], vals[:0]) == 0  # n == 0
    with pytest.raises(ValueError):  # ragged n
        store.dup_putmulti_arrays("sp", keys, vals[:50])
    with pytest.raises(ValueError):  # non-2d
        store.dup_putmulti_arrays("sp", keys[0], vals[0])


def test_prefix_scan(store):
    store.dup_put("units", b"\x01\x02\x03\x04", b"a")
    store.dup_put("units", b"\x01\x02\x03\x04\x05\x06", b"b")
    store.dup_put("units", b"\x01\x02\xff\xff", b"c")
    store.dup_put("units", b"\x02\x00\x00\x00", b"d")
    hits = store.prefix_scan("units", b"\x01\x02")
    assert [v for _, v in hits] == [b"a", b"b", b"c"]
    hits = store.prefix_scan("units", b"\x01\x02\x03\x04")
    assert [v for _, v in hits] == [b"a", b"b"]
    assert store.prefix_scan("units", b"\x03") == []
    # limit
    hits = store.prefix_scan("units", b"\x01", limit=2)
    assert len(hits) == 2


def test_range_scan(store):
    for i in range(10):
        store.put("m", bytes([i]), bytes([i * 2]))
    hits = store.range_scan("m", bytes([5]))
    assert [k for k, _ in hits] == [bytes([i]) for i in range(5, 10)]
    assert len(store.range_scan("m")) == 10
    assert len(store.range_scan("m", limit=3)) == 3


def test_list_and_drop_dbs(store):
    store.put("one", b"k", b"v")
    store.dup_put("two", b"k", b"v")
    assert set(store.list_dbs()) == {"one", "two"}
    assert store.drop_db("one") is True
    assert store.list_dbs() == ["two"]
    assert store.get("one", b"k") is None


def test_persistence_across_reopen(tmp_path):
    path = tmp_path / "db"
    s = HostStore(path)
    s.put("assets", b"key", b"value")
    s.dup_put("inst", b"c", b"x")
    s.dup_put("inst", b"c", b"y")
    s.close()

    s2 = HostStore(path)
    assert s2.get("assets", b"key") == b"value"
    assert s2.get_dups("inst", b"c") == [b"x", b"y"]
    s2.close()


def test_torn_tail_recovery(tmp_path):
    path = tmp_path / "db"
    s = HostStore(path)
    s.put("a", b"k1", b"v1")
    s.put("a", b"k2", b"v2")
    s.close()

    # Corrupt the log tail (simulates crash mid-append)
    log = path / "store.log"
    data = log.read_bytes()
    log.write_bytes(data + b"\x50\x00\x00\x00garbage")

    s2 = HostStore(path)
    assert s2.get("a", b"k1") == b"v1"
    assert s2.get("a", b"k2") == b"v2"
    # Store remains writable after tail truncation
    s2.put("a", b"k3", b"v3")
    s2.close()
    s3 = HostStore(path)
    assert s3.get("a", b"k3") == b"v3"
    s3.close()


def test_compaction(tmp_path):
    path = tmp_path / "db"
    s = HostStore(path)
    for i in range(100):
        s.put("a", b"samekey", str(i).encode())
    s.compact()
    assert (path / "store.snap").exists()
    s.put("a", b"after", b"compact")
    s.close()

    s2 = HostStore(path)
    assert s2.get("a", b"samekey") == b"99"
    assert s2.get("a", b"after") == b"compact"
    s2.close()


def test_used_bytes(store):
    before = store.used_bytes()
    store.put("a", b"key12345", b"x" * 1000)
    assert store.used_bytes() >= before + 1000


def test_sync_and_flush(store):
    store.put("a", b"k", b"v")
    store.flush()
    store.sync()
    assert store.get("a", b"k") == b"v"


def test_close_idempotent(tmp_path):
    s = HostStore(tmp_path / "db")
    s.close()
    s.close()


def test_binary_keys_values(store):
    key = bytes(range(256))
    val = os.urandom(1024)
    store.put("bin", key, val)
    assert store.get("bin", key) == val


def test_putmulti_plain(store):
    pairs = [(bytes([i]), bytes([i * 2])) for i in range(10)]
    assert store.putmulti("bulk", pairs) == 10
    assert store.get("bulk", bytes([4])) == bytes([8])
    # Replacement counts as applied
    assert store.putmulti("bulk", [(bytes([4]), b"new")]) == 1
    assert store.get("bulk", bytes([4])) == b"new"
    assert store.entries("bulk") == 10


def test_get_is_owned_copy_under_writes(store):
    import threading

    store.put("r", b"key", b"A" * 1000)
    stop = threading.Event()
    errors = []

    def writer():
        i = 0
        try:
            while not stop.is_set():
                store.put("r", b"key", bytes([65 + (i % 26)]) * 1000)
                i += 1
        except Exception as e:  # a dead writer must fail the test, not mute it
            errors.append(repr(e))

    t = threading.Thread(target=writer)
    t.start()
    try:
        for _ in range(2000):
            v = store.get("r", b"key")
            assert v is not None and len(v) == 1000
            assert len(set(v)) == 1, "torn read detected"
    finally:
        stop.set()
        t.join(5)
    assert not errors


# ------------------------------------------------ value externalization


def test_external_values_roundtrip(tmp_path):
    """Values >= threshold live on disk (log refs) yet read back correctly
    before flush, after flush, across reopen, and after compaction."""
    big1 = b"A" * 500
    big2 = b"B" * 2000
    small = b"s"
    s = HostStore(tmp_path / "db")
    s.put("assets", b"k1", big1)
    s.put("assets", b"k2", small)
    # Unflushed: value bytes are still in the write buffer
    assert s.get("assets", b"k1") == big1
    s.flush()
    assert s.get("assets", b"k1") == big1  # now pread from the log file
    s.put("assets", b"k1", big2)  # replace external with external
    assert s.get("assets", b"k1") == big2
    s.close()

    s = HostStore(tmp_path / "db")  # log replay builds refs, not copies
    assert s.get("assets", b"k1") == big2
    assert s.get("assets", b"k2") == small
    s.compact()  # values move into the snapshot; refs are rewritten
    assert s.get("assets", b"k1") == big2
    s.put("assets", b"k3", big1)  # post-compaction put -> fresh log ref
    assert s.get("assets", b"k3") == big1
    s.close()

    s = HostStore(tmp_path / "db")  # snapshot replay + log replay
    assert s.get("assets", b"k1") == big2
    assert s.get("assets", b"k2") == small
    assert s.get("assets", b"k3") == big1
    s.close()


def test_external_values_in_scans(tmp_path):
    big = b"X" * 300
    s = HostStore(tmp_path / "db")
    s.put("assets", b"aa1", big)
    s.put("assets", b"aa2", b"tiny")
    s.put("assets", b"zz1", big)
    pairs = s.prefix_scan("assets", b"aa")
    assert pairs == [(b"aa1", big), (b"aa2", b"tiny")]
    allpairs = s.range_scan("assets")
    assert allpairs[-1] == (b"zz1", big)
    s.close()


def test_external_values_torn_tail(tmp_path):
    big = b"Q" * 400
    s = HostStore(tmp_path / "db")
    s.put("assets", b"k", big)
    s.flush()
    s.sync()
    s.close()
    # Append garbage (simulated torn write)
    with open(tmp_path / "db" / "store.log", "ab") as fh:
        fh.write(b"\x99" * 37)
    s = HostStore(tmp_path / "db")
    assert s.get("assets", b"k") == big
    s.put("assets", b"k2", big)  # appends after the truncated tail
    assert s.get("assets", b"k2") == big
    s.close()
    s = HostStore(tmp_path / "db")
    assert s.get("assets", b"k2") == big
    s.close()


def test_external_values_delete_and_overwrite(tmp_path):
    big = b"D" * 1000
    s = HostStore(tmp_path / "db")
    s.put("assets", b"k", big)
    assert s.delete("assets", b"k") is True
    assert s.get("assets", b"k") is None
    s.put("assets", b"k", b"small-now")
    assert s.get("assets", b"k") == b"small-now"
    s.put("assets", b"k", big)
    s.compact()
    s.compact()  # idempotent double compaction (snap -> snap refs)
    assert s.get("assets", b"k") == big
    assert s.used_bytes() >= 1000  # logical size counts external values
    s.close()


def test_ext_min_env_disable(tmp_path, monkeypatch):
    monkeypatch.setenv("TRUCTSTORE_EXT_MIN", "0")
    s = HostStore(tmp_path / "db")
    big = b"E" * 5000
    s.put("assets", b"k", big)
    assert s.get("assets", b"k") == big
    s.close()
    monkeypatch.setenv("TRUCTSTORE_EXT_MIN", "1")
    s = HostStore(tmp_path / "db")  # replay externalizes everything
    assert s.get("assets", b"k") == big
    s.put("assets", b"t", b"x")
    assert s.get("assets", b"t") == b"x"
    s.close()


def test_store_model_based_fuzz(tmp_path):
    """Random op sequences mirrored against a dict model, with reopen and
    compaction at random points. Catches externalization ref bugs (dangling
    offsets, stale refs after compaction, wbuf-window reads) by construction.
    """
    import random

    rnd = random.Random(4242)
    path = tmp_path / "db"
    plain = {}  # key -> value
    dups = {}  # key -> set(values)
    s = HostStore(path)

    def rand_key():
        return bytes([rnd.randint(0, 3) for _ in range(rnd.randint(1, 3))])

    def rand_val():
        # Mix sizes around the 64-byte externalization threshold
        n = rnd.choice([1, 8, 63, 64, 65, 200, 1500])
        return bytes([rnd.randint(0, 255) for _ in range(n)])

    for step in range(1500):
        r = rnd.random()
        if r < 0.35:
            k, v = rand_key(), rand_val()
            s.put("p", k, v)
            plain[k] = v
        elif r < 0.45:
            k = rand_key()
            assert s.delete("p", k) == (k in plain)
            plain.pop(k, None)
        elif r < 0.60:
            k, v = rand_key(), bytes([rnd.randint(0, 9) for _ in range(rnd.randint(1, 20))])
            inserted = s.dup_put("d", k, v)
            assert inserted == (v not in dups.get(k, set()))
            dups.setdefault(k, set()).add(v)
        elif r < 0.68:
            k = rand_key()
            vals = sorted(dups.get(k, set()))
            if vals:
                v = rnd.choice(vals)
                assert s.dup_delete("d", k, v) is True
                dups[k].discard(v)
                if not dups[k]:
                    del dups[k]
        elif r < 0.88:
            k = rand_key()
            assert s.get("p", k) == plain.get(k)
            assert s.get_dups("d", k) == sorted(dups.get(k, set()))
        elif r < 0.94:
            s.flush()
        elif r < 0.98 and step > 50:
            s.close()
            s = HostStore(path)
        else:
            s.compact()

    # Final full-state comparison via ordered scans
    got_plain = dict(s.range_scan("p"))
    assert got_plain == plain
    got_dups = {}
    for k, v in s.range_scan("d"):
        got_dups.setdefault(k, set()).add(v)
    assert got_dups == dups
    assert s.entries("p") == len(plain)
    assert s.entries("d") == sum(len(v) for v in dups.values())
    s.close()


def test_stale_snapshot_tmp_cleaned_on_open(tmp_path):
    """A crash between snapshot write and rename leaves store.snap.tmp; open
    must ignore and remove it (it was never the committed snapshot)."""
    s = HostStore(tmp_path / "db")
    s.put("a", b"k", b"v" * 100)
    s.compact()
    s.close()
    stale = tmp_path / "db" / "store.snap.tmp"
    stale.write_bytes(b"\x01garbage-from-crashed-compaction")
    s = HostStore(tmp_path / "db")
    assert s.get("a", b"k") == b"v" * 100
    assert not stale.exists()
    s.compact()
    assert s.get("a", b"k") == b"v" * 100
    s.close()


# ----------------------------------------------------- paged streaming scan


def test_iter_range_pages_match_full_scan(tmp_path):
    store = HostStore(tmp_path / "pg")
    # dupsort runs of varied length so page boundaries split runs
    import random

    r = random.Random(5)
    expected = []
    for ki in range(40):
        key = bytes([ki]) * 3
        for vi in range(r.randint(1, 23)):
            val = bytes([vi]) + key
            store.dup_put("d", key, val)
    full = store.range_scan("d")
    for batch in (1, 2, 3, 7, 16, 1000):
        paged = list(store.iter_range("d", batch=batch))
        assert paged == full, f"batch={batch}"
    store.close()


def test_iter_range_plain_db_and_start(tmp_path):
    store = HostStore(tmp_path / "pg2")
    for i in range(30):
        store.put("p", bytes([i]), bytes([i]) * 2)
    full = store.range_scan("p")
    assert list(store.iter_range("p", batch=4)) == full
    assert list(store.iter_range("p", start=bytes([10]), batch=4)) == full[10:]
    assert list(store.iter_range("p", batch=7)) == full
    store.close()


def test_range_scan_after_semantics(tmp_path):
    store = HostStore(tmp_path / "pg3")
    store.dup_put("d", b"a", b"1")
    store.dup_put("d", b"a", b"2")
    store.dup_put("d", b"b", b"9")
    assert store.range_scan_after("d", b"a", b"1") == [(b"a", b"2"), (b"b", b"9")]
    assert store.range_scan_after("d", b"a", b"2") == [(b"b", b"9")]
    assert store.range_scan_after("d", b"b", b"9") == []
    # after a pair that was deleted: resumes at the next surviving pair
    store.dup_delete("d", b"a", b"2")
    assert store.range_scan_after("d", b"a", b"1") == [(b"b", b"9")]
    store.close()


# ---------------------------------------------------------- db-kind safety


def test_db_kind_flip_rejected(tmp_path):
    store = HostStore(tmp_path / "kind")
    assert store.put("p", b"k", b"v")
    with pytest.raises(ValueError, match="plain db"):
        store.dup_put("p", b"k", b"v2")  # dup op on plain db: rejected loudly
    assert store.get("p", b"k") == b"v"
    assert store.entries("p") == 1

    assert store.dup_put("d", b"k", b"v1")
    with pytest.raises(ValueError, match="dupsort"):
        store.put("d", b"k", b"boom")  # plain op on dupsort db: rejected loudly
    assert store.get_dups("d", b"k") == [b"v1"]
    assert store.entries("d") == 1
    # an emptied db may change kind
    store.dup_delete("d", b"k", b"v1")
    store.delete("d", b"k")
    assert store.put("d", b"k", b"now-plain")
    assert store.get("d", b"k") == b"now-plain"
    store.close()


def test_db_kind_flip_rejected_externalized(tmp_path, monkeypatch):
    monkeypatch.setenv("TRUCTSTORE_EXT_MIN", "8")
    store = HostStore(tmp_path / "kindext")
    assert store.dup_put("d", b"k", b"v1")
    # externalized plain put on a dupsort db must be rejected BEFORE logging
    # (and surfaced as an error, not a silent False: the write is dropped)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="dupsort"):
        store.put("d", b"k", b"x" * 100)
    assert store.get_dups("d", b"k") == [b"v1"]
    store.close()
    reopened = HostStore(tmp_path / "kindext")  # replay must agree
    assert reopened.get_dups("d", b"k") == [b"v1"]
    reopened.close()


def test_get_many_roundtrip(store):
    store.put("assets", b"k1------", b"v1")
    store.put("assets", b"k3------", b"")  # zero-length value != missing
    vals = store.get_many("assets", [b"k1------", b"k2------", b"k3------", b"k1------"])
    assert vals == [b"v1", None, b"", b"v1"]  # request order, dups allowed


def test_get_many_matches_get_under_load(store):
    keys = [struct.pack(">Q", i) for i in range(500)]
    for i, k in enumerate(keys[::2]):  # every other key present
        store.put("assets", k, b"payload-%d" % i)
    batched = store.get_many("assets", keys)
    assert batched == [store.get("assets", k) for k in keys]


def test_get_many_edge_inputs(store):
    assert store.get_many("assets", []) == []
    assert store.get_many("nosuchdb", [b"k"]) == [None]
    with pytest.raises(ValueError, match="equal-width"):
        store.get_many("assets", [b"k1", b"key2"])


def test_get_many_externalized_values(tmp_path, monkeypatch):
    """Batched reads follow external value refs like single gets do."""
    monkeypatch.setenv("TRUCTSTORE_EXT_MIN", "1")
    s = HostStore(tmp_path / "ext")
    try:
        big = b"x" * 4096
        s.put("assets", b"kbig----", big)
        assert s.get_many("assets", [b"kbig----", b"none----"]) == [big, None]
    finally:
        s.close()
