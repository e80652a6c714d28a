"""Branch coverage round 12: batcher collection arms, kv/memory backend
edges, codec validation arms, model header-cache bypass, cursor/config/cache
fallback arms."""

import os
import threading
import time

import numpy as np
import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.engine.batcher import SearchBatcher
from iscc_search_tpu.indexes.kv import KvIndex
from iscc_search_tpu.schema import IsccEntry, IsccQuery

from tests.conftest import make_iscc_id


def _inst(n=0):
    body = bytes([n]) * 8
    header = ic.encode_header(ic.MT.INSTANCE, 0, ic.VS.V0, ic.encode_length(ic.MT.INSTANCE, 64))
    return "ISCC:" + ic.encode_base32(header + body)


def _unit(body, mtype=ic.MT.DATA, stype=0):
    header = ic.encode_header(mtype, stype, ic.VS.V0, ic.encode_length(mtype, len(body) * 8))
    return "ISCC:" + ic.encode_base32(header + body)


# -------------------------------------------------------------- batcher arms


class _EchoIndex:
    def __init__(self):
        self.batches = []

    def search(self, bodies, count):
        self.batches.append(len(bodies))
        return [((1, 2, 3), (0.9, 0.8, 0.7))] * len(bodies)


class _GatedIndex(_EchoIndex):
    def __init__(self, gate):
        super().__init__()
        self.gate = gate

    def search(self, bodies, count):
        self.gate.wait(10)
        return super().search(bodies, count)


def test_batcher_single_oversized_request_dispatches_alone():
    b = SearchBatcher(_EchoIndex(), max_batch=2, window_ms=0)
    try:
        res = b.search([b"a" * 8, b"b" * 8, b"c" * 8], 2)
        assert len(res) == 3
        assert b.index.batches == [3]
    finally:
        b.close()


def test_batcher_splits_when_next_request_does_not_fit():
    gate = threading.Event()
    idx = _GatedIndex(gate)
    b = SearchBatcher(idx, max_batch=3, window_ms=0)
    try:
        results = {}

        def req(name, n):
            results[name] = b.search([name.encode() * 8] * n, 1)

        t0 = threading.Thread(target=req, args=("a", 1))
        t0.start()
        time.sleep(0.2)  # first sweep in flight, blocked on the gate
        t1 = threading.Thread(target=req, args=("b", 2))
        t2 = threading.Thread(target=req, args=("c", 2))
        t1.start()
        time.sleep(0.1)
        t2.start()
        time.sleep(0.2)  # both queued behind the in-flight sweep
        gate.set()
        for t in (t0, t1, t2):
            t.join(10)
        assert sorted(len(v) for v in results.values()) == [1, 2, 2]
        # the two 2-body requests cannot fuse into one max_batch=3 sweep
        assert idx.batches[0] == 1 and set(idx.batches[1:]) == {2}
    finally:
        b.close()


# --------------------------------------------------------- kv backend edges


@pytest.fixture
def kv_idx(tmp_path):
    i = KvIndex(tmp_path / "kv")
    yield i
    i.close()


def test_kv_add_when_created_at_already_persisted(kv_idx):
    kv_idx.add_assets([IsccEntry(iscc_id=make_iscc_id(1), units=[_unit(b"\xaa" * 8), _inst(1)])])
    # Simulate a fresh process over an existing store: realm cache cleared
    # but created_at persisted -> the created_at put is skipped.
    kv_idx._realm_id = None
    kv_idx.add_assets([IsccEntry(iscc_id=make_iscc_id(2), units=[_unit(b"\xbb" * 8), _inst(2)])])
    from iscc_search_tpu.indexes.kv.index import DB_META

    assert kv_idx.store.get(DB_META, b"created_at") is not None


def test_kv_update_of_unitless_asset(kv_idx):
    """Updating an asset that had no units: the stale-row sweep has nothing
    to walk."""
    kv_idx.add_assets([IsccEntry(iscc_id=make_iscc_id(3), metadata={"v": 1})])
    res = kv_idx.add_assets(
        [IsccEntry(iscc_id=make_iscc_id(3), units=[_unit(b"\xcc" * 8), _inst(3)], metadata={"v": 2})]
    )
    assert res[0].status.value == "updated"


def test_kv_search_without_units(kv_idx):
    """iscc_id-only query: the per-unit loop never runs."""
    kv_idx.add_assets([IsccEntry(iscc_id=make_iscc_id(4), units=[_unit(b"\xdd" * 8), _inst(4)])])
    res = kv_idx.search_assets(IsccQuery(iscc_id=make_iscc_id(4)))
    assert res.global_matches == []


def test_kv_match_with_missing_asset_record(kv_idx):
    """Orphan unit rows (asset record deleted out from under them) still
    match, with no metadata."""
    unit = _unit(b"\xee" * 8)
    iid = make_iscc_id(5)
    kv_idx.add_assets([IsccEntry(iscc_id=iid, units=[unit, _inst(5)], metadata={"m": 1})])
    kv_idx.store.delete("assets", iid.encode("utf-8"))
    res = kv_idx.search_assets(IsccQuery(units=[unit]))
    assert res.global_matches and res.global_matches[0].metadata is None


# ------------------------------------------------------------- codec arms


def test_decode_length_iscc_subtype_arms():
    assert ic.decode_length(ic.MT.ISCC, ic.encode_units(()), subtype=None) >= 128
    assert ic.decode_length(ic.MT.ISCC, ic.encode_units(()), subtype=ic.ST_ISCC.WIDE) == 256
    assert ic.decode_length(ic.MT.ISCC, ic.encode_units(()), subtype=0) >= 128


def test_decode_units_bounds():
    with pytest.raises(ValueError, match="invalid unit composition"):
        ic.decode_units(-1)
    with pytest.raises(ValueError, match="invalid unit composition"):
        ic.decode_units(10_000)
    assert ic.decode_units(0) == ()


def test_gen_iscc_code_wide_needs_both_long_bodies():
    rng = np.random.default_rng(7)
    data_256 = _unit(rng.integers(0, 256, 32, dtype=np.uint8).tobytes(), ic.MT.DATA)
    inst_64 = _unit(rng.integers(0, 256, 8, dtype=np.uint8).tobytes(), ic.MT.INSTANCE)
    out = ic.gen_iscc_code_v0([data_256, inst_64], wide=True)
    # instance too short for WIDE: falls back to the standard composite
    from iscc_search_tpu.models import IsccCode

    assert IsccCode(out["iscc"]).fields.subtype != int(ic.ST_ISCC.WIDE)


def test_gen_iscc_id_rejects_negative_server_id():
    with pytest.raises(ValueError, match="12 bits"):
        ic.gen_iscc_id_v1(server_id=-1)


# ------------------------------------------------------------- model arms


def test_split_iscc_sequence_empty():
    from iscc_search_tpu.models import split_iscc_sequence

    assert split_iscc_sequence(b"") == []


def test_unit_type_cache_bypass_for_extended_header():
    """A header with a high-bit nibble (length >= 8) is not 2-byte-determined:
    both cache gates take the bypass arm."""
    from iscc_search_tpu.models import IsccUnit

    digest = bytes([0x00, 0x08]) + b"\x00" * 36  # META, ln nibble 8
    u = IsccUnit(digest)
    t1 = u.unit_type
    u2 = IsccUnit(digest)
    assert u2.unit_type == t1
    assert t1.startswith("META")


def test_convert_workers_default_multicore(monkeypatch):
    from iscc_search_tpu.options import SearchOptions

    monkeypatch.setattr(os, "sched_getaffinity", lambda _pid: {0, 1, 2}, raising=False)
    assert SearchOptions(index_uri="memory://").aggregator_convert_workers == 1
    monkeypatch.setattr(os, "sched_getaffinity", lambda _pid: {0}, raising=False)
    assert SearchOptions(index_uri="memory://").aggregator_convert_workers == 0


# ------------------------------------------------------- memory backend arms


def test_memory_search_edges():
    from iscc_search_tpu.indexes.memory import MemoryIndex
    from iscc_search_tpu.schema import IsccIndex

    idx = MemoryIndex()
    try:
        idx.create_index(IsccIndex(name="t"))
        code = ic.gen_iscc_code_v0(
            [
                _unit(b"\x01" * 8, ic.MT.DATA),
                _unit(b"\x02" * 8, ic.MT.INSTANCE),
            ]
        )["iscc"]
        idx.add_assets("t", [IsccEntry(iscc_id=make_iscc_id(9), units=None, iscc_code=None)])
        # iscc_code query vs an asset with no code: comparison short-circuits
        res = idx.search_assets("t", IsccQuery(iscc_code=code))
        assert res.global_matches == []
    finally:
        idx.close()


# --------------------------------------------------------- cursors / tlog


def test_cursor_persist_failure_paths(tmp_path, monkeypatch):
    from iscc_search_tpu.aggregator.cursors import CursorStore

    store = CursorStore(tmp_path / "cursors.json", network="testnet")

    def boom_replace(src, dst):
        raise OSError("disk gone")

    monkeypatch.setattr(os, "replace", boom_replace)
    store.save({1: 5})  # unlink of tmp succeeds -> warning, no raise
    monkeypatch.setattr(os, "unlink", lambda p: (_ for _ in ()).throw(OSError("x")))
    store.save({1: 6})  # unlink fails too -> still only a warning


def test_cursor_store_for_uri_arms():
    from iscc_search_tpu.aggregator.cursors import cursor_store_for

    class O:
        aggregator_mode = True
        index_uri = "noscheme-path"

    assert cursor_store_for(O()) is None
    O.index_uri = "kv://"
    assert cursor_store_for(O()) is None


def test_tlog_parse_empty():
    from iscc_search_tpu.aggregator import tlog

    assert list(tlog.iter_records(b"")) == []


# --------------------------------------------- config / compile cache / app


def test_config_add_second_index_without_use(tmp_path):
    from iscc_search_tpu.config import ConfigManager

    cfg = ConfigManager(tmp_path)
    cfg.add_remote("a", "http://x", "idx", use=False)  # first: becomes active anyway
    assert cfg.config.active == "a"
    cfg.add_remote("b", "http://y", "idx", use=False)  # active stays "a"
    assert cfg.config.active == "a"
    cfg.add_remote("c", "http://z", "idx", use=True)
    assert cfg.config.active == "c"


def test_compile_cache_explicit_off(monkeypatch, tmp_path):
    from iscc_search_tpu import compile_cache as cc

    monkeypatch.setattr(cc, "_configured", None)
    assert cc.ensure_compile_cache("off") is None
    monkeypatch.setattr(cc, "_configured", None)
    monkeypatch.delenv("ISCC_SEARCH_COMPILE_CACHE_DIR", raising=False)
    got = cc.ensure_compile_cache(str(tmp_path / "cache"))
    assert got == str(tmp_path / "cache")


def test_static_traversal_and_missing(tmp_path):
    import httpx

    from iscc_search_tpu.indexes.memory import MemoryIndex
    from iscc_search_tpu.options import SearchOptions
    from iscc_search_tpu.server.app import create_app

    app = create_app(index=MemoryIndex(), opts=SearchOptions(index_uri="memory://"))
    transport = httpx.WSGITransport(app=app)
    with httpx.Client(transport=transport, base_url="http://t") as c:
        assert c.get("/static/%2e%2e/%2e%2e/options.py").status_code == 404
        assert c.get("/static/definitely-missing.js").status_code == 404


def test_remote_client_with_api_key_header():
    from iscc_search_tpu.remote.client import RemoteIndex

    c = RemoteIndex("http://127.0.0.1:9", "idx", api_key="sekrit")
    assert c.client.headers["x-api-key"] == "sekrit"
    c2 = RemoteIndex("http://127.0.0.1:9", "idx")
    assert "x-api-key" not in c2.client.headers


# ------------------------------------------------------- simprint_ops arms


def test_inverse_entry_roundtrip():
    from iscc_search_tpu.engine.simprint_ops import pack_inverse_entry, unpack_inverse_entry

    packed = pack_inverse_entry(b"\xab" * 12, 7, 3)
    assert unpack_inverse_entry(packed) == (b"\xab" * 12, 7, 3)


def test_iter_simprint_vectors_exact_multiple(tmp_path):
    from iscc_search_tpu.engine.simprint_ops import iter_simprint_vectors
    from iscc_search_tpu.store.kv import HostStore

    s = HostStore(tmp_path / "db")
    try:
        for i in range(4):
            s.put("simprints", bytes([i]) * 10, b"p" * 12)
        batches = list(iter_simprint_vectors(s, "simprints", batch_size=2))
        assert [len(k) for k, _ in batches] == [2, 2]  # no short tail
        batches = list(iter_simprint_vectors(s, "simprints", batch_size=3))
        assert [len(k) for k, _ in batches] == [3, 1]  # short tail arm
    finally:
        s.close()
