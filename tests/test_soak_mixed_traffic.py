"""Short mixed-traffic soak: concurrent add/search/get against periodic
flush + rebuild on one TpuIndex.

Pins the rebuild availability contract the long-form soak caught: searches
must NEVER miss an asset's own unit, even mid-rebuild — the rebuild builds
aside and swaps the new index in atomically (no missing-type window, no
window where the type serves empty results for the rebuild duration).
"""

import random
import threading
import time

import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.indexes.tpu import TpuIndex
from iscc_search_tpu.schema import IsccEntry, IsccQuery

from tests.conftest import make_iscc_id, make_unit

SOAK_SECONDS = 8


def _unit(body):
    h = ic.encode_header(ic.MT.DATA, 0, ic.VS.V0, ic.encode_length(ic.MT.DATA, len(body) * 8))
    return "ISCC:" + ic.encode_base32(h + body)


def test_search_never_misses_during_rebuilds(tmp_path):
    idx = TpuIndex(tmp_path / "idx", flush_interval=200)
    errors = []
    stop = threading.Event()
    added = []
    lock = threading.Lock()
    rng = random.Random(7)

    def adder():
        n = 0
        try:
            while not stop.is_set():
                batch = []
                for _ in range(10):
                    n += 1
                    body = bytes(rng.getrandbits(8) for _ in range(8))
                    batch.append(
                        IsccEntry(
                            iscc_id=make_iscc_id(n),
                            units=[_unit(body), make_unit(ic.MT.INSTANCE, 0, 64)],
                        )
                    )
                idx.add_assets(batch)
                with lock:
                    added.extend((e.iscc_id, e.units[0]) for e in batch)
        except Exception as e:
            errors.append(f"adder: {e!r}")

    def searcher():
        try:
            while not stop.is_set():
                with lock:
                    if not added:
                        continue
                    iscc_id, u = added[rng.randrange(len(added))]
                res = idx.search_assets(IsccQuery(units=[u]), limit=5)
                if iscc_id not in [m.iscc_id for m in res.global_matches]:
                    errors.append(f"searcher: {iscc_id} missing for its own unit")
                    return
        except Exception as e:
            errors.append(f"searcher: {e!r}")

    def rebuilder():
        try:
            while not stop.is_set():
                time.sleep(0.5)
                idx.rebuild(["DATA_NONE_V0"], [])
        except Exception as e:
            errors.append(f"rebuilder: {e!r}")

    threads = [
        threading.Thread(target=adder),
        threading.Thread(target=searcher),
        threading.Thread(target=searcher),
        threading.Thread(target=rebuilder),
    ]
    for t in threads:
        t.start()
    time.sleep(SOAK_SECONDS)
    stop.set()
    for t in threads:
        t.join(timeout=60)
    wedged = [t.name for t in threads if t.is_alive()]
    idx.close()
    assert errors == [] and wedged == []

    # Reopen: counts must be exact
    idx2 = TpuIndex(tmp_path / "idx")
    try:
        assert len(idx2) == len({a for a, _ in added})
    finally:
        idx2.close()


def test_kv_concurrent_updates_leave_no_stale_rows(tmp_path):
    """KvIndex.add_assets is a multi-op sequence; without write
    serialization two interleaved updates of the same asset leave stale
    unit rows pointing at bodies the asset no longer carries."""
    from iscc_search_tpu.indexes import common
    from iscc_search_tpu.indexes.kv.index import KvIndex
    from iscc_search_tpu.models import IsccUnit

    idx = KvIndex(tmp_path / "kv")
    errors = []
    stop = threading.Event()
    shared = 12
    rng_local = random.Random(3)

    def writer():
        try:
            while not stop.is_set():
                n = rng_local.randrange(shared)
                body = bytes(rng_local.getrandbits(8) for _ in range(8))
                idx.add_assets(
                    [
                        IsccEntry(
                            iscc_id=make_iscc_id(n),
                            units=[_unit(body), make_unit(ic.MT.INSTANCE, 0, 64)],
                        )
                    ]
                )
        except Exception as e:
            errors.append(repr(e))

    threads = [threading.Thread(target=writer) for _ in range(4)]
    for t in threads:
        t.start()
    time.sleep(4)
    stop.set()
    for t in threads:
        t.join(timeout=30)
    assert errors == []

    stale = 0
    for n in range(shared):
        asset = idx.get_asset(make_iscc_id(n))
        current = {
            ic.decode_base32(u.removeprefix("ISCC:"))[2:]
            for u in asset.units
            if "DATA" in IsccUnit(u).unit_type
        }
        body8 = common.extract_iscc_id_body(make_iscc_id(n))
        rows = {k for k, v in idx.store.iter_range("unit:DATA_NONE_V0") if v == body8}
        if rows != current:
            stale += 1
    idx.close()
    assert stale == 0


def test_simprint_search_stable_under_updates_and_rebuilds(tmp_path):
    """Chunk searches must keep finding an asset's CURRENT simprints while
    concurrent updates replace chunk sets and simprint rebuilds run."""
    idx = TpuIndex(tmp_path / "idx", flush_interval=300)
    errors = []
    stop = threading.Event()
    rng_local = random.Random(5)
    lock = threading.Lock()
    # iscc_id -> current simprint list, or None while a replacement
    # add_assets is in flight. The in-flight marker must be set BEFORE the
    # add: `live` is only updated after add_assets returns, so without it a
    # searcher that misses (replacement mid-flight) would re-check against a
    # stale entry that still matches its first read and flag a false
    # "missing" whenever the add outlives the settle sleep (seen under
    # full-suite contention on a 1-core host).
    live = {}

    def writer():
        n = 0
        try:
            while not stop.is_set():
                if live and rng_local.random() < 0.5:
                    with lock:
                        iscc_id = rng_local.choice(list(live))
                        live[iscc_id] = None  # replacement in flight
                else:
                    n += 1
                    iscc_id = make_iscc_id(n)
                sps = [
                    ic.encode_base64(bytes(rng_local.getrandbits(8) for _ in range(16)))
                    for _ in range(3)
                ]
                idx.add_assets(
                    [
                        IsccEntry(
                            iscc_id=iscc_id,
                            units=[make_unit(ic.MT.DATA, 0, 64), make_unit(ic.MT.INSTANCE, 0, 64)],
                            simprints={
                                "text": [
                                    {"simprint": s, "offset": i * 10, "size": 10}
                                    for i, s in enumerate(sps)
                                ]
                            },
                        )
                    ]
                )
                with lock:
                    live[iscc_id] = sps
        except Exception as e:
            errors.append(f"writer: {e!r}")

    def searcher():
        try:
            while not stop.is_set():
                with lock:
                    settled = [(k, v) for k, v in live.items() if v is not None]
                    if not settled:
                        continue
                    iscc_id, sps = rng_local.choice(settled)
                q = IsccQuery.model_construct(simprints={"text": [sps[0]]})
                res = idx.search_assets(q, limit=5)
                if iscc_id not in [m.iscc_id for m in res.chunk_matches]:
                    # May be a mid-flight update: settle and check the
                    # CURRENT chunk set (a completed state must be findable)
                    time.sleep(0.3)
                    with lock:
                        cur = live.get(iscc_id)
                    if cur is None:
                        continue
                    q2 = IsccQuery.model_construct(simprints={"text": [cur[0]]})
                    res2 = idx.search_assets(q2, limit=5)
                    if iscc_id not in [m.iscc_id for m in res2.chunk_matches]:
                        with lock:
                            if live.get(iscc_id) == cur:
                                errors.append(f"{iscc_id} missing for its current chunk")
                                return
        except Exception as e:
            errors.append(f"searcher: {e!r}")

    def rebuilder():
        try:
            while not stop.is_set():
                time.sleep(1.0)
                idx.rebuild([], ["text"])
        except Exception as e:
            errors.append(f"rebuilder: {e!r}")

    threads = [
        threading.Thread(target=writer),
        threading.Thread(target=searcher),
        threading.Thread(target=rebuilder),
    ]
    for t in threads:
        t.start()
    time.sleep(SOAK_SECONDS)
    stop.set()
    for t in threads:
        t.join(timeout=90)
    wedged = [t.name for t in threads if t.is_alive()]
    idx.close()
    assert errors == [] and wedged == []
