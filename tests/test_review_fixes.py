"""Regression tests for the round-2 review findings: simprint auto-flush,
coalesced-save seal durability, and poller cursor-persistence isolation."""

import asyncio
import threading

import numpy as np
import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.indexes.tpu import TpuIndex
from iscc_search_tpu.schema import IsccEntry

from tests.conftest import make_iscc_id, make_unit


def test_simprint_auto_flush_background(tmp_path, rng):
    """Auto-flush at flush_interval must accept the background-save call on
    the simprint engine too (it used to raise TypeError and poison ingest)."""
    idx = TpuIndex(tmp_path / "i", flush_interval=4)
    for i in range(1, 10):
        sp = {
            "CONTENT_TEXT_V0": [
                {
                    "simprint": ic.encode_base64(bytes([i]) * 16),
                    "offset": 0,
                    "size": 50,
                }
            ]
        }
        e = IsccEntry(
            iscc_id=make_iscc_id(i),
            units=[
                make_unit(ic.MT.DATA, ic.ST.NONE, 64, rng=rng),
                make_unit(ic.MT.INSTANCE, ic.ST.NONE, 64, rng=rng),
            ],
            simprints=sp,
        )
        idx.add_assets([e])  # crosses flush_interval several times
    sp_index = idx._simprint_indexes["CONTENT_TEXT_V0"]
    sp_index.drain_rotations()
    # The background flush ran at least twice: only post-flush mutations
    # remain unsaved, and the derived state reached disk.
    assert sp_index.dirty < 4
    assert (tmp_path / "i" / "sp_CONTENT_TEXT_V0" / "state.json").exists() or any(
        (tmp_path / "i").rglob("state.json")
    )
    idx.close()


def test_coalesced_save_preserves_sealed_segments(tmp_path, rng):
    """A queued snapshot that sealed a segment may be superseded before the
    worker writes it; the replacement must still emit the sealed file (the
    manifest would otherwise reference a file that never hits disk)."""
    from iscc_search_tpu.engine.device_index import DeviceNphdIndex

    idx = DeviceNphdIndex(tmp_path / "n", shard_size=1)  # shard_rows -> 1024
    assert idx.shard_rows == 1024
    nrng = np.random.default_rng(7)
    bodies = [nrng.integers(0, 256, 8, dtype=np.uint8).tobytes() for _ in range(2100)]

    idx.add(list(range(1100)), bodies[:1100])
    idx.save(wait=True)  # seals seg-00000 and writes it

    # Block the writer mid-snapshot
    gate = threading.Event()
    entered = threading.Event()
    orig_write = idx._write_snapshot

    def blocking_write(snapshot):
        entered.set()
        gate.wait(30)
        orig_write(snapshot)

    idx._write_snapshot = blocking_write
    idx.save(wait=False)  # A: occupies the worker (blocked in write)
    assert entered.wait(10)

    idx.add(list(range(1100, 2100)), bodies[1100:])  # crosses the 2048 seal
    idx.save(wait=False)  # B: seals seg-00001, queued behind A
    idx.save(wait=False)  # C: coalesces over B — must re-emit seg-00001
    gate.set()
    idx.drain_rotations()
    idx.close()

    # Both sealed segments must be on disk (names are unique per seal)
    sealed = sorted(f.name for f in (tmp_path / "n").glob("seg-*.npz"))
    assert len(sealed) == 2, sealed
    idx2 = DeviceNphdIndex(tmp_path / "n", shard_size=1)
    assert idx2.size == 2100
    (keys, scores), = idx2.search([bodies[1500]], 1)
    assert int.from_bytes(keys[0].tobytes(), "big") == 1500
    idx2.close()


def test_poller_survives_cursor_persistence_failure(tmp_path):
    """A failing durable-cursor save is isolated per hub: the loop keeps
    polling and ingestion continues (idempotent upserts make the lag safe)."""
    import httpx

    from iscc_search_tpu.aggregator import poller
    from iscc_search_tpu.indexes.memory import MemoryIndex
    from iscc_search_tpu.options import SearchOptions
    from iscc_search_tpu.schema import IsccIndex
    from tests.test_aggregator import HUBS_YAML, FakeLog, make_record

    index = MemoryIndex()
    index.create_index(IsccIndex(name="idptest"))
    opts = SearchOptions(
        index_uri="memory://",
        aggregator_network="testnet",
        aggregator_hub_list_url="https://hub0.example/hubs.yaml",
    )
    records = [make_record(i) for i in range(1, 30)]
    fake = FakeLog(records)
    client = httpx.AsyncClient(transport=httpx.MockTransport(fake.handler))
    status = {}

    class ExplodingCursorStore:
        def load(self):
            return {}

        def save(self, cursors):
            raise OSError("disk full")

    async def go():
        stop = asyncio.Event()

        async def stopper():
            for _ in range(500):
                await asyncio.sleep(0.01)
                if status.get(0) and status[0].counts.get("ok"):
                    break
            stop.set()

        await asyncio.gather(
            poller.poll_loop(index, opts, stop, client, status, cursor_store=ExplodingCursorStore()),
            stopper(),
        )

    asyncio.new_event_loop().run_until_complete(go())
    # Ingestion succeeded despite every cursor save failing
    assert status[0].counts["ok"] == 29
    assert index.get_index("idptest").assets == 29
