"""Regression tests for the server-runtime/aggregator review findings.

1. A valid-JSON non-dict cursor file crashed the poller at startup
   (AttributeError in the warning f-string) instead of degrading to {}.
2. AggregatorRunner.stop() raised on a closed loop (poller crashed
   earlier), aborting serve()'s finally and skipping index.close().
3. A roster flap (hub temporarily absent from a non-empty hub list) lost
   the hub's durable cursor and re-seeded from a process-start snapshot.
4. Failed bundles' records were tallied before add_assets ran, so
   retries double-counted them in the cumulative /status totals.
5. A short engine return handed trailing batcher callers empty results
   instead of an error.
"""

import asyncio
from collections import Counter

import numpy as np
import pytest

from iscc_search_tpu.aggregator.cursors import CursorStore
from iscc_search_tpu.engine.batcher import SearchBatcher


# 1. ---------------------------------------------------------------------


def test_cursor_store_non_dict_payload_degrades(tmp_path):
    p = tmp_path / "cursors.json"
    p.write_text("[1, 2]")
    assert CursorStore(p, network="testnet").load() == {}
    p.write_text('"still-not-a-dict"')
    assert CursorStore(p, network="testnet").load() == {}


# 2. ---------------------------------------------------------------------


def test_runner_stop_survives_crashed_poller(monkeypatch):
    from iscc_search_tpu.indexes.memory import MemoryIndex
    from iscc_search_tpu.options import SearchOptions
    from iscc_search_tpu.server.httpd import AggregatorRunner

    async def crash(*a, **kw):
        raise RuntimeError("poller crash (simulated)")

    import iscc_search_tpu.aggregator.poller as poller_mod

    monkeypatch.setattr(poller_mod, "run", crash)
    opts = SearchOptions(index_uri="memory://", aggregator_network="testnet")
    runner = AggregatorRunner(MemoryIndex(), opts, {})
    runner.start()
    runner._thread.join(timeout=10)  # poller dies, loop closes
    runner.stop(timeout=5)  # must NOT raise 'Event loop is closed'
    runner.stop(timeout=5)  # idempotent


# 3. ---------------------------------------------------------------------


def test_roster_flap_keeps_durable_cursor(tmp_path):
    """A hub pruned from the roster and re-added must resume from its
    LATEST saved cursor, and the cursor file must keep pruned hubs."""
    from iscc_search_tpu.aggregator import hublist, poller
    from iscc_search_tpu.indexes.memory import MemoryIndex
    from iscc_search_tpu.options import SearchOptions
    from iscc_search_tpu.schema import IsccIndex

    store = CursorStore(tmp_path / "cursors.json", network="testnet")
    durable = {1: 5000}

    async def go():
        opts = SearchOptions(index_uri="memory://", aggregator_network="testnet")
        index = MemoryIndex()
        index.create_index(IsccIndex(name=opts.aggregator_index_name))
        status = {}
        state = poller.HubStatus(hub_id=1, url="https://h1", cursor=5000)
        status[1] = state
        hub = hublist.Hub(hub_id=1, url="https://h1")

        async def no_growth(client, h, last_size, *a, **kw):
            return poller.PollResult(last_size=last_size + 100, counts={"ok": 100})

        real = poller.poll_hub_once
        poller.poll_hub_once = no_growth
        try:
            await poller._poll_one_hub(
                None, hub, state, index, opts, asyncio.Event(), store, durable
            )
        finally:
            poller.poll_hub_once = real
        # Durable map advanced and persisted WITH the hub present
        assert durable[1] == 5100
        assert store.load() == {1: 5100}
        # Roster flap: prune the status row entirely (registry hiccup)
        status.pop(1)
        # Re-seed path uses the live durable map, not a stale snapshot
        assert durable.get(1, 0) == 5100

    asyncio.run(go())


# 4. ---------------------------------------------------------------------


def test_failed_bundle_not_counted_until_committed():
    """poll_hub_once must not merge a failed bundle's reason tallies."""
    import httpx

    from iscc_search_tpu.aggregator import hublist, poller, tlog

    records = [b"notjson"] * tlog.TILE_WIDTH  # converts to 'malformed' x256

    def handler(request):
        if request.url.path.endswith("/checkpoint"):
            return httpx.Response(200, text="origin\n256\nhash")
        return httpx.Response(
            200,
            content=b"".join(len(r).to_bytes(2, "big") + r for r in records),
        )

    class FailingIndex:
        def add_assets(self, name, entries):
            raise OSError("index write failed")

    async def go():
        client = httpx.AsyncClient(transport=httpx.MockTransport(handler))
        hub = hublist.Hub(hub_id=0, url="https://h0.example")
        result = await poller.poll_hub_once(
            client, hub, 0, FailingIndex(), "idx", "testnet", asyncio.Event()
        )
        await client.aclose()
        assert result.error is not None
        # The failed bundle's 256 'malformed' records are NOT pre-counted:
        # a retry next poll would double-count them.
        assert result.counts.get("malformed", 0) == 0

    asyncio.run(go())


# 5. ---------------------------------------------------------------------


def test_batcher_short_engine_return_is_an_error():
    class _Short:
        def search(self, bodies, count):
            # one result fewer than queries
            return [(np.zeros((0, 8), np.uint8), np.zeros(0, np.float32))] * (len(bodies) - 1)

    batcher = SearchBatcher(_Short(), max_batch=8, window_ms=0)
    try:
        with pytest.raises(RuntimeError, match="returned"):
            batcher.search([b"\x00" * 8, b"\x01" * 8], 5)
    finally:
        batcher.close()


def test_cursor_store_rejects_negative_cursors(tmp_path):
    import json

    p = tmp_path / "cursors.json"
    p.write_text(json.dumps({"network": "testnet", "cursors": {"1": -5, "2": 7}}))
    assert CursorStore(p, network="testnet").load() == {2: 7}
