"""
Transparency-log poller (async I/O shell over the Sans-IO cores).

Parity with reference aggregator/poller.py: plan bundles covering new
records, poll each hub with per-hub error isolation, handle checkpoint
regression by re-backfilling from leaf 0, and publish per-hub HubStatus for
/status. Beyond the reference (which keeps cursors in memory and
re-backfills on restart), cursors persist next to durable backends via
aggregator.cursors — add_assets stays an idempotent upsert, so at-least-once
delivery remains safe either way.
"""

from __future__ import annotations

import asyncio
import time
from dataclasses import dataclass, field
from typing import TYPE_CHECKING

import httpx

from iscc_search_tpu.aggregator import hublist, tlog
from iscc_search_tpu.aggregator.entry import REASONS, record_to_entry
from iscc_search_tpu.utils import get_logger

if TYPE_CHECKING:  # pragma: no cover
    from iscc_search_tpu.options import SearchOptions  # noqa: F401

logger = get_logger(__name__)

HTTP_TIMEOUT = 30.0


@dataclass(frozen=True)
class PollResult:
    """Outcome of one hub poll: new cursor, per-reason counts, bundle error."""

    last_size: int
    counts: dict
    error: str | None = None


@dataclass
class HubStatus:
    """Mutable per-hub ingestion status shared with the /status endpoint."""

    hub_id: int
    url: str
    cursor: int = 0
    last_poll: float | None = None
    ok: bool = True
    error: str | None = None
    counts: dict = field(default_factory=dict)


def plan_bundles(last_size, tree_size):
    # type: (int, int) -> list[tuple[int, int]]
    """
    Entry-bundle fetch plan covering records [last_size, tree_size).

    Returns (bundle_index, width) pairs; width 0 = full bundle, >0 = the
    in-progress partial bundle (.p/<width>). Empty when the tree has not
    grown (regression handled by the caller).
    """
    if tree_size <= last_size:
        return []
    first = last_size // tlog.TILE_WIDTH
    last = (tree_size - 1) // tlog.TILE_WIDTH
    plans = []
    for index in range(first, last + 1):
        if (index + 1) * tlog.TILE_WIDTH <= tree_size:
            plans.append((index, 0))
        else:
            plans.append((index, tree_size - index * tlog.TILE_WIDTH))
    return plans


async def poll_hub_once(client, hub, last_size, index, index_name, network, stop_event):
    # type: (httpx.AsyncClient, hublist.Hub, int, ..., str, str, asyncio.Event) -> PollResult
    """
    One poll of one hub: read the checkpoint, ingest new bundles one at a
    time (bounded bursts of <=256 records between awaits). A failing bundle
    keeps the progress made and surfaces PollResult.error; a tree-size
    regression resets the cursor to 0 for re-backfill.
    """
    response = await client.get(f"{hub.url}/log/checkpoint")
    response.raise_for_status()
    tree_size = tlog.parse_checkpoint(response.text)
    counts = dict.fromkeys(REASONS, 0)
    if tree_size < last_size:
        logger.warning(f"aggregator: {hub.url}: checkpoint regression {last_size} -> {tree_size}, re-backfilling")
        return PollResult(last_size=0, counts=counts)
    processed = last_size
    for bundle_index, width in plan_bundles(last_size, tree_size):
        if stop_event.is_set():
            break
        try:
            path = tlog.entries_path(bundle_index, width)
            response = await client.get(f"{hub.url}/log/{path}")
            response.raise_for_status()
            records = tlog.parse_entry_bundle(response.content)
            expected = width or tlog.TILE_WIDTH
            if len(records) != expected:
                raise ValueError(f"{path} has {len(records)} records, expected {expected}")
            bundle_start = bundle_index * tlog.TILE_WIDTH
            entries = []
            for record in records[max(last_size - bundle_start, 0):]:
                converted, reason = record_to_entry(record, network)
                counts[reason] += 1
                if converted is not None:
                    entries.append(converted)
                elif reason != "deletion":
                    logger.warning(f"aggregator: {hub.url}: skipped record ({reason})")
            await asyncio.to_thread(index.add_assets, index_name, entries)
        except Exception as exc:
            logger.warning(f"aggregator: {hub.url}: bundle {bundle_index} failed, retrying next poll: {exc}")
            return PollResult(last_size=processed, counts=counts, error=f"bundle {bundle_index} failed: {exc}")
        processed = min((bundle_index + 1) * tlog.TILE_WIDTH, tree_size)
    return PollResult(last_size=processed, counts=counts)


async def poll_loop(index, opts, stop_event, client, status, cursor_store=None):
    # type: (..., SearchOptions, asyncio.Event, httpx.AsyncClient, dict[int, HubStatus], ...) -> None
    """
    Refresh the hub list and poll every hub until stopped.

    Hub-list refresh failure keeps the last-known-good list (retry at the
    short poll interval); an empty list is benign idle; hubs leaving a
    non-empty refreshed list are pruned from status (empty refreshes prune
    nothing so cursors survive transient outages). With a durable backend,
    cursors are seeded from and persisted to ``cursor_store`` so restarts
    resume from the last ingested bundle instead of re-backfilling.
    """
    network = opts.aggregator_network
    index_name = opts.aggregator_index_name
    saved_cursors = cursor_store.load() if cursor_store is not None else {}
    hubs = []  # type: list[hublist.Hub]
    next_refresh = 0.0
    while not stop_event.is_set():
        now = time.monotonic()
        if now >= next_refresh:
            try:
                hubs = await hublist.fetch_hub_list(opts.aggregator_hub_list_source, network, client)
                if not hubs:
                    logger.warning("aggregator: hub list is empty, nothing to poll")
                    next_refresh = now + opts.aggregator_poll_interval
                else:
                    for stale_id in set(status) - {hub.hub_id for hub in hubs}:
                        del status[stale_id]
                    next_refresh = now + opts.aggregator_hub_refresh_interval
            except Exception as exc:
                logger.warning(f"aggregator: hub-list refresh failed, keeping previous list: {exc}")
                next_refresh = now + opts.aggregator_poll_interval
        for hub in hubs:
            if stop_event.is_set():
                break
            if hub.hub_id not in status:
                status[hub.hub_id] = HubStatus(
                    hub_id=hub.hub_id, url=hub.url, cursor=saved_cursors.get(hub.hub_id, 0)
                )
            hub_status = status[hub.hub_id]
            hub_status.url = hub.url  # refresh may relocate a hub
            hub_status.last_poll = time.time()
            try:
                result = await poll_hub_once(
                    client, hub, hub_status.cursor, index, index_name, network, stop_event
                )
                cursor_moved = result.last_size != hub_status.cursor
                hub_status.cursor = result.last_size
                for reason, count in result.counts.items():
                    hub_status.counts[reason] = hub_status.counts.get(reason, 0) + count
                hub_status.ok = result.error is None
                hub_status.error = result.error
                if cursor_moved and cursor_store is not None:
                    await asyncio.to_thread(
                        cursor_store.save, {hid: st.cursor for hid, st in status.items()}
                    )
                if result.counts["ok"]:
                    logger.info(
                        f"aggregator: {hub.url}: indexed {result.counts['ok']} records, cursor {result.last_size}"
                    )
            except Exception as exc:
                hub_status.ok = False
                hub_status.error = str(exc)
                logger.warning(f"aggregator: poll of {hub.url} failed: {exc}")
        try:
            await asyncio.wait_for(stop_event.wait(), timeout=opts.aggregator_poll_interval)
        except (TimeoutError, asyncio.TimeoutError):
            pass


async def run(index, opts, stop_event, status):
    # type: (..., SearchOptions, asyncio.Event, dict[int, HubStatus]) -> None
    """Poller entry point owning the HTTP client."""
    from iscc_search_tpu.aggregator.cursors import cursor_store_for

    cursor_store = cursor_store_for(opts)
    async with httpx.AsyncClient(timeout=HTTP_TIMEOUT, follow_redirects=True) as client:
        await poll_loop(index, opts, stop_event, client, status, cursor_store=cursor_store)
