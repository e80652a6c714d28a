"""
Durable per-hub transparency-log cursors.

The reference keeps poll cursors in memory only (aggregator restarts
re-backfill from leaf 0 and rely on idempotent upserts). That is safe but
slow at 100M-record scale, so we persist cursors next to the index data and
resume polling from the last fully ingested bundle.

Correctness still does not depend on this file: a missing, corrupt, or
wrong-network cursor file simply degrades to the reference behavior
(re-backfill from 0), and a checkpoint regression resets the stored cursor
the same way it resets the in-memory one.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path
from urllib.parse import urlparse

from iscc_search_tpu.utils import get_logger

logger = get_logger(__name__)

FILENAME = "aggregator_cursors.json"


class CursorStore:
    """Atomic JSON persistence for ``{hub_id: tree_size}`` poll cursors."""

    def __init__(self, path, network):
        # type: (Path | str, str) -> None
        self.path = Path(path)
        self.network = network

    def load(self):
        # type: () -> dict[int, int]
        """Stored cursors, or {} when missing/corrupt/another network."""
        try:
            data = json.loads(self.path.read_text())
        except FileNotFoundError:
            return {}
        except (OSError, ValueError) as exc:
            logger.warning(f"aggregator: ignoring unreadable cursor file {self.path}: {exc}")
            return {}
        if not isinstance(data, dict):
            logger.warning(f"aggregator: ignoring malformed cursor file {self.path}")
            return {}
        if data.get("network") != self.network:
            logger.warning(f"aggregator: ignoring cursor file for network {data.get('network')!r}")
            return {}
        cursors = data.get("cursors")
        if not isinstance(cursors, dict):
            return {}
        out = {}
        for hub_id, size in cursors.items():
            try:
                value = int(size)
            except (TypeError, ValueError):
                continue
            if value < 0:
                # A negative cursor would wedge the hub forever (bundle -1
                # fetches a garbage path every poll); degrade to re-backfill.
                continue
            out[int(hub_id)] = value
        return out

    def save(self, cursors):
        # type: (dict[int, int]) -> None
        """Write cursors atomically (tmp + fsync + rename); failures are non-fatal."""
        payload = {"network": self.network, "cursors": {str(k): int(v) for k, v in cursors.items()}}
        try:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=self.path.parent, prefix=".cursors-")
            try:
                with os.fdopen(fd, "w") as f:
                    f.write(json.dumps(payload))
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, self.path)
            except BaseException:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                raise
        except OSError as exc:
            logger.warning(f"aggregator: failed to persist cursors to {self.path}: {exc}")


def cursor_store_for(opts):
    # type: (...) -> CursorStore | None
    """
    CursorStore co-located with a durable index backend, else None.

    memory:// gets no store on purpose: the indexed data dies with the
    process, so resuming cursors would silently skip re-ingestion.
    """
    if not opts.aggregator_mode:
        return None
    uri = opts.index_uri
    if "://" not in uri:
        return None
    parsed = urlparse(uri)
    if parsed.scheme not in ("kv", "lmdb", "tpu", "usearch") or not parsed.path:
        return None
    from iscc_search_tpu.options import _normalize_uri_path

    # Same path normalization as the index factory, or the cursor file
    # lands beside a DIFFERENT directory than the index on win/'//' paths.
    return CursorStore(Path(_normalize_uri_path(parsed.path)) / FILENAME, opts.aggregator_network)
