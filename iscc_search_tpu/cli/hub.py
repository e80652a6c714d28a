"""`hub` command: bulk-ingest ISCC datasets from the Hugging Face hub.

Parity with reference cli/hub.py: stream parquet batches with pyarrow and
upsert rows as IsccEntry batches with freshly generated monotonic ISCC-IDs.
Requires network access and huggingface-hub (gracefully gated when absent).
"""

from __future__ import annotations

import click
from rich.console import Console

from iscc_search_tpu.cli.common import get_active_index, parse_simprints_from_features
from iscc_search_tpu.schema import IsccEntry
from iscc_search_tpu.utils import get_logger, timer

logger = get_logger(__name__)
console = Console()

BATCH_SIZE = 100


class _IdGenerator:
    """Fresh monotonic ISCC-IDs (timestamp microseconds, fixed server id)."""

    def __init__(self, realm_id=0, server_id=0):
        import time

        from iscc_search_tpu import codec as ic

        self._ic = ic
        self.realm_id = realm_id
        self.server_id = server_id
        self._last = time.time_ns() // 1000

    def next(self):
        # type: () -> str
        self._last += 1
        return self._ic.gen_iscc_id_v1(self._last, self.server_id, self.realm_id)["iscc"]


def row_to_entry(row, gen, simprint_bits=None):
    # type: (dict, _IdGenerator, int | None) -> IsccEntry | None
    """Convert one dataset row to an IsccEntry with a fresh ISCC-ID."""
    entry = {"iscc_id": gen.next()}
    if row.get("iscc") or row.get("iscc_code"):
        entry["iscc_code"] = row.get("iscc") or row.get("iscc_code")
    if row.get("units"):
        entry["units"] = list(row["units"])
    if not entry.get("iscc_code") and not entry.get("units"):
        return None
    if entry.get("iscc_code") and not entry.get("units"):
        from iscc_search_tpu.models import IsccCode

        entry["units"] = [str(u) for u in IsccCode(entry["iscc_code"]).units]
    features = row.get("features")
    if features is not None and len(features):
        import json as _json

        if isinstance(features, (bytes, str)):
            try:
                features = _json.loads(features)
            except Exception:
                features = None
        if features:
            simprints = parse_simprints_from_features(list(features), simprint_bits)
            if simprints:
                entry["simprints"] = simprints
    metadata = {}
    for field in ("name", "source", "media_type"):
        if row.get(field):
            metadata[field] = row[field]
    if metadata:
        entry["metadata"] = metadata
    return IsccEntry(**entry)


@click.command("hub")
@click.argument("dataset")
@click.option("--index", "index_name", default=None, help="Target index (default: active index)")
@click.option("--limit", default=None, type=int, help="Maximum rows to ingest")
@click.option("--simprint-bits", type=click.Choice(["64", "128", "192", "256"]), default=None)
@click.option("--batch-size", default=BATCH_SIZE, show_default=True)
def hub_command(dataset, index_name, limit, simprint_bits, batch_size):
    """Ingest an ISCC parquet DATASET from the Hugging Face hub."""
    try:
        from huggingface_hub import hf_hub_download, list_repo_files
    except ImportError:  # pragma: no cover - module is present in most envs
        console.print("[red]huggingface-hub is not installed[/red]")
        raise SystemExit(1)
    import pyarrow.parquet as pq

    files = [f for f in list_repo_files(dataset, repo_type="dataset") if f.endswith(".parquet")]
    if not files:
        console.print(f"[red]No parquet files in dataset {dataset}[/red]")
        raise SystemExit(1)

    index, name = get_active_index(index_name)
    gen = _IdGenerator()
    bits = int(simprint_bits) if simprint_bits else None
    total = 0
    batch = []  # type: list[IsccEntry]

    def flush():
        nonlocal total
        if batch:
            index.add_assets(name, batch)
            total += len(batch)
            batch.clear()

    limit_reached = False
    with timer(f"hub ingest {dataset}"):
        try:
            for filename in files:
                local = hf_hub_download(dataset, filename, repo_type="dataset")
                parquet = pq.ParquetFile(local)
                for record_batch in parquet.iter_batches(batch_size=batch_size):
                    for row in record_batch.to_pylist():
                        try:
                            entry = row_to_entry(row, gen, bits)
                        except Exception as e:
                            # One malformed dataset row must not abort a
                            # multi-GB ingest (same contract as `add`).
                            logger.warning(f"Skipping row in {filename}: invalid entry ({e})")
                            continue
                        if entry is None:
                            continue
                        batch.append(entry)
                        if len(batch) >= batch_size:
                            flush()
                        if limit and total + len(batch) >= limit:
                            limit_reached = True
                            break
                    if limit_reached:
                        break
                if limit_reached:
                    break
            flush()
        finally:
            index.close()  # flush derived indexes even when ingest fails mid-run
    suffix = " (limit reached)" if limit_reached else f" from {dataset}"
    console.print(f"[green]Ingested {total} assets{suffix}[/green]")
