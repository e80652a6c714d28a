"""`add` command: bulk-ingest .iscc.json files (glob/dir/file) in batches."""

from __future__ import annotations

import json
from pathlib import Path

import click
from rich.console import Console

from iscc_search_tpu.cli.common import get_active_index, parse_simprints_from_features
from iscc_search_tpu.schema import IsccEntry
from iscc_search_tpu.utils import get_logger, timer

logger = get_logger(__name__)
console = Console()

BATCH_SIZE = 100


def expand_pattern_to_files(pattern):
    # type: (str) -> list[Path]
    """Expand a file path, directory, or glob into ingestible files."""
    p = Path(pattern)
    if p.is_file():
        return [p]
    if p.is_dir():
        files = list(p.glob("*.iscc.json")) + list(p.glob("*.ndjson")) + list(p.glob("*.jsonl"))
        return sorted(files)
    # For a bare glob like "*.json", Path().parent is already "." — glob
    # from it directly.
    return sorted(p.parent.glob(p.name))


def dict_to_entry(data, simprint_bits=None, include_simprints=True):
    # type: (dict, int | None, bool) -> IsccEntry | None
    """Convert one parsed .iscc.json document into an IsccEntry."""
    entry = {}
    for field in ("iscc_id", "iscc_code", "units", "metadata"):
        if data.get(field) is not None:
            entry[field] = data[field]
    if "iscc_code" not in entry and data.get("iscc"):
        entry["iscc_code"] = data["iscc"]
    if include_simprints and data.get("features"):
        simprints = parse_simprints_from_features(data["features"], simprint_bits)
        if simprints:
            entry["simprints"] = simprints
    if not entry.get("iscc_code") and not entry.get("units"):
        return None
    if entry.get("iscc_code") and not entry.get("units"):
        from iscc_search_tpu.models import IsccCode

        entry["units"] = [str(u) for u in IsccCode(entry["iscc_code"]).units]
    if not entry.get("iscc_id"):
        from iscc_search_tpu.models import IsccID

        entry["iscc_id"] = str(IsccID.random())
    return IsccEntry(**entry)


def iter_entries(path, simprint_bits=None, include_simprints=True):
    # type: (Path, int | None, bool) -> ...
    """Yield IsccEntry objects from a file (.iscc.json doc or NDJSON stream)."""
    if path.suffix in (".ndjson", ".jsonl"):
        with path.open("r", encoding="utf-8") as fh:
            for lineno, line in enumerate(fh, 1):
                line = line.strip()
                if not line:
                    continue
                try:
                    data = json.loads(line)
                except Exception as e:
                    logger.warning(f"Skipping {path}:{lineno}: invalid JSON ({e})")
                    continue
                try:
                    entry = dict_to_entry(data, simprint_bits, include_simprints)
                except Exception as e:
                    # One malformed row (bad iscc_id pattern, too few units,
                    # undecodable code) must not abort the whole bulk ingest.
                    logger.warning(f"Skipping {path}:{lineno}: invalid entry ({e})")
                    continue
                if entry is None:
                    logger.warning(f"Skipping {path}:{lineno}: no iscc_code or units")
                    continue
                yield entry
        return
    entry = file_to_entry(path, simprint_bits, include_simprints)
    if entry is not None:
        yield entry


def file_to_entry(path, simprint_bits=None, include_simprints=True):
    # type: (Path, int | None, bool) -> IsccEntry | None
    """Parse one .iscc.json file into an IsccEntry."""
    try:
        data = json.loads(path.read_text(encoding="utf-8"))
    except Exception as e:
        logger.warning(f"Skipping {path}: invalid JSON ({e})")
        return None
    try:
        entry = dict_to_entry(data, simprint_bits, include_simprints)
    except Exception as e:
        logger.warning(f"Skipping {path}: invalid entry ({e})")
        return None
    if entry is None:
        logger.warning(f"Skipping {path}: no iscc_code or units")
    return entry


@click.command("add")
@click.argument("pattern")
@click.option("--index", "index_name", default=None, help="Target index (default: active index)")
@click.option("--simprint-bits", type=click.Choice(["64", "128", "192", "256"]), default=None,
              help="Truncate simprints to this bit length")
@click.option("--no-simprints", is_flag=True, help="Skip simprint indexing")
@click.option("--batch-size", default=BATCH_SIZE, show_default=True)
def add_command(pattern, index_name, simprint_bits, no_simprints, batch_size):
    """Add assets from .iscc.json FILES (file, directory, or glob PATTERN)."""
    files = expand_pattern_to_files(pattern)
    if not files:
        console.print(f"[red]No files matched: {pattern}[/red]")
        raise SystemExit(1)

    index, name = get_active_index(index_name)
    bits = int(simprint_bits) if simprint_bits else None
    created = updated = skipped = 0
    batch = []  # type: list[IsccEntry]

    def flush_batch():
        nonlocal created, updated
        if not batch:
            return
        results = index.add_assets(name, batch)
        created_n = sum(1 for r in results if r.status == "created")
        created += created_n
        updated += len(results) - created_n
        batch.clear()

    with timer(f"add {len(files)} files"):
        try:
            for path in files:
                produced = 0
                for entry in iter_entries(path, bits, include_simprints=not no_simprints):
                    produced += 1
                    batch.append(entry)
                    if len(batch) >= batch_size:
                        flush_batch()
                if produced == 0:
                    skipped += 1
            flush_batch()
        finally:
            index.close()  # flush derived indexes even when ingest fails mid-run

    console.print(f"[green]Added {created} created, {updated} updated, {skipped} skipped[/green]")
