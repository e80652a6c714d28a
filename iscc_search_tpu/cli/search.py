"""`search` command: similarity search by ISCC-CODE or ISCC-ID."""

from __future__ import annotations

import json

import click
from rich.console import Console
from rich.table import Table

from iscc_search_tpu.cli.common import get_active_index
from iscc_search_tpu.schema import IsccQuery

console = Console()


def _is_iscc_id(iscc):
    # type: (str) -> bool
    """Route by decoded header MainType, not string length: a 64-bit
    single-unit ISCC-CODE is exactly as long as an ISCC-ID."""
    from iscc_search_tpu import codec as ic

    try:
        mtype, *_ = ic.decode_header(ic.decode_base32(iscc.removeprefix("ISCC:")))
        return mtype == ic.MT.ID
    except Exception:
        return False  # let IsccQuery(iscc_code=...) produce the validation error


@click.command("search")
@click.argument("iscc")
@click.option("--index", "index_name", default=None, help="Target index (default: active index)")
@click.option("--limit", default=10, show_default=True)
@click.option("--json", "as_json", is_flag=True, help="Print the raw JSON result")
def search_command(iscc, index_name, limit, as_json):
    """Search for assets similar to an ISCC-CODE or ISCC-ID."""
    index, name = get_active_index(index_name)
    try:
        if _is_iscc_id(iscc):
            query = IsccQuery(iscc_id=iscc)
        else:
            query = IsccQuery(iscc_code=iscc)
        result = index.search_assets(name, query, limit)
    except (FileNotFoundError, ValueError) as e:
        console.print(f"[red]{e}[/red]")
        raise SystemExit(1)
    finally:
        index.close()

    if as_json:
        console.print_json(json.dumps(result.model_dump(mode="json", exclude_none=True)))
        return

    if not result.global_matches and not result.chunk_matches:
        console.print("[yellow]No matches found[/yellow]")
        return

    if result.global_matches:
        table = Table(title=f"Global matches in '{name}'")
        table.add_column("ISCC-ID", style="cyan")
        table.add_column("Score", justify="right", style="green")
        table.add_column("Types")
        for m in result.global_matches:
            types = ", ".join(f"{t}={s:.3f}" for t, s in m.types.items())
            table.add_row(m.iscc_id, f"{m.score:.3f}", types)
        console.print(table)

    if result.chunk_matches:
        table = Table(title="Chunk matches")
        table.add_column("ISCC-ID", style="cyan")
        table.add_column("Score", justify="right", style="green")
        table.add_column("Types")
        for m in result.chunk_matches:
            types = ", ".join(f"{t}: {tr.matches}/{tr.queried}@{tr.score:.3f}" for t, tr in m.types.items())
            table.add_row(m.iscc_id, f"{m.score:.3f}", types)
        console.print(table)
