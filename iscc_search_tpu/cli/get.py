"""`get` command: fetch a stored asset by ISCC-ID."""

from __future__ import annotations

import json

import click
from rich.console import Console

from iscc_search_tpu.cli.common import get_active_index

console = Console()


@click.command("get")
@click.argument("iscc_id")
@click.option("--index", "index_name", default=None, help="Target index (default: active index)")
def get_command(iscc_id, index_name):
    """Get an asset by ISCC_ID."""
    index, name = get_active_index(index_name)
    try:
        asset = index.get_asset(name, iscc_id)
    except (FileNotFoundError, ValueError) as e:
        console.print(f"[red]{e}[/red]")
        raise SystemExit(1)
    finally:
        index.close()
    console.print_json(json.dumps(asset.model_dump(mode="json", exclude_none=True)))
