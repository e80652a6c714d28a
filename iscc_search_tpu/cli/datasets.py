"""`datasets` command: list ISCC datasets available on the Hugging Face hub."""

from __future__ import annotations

import click
from rich.console import Console
from rich.table import Table

console = Console()


@click.command("datasets")
@click.option("--search", "query", default="iscc", show_default=True, help="Search term")
@click.option("--limit", default=20, show_default=True)
def datasets_command(query, limit):
    """List candidate ISCC datasets on the Hugging Face hub."""
    try:
        from huggingface_hub import HfApi
    except ImportError:  # pragma: no cover
        console.print("[red]huggingface-hub is not installed[/red]")
        raise SystemExit(1)

    api = HfApi()
    results = list(api.list_datasets(search=query, limit=limit))
    if not results:
        console.print("[yellow]No datasets found[/yellow]")
        return
    table = Table(title=f"Datasets matching '{query}'")
    table.add_column("ID", style="cyan")
    table.add_column("Downloads", justify="right")
    table.add_column("Updated")
    for d in results:
        downloads = getattr(d, "downloads", None)
        updated = getattr(d, "last_modified", None)
        table.add_row(d.id, str(downloads) if downloads is not None else "-",
                      str(updated)[:10] if updated is not None else "-")
    console.print(table)
