"""`index` command group: configure named indexes (add/list/use/remove/rebuild)."""

from __future__ import annotations

import click
from rich.console import Console
from rich.table import Table

from iscc_search_tpu.cli.common import get_config_manager

console = Console()


@click.group("index")
def index_group():
    """Manage configured indexes (git-like add/list/use/remove)."""


@index_group.command("add")
@click.argument("name")
@click.option("--path", default=None, help="Local index base directory")
@click.option("--scheme", default="tpu", type=click.Choice(["tpu", "kv"]), show_default=True)
@click.option("--url", default=None, help="Remote server URL (registers a remote index)")
@click.option("--remote-name", default=None, help="Index name on the remote server (default: NAME)")
@click.option("--api-key", default=None, help="API key for the remote server")
@click.option("--no-use", is_flag=True, help="Do not activate the new index")
def index_add(name, path, scheme, url, remote_name, api_key, no_use):
    """Register a local or remote index under NAME."""
    manager = get_config_manager()
    try:
        if url:
            manager.add_remote(name, url, remote_name or name, api_key=api_key, use=not no_use)
            console.print(f"[green]Added remote index '{name}' -> {url}[/green]")
        else:
            if not path:
                import iscc_search_tpu

                path = iscc_search_tpu.dirs.user_data_dir
            manager.add_local(name, path, scheme=scheme, use=not no_use)
            console.print(f"[green]Added local index '{name}' at {path} ({scheme}://)[/green]")
    except ValueError as e:
        console.print(f"[red]{e}[/red]")
        raise SystemExit(1)


@index_group.command("list")
def index_list():
    """List configured indexes (* marks the active one)."""
    manager = get_config_manager()
    discovered = manager.discover()
    if discovered:
        console.print(f"[dim]Discovered: {', '.join(discovered)}[/dim]")
    indexes = manager.list()
    if not indexes:
        console.print("[yellow]No indexes configured. Use 'iscc-search-tpu index add'.[/yellow]")
        return
    active = manager.config.active
    table = Table()
    table.add_column("")
    table.add_column("Name", style="cyan")
    table.add_column("Type")
    table.add_column("Location")
    for name, cfg in indexes.items():
        mark = "*" if name == active else ""
        location = cfg.path if cfg.type == "local" else f"{cfg.url} ({cfg.index_name})"
        table.add_row(mark, name, cfg.type, location)
    console.print(table)


@index_group.command("use")
@click.argument("name")
def index_use(name):
    """Set the active index."""
    manager = get_config_manager()
    try:
        manager.use(name)
        console.print(f"[green]Active index: {name}[/green]")
    except KeyError as e:
        console.print(f"[red]{e}[/red]")
        raise SystemExit(1)


@index_group.command("remove")
@click.argument("name")
@click.option("--delete-data", is_flag=True, help="Also delete the index data on disk")
def index_remove(name, delete_data):
    """Remove NAME from the configuration (data kept unless --delete-data)."""
    manager = get_config_manager()
    try:
        cfg = manager.list().get(name)
        manager.remove(name)
    except KeyError as e:
        console.print(f"[red]{e}[/red]")
        raise SystemExit(1)
    if delete_data and cfg is not None and cfg.type == "local":
        import shutil
        from pathlib import Path

        target = Path(cfg.path) / name
        if target.exists():
            shutil.rmtree(target)
            console.print(f"[yellow]Deleted data at {target}[/yellow]")
    console.print(f"[green]Removed index '{name}'[/green]")


@index_group.command("rebuild")
@click.argument("name", required=False)
@click.option("--unit-type", "unit_types", multiple=True, help="NPHD unit types to rebuild")
@click.option("--simprint-type", "simprint_types", multiple=True, help="Simprint types to rebuild")
@click.option("--all", "rebuild_all", is_flag=True, help="Rebuild all tracked derived indexes")
def index_rebuild(name, unit_types, simprint_types, rebuild_all):
    """Rebuild derived device indexes from the source-of-truth store."""
    from iscc_search_tpu.cli.common import get_active_index

    if not unit_types and not simprint_types and not rebuild_all:
        console.print("[red]Specify --unit-type/--simprint-type or --all[/red]")
        raise SystemExit(1)
    index, idx_name = get_active_index(name)
    if not hasattr(index, "rebuild"):
        index.close()  # get_active_index opened (and may have created) it
        console.print("[red]The configured backend does not support rebuild[/red]")
        raise SystemExit(1)
    try:
        result = index.rebuild(
            idx_name,
            unit_types=None if rebuild_all else list(unit_types),
            simprint_types=None if rebuild_all else list(simprint_types),
        )
    finally:
        index.close()
    console.print(f"[green]Rebuilt unit types: {result['unit_types'] or '-'}[/green]")
    console.print(f"[green]Rebuilt simprint types: {result['simprint_types'] or '-'}[/green]")
