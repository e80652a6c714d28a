"""`serve` command: run the REST API server."""

from __future__ import annotations

import click
from rich.console import Console

console = Console()


@click.command("serve")
@click.option("--host", default=None, help="Bind host (default: ISCC_SEARCH_HOST or 0.0.0.0)")
@click.option("--port", default=None, type=int, help="Bind port (default: ISCC_SEARCH_PORT or 8000)")
@click.option("--index-uri", default=None, help="Backend URI (memory://, kv:///path, tpu:///path)")
@click.option("--workers", default=None, type=int, help="Worker processes (only 1 supported for device backends)")
def serve_command(host, port, index_uri, workers):
    """Run the ISCC-Search API server."""
    from iscc_search_tpu.options import search_opts
    from iscc_search_tpu.server.httpd import serve

    opts = search_opts.override(
        {
            k: v
            for k, v in {"host": host, "port": port, "index_uri": index_uri, "workers": workers}.items()
            if v is not None
        }
    )
    # workers > 1 runs the scale-out topology (server/scaleout.py): this
    # process keeps exclusive index ownership (single-writer constraint, same
    # as the reference usearch backend's, cli/serve.py:44-60) and serves it
    # over IPC to SO_REUSEPORT HTTP worker processes.
    if opts.aggregator_mode and opts.workers and opts.workers > 1:
        console.print("[red]Aggregator mode requires a single worker (one poller).[/red]")
        raise SystemExit(1)
    serve(opts)
