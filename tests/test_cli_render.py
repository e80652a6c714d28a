"""CLI output-rendering and command-body coverage: search tables, hub
ingest loop, and the in-process server entry point."""

import json
import threading
import time
import urllib.request

import pytest
from click.testing import CliRunner

from iscc_search_tpu import codec as ic
from iscc_search_tpu.cli import cli
from iscc_search_tpu.cli import common as cli_common
from iscc_search_tpu.config import ConfigManager
from tests.conftest import make_unit


@pytest.fixture
def runner(tmp_path):
    manager = ConfigManager(config_dir=tmp_path / "cfg")
    cli_common.set_config_manager(manager)
    yield CliRunner(), manager, tmp_path
    cli_common.set_config_manager(None)


def _setup_index(r, base):
    res = r.invoke(cli, ["index", "add", "main", "--path", str(base / "data")])
    assert res.exit_code == 0, res.output


def _write_entries(path, entries):
    path.write_text("\n".join(json.dumps(e) for e in entries))


def test_search_pretty_global_table(runner, entry_factory):
    r, _, base = runner
    _setup_index(r, base)
    e1 = entry_factory()
    e2 = entry_factory()
    _write_entries(base / "in.ndjson", [e1, e2])
    assert r.invoke(cli, ["add", str(base / "in.ndjson")]).exit_code == 0

    res = r.invoke(cli, ["search", e1["iscc_code"]])
    assert res.exit_code == 0, res.output
    assert "Global matches" in res.output
    # Rich wraps the table; strip newlines before matching the id
    assert e1["iscc_id"].split(":")[1][:8] in res.output.replace("\n", "")


def test_search_pretty_chunk_table(runner, entry_factory, monkeypatch):
    """Chunk-match table rendering. The CLI cannot submit simprints itself
    (and stored assets exclude them on re-query — reference parity), so the
    renderer is driven with a faked engine result carrying chunk matches."""
    from iscc_search_tpu.cli import search as search_mod
    from iscc_search_tpu.schema import (
        IsccChunkMatch,
        IsccGlobalMatch,
        IsccQuery,
        IsccSearchResult,
        Types,
    )

    r, _, base = runner
    e = entry_factory()

    class FakeIndex:
        def search_assets(self, name, query, limit):
            return IsccSearchResult(
                query=IsccQuery(iscc_id=e["iscc_id"]),
                global_matches=[
                    IsccGlobalMatch(iscc_id=e["iscc_id"], score=0.9, types={"DATA_NONE_V0": 0.9})
                ],
                chunk_matches=[
                    IsccChunkMatch(
                        iscc_id=e["iscc_id"],
                        score=0.8,
                        types={"CONTENT_TEXT_V0": Types(score=0.8, matches=1, queried=2)},
                    )
                ],
            )

        def close(self):
            pass

    monkeypatch.setattr(search_mod, "get_active_index", lambda name: (FakeIndex(), "main"))
    res = r.invoke(cli, ["search", e["iscc_id"]])
    assert res.exit_code == 0, res.output
    assert "Chunk matches" in res.output
    assert "Global matches" in res.output


def test_search_no_matches(runner, entry_factory):
    r, _, base = runner
    _setup_index(r, base)
    e = entry_factory()
    res = r.invoke(cli, ["search", e["iscc_code"]])
    assert res.exit_code == 0, res.output
    assert "No matches found" in res.output


def test_search_invalid_iscc_exits_red(runner, entry_factory):
    r, _, base = runner
    _setup_index(r, base)
    res = r.invoke(cli, ["search", "ISCC:%%%NOTACODE%%%"])
    assert res.exit_code == 1


def test_hub_command_ingest(runner, entry_factory, tmp_path, monkeypatch):
    pa = pytest.importorskip("pyarrow")
    pq = pytest.importorskip("pyarrow.parquet")
    r, _, base = runner
    _setup_index(r, base)

    rows = [{"iscc": entry_factory()["iscc_code"], "name": f"asset {i}"} for i in range(5)]
    table = pa.Table.from_pylist(rows)
    parquet_path = tmp_path / "data.parquet"
    pq.write_table(table, parquet_path)

    import huggingface_hub

    monkeypatch.setattr(
        huggingface_hub, "list_repo_files", lambda ds, repo_type: ["data.parquet", "README.md"]
    )
    monkeypatch.setattr(
        huggingface_hub, "hf_hub_download", lambda ds, fn, repo_type: str(parquet_path)
    )

    res = r.invoke(cli, ["hub", "fake/dataset", "--batch-size", "2"])
    assert res.exit_code == 0, res.output
    assert "Ingested 5 assets" in res.output


def test_hub_command_limit(runner, entry_factory, tmp_path, monkeypatch):
    pa = pytest.importorskip("pyarrow")
    pq = pytest.importorskip("pyarrow.parquet")
    r, _, base = runner
    _setup_index(r, base)

    rows = [{"iscc": entry_factory()["iscc_code"]} for i in range(6)]
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "d.parquet")

    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "list_repo_files", lambda ds, repo_type: ["d.parquet"])
    monkeypatch.setattr(
        huggingface_hub, "hf_hub_download", lambda ds, fn, repo_type: str(tmp_path / "d.parquet")
    )

    res = r.invoke(cli, ["hub", "fake/dataset", "--limit", "3"])
    assert res.exit_code == 0, res.output
    assert "limit reached" in res.output


def test_hub_command_no_parquet(runner, monkeypatch):
    r, _, base = runner
    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "list_repo_files", lambda ds, repo_type: ["README.md"])
    res = r.invoke(cli, ["hub", "fake/empty"])
    assert res.exit_code == 1
    assert "No parquet" in res.output


def test_serve_entry_point_in_process(monkeypatch):
    """Drive httpd.serve() end-to-end: boot on a memory backend, answer a
    request, then shut down cleanly via the captured server handle."""
    from iscc_search_tpu.options import SearchOptions
    from iscc_search_tpu.server import httpd as httpd_mod

    captured = {}
    real_make_server = httpd_mod.make_server

    def capture_make_server(*args, **kw):
        srv = real_make_server(*args, **kw)
        captured["srv"] = srv
        return srv

    monkeypatch.setattr(httpd_mod, "make_server", capture_make_server)
    # This test drives the wsgiref arm; the pooled transport's serve() arm
    # is covered in tests/test_pooled.py.
    opts = SearchOptions(index_uri="memory://", host="127.0.0.1", port=18321, http_backend="wsgiref")

    t = threading.Thread(target=httpd_mod.serve, args=(opts,), daemon=True)
    t.start()
    deadline = time.time() + 10
    status = None
    while time.time() < deadline:
        try:
            status = json.load(urllib.request.urlopen("http://127.0.0.1:18321/healthz", timeout=1))
            break
        except Exception:
            time.sleep(0.05)
    assert status == {"status": "ok"}
    captured["srv"].shutdown()
    t.join(timeout=10)
    assert not t.is_alive()
