"""CLI tests via click's CliRunner against local tpu-backed indexes."""

import json

import pytest
from click.testing import CliRunner

from iscc_search_tpu.cli import cli
from iscc_search_tpu.cli import common as cli_common
from iscc_search_tpu.cli.common import parse_simprints_from_features
from iscc_search_tpu.config import ConfigManager


@pytest.fixture
def runner(tmp_path, monkeypatch):
    manager = ConfigManager(config_dir=tmp_path / "cfg")
    cli_common.set_config_manager(manager)
    yield CliRunner(), manager, tmp_path
    cli_common.set_config_manager(None)


def write_iscc_json(path, entry):
    path.write_text(json.dumps(entry))


def test_version(runner):
    r, _, _ = runner
    result = r.invoke(cli, ["version"])
    assert result.exit_code == 0
    assert "iscc-search-tpu" in result.output


def test_index_add_list_use_remove(runner, tmp_path):
    r, manager, base = runner
    result = r.invoke(cli, ["index", "add", "main", "--path", str(base / "data")])
    assert result.exit_code == 0, result.output
    result = r.invoke(cli, ["index", "list"])
    assert "main" in result.output
    result = r.invoke(cli, ["index", "add", "second", "--path", str(base / "data2"), "--no-use"])
    assert result.exit_code == 0
    result = r.invoke(cli, ["index", "use", "second"])
    assert result.exit_code == 0
    assert manager.get_active()[0] == "second"
    result = r.invoke(cli, ["index", "remove", "second"])
    assert result.exit_code == 0
    assert manager.get_active()[0] == "main"


def test_index_add_remote(runner):
    r, manager, _ = runner
    result = r.invoke(cli, ["index", "add", "prod", "--url", "https://api.example.com"])
    assert result.exit_code == 0
    cfg = manager.list()["prod"]
    assert cfg.type == "remote"


def test_add_get_search_flow(runner, entry_factory):
    r, manager, base = runner
    r.invoke(cli, ["index", "add", "main", "--path", str(base / "data")])

    entry = entry_factory(metadata={"name": "CLI asset"})
    src = base / "one.iscc.json"
    write_iscc_json(src, entry)

    result = r.invoke(cli, ["add", str(src)])
    assert result.exit_code == 0, result.output
    assert "1 created" in result.output

    result = r.invoke(cli, ["get", entry["iscc_id"]])
    assert result.exit_code == 0, result.output
    assert entry["iscc_id"] in result.output.replace("\n", "")

    result = r.invoke(cli, ["search", entry["iscc_code"], "--json"])
    assert result.exit_code == 0, result.output
    assert entry["iscc_id"] in result.output.replace("\n", "")


def test_add_directory_glob(runner, entry_factory):
    r, manager, base = runner
    r.invoke(cli, ["index", "add", "main", "--path", str(base / "data")])
    d = base / "files"
    d.mkdir()
    for i in range(3):
        write_iscc_json(d / f"a{i}.iscc.json", entry_factory())
    result = r.invoke(cli, ["add", str(d)])
    assert result.exit_code == 0, result.output
    assert "3 created" in result.output


def test_add_no_files(runner):
    r, _, base = runner
    r.invoke(cli, ["index", "add", "main", "--path", str(base / "data")])
    result = r.invoke(cli, ["add", str(base / "nothing-*.json")])
    assert result.exit_code == 1


def test_get_missing(runner, entry_factory):
    r, _, base = runner
    r.invoke(cli, ["index", "add", "main", "--path", str(base / "data")])
    src = base / "one.iscc.json"
    write_iscc_json(src, entry_factory())
    r.invoke(cli, ["add", str(src)])
    result = r.invoke(cli, ["get", "ISCC:MAIGIIFJRDGEQQAA"])
    assert result.exit_code == 1


def test_rebuild_all(runner, entry_factory):
    r, _, base = runner
    r.invoke(cli, ["index", "add", "main", "--path", str(base / "data")])
    src = base / "one.iscc.json"
    write_iscc_json(src, entry_factory())
    r.invoke(cli, ["add", str(src)])
    result = r.invoke(cli, ["index", "rebuild", "--all"])
    assert result.exit_code == 0, result.output
    assert "Rebuilt unit types" in result.output


def test_rebuild_requires_selector(runner):
    r, _, base = runner
    r.invoke(cli, ["index", "add", "main", "--path", str(base / "data")])
    result = r.invoke(cli, ["index", "rebuild"])
    assert result.exit_code == 1


def test_parse_simprints_from_features():
    features = [
        {
            "maintype": "semantic",
            "subtype": "text",
            "version": 0,
            "simprints": ["AAAAAAAAAAAAAAAAAAAAAA", "__________________hello"],
            "offsets": [0, 100],
            "sizes": [50, 60],
        }
    ]
    out = parse_simprints_from_features(features)
    assert list(out) == ["SEMANTIC_TEXT_V0"]
    assert out["SEMANTIC_TEXT_V0"][0] == {"simprint": "AAAAAAAAAAAAAAAAAAAAAA", "offset": 0, "size": 50}


def test_parse_simprints_truncation():
    from iscc_search_tpu import codec as ic

    sp = ic.encode_base64(bytes(range(32)))
    features = [
        {"maintype": "content", "subtype": "text", "version": 0, "simprints": [sp], "offsets": [0], "sizes": [10]}
    ]
    out = parse_simprints_from_features(features, simprint_bits=128)
    got = ic.decode_base64(out["CONTENT_TEXT_V0"][0]["simprint"])
    assert got == bytes(range(16))


def test_parse_simprints_skips_incomplete():
    assert parse_simprints_from_features([]) is None
    assert parse_simprints_from_features([{"maintype": "", "subtype": "text", "simprints": ["x"]}]) is None


def test_add_ndjson(runner, entry_factory):
    r, manager, base = runner
    r.invoke(cli, ["index", "add", "main", "--path", str(base / "data")])
    nd = base / "bulk.ndjson"
    lines = [json.dumps(entry_factory()) for _ in range(5)]
    nd.write_text("\n".join(lines) + "\n\n{invalid\n")
    result = r.invoke(cli, ["add", str(nd)])
    assert result.exit_code == 0, result.output
    assert "5 created" in result.output


def test_serve_multi_worker_dispatches_scaleout(runner, tmp_path, monkeypatch):
    """workers > 1 with a persistent backend runs the scale-out topology
    (previously rejected); serve() must receive the worker count."""
    served = []
    monkeypatch.setattr("iscc_search_tpu.server.httpd.serve", lambda opts: served.append(opts))
    r, _, base = runner
    result = r.invoke(
        cli, ["serve", "--workers", "2", "--index-uri", f"tpu://{base}/srv"]
    )
    assert result.exit_code == 0, result.output
    assert served and served[-1].workers == 2


def test_serve_rejects_multi_worker_aggregator(runner, monkeypatch):
    import iscc_search_tpu.options as opts_mod

    r, _, _ = runner
    monkeypatch.setattr(opts_mod, "search_opts", opts_mod.SearchOptions(
        index_uri="memory://", aggregator_network="testnet"))
    result = r.invoke(cli, ["serve", "--workers", "2", "--index-uri", "memory://"])
    assert result.exit_code == 1


def test_datasets_command_listing(runner, monkeypatch):
    """`datasets` renders a table from the HF API (mocked — no network)."""
    r, _, _ = runner
    import types

    class FakeInfo:
        def __init__(self, i):
            self.id = f"org/iscc-set-{i}"
            self.downloads = i * 10
            self.last_modified = "2026-01-01T00:00:00"

    class FakeApi:
        def list_datasets(self, search=None, limit=None):
            assert search == "iscc"
            return [FakeInfo(i) for i in range(3)]

    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "HfApi", FakeApi)
    from iscc_search_tpu.cli import cli

    res = r.invoke(cli, ["datasets"])
    assert res.exit_code == 0
    assert "iscc-set-0" in res.output


def test_datasets_command_empty(runner, monkeypatch):
    r, _, _ = runner

    class FakeApi:
        def list_datasets(self, search=None, limit=None):
            return []

    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "HfApi", FakeApi)
    from iscc_search_tpu.cli import cli

    res = r.invoke(cli, ["datasets", "--search", "nothing"])
    assert res.exit_code == 0
    assert "No datasets found" in res.output


def test_cli_command_surface(runner):
    """Pin the top-level command surface (reference CLI parity set)."""
    r, _, _ = runner
    from iscc_search_tpu.cli import cli

    res = r.invoke(cli, ["--help"])
    assert res.exit_code == 0
    for cmd in ("add", "get", "search", "serve", "index", "hub", "datasets", "version"):
        assert cmd in res.output, cmd
    res = r.invoke(cli, ["index", "--help"])
    assert res.exit_code == 0
    for sub in ("add", "list", "use", "remove", "rebuild"):
        assert sub in res.output, sub
