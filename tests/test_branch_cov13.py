"""Branch coverage round 13: CLI rendering/validation arms (search chunk
tables, add pattern/simprint arms, index remove/rebuild gates, serve
aggregator-worker gate, datasets table fallbacks, unknown config type)."""

import json

import pytest
from click.testing import CliRunner

from iscc_search_tpu.cli import cli
from iscc_search_tpu.cli import common as cli_common
from iscc_search_tpu.config import ConfigManager
from iscc_search_tpu.schema import IsccQuery, IsccSearchResult

from tests.conftest import make_iscc_id


@pytest.fixture
def runner(tmp_path):
    manager = ConfigManager(config_dir=tmp_path / "cfg")
    cli_common.set_config_manager(manager)
    yield CliRunner(), manager, tmp_path
    cli_common.set_config_manager(None)


class _StubIndex:
    def __init__(self, result):
        self.result = result

    def search_assets(self, name, query, limit):
        return self.result

    def close(self):
        pass


def _result(global_matches=(), chunk_matches=()):
    return IsccSearchResult(
        query=IsccQuery(iscc_id=make_iscc_id(1)),
        global_matches=list(global_matches),
        chunk_matches=list(chunk_matches),
    )


_CHUNK = {
    "iscc_id": make_iscc_id(2),
    "score": 0.75,
    "types": {"CONTENT_TEXT_V0": {"score": 0.75, "matches": 2, "queried": 3}},
}
_GLOBAL = {"iscc_id": make_iscc_id(3), "score": 0.9, "types": {"DATA_NONE_V0": 0.9}}


def test_search_renders_chunk_only_result(runner, monkeypatch):
    r, _, _ = runner
    stub = _StubIndex(_result(chunk_matches=[_CHUNK]))
    monkeypatch.setattr("iscc_search_tpu.cli.search.get_active_index", lambda n: (stub, "t"))
    result = r.invoke(cli, ["search", make_iscc_id(1)])
    assert result.exit_code == 0, result.output
    assert "Chunk matches" in result.output
    assert "No matches" not in result.output


def test_search_renders_global_and_chunk_result(runner, monkeypatch):
    r, _, _ = runner
    stub = _StubIndex(_result(global_matches=[_GLOBAL], chunk_matches=[_CHUNK]))
    monkeypatch.setattr("iscc_search_tpu.cli.search.get_active_index", lambda n: (stub, "t"))
    result = r.invoke(cli, ["search", make_iscc_id(1)])
    assert result.exit_code == 0, result.output
    assert "Global matches" in result.output and "Chunk matches" in result.output


def test_add_pattern_with_directory_prefix(runner, tmp_path):
    r, manager, base = runner
    r.invoke(cli, ["index", "add", "main", "--path", str(base / "data")])
    sub = tmp_path / "docs"
    sub.mkdir()
    (sub / "a.iscc.json").write_text(
        json.dumps({"iscc_id": make_iscc_id(5), "iscc": "ISCC:KACYPXW445FTYNJ3CYSXHAFJMA2HUWULUNRFE3BLHRSCXYH2M5AEGQY"})
    )
    result = r.invoke(cli, ["add", str(sub / "*.iscc.json")])
    assert result.exit_code == 0, result.output


def test_add_with_simprint_bits_option(runner, tmp_path):
    r, manager, base = runner
    r.invoke(cli, ["index", "add", "main", "--path", str(base / "data")])
    f = tmp_path / "b.iscc.json"
    f.write_text(
        json.dumps({"iscc_id": make_iscc_id(6), "iscc": "ISCC:KACYPXW445FTYNJ3CYSXHAFJMA2HUWULUNRFE3BLHRSCXYH2M5AEGQY"})
    )
    result = r.invoke(cli, ["add", str(f), "--simprint-bits", "64"])
    assert result.exit_code == 0, result.output


def test_dict_to_entry_features_without_usable_simprints():
    from iscc_search_tpu.cli.add import dict_to_entry

    entry = dict_to_entry(
        {
            "iscc": "ISCC:KACYPXW445FTYNJ3CYSXHAFJMA2HUWULUNRFE3BLHRSCXYH2M5AEGQY",
            "features": [{"maintype": "content", "subtype": "text", "version": 0, "simprints": []}],
        }
    )
    assert entry is not None and entry.simprints is None


def test_index_remove_with_delete_data_on_unconfigured_dir(runner, tmp_path):
    """--delete-data with a cfg that vanished mid-call: the guard skips rm."""
    r, manager, base = runner
    r.invoke(cli, ["index", "add", "main", "--path", str(base / "data")])
    r.invoke(cli, ["index", "add", "aux", "--path", str(base / "aux"), "--no-use"])
    result = r.invoke(cli, ["index", "remove", "aux", "--delete-data"])
    assert result.exit_code == 0, result.output


def test_index_rebuild_all_flag_gate(runner, tmp_path):
    r, manager, base = runner
    r.invoke(cli, ["index", "add", "main", "--path", str(base / "data")])
    result = r.invoke(cli, ["index", "rebuild"])
    assert result.exit_code == 1
    assert "--all" in result.output
    result = r.invoke(cli, ["index", "rebuild", "--all"])
    assert result.exit_code == 0, result.output


def test_serve_aggregator_single_worker_passes_gate(runner, monkeypatch):
    r, _, _ = runner
    called = {}
    monkeypatch.setattr(
        "iscc_search_tpu.server.httpd.serve", lambda opts: called.update(ok=True)
    )
    # the CLI builds from the module-level search_opts singleton — env vars
    # set at invoke time are too late, so swap the singleton itself
    from iscc_search_tpu.options import SearchOptions

    monkeypatch.setattr(
        "iscc_search_tpu.options.search_opts",
        SearchOptions(index_uri="memory://", aggregator_network="testnet"),
    )
    result = r.invoke(cli, ["serve", "--workers", "1"])
    assert result.exit_code == 0, result.output
    assert called == {"ok": True}


def test_datasets_row_attribute_fallbacks(runner, monkeypatch):
    r, _, _ = runner

    class Row:
        def __init__(self, id, **attrs):
            self.id = id
            for k, v in attrs.items():
                setattr(self, k, v)

    class FakeApi:
        def list_datasets(self, search, limit):
            return [
                Row("org/full", downloads=12, last_modified="2026-01-01T00:00:00"),
                Row("org/bare"),
            ]

    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "HfApi", FakeApi)
    result = r.invoke(cli, ["datasets"])
    assert result.exit_code == 0, result.output
    assert "org/full" in result.output and "org/bare" in result.output


def test_get_active_index_unknown_config_type(runner):
    _, manager, _ = runner

    class Weird:
        pass

    manager.config.indexes["w"] = None  # placeholder; replaced below
    manager.config.indexes["w"] = Weird()
    with pytest.raises(ValueError, match="Unknown index type"):
        cli_common.get_active_index("w")
