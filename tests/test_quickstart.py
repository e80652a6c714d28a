"""The quickstart tutorial (docs/tutorials/getting-started.md) must stay runnable end-to-end:
create index -> add NDJSON -> search -> get -> rebuild, via the real CLI."""

import json

from click.testing import CliRunner

from iscc_search_tpu.cli import cli

CODE1 = "ISCC:KACYPXW445FTYNJ3CYSXHAFJMA2HUWULUNRFE3BLHRSCXYH2M5AEGQY"
CODE2 = "ISCC:KACT4EBWK27737D2AYCJRAL5Z36G76RFRMO4554RU26HZ4ORJGIVHDI"


def test_quickstart_flow(tmp_path, monkeypatch):
    from iscc_search_tpu.cli import common as cli_common

    monkeypatch.setenv("HOME", str(tmp_path))
    # Drop any manager another test left cached so the tutorial resolves
    # its config from the (patched) HOME, exactly as a fresh shell would.
    cli_common.set_config_manager(None)
    r = CliRunner()

    def run(*args):
        res = r.invoke(cli, list(args), catch_exceptions=False)
        assert res.exit_code == 0, (args, res.output)
        return res.output

    assert "iscc-search-tpu" in run("version")
    run("index", "add", "mylib", "--path", str(tmp_path / "data"))
    assert "mylib" in run("index", "list")

    ndjson = tmp_path / "assets.ndjson"
    ndjson.write_text(
        json.dumps({"iscc_id": "ISCC:MAIAAAAAAAAAAAAB", "iscc_code": CODE1, "metadata": {"name": "sample one"}})
        + "\n"
        + json.dumps({"iscc_id": "ISCC:MAIAAAAAAAAAAAAC", "iscc_code": CODE2, "metadata": {"name": "sample two"}})
        + "\n"
    )
    out = run("add", str(ndjson))
    assert "2 created" in out
    out = run("add", str(ndjson))  # idempotent re-add (no derived work; reports updated)
    assert "2 updated" in out

    assert "MAIAAAAAAAAAAAAB" in run("search", CODE1)
    assert "sample one" in run("get", "ISCC:MAIAAAAAAAAAAAAB")
    assert "Rebuilt" in run("index", "rebuild", "mylib", "--all")
