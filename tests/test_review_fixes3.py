"""Regression tests for the round-2 server/CLI/config review findings.

Each test pins one fixed defect:
1. discover() registered the index directory itself as the manager base
   path, so discovered indexes silently opened an empty nested index.
2. One row failing pydantic validation aborted the whole bulk ingest (and
   skipped index.close()).
3. dict_to_entry keyed the 'iscc' fallback on missing units instead of
   missing iscc_code, clobbering an explicit iscc_code.
4. search?limit=-1 reached the device top-k (500) or dropped the best
   match via negative slicing; now 422.
5. The CLI search command routed any 16-char body to an iscc_id lookup,
   misrouting valid 64-bit single-unit codes.
6. 404/405 fallback responses lacked CORS headers.
7. compare_digest(str, str) raised TypeError (-> 500) on non-ASCII keys.
"""

import json

import pytest
from click.testing import CliRunner

from iscc_search_tpu import codec as ic
from iscc_search_tpu.cli import cli
from iscc_search_tpu.cli import common as cli_common
from iscc_search_tpu.cli.add import dict_to_entry
from iscc_search_tpu.cli.search import _is_iscc_id
from iscc_search_tpu.config import ConfigManager
from iscc_search_tpu.indexes.tpu import TpuIndexManager
from iscc_search_tpu.schema import IsccIndex

from tests.conftest import make_iscc_id, make_unit


@pytest.fixture
def runner(tmp_path):
    manager = ConfigManager(config_dir=tmp_path / "cfg")
    cli_common.set_config_manager(manager)
    yield CliRunner(), manager, tmp_path
    cli_common.set_config_manager(None)


# 1. ---------------------------------------------------------------------


def test_discover_registers_base_path_not_index_dir(tmp_path, runner):
    r, manager, base = runner
    data = base / "data"
    backend = TpuIndexManager(data)
    backend.create_index(IsccIndex(name="photos"))
    backend.close()

    found = manager.discover(data)
    assert found == ["photos"]
    cfg = manager.list()["photos"]
    # The registered path must be the manager BASE dir: consumers open
    # TpuIndexManager(cfg.path).get_index('photos') -> {path}/photos/store.
    assert cfg.path == str(data.resolve())
    index, name = cli_common.get_active_index("photos")
    try:
        # Resolves the EXISTING index (0 assets but present), not a fresh
        # nested one at data/photos/photos.
        assert index.get_index("photos").name == "photos"
        assert not (data / "photos" / "photos").exists()
    finally:
        index.close()


# 2. ---------------------------------------------------------------------


def test_add_skips_validation_failures_without_aborting(runner, entry_factory):
    r, manager, base = runner
    r.invoke(cli, ["index", "add", "main", "--path", str(base / "data")])
    nd = base / "bulk.ndjson"
    bad = {"iscc_id": make_iscc_id(999), "units": [make_unit(2, 0, 64)]}  # min_length=2 violated
    lines = [json.dumps(entry_factory()) for _ in range(3)]
    lines.insert(1, json.dumps(bad))
    nd.write_text("\n".join(lines) + "\n")
    result = r.invoke(cli, ["add", str(nd)])
    assert result.exit_code == 0, result.output
    assert "3 created" in result.output


# 3. ---------------------------------------------------------------------


def test_dict_to_entry_iscc_fallback_keys_on_missing_iscc_code():
    units = [make_unit(3, 0, 64), make_unit(4, 0, 64)]
    code_a = ic.gen_iscc_code_v0(units)["iscc"]
    other_units = [make_unit(3, 0, 64), make_unit(4, 0, 64)]
    code_b = ic.gen_iscc_code_v0(other_units)["iscc"]

    # Explicit iscc_code must not be clobbered by the 'iscc' alias
    e = dict_to_entry({"iscc_id": make_iscc_id(1), "iscc_code": code_a, "iscc": code_b})
    assert e.iscc_code == code_a

    # 'iscc' fills in iscc_code even when units are present
    e = dict_to_entry({"iscc_id": make_iscc_id(2), "units": units, "iscc": code_b})
    assert e.iscc_code == code_b


# 4. ---------------------------------------------------------------------


@pytest.fixture
def client(tmp_path):
    import httpx

    from iscc_search_tpu.options import SearchOptions, get_index
    from iscc_search_tpu.server.app import create_app

    opts = SearchOptions(index_uri=f"tpu://{tmp_path / 'srv'}", cors_origins="https://ui.example")
    index = get_index(opts.index_uri)
    app = create_app(index=index, opts=opts)
    transport = httpx.WSGITransport(app=app)
    with httpx.Client(transport=transport, base_url="http://testserver") as c:
        yield c
    index.close()


def test_search_limit_below_one_is_422(client):
    client.post("/indexes", json={"name": "idx"})
    for bad in ("-1", "0"):
        r = client.get(f"/indexes/idx/search?iscc_code=ISCC:AAAAAAAAAAAAAAAA&limit={bad}")
        assert r.status_code == 422, r.text
    r = client.get("/indexes/idx/search?iscc_code=x&limit=abc")
    assert r.status_code == 422


# 5. ---------------------------------------------------------------------


def test_cli_search_routes_by_header_maintype():
    unit_64 = make_unit(3, 0, 64)  # CONTENT unit: 16 body chars, same as an ID
    assert not _is_iscc_id(unit_64)
    assert _is_iscc_id(make_iscc_id(7))
    assert not _is_iscc_id("not-an-iscc")


# 6. ---------------------------------------------------------------------


def test_fallback_responses_carry_cors_headers(client):
    r = client.get("/definitely/not/a/route", headers={"Origin": "https://ui.example"})
    assert r.status_code == 404
    assert r.headers.get("Access-Control-Allow-Origin") == "https://ui.example"
    r = client.request("DELETE", "/healthz", headers={"Origin": "https://ui.example"})
    assert r.status_code == 405
    assert r.headers.get("Access-Control-Allow-Origin") == "https://ui.example"


# 7. ---------------------------------------------------------------------


def test_non_ascii_api_key_is_401_not_500():
    # httpx refuses to SEND non-ASCII headers, but raw WSGI delivers them
    # (latin-1), so exercise verify_api_key directly.
    from types import SimpleNamespace

    from iscc_search_tpu.options import SearchOptions
    from iscc_search_tpu.server import auth
    from iscc_search_tpu.server.wsgi import HTTPError

    opts = SearchOptions(index_uri="memory://", api_secret="secret")
    req = SimpleNamespace(headers={"x-api-key": "s\u00e9cret"})
    with pytest.raises(HTTPError) as exc_info:
        auth.verify_api_key(req, opts)
    assert exc_info.value.status == 401
    auth.verify_api_key(SimpleNamespace(headers={"x-api-key": "secret"}), opts)
