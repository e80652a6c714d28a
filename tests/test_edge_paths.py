"""Error-branch coverage for commons, aggregator cursors, CLI ingest, and
the kv manager — the paths a misbehaving input or failing disk takes."""

import json

import pytest

from iscc_search_tpu import codec as ic
from iscc_search_tpu.aggregator.cursors import CursorStore, cursor_store_for
from iscc_search_tpu.cli.add import dict_to_entry
from iscc_search_tpu.indexes import common
from iscc_search_tpu.options import SearchOptions

from tests.conftest import make_iscc_id, make_unit


# ---------------------------------------------------------- parse_iscc_id


def test_parse_iscc_id_valid_roundtrip():
    iscc_id = make_iscc_id(42, realm_id=1)
    obj = common.parse_iscc_id(iscc_id, expected_realm=1)
    assert obj.realm_id == 1


@pytest.mark.parametrize(
    "bad,match",
    [
        ("no-prefix", "must start with"),
        ("ISCC:~~~~", "base32|invalid"),
        ("ISCC:" + "AA", "length"),  # too short to be a 10-byte ID digest
    ],
)
def test_parse_iscc_id_rejects_malformed(bad, match):
    with pytest.raises(ValueError, match=match):
        common.parse_iscc_id(bad)


def test_parse_iscc_id_rejects_wrong_maintype():
    unit = make_unit(ic.MT.DATA, 0, 64)
    with pytest.raises(ValueError, match="main type"):
        common.parse_iscc_id(unit)


def test_parse_iscc_id_rejects_wrong_length_field():
    # MT.ID header with a non-zero length field (claims a 128-bit ID)
    digest = ic.encode_header(ic.MT.ID, 0, ic.VS.V1, 1) + b"\x00" * 8
    with pytest.raises(ValueError, match="length field"):
        common.parse_iscc_id("ISCC:" + ic.encode_base32(digest))


def test_parse_iscc_id_rejects_realm_mismatch():
    iscc_id = make_iscc_id(7, realm_id=0)
    with pytest.raises(ValueError, match="[Rr]ealm"):
        common.parse_iscc_id(iscc_id, expected_realm=1)


# ------------------------------------------------------------ CursorStore


def test_cursor_store_ignores_foreign_network(tmp_path):
    p = tmp_path / "cursors.json"
    p.write_text(json.dumps({"network": "othernet", "cursors": {"1": 5}}))
    assert CursorStore(p, network="testnet").load() == {}


def test_cursor_store_ignores_malformed_payloads(tmp_path):
    p = tmp_path / "cursors.json"
    p.write_text(json.dumps({"network": "testnet", "cursors": "nope"}))
    assert CursorStore(p, network="testnet").load() == {}
    p.write_text(json.dumps({"network": "testnet", "cursors": {"1": 5, "x": "y", "2": None}}))
    assert CursorStore(p, network="testnet").load() == {1: 5}


def test_cursor_store_save_failure_is_non_fatal(tmp_path):
    blocker = tmp_path / "blocked"
    blocker.write_text("file, not a dir")
    store = CursorStore(blocker / "cursors.json", network="testnet")
    store.save({1: 5})  # parent mkdir fails under a file -> warn, no raise
    assert store.load() == {}


def test_cursor_store_for_uri_gating(tmp_path):
    mem = SearchOptions(index_uri="memory://", aggregator_network="testnet")
    assert cursor_store_for(mem) is None
    off = SearchOptions(index_uri=f"tpu://{tmp_path}")
    assert cursor_store_for(off) is None  # aggregator mode off
    on = SearchOptions(index_uri=f"tpu://{tmp_path}", aggregator_network="testnet")
    cs = cursor_store_for(on)
    assert cs is not None and str(tmp_path) in str(cs.path)


# ----------------------------------------------------------- dict_to_entry


def test_dict_to_entry_none_without_code_or_units():
    assert dict_to_entry({"metadata": {"name": "x"}}) is None


def test_dict_to_entry_generates_random_id():
    units = [make_unit(ic.MT.DATA, 0, 64), make_unit(ic.MT.INSTANCE, 0, 64)]
    e = dict_to_entry({"iscc": ic.gen_iscc_code_v0(units)["iscc"]})
    assert e.iscc_id.startswith("ISCC:")
    assert len(e.units) == 2  # decomposed from the code


def test_dict_to_entry_features_to_simprints():
    units = [make_unit(ic.MT.DATA, 0, 64), make_unit(ic.MT.INSTANCE, 0, 64)]
    features = [
        {
            "maintype": "content",
            "subtype": "text",
            "version": 0,
            "simprints": [ic.encode_base64(bytes(range(8)))],
            "offsets": [0],
            "sizes": [100],
        }
    ]
    e = dict_to_entry({"iscc_id": make_iscc_id(1), "units": units, "features": features})
    assert "CONTENT_TEXT_V0" in e.simprints
    e2 = dict_to_entry(
        {"iscc_id": make_iscc_id(2), "units": units, "features": features}, include_simprints=False
    )
    assert e2.simprints is None


# ------------------------------------------------------------- kv manager


def test_kv_manager_list_skips_corrupt_index(tmp_path):
    from iscc_search_tpu.indexes.kv import KvIndexManager
    from iscc_search_tpu.schema import IsccIndex

    mgr = KvIndexManager(tmp_path)
    mgr.create_index(IsccIndex(name="good"))
    # A directory that looks like an index but has a corrupt store
    bad = tmp_path / "bad" / "store"
    bad.mkdir(parents=True)
    (bad / "store.log").write_bytes(b"\xff" * 7)  # torn garbage; open may still succeed
    names = [i.name for i in mgr.list_indexes()]
    assert "good" in names
    mgr.sync("good")  # durability barrier path
    mgr.close()


def test_file_to_entry_invalid_entry_warns(tmp_path):
    from iscc_search_tpu.cli.add import file_to_entry

    bad = tmp_path / "bad.iscc.json"
    bad.write_text(json.dumps({"iscc_id": make_iscc_id(1), "units": [make_unit(3, 0, 64)]}))  # min 2
    assert file_to_entry(bad) is None  # warn-and-skip, not raise
    nocode = tmp_path / "empty.iscc.json"
    nocode.write_text(json.dumps({"metadata": {"name": "x"}}))
    assert file_to_entry(nocode) is None


def test_add_single_file_with_invalid_entry_skips(tmp_path):
    from click.testing import CliRunner

    from iscc_search_tpu.cli import cli
    from iscc_search_tpu.cli import common as cli_common
    from iscc_search_tpu.config import ConfigManager

    manager = ConfigManager(config_dir=tmp_path / "cfg")
    cli_common.set_config_manager(manager)
    try:
        r = CliRunner()
        r.invoke(cli, ["index", "add", "main", "--path", str(tmp_path / "data")])
        bad = tmp_path / "bad.iscc.json"
        bad.write_text(json.dumps({"iscc_id": make_iscc_id(5), "units": [make_unit(3, 0, 64)]}))
        result = r.invoke(cli, ["add", str(bad)])
        assert result.exit_code == 0, result.output
        assert "0 created" in result.output and "1 skipped" in result.output
    finally:
        cli_common.set_config_manager(None)


def test_kv_manager_cold_load_and_sync(tmp_path):
    from iscc_search_tpu.indexes.kv import KvIndexManager
    from iscc_search_tpu.schema import IsccIndex

    mgr = KvIndexManager(tmp_path)
    mgr.create_index(IsccIndex(name="cold"))
    mgr.close()
    # A fresh manager must lazily load the existing index from disk
    mgr2 = KvIndexManager(tmp_path)
    info = mgr2.get_index("cold")
    assert info.name == "cold" and info.assets == 0
    mgr2.sync("cold")
    mgr2.close()
