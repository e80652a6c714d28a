"""SearchOptions env loading, override validation, and backend factory tests."""

import pytest

from iscc_search_tpu.indexes.kv import KvIndexManager
from iscc_search_tpu.indexes.memory import MemoryIndex
from iscc_search_tpu.indexes.tpu import TpuIndexManager
from iscc_search_tpu.options import SearchOptions, get_index


def test_defaults():
    opts = SearchOptions()
    assert opts.match_threshold_units == 0.75
    assert opts.confidence_exponent == 4
    assert opts.oversampling_factor == 20
    assert opts.flush_interval == 100000
    assert opts.scan_recall_target is None
    assert not opts.aggregator_mode


def test_from_env():
    env = {
        "ISCC_SEARCH_INDEX_URI": "memory://",
        "ISCC_SEARCH_PORT": "9001",
        "ISCC_SEARCH_MATCH_THRESHOLD_UNITS": "0.5",
        "ISCC_SEARCH_SCAN_RECALL_TARGET": "0.95",
        "ISCC_SEARCH_AGGREGATOR_NETWORK": "testnet",
        "ISCC_SEARCH_CORS_ORIGINS": "https://a.com, https://b.com",
        "UNRELATED": "x",
    }
    opts = SearchOptions.from_env(env)
    assert opts.index_uri == "memory://"
    assert opts.port == 9001
    assert opts.match_threshold_units == 0.5
    assert opts.scan_recall_target == 0.95
    assert opts.aggregator_mode
    assert opts.aggregator_index_name == "idptest"
    assert opts.cors_origins_list == ["https://a.com", "https://b.com"]


def test_invalid_network_rejected():
    with pytest.raises(ValueError):
        SearchOptions(aggregator_network="devnet")


def test_override_validates():
    opts = SearchOptions()
    new = opts.override({"match_threshold_units": 0.9})
    assert new.match_threshold_units == 0.9
    assert opts.match_threshold_units == 0.75  # original untouched
    with pytest.raises(Exception):
        opts.override({"match_threshold_units": 2.0})


def test_hub_list_source():
    opts = SearchOptions(aggregator_network="mainnet")
    assert "mainnet.yaml" in opts.aggregator_hub_list_source
    opts2 = SearchOptions(aggregator_network="mainnet", aggregator_hub_list_url="/tmp/hubs.yaml")
    assert opts2.aggregator_hub_list_source == "/tmp/hubs.yaml"


def test_factory_memory():
    assert isinstance(get_index("memory://"), MemoryIndex)


def test_factory_kv_and_alias(tmp_path):
    idx = get_index(f"kv://{tmp_path}/kv1")
    assert isinstance(idx, KvIndexManager)
    idx.close()
    idx = get_index(f"lmdb://{tmp_path}/kv2")
    assert isinstance(idx, KvIndexManager)
    idx.close()


def test_factory_tpu_and_alias(tmp_path):
    idx = get_index(f"tpu://{tmp_path}/t1")
    assert isinstance(idx, TpuIndexManager)
    idx.close()
    idx = get_index(f"usearch://{tmp_path}/t2")
    assert isinstance(idx, TpuIndexManager)
    idx.close()


def test_factory_rejects_bad_uris(tmp_path):
    with pytest.raises(ValueError):
        get_index(str(tmp_path))  # no scheme
    with pytest.raises(ValueError):
        get_index("postgres://localhost/db")


def test_configuration_doc_in_sync():
    """docs/reference/configuration.md must match what the generator renders from
    SearchOptions — the doc can't silently drift from the code."""
    import importlib.util
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location("gen_config_doc", root / "scripts" / "gen_config_doc.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert (root / "docs" / "reference" / "configuration.md").read_text() == mod.render()


def test_cors_origins_parsing():
    opts = SearchOptions(cors_origins="*")
    assert opts.cors_origins_list == ["*"]
    opts = SearchOptions(cors_origins="https://a.example, https://b.example")
    assert opts.cors_origins_list == ["https://a.example", "https://b.example"]


def test_override_none_and_empty():
    from iscc_search_tpu.options import search_opts

    base = SearchOptions(port=1234)
    assert base.override(None).port == 1234
    assert base.override({}).port == 1234
    multi = base.override({"port": 9}).override({"host": "1.2.3.4"})
    assert (multi.port, multi.host) == (9, "1.2.3.4")


def test_extra_env_fields_ignored(monkeypatch):
    monkeypatch.setenv("ISCC_SEARCH_NO_SUCH_OPTION", "x")
    assert SearchOptions().index_uri  # construction unaffected


def test_aggregator_network_empty_disables():
    opts = SearchOptions(aggregator_network="")
    assert not opts.aggregator_mode


def test_override_returns_new_object_and_chains():
    from iscc_search_tpu.options import SearchOptions

    base = SearchOptions(index_uri="memory://", port=1234)
    first = base.override({"port": 4321})
    second = first.override({"host": "127.0.0.9"})
    assert base.port == 1234  # original untouched
    assert (first.port, second.port) == (4321, 4321)
    assert second.host == "127.0.0.9"
    assert second.index_uri == "memory://"


def test_http_transport_options_env(monkeypatch):
    from iscc_search_tpu.options import SearchOptions

    monkeypatch.setenv("ISCC_SEARCH_HTTP_BACKEND", "wsgiref")
    monkeypatch.setenv("ISCC_SEARCH_HTTP_THREADS", "7")
    opts = SearchOptions.from_env()
    assert opts.http_backend == "wsgiref"
    assert opts.http_threads == 7


def test_http_backend_validation():
    from iscc_search_tpu.options import SearchOptions

    with pytest.raises(Exception):
        SearchOptions(http_backend="uvicorn")
    with pytest.raises(Exception):
        SearchOptions(http_threads=0)


def test_get_index_default_path(monkeypatch, tmp_path):
    import iscc_search_tpu
    from iscc_search_tpu.options import SearchOptions, get_index

    class FakeDirs:
        user_data_dir = str(tmp_path / "default-data")

    monkeypatch.setattr(iscc_search_tpu, "dirs", FakeDirs())
    opts = SearchOptions()
    assert "default-data" in opts.index_uri
    index = get_index(opts.index_uri)
    try:
        assert index.list_indexes() == []
    finally:
        index.close()
