"""ConfigManager tests (persistent CLI multi-index config)."""

import json

import pytest

from iscc_search_tpu.config import ConfigManager, LocalIndexConfig, RemoteIndexConfig


@pytest.fixture
def manager(tmp_path):
    return ConfigManager(config_dir=tmp_path / "cfg")


def test_empty_config(manager):
    assert manager.list() == {}
    assert manager.get_active() is None


def test_add_local_and_activate(manager, tmp_path):
    manager.add_local("main", tmp_path / "data")
    name, cfg = manager.get_active()
    assert name == "main"
    assert isinstance(cfg, LocalIndexConfig)
    assert cfg.scheme == "tpu"


def test_add_duplicate_raises(manager, tmp_path):
    manager.add_local("main", tmp_path)
    with pytest.raises(ValueError):
        manager.add_local("main", tmp_path)


def test_add_remote(manager):
    manager.add_remote("prod", "https://api.example.com", "idx", api_key="k")
    _, cfg = manager.get_active()
    assert isinstance(cfg, RemoteIndexConfig)
    assert cfg.url == "https://api.example.com"
    assert cfg.api_key == "k"


def test_use_and_remove(manager, tmp_path):
    manager.add_local("a", tmp_path / "a")
    manager.add_local("b", tmp_path / "b", use=False)
    assert manager.get_active()[0] == "a"
    manager.use("b")
    assert manager.get_active()[0] == "b"
    with pytest.raises(KeyError):
        manager.use("missing")
    manager.remove("b")
    assert manager.get_active()[0] == "a"
    with pytest.raises(KeyError):
        manager.remove("b")


def test_persistence_across_instances(manager, tmp_path):
    manager.add_local("main", tmp_path / "data")
    m2 = ConfigManager(config_dir=manager.config_dir)
    assert "main" in m2.list()
    assert m2.get_active()[0] == "main"


def test_corrupt_config_recovers(manager, tmp_path):
    manager.add_local("main", tmp_path)
    manager.config_path.write_text("{invalid json")
    m2 = ConfigManager(config_dir=manager.config_dir)
    assert m2.list() == {}  # fresh start instead of crash


def test_discover(manager, tmp_path):
    base = tmp_path / "indexes"
    (base / "alpha" / "store").mkdir(parents=True)
    (base / "beta" / "store").mkdir(parents=True)
    (base / "notanindex").mkdir()
    found = manager.discover(base)
    assert found == ["alpha", "beta"]
    assert manager.get_active()[0] == "alpha"
    # Re-discovery is a no-op
    assert manager.discover(base) == []


# ---------------------------------------------------------------- persistence


def test_save_and_reload_roundtrip(manager, tmp_path):
    manager.add_local("a", tmp_path / "da")
    manager.add_remote("b", "https://api.example.com", "remote-b", api_key="k2", use=False)
    fresh = ConfigManager(config_dir=manager.config_dir)
    assert set(fresh.list()) == {"a", "b"}
    assert fresh.get_active()[0] == "a"
    assert fresh.list()["b"].index_name == "remote-b"


def test_save_is_atomic_tmp_then_replace(manager, tmp_path):
    manager.add_local("a", tmp_path / "da")
    assert manager.config_path.exists()
    assert not manager.config_path.with_suffix(".tmp").exists()
    data = json.loads(manager.config_path.read_text())
    assert data["version"] == 1
    assert data["indexes"]["a"]["type"] == "local"


def test_corrupt_config_file_starts_fresh(tmp_path):
    cfg_dir = tmp_path / "cfg"
    cfg_dir.mkdir()
    (cfg_dir / "config.json").write_text("{ not json !!")
    manager = ConfigManager(config_dir=cfg_dir)
    assert manager.list() == {}
    manager.add_local("recovered", tmp_path / "d")
    # And the recovery persists over the corrupt file
    fresh = ConfigManager(config_dir=cfg_dir)
    assert "recovered" in fresh.list()


def test_wrong_schema_config_starts_fresh(tmp_path):
    cfg_dir = tmp_path / "cfg"
    cfg_dir.mkdir()
    (cfg_dir / "config.json").write_text(json.dumps({"version": 1, "indexes": {"x": {"type": "alien"}}}))
    manager = ConfigManager(config_dir=cfg_dir)
    assert manager.list() == {}


def test_path_expansion_and_resolution(manager, tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))
    manager.add_local("home", "~/data")
    cfg = manager.list()["home"]
    assert cfg.path == str((tmp_path / "data").resolve())


# ------------------------------------------------------------- active concept


def test_first_add_becomes_active_even_with_use_false(manager, tmp_path):
    manager.add_local("first", tmp_path / "d1", use=False)
    assert manager.get_active()[0] == "first"


def test_use_false_keeps_current_active(manager, tmp_path):
    manager.add_local("first", tmp_path / "d1")
    manager.add_local("second", tmp_path / "d2", use=False)
    assert manager.get_active()[0] == "first"


def test_remove_active_falls_back_to_next(manager, tmp_path):
    manager.add_local("a", tmp_path / "da")
    manager.add_local("b", tmp_path / "db", use=False)
    manager.remove("a")
    assert manager.get_active()[0] == "b"


def test_remove_last_clears_active(manager, tmp_path):
    manager.add_local("only", tmp_path / "d")
    manager.remove("only")
    assert manager.get_active() is None
    assert manager.list() == {}


def test_active_pointing_at_missing_entry_returns_none(tmp_path):
    cfg_dir = tmp_path / "cfg"
    cfg_dir.mkdir()
    (cfg_dir / "config.json").write_text(json.dumps({"version": 1, "active": "ghost", "indexes": {}}))
    manager = ConfigManager(config_dir=cfg_dir)
    assert manager.get_active() is None


def test_use_unknown_raises_keyerror(manager):
    with pytest.raises(KeyError):
        manager.use("nope")


def test_remove_unknown_raises_keyerror(manager):
    with pytest.raises(KeyError):
        manager.remove("nope")


def test_remote_duplicate_raises(manager):
    manager.add_remote("r", "https://x", "i")
    with pytest.raises(ValueError):
        manager.add_remote("r", "https://y", "j")


def test_local_scheme_validation(manager, tmp_path):
    manager.add_local("kvx", tmp_path / "kv", scheme="kv")
    assert manager.list()["kvx"].scheme == "kv"
    with pytest.raises(Exception):
        manager.add_local("bad", tmp_path / "b", scheme="not-a-scheme")


# ---------------------------------------------------------------- discovery


def _make_index_dir(base, name):
    d = base / name / "store"
    d.mkdir(parents=True)
    return base / name


def test_discover_registers_store_dirs(manager, tmp_path):
    base = tmp_path / "data"
    _make_index_dir(base, "found1")
    _make_index_dir(base, "found2")
    (base / "not-an-index").mkdir()
    (base / "file.txt").parent.mkdir(exist_ok=True)
    (base / "file.txt").write_text("x")
    found = manager.discover(base_dir=base)
    assert found == ["found1", "found2"]
    # The registered path is the manager BASE dir, not the entry dir
    assert manager.list()["found1"].path == str(base.resolve())
    # First discovery activates when nothing was active
    assert manager.get_active()[0] == "found1"


def test_discover_skips_already_registered(manager, tmp_path):
    base = tmp_path / "data"
    _make_index_dir(base, "known")
    manager.add_local("known", base)
    assert manager.discover(base_dir=base) == []


def test_discover_missing_base_dir(manager, tmp_path):
    assert manager.discover(base_dir=tmp_path / "nope") == []


def test_discover_does_not_steal_active(manager, tmp_path):
    base = tmp_path / "data"
    manager.add_local("mine", tmp_path / "d")
    _make_index_dir(base, "newidx")
    manager.discover(base_dir=base)
    assert manager.get_active()[0] == "mine"


def test_discover_persists(manager, tmp_path):
    base = tmp_path / "data"
    _make_index_dir(base, "persisted")
    manager.discover(base_dir=base)
    fresh = ConfigManager(config_dir=manager.config_dir)
    assert "persisted" in fresh.list()


# ------------------------------------------------------------------ laziness


def test_lazy_load_only_on_first_access(tmp_path):
    manager = ConfigManager(config_dir=tmp_path / "cfg")
    assert manager._config is None
    manager.list()
    assert manager._config is not None


def test_save_without_prior_mutation_writes_default(tmp_path):
    manager = ConfigManager(config_dir=tmp_path / "cfg")
    manager.save()
    data = json.loads(manager.config_path.read_text())
    assert data == {"version": 1, "active": None, "indexes": {}}
