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
