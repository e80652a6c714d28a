"""
CLI multi-index configuration.

The second half of the dual-config split (see options.py): a persistent JSON
config for CLI workflows with named local/remote indexes and a git-like
active-index concept (parity with reference config.py:211-429 —
add/list/use/remove plus auto-discovery of index directories).

Config file: ~/.iscc-search-tpu/config.json (overridable for tests).
"""

from __future__ import annotations

import json
from pathlib import Path

from pydantic import BaseModel, Field

import iscc_search_tpu

def default_config_dir():
    # type: () -> Path
    """Resolved at call time (not import) so HOME changes take effect —
    required for test isolation and matches shell-tool expectations."""
    return Path.home() / ".iscc-search-tpu"


class LocalIndexConfig(BaseModel):
    """A named local index rooted at a directory (tpu:// or kv:// backend)."""

    type: str = "local"
    path: str
    scheme: str = Field("tpu", pattern="^(tpu|kv|usearch|lmdb)$")


class RemoteIndexConfig(BaseModel):
    """A named remote index on an API server."""

    type: str = "remote"
    url: str
    index_name: str
    api_key: str | None = None


class Config(BaseModel):
    """Persisted configuration document."""

    version: int = 1
    active: str | None = None
    indexes: dict[str, LocalIndexConfig | RemoteIndexConfig] = Field(default_factory=dict)


class ConfigManager:
    """Load/save/modify the persistent CLI configuration."""

    def __init__(self, config_dir=None):
        # type: (str | Path | None) -> None
        self.config_dir = Path(config_dir) if config_dir else default_config_dir()
        self.config_path = self.config_dir / "config.json"
        self._config = None  # type: Config | None

    @property
    def config(self):
        # type: () -> Config
        if self._config is None:
            self._config = self._load()
        return self._config

    def _load(self):
        # type: () -> Config
        if self.config_path.exists():
            try:
                return Config(**json.loads(self.config_path.read_text()))
            except Exception:
                # A corrupt config file must not brick the CLI; start fresh.
                return Config()
        return Config()

    def save(self):
        # type: () -> None
        self.config_dir.mkdir(parents=True, exist_ok=True)
        tmp = self.config_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(self.config.model_dump(mode="json"), indent=2))
        tmp.replace(self.config_path)

    # -- index registry -------------------------------------------------------

    def add_local(self, name, path, scheme="tpu", use=True):
        # type: (str, str | Path, str, bool) -> None
        """Register a local index directory under a name."""
        if name in self.config.indexes:
            raise ValueError(f"Index '{name}' already configured")
        self.config.indexes[name] = LocalIndexConfig(path=str(Path(path).expanduser().resolve()), scheme=scheme)
        if use or self.config.active is None:
            self.config.active = name
        self.save()

    def add_remote(self, name, url, index_name, api_key=None, use=True):
        # type: (str, str, str, str | None, bool) -> None
        """Register a remote index (server URL + index name) under a name."""
        if name in self.config.indexes:
            raise ValueError(f"Index '{name}' already configured")
        self.config.indexes[name] = RemoteIndexConfig(url=url, index_name=index_name, api_key=api_key)
        if use or self.config.active is None:
            self.config.active = name
        self.save()

    def remove(self, name):
        # type: (str) -> None
        if name not in self.config.indexes:
            raise KeyError(f"Index '{name}' not configured")
        del self.config.indexes[name]
        if self.config.active == name:
            self.config.active = next(iter(self.config.indexes), None)
        self.save()

    def use(self, name):
        # type: (str) -> None
        if name not in self.config.indexes:
            raise KeyError(f"Index '{name}' not configured")
        self.config.active = name
        self.save()

    def list(self):
        # type: () -> dict
        return dict(self.config.indexes)

    def get_active(self):
        # type: () -> tuple[str, LocalIndexConfig | RemoteIndexConfig] | None
        name = self.config.active
        if name is None or name not in self.config.indexes:
            return None
        return name, self.config.indexes[name]

    def discover(self, base_dir=None):
        # type: (str | Path | None) -> list[str]
        """
        Auto-discover index directories under the default data dir and
        register unknown ones by directory name (reference config.py:387-412).
        """
        base = Path(base_dir) if base_dir else Path(iscc_search_tpu.dirs.user_data_dir)
        found = []
        if not base.exists():
            return found
        # LocalIndexConfig.path is the manager BASE directory (the index lives
        # at {path}/{name}/store — see get_active_index/_local_manager and
        # `index remove --delete-data`). Registering the entry dir itself
        # would make every consumer open an empty nested index beside the
        # real data.
        base_path = str(base.resolve())
        for entry in sorted(base.iterdir()):
            if entry.is_dir() and (entry / "store").exists():
                if entry.name in self.config.indexes:
                    continue
                self.config.indexes[entry.name] = LocalIndexConfig(path=base_path, scheme="tpu")
                found.append(entry.name)
        if found:
            if self.config.active is None:
                self.config.active = found[0]
            self.save()
        return found
