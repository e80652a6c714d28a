"""Persistent XLA compile cache configuration (compile_cache.py)."""

import jax

from iscc_search_tpu import compile_cache


def _reset(monkeypatch):
    monkeypatch.setattr(compile_cache, "_configured", None)


def test_default_dir_is_platform_cache():
    assert compile_cache.default_cache_dir().endswith("xla")
    assert "iscc-search-tpu" in compile_cache.default_cache_dir()


def test_explicit_path_configures_jax(monkeypatch, tmp_path):
    _reset(monkeypatch)
    target = tmp_path / "xlacache"
    got = compile_cache.ensure_compile_cache(str(target))
    assert got == str(target)
    assert target.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(target)


def test_disabled_values(monkeypatch, tmp_path):
    for value in ("off", "OFF", "none", "0", ""):
        _reset(monkeypatch)
        assert compile_cache.ensure_compile_cache(value) is None


def test_env_fallback(monkeypatch, tmp_path):
    _reset(monkeypatch)
    target = tmp_path / "envcache"
    monkeypatch.setenv("ISCC_SEARCH_COMPILE_CACHE_DIR", str(target))
    assert compile_cache.ensure_compile_cache() == str(target)


def test_first_explicit_caller_wins(monkeypatch, tmp_path):
    _reset(monkeypatch)
    first = tmp_path / "first"
    compile_cache.ensure_compile_cache(str(first))
    # A later explicit call is a no-op reporting the active dir.
    assert compile_cache.ensure_compile_cache(str(tmp_path / "second")) == str(first)


def test_explicit_overrides_implicit(monkeypatch, tmp_path):
    # Importing an ops module configures the env/default path implicitly;
    # the user's SearchOptions.compile_cache_dir must still take effect.
    _reset(monkeypatch)
    monkeypatch.setenv("ISCC_SEARCH_COMPILE_CACHE_DIR", str(tmp_path / "envdir"))
    compile_cache.ensure_compile_cache()  # implicit (ops import)
    chosen = tmp_path / "chosen"
    assert compile_cache.ensure_compile_cache(str(chosen)) == str(chosen)
    assert jax.config.jax_compilation_cache_dir == str(chosen)


def test_explicit_off_overrides_implicit(monkeypatch, tmp_path):
    _reset(monkeypatch)
    monkeypatch.setenv("ISCC_SEARCH_COMPILE_CACHE_DIR", str(tmp_path / "envdir"))
    compile_cache.ensure_compile_cache()  # implicit: installs envdir
    assert compile_cache.ensure_compile_cache("off") is None
    assert not jax.config.jax_compilation_cache_dir


def test_implicit_never_overrides(monkeypatch, tmp_path):
    _reset(monkeypatch)
    chosen = tmp_path / "chosen"
    compile_cache.ensure_compile_cache(str(chosen))
    assert compile_cache.ensure_compile_cache() == str(chosen)  # implicit no-op


def test_default_fallback_uses_platform_dir(monkeypatch, tmp_path):
    _reset(monkeypatch)
    monkeypatch.delenv("ISCC_SEARCH_COMPILE_CACHE_DIR", raising=False)
    monkeypatch.setattr(
        compile_cache, "default_cache_dir", lambda: str(tmp_path / "plat")
    )
    assert compile_cache.ensure_compile_cache() == str(tmp_path / "plat")


def test_failed_configuration_does_not_latch(tmp_path, monkeypatch):
    """A transient failure must not permanently disable the cache: a later
    call with a valid path still configures it."""
    import iscc_search_tpu.compile_cache as cc

    monkeypatch.setattr(cc, "_configured", None)
    blocker = tmp_path / "file"
    blocker.write_text("x")  # makedirs below a FILE fails
    assert cc.ensure_compile_cache(str(blocker / "sub")) is None
    good = tmp_path / "cache"
    assert cc.ensure_compile_cache(str(good)) == str(good)
