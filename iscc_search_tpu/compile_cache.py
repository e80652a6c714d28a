"""
Persistent XLA compilation cache — the cold-start fix for production restarts.

A 10M-row index opens from snapshot in ~1 s and uploads to HBM in well under
a second, yet the *first query* of a fresh process cost minutes: every scan
kernel, twin builder, and top-k merge is a separate XLA/Pallas compile, and
on a remote-attached device (the axon tunnel) each one round-trips to the
platform compiler. The compiles are identical across restarts, so the
TPU-native answer is JAX's persistent compilation cache: serialized
executables keyed by HLO fingerprint, written once, loaded on every later
start (measured here: 193 s -> seconds at 1M rows, see
benchmarks/COLDSTART_10M.json).

The reference engine has no analog (usearch mmap-loads a prebuilt graph —
its "compile" is the index build itself); this module restores restart
parity for the scan engine.

Call precedence: ops modules invoke :func:`ensure_compile_cache` with no
argument at import time (env/default path); backends created through
``SearchOptions.compile_cache_dir`` pass that value explicitly. An explicit
call overrides an earlier implicit one (importing any ops module before
``manager_for()`` must not swallow the configured option); among explicit
calls the first wins. JAX consults the setting on each compile, so a
post-import reconfiguration still applies to every not-yet-compiled kernel.
"""

from __future__ import annotations

import os

from iscc_search_tpu.utils import get_logger

logger = get_logger(__name__)

_DISABLED = {"off", "none", "0", "disabled"}
_configured = None  # type: str | None  # "implicit" | "explicit" once set


def default_cache_dir():
    # type: () -> str
    """Platform user-cache location (~/.cache/iscc-search-tpu/xla on Linux)."""
    import iscc_search_tpu

    return os.path.join(iscc_search_tpu.dirs.user_cache_dir, "xla")


def ensure_compile_cache(path=None):
    # type: (str | None) -> str | None
    """
    Point JAX's persistent compilation cache at ``path``. ``None`` falls back
    to ``ISCC_SEARCH_COMPILE_CACHE_DIR`` then the platform cache dir; ``"off"``
    (or empty) disables persistence. Explicit paths override an earlier
    implicit (env/default) configuration; the first explicit path wins.

    Returns the directory in use, or None when disabled/unavailable.
    """
    global _configured
    explicit = path is not None
    if _configured == "explicit" or (_configured is not None and not explicit):
        return _current()

    if path is None:
        path = os.environ.get("ISCC_SEARCH_COMPILE_CACHE_DIR")
    if path is None:
        path = default_cache_dir()
    if not path or str(path).strip().lower() in _DISABLED:
        _configured = "explicit" if explicit else "implicit"
        _disable()
        return None

    path = str(path)
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything: even sub-second kernels pay a multi-second
        # round-trip on remote-attached devices, and entries are tiny
        # compared to the index itself.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as exc:  # pragma: no cover - platform-specific
        # Do NOT latch _configured on failure: a transient error (read-only
        # FS, jax state) would otherwise permanently disable the cache for
        # this process — a later call with a valid path must still work.
        logger.warning(f"persistent compile cache unavailable at {path}: {exc}")
        return None
    _configured = "explicit" if explicit else "implicit"
    return path


def _disable():
    # type: () -> None
    """Clear any cache dir a prior implicit call installed ('off' override)."""
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            jax.config.update("jax_compilation_cache_dir", None)
    except Exception:  # pragma: no cover - jax absent/misconfigured
        pass


def _current():
    # type: () -> str | None
    try:
        import jax

        value = jax.config.jax_compilation_cache_dir
        return value or None
    except Exception:  # pragma: no cover
        return None
