"""
Test configuration.

Forces JAX onto a virtual 8-device CPU mesh so sharding/collective paths are
exercised without TPU hardware (mirrors the reference's strategy of testing
distributed behavior without a cluster — SURVEY §4.8).
"""

import os

# Force the CPU backend for tests even when the environment pins JAX_PLATFORMS
# to a TPU plugin (e.g. a tunneled remote TPU): unit tests must not round-trip
# a network-attached accelerator. jax may already be imported by an interpreter
# startup hook, so setting os.environ alone is not enough — update jax config
# directly (backends initialize lazily, so this still takes effect here).
# Set ISCC_TEST_PLATFORM=tpu/axon explicitly to run the suite on real hardware.
_platform = os.environ.get("ISCC_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
if _platform == "cpu":
    # Subprocess hermeticity: dev environments that tunnel a remote TPU
    # inject a sitecustomize via PYTHONPATH whose plugin registration dials
    # the tunnel at interpreter start — a child process spawned by a test
    # (scale-out workers, multihost cluster procs) would hang on a dead or
    # busy tunnel even with JAX_PLATFORMS=cpu. Strip those entries so test
    # children get a plain CPU interpreter.
    _pp = [
        p
        for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon_site" not in p
    ]
    os.environ["PYTHONPATH"] = os.pathsep.join(_pp)

# Convert inline by default in tests: the poller's conversion-worker pool
# spawns a fresh interpreter per poll_loop (~3s each on this host). Tests that
# exercise the pool pass aggregator_convert_workers=1 explicitly (init args
# override env in pydantic-settings).
os.environ.setdefault("ISCC_SEARCH_AGGREGATOR_CONVERT_WORKERS", "0")

# The scale-out FUNCTIONAL tests exercise the multi-process topology on
# whatever host runs them; the >= workers+1 core guard (scaleout.py
# _apply_core_guard) would otherwise fall them back to single-process on
# small CI hosts. Guard behavior itself is tested with this forced off.
os.environ.setdefault("ISCC_SEARCH_SCALEOUT_FORCE", "1")

import jax

jax.config.update("jax_platforms", _platform)

import random

import pytest

from iscc_search_tpu import codec as ic


@pytest.fixture
def rng():
    return random.Random(42)


_FALLBACK_RNG = random.Random(0xA11CE)  # reproducible default for rng-less calls


def make_unit(mtype, stype, bits, body=None, rng=None):
    # type: (int, int, int, bytes | None, random.Random | None) -> str
    """Build a canonical ISCC-UNIT string with the given body (random if None)."""
    if body is None:
        rnd = rng or _FALLBACK_RNG  # seeded: failures stay reproducible
        body = bytes(rnd.getrandbits(8) for _ in range(bits // 8))
    header = ic.encode_header(mtype, stype, ic.VS.V0, ic.encode_length(mtype, bits))
    return "ISCC:" + ic.encode_base32(header + body[: bits // 8])


def make_iscc_id(n, realm_id=0):
    # type: (int, int) -> str
    """Deterministic ISCC-ID from a small integer (timestamp=n, server=0)."""
    return ic.gen_iscc_id_v1(timestamp_us=n + 1, server_id=n % 4096, realm_id=realm_id)["iscc"]


@pytest.fixture
def unit_factory(rng):
    def factory(mtype=ic.MT.CONTENT, stype=ic.ST_CC.TEXT, bits=64, body=None):
        return make_unit(mtype, stype, bits, body, rng)

    return factory


@pytest.fixture
def entry_factory(rng):
    """Produce valid IsccEntry dicts with random units."""
    counter = [0]

    def factory(bits=64, with_meta=False, with_content=True, simprints=None, metadata=None):
        counter[0] += 1
        units = []
        if with_meta:
            units.append(make_unit(ic.MT.META, ic.ST.NONE, bits, rng=rng))
        if with_content:
            units.append(make_unit(ic.MT.CONTENT, ic.ST_CC.TEXT, bits, rng=rng))
        units.append(make_unit(ic.MT.DATA, ic.ST.NONE, bits, rng=rng))
        units.append(make_unit(ic.MT.INSTANCE, ic.ST.NONE, bits, rng=rng))
        entry = {
            "iscc_id": make_iscc_id(counter[0]),
            "iscc_code": ic.gen_iscc_code_v0(units, wide=True)["iscc"],
            "units": units,
        }
        if simprints is not None:
            entry["simprints"] = simprints
        if metadata is not None:
            entry["metadata"] = metadata
        return entry

    return factory
