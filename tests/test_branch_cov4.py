"""
Branch-coverage fillers for the HTTP layer (server/app.py, server/wsgi.py,
server/httpd.py), CLI serve guards, models/codec edge arms, the shared index
commons, and the simprint/batcher engines. Companion to
test_branch_cov{,2,3}.py for the branch gate.
"""

import random
import threading

import httpx
import numpy as np
import pytest
from click.testing import CliRunner

from iscc_search_tpu import codec as ic
from iscc_search_tpu.aggregator.poller import HubStatus
from iscc_search_tpu.indexes import common
from iscc_search_tpu.indexes.memory import MemoryIndex
from iscc_search_tpu.models import IsccCode, IsccID, IsccUnit
from iscc_search_tpu.options import SearchOptions
from iscc_search_tpu.schema import IsccEntry, IsccQuery
from iscc_search_tpu.server.app import create_app, init_sentry
from iscc_search_tpu.server.wsgi import Response

from tests.conftest import make_iscc_id, make_unit


def client_for(opts, index=None, status=None):
    app = create_app(index=index or MemoryIndex(), opts=opts)
    if status is not None:
        app.state.aggregator_status = status
    transport = httpx.WSGITransport(app=app)
    return httpx.Client(transport=transport, base_url="http://testserver")


# ------------------------------------------------------------ server/app.py


def test_sentry_dsn_set_but_sdk_missing():
    opts = SearchOptions(index_uri="memory://", sentry_dsn="https://x@example/1")
    assert init_sentry(opts) is False  # app.py:66 False arm + ImportError


def test_status_aggregator_hubs_and_cache():
    opts = SearchOptions(index_uri="memory://", aggregator_network="testnet")
    status = {
        1: HubStatus(hub_id=1, url="https://hub1", ok=True, error=None),
        2: HubStatus(hub_id=2, url="https://hub2", ok=False, error="boom: secret"),
    }
    with client_for(opts, status=status) as c:
        r = c.get("/status")
        assert r.status_code == 200
        hubs = {h["hub_id"]: h for h in r.json()["hubs"]}
        assert hubs[1]["error"] is None
        assert hubs[2]["error"] == "poll failed"  # redacted (app.py:161)
        # Second call within the TTL serves the cached index info (129 True)
        r2 = c.get("/status")
        assert r2.status_code == 200


def test_landing_fallback_when_static_missing(monkeypatch, tmp_path):
    import iscc_search_tpu.server.app as app_mod

    monkeypatch.setattr(app_mod, "STATIC_DIR", tmp_path / "nostatic")
    opts = SearchOptions(index_uri="memory://")
    with client_for(opts) as c:
        r = c.get("/")
        assert r.status_code == 200
        assert r.json()["docs"] == "/docs"  # app.py:278 False arm


def test_static_path_traversal_rejected():
    opts = SearchOptions(index_uri="memory://")
    with client_for(opts) as c:
        assert c.get("/static/%2e%2e%2fapp.py").status_code == 404  # 288 traversal
        assert c.get("/static/nope.js").status_code == 404  # missing file
        assert c.get("/static/app.js").status_code == 200


# ----------------------------------------------------------- server/wsgi.py


def test_response_shapes():
    assert Response(None).body == b""  # 91 content None
    assert Response({}, status=204).body == b""  # 91 status 204
    r = Response("plain text", media_type="text/plain")
    assert r.body == b"plain text"  # 95 str + non-json
    r = Response("json string")  # str + json media type -> json-encoded
    assert r.body == b'"json string"'
    r = Response({"a": 1}, headers={"Content-Type": "application/custom"})
    assert r.headers["Content-Type"] == "application/custom"  # 99 preset header


def test_request_body_cached_and_bad_length():
    import io

    from iscc_search_tpu.server.wsgi import Request

    env = {
        "REQUEST_METHOD": "POST",
        "PATH_INFO": "/x",
        "CONTENT_LENGTH": "5",
        "wsgi.input": io.BytesIO(b"hello"),
    }
    req = Request(env)
    assert req.body == b"hello"
    assert req.body == b"hello"  # 68 cached arm (no second read)
    env2 = {
        "REQUEST_METHOD": "POST",
        "PATH_INFO": "/x",
        "CONTENT_LENGTH": "not-a-number",
        "wsgi.input": io.BytesIO(b""),
    }
    assert Request(env2).body == b""  # ValueError arm -> empty body


# ---------------------------------------------------------- server/httpd.py


def test_aggregator_runner_stop_before_start():
    from iscc_search_tpu.server.httpd import AggregatorRunner

    opts = SearchOptions(index_uri="memory://", aggregator_network="testnet")
    runner = AggregatorRunner(MemoryIndex(), opts, {})
    runner.stop()  # httpd.py:82 True: never started -> no-op


# -------------------------------------------------------------- cli/serve.py


def test_serve_multiworker_guards(tmp_path, monkeypatch):
    import iscc_search_tpu.server.httpd as httpd_mod
    from iscc_search_tpu.cli import cli
    from iscc_search_tpu.cli import common as cli_common
    from iscc_search_tpu.config import ConfigManager
    from iscc_search_tpu.options import search_opts

    # Never start a real server topology from this test.
    served = []
    monkeypatch.setattr(httpd_mod, "serve", lambda opts: served.append(opts))
    cli_common.set_config_manager(ConfigManager(config_dir=tmp_path / "cfg"))
    try:
        # Persistent backend + workers > 1: allowed — scale-out keeps the
        # single-writer constraint (engine owns the index, workers use IPC).
        r = CliRunner().invoke(
            cli, ["serve", "--index-uri", f"tpu://{tmp_path}/idx", "--workers", "2"]
        )
        assert r.exit_code == 0, r.output
        assert served and served[-1].workers == 2
        # Aggregator mode + workers > 1: single-poller guard (serve.py)
        monkeypatch.setattr(search_opts, "aggregator_network", "testnet")
        r = CliRunner().invoke(cli, ["serve", "--index-uri", "memory://", "--workers", "2"])
        assert r.exit_code == 1
        assert "single worker" in r.output
    finally:
        cli_common.set_config_manager(None)


# ------------------------------------------------------------- models/codec


def test_model_eq_against_other_types():
    uid = IsccID(make_iscc_id(1))
    assert (uid == "not-an-iscc") is False  # models.py:119 non-IsccBase
    from iscc_search_tpu.models import IsccItem

    item = IsccItem.new(make_iscc_id(1), units=[make_unit(ic.MT.DATA, 0, 64, rng=random.Random(3))])
    assert (item == 42) is False  # models.py:252 non-IsccItem


def test_iscc_code_wide_and_short_instance():
    """WIDE composite requires 32-byte DATA+INSTANCE bodies; a 16-byte pair
    decodes as non-wide (models.py:207 False arm)."""
    rng = random.Random(31)
    data = make_unit(ic.MT.DATA, 0, 128, rng=rng)
    inst = make_unit(ic.MT.INSTANCE, 0, 128, rng=rng)
    code = ic.gen_iscc_code_v0([data, inst])["iscc"]
    units = IsccCode(code).units
    assert {u.unit_type.split("_")[0] for u in units} == {"DATA", "INSTANCE"}


def test_codec_error_arms():
    with pytest.raises(ValueError):
        ic.encode_length(ic.MT.DATA, 33)  # codec.py:256 bits % 32
    with pytest.raises(ValueError):
        ic.encode_length(ic.MT.DATA, 0)  # codec.py:256 bits <= 0
    with pytest.raises(ValueError):
        ic.decode_units(99)  # codec.py:288 out of range
    with pytest.raises(ValueError):
        ic.gen_iscc_id_v1(timestamp_us=1, server_id=4096)  # codec.py:461
    # 273: WIDE subtype length decode (256-bit wide units)
    assert ic.decode_length(ic.MT.ISCC, 1, subtype=ic.ST_ISCC.WIDE) > 0


def test_gen_iscc_code_keeps_longest_per_type():
    """Duplicate unit types: the longest body wins (codec.py:410)."""
    rng = random.Random(32)
    body = bytes(rng.getrandbits(8) for _ in range(32))
    d64 = "ISCC:" + ic.encode_base32(
        ic.encode_header(ic.MT.DATA, 0, ic.VS.V0, ic.encode_length(ic.MT.DATA, 64)) + body[:8]
    )
    d256 = "ISCC:" + ic.encode_base32(
        ic.encode_header(ic.MT.DATA, 0, ic.VS.V0, ic.encode_length(ic.MT.DATA, 256)) + body
    )
    inst = make_unit(ic.MT.INSTANCE, 0, 256, rng=rng)
    code_long_first = ic.gen_iscc_code_v0([d256, d64, inst])["iscc"]
    code_short_first = ic.gen_iscc_code_v0([d64, d256, inst])["iscc"]
    assert code_long_first == code_short_first


# --------------------------------------------------------- indexes/common.py


def test_validate_iscc_id_rejects_empty_and_unprefixed():
    with pytest.raises(ValueError):
        common.validate_iscc_id("")
    with pytest.raises(ValueError):
        common.validate_iscc_id("MAIAAAAAAAAAAIAB")  # missing ISCC: prefix


def test_memory_search_by_id_expands_simprints():
    """MemoryIndex keeps full entries, so an iscc_id query re-expands the
    stored simprints (common.py:164-165 True)."""
    rng = random.Random(33)
    idx = MemoryIndex()
    from iscc_search_tpu.schema import IsccIndex

    idx.create_index(IsccIndex(name="t"))
    units = [make_unit(ic.MT.DATA, 0, 64, rng=rng), make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)]
    raw = bytes(rng.getrandbits(8) for _ in range(16))
    e = IsccEntry(
        iscc_id=make_iscc_id(1),
        units=units,
        simprints={"CT1": [{"simprint": ic.encode_base64(raw), "offset": 0, "size": 10}]},
    )
    idx.add_assets("t", [e])
    res = idx.search_assets("t", IsccQuery(iscc_id=make_iscc_id(1)), limit=5)
    assert res.query.simprints is not None


def test_normalize_query_code_only_and_both():
    rng = random.Random(34)
    data = make_unit(ic.MT.DATA, 0, 64, rng=rng)
    inst = make_unit(ic.MT.INSTANCE, 0, 64, rng=rng)
    code = ic.gen_iscc_code_v0([data, inst])["iscc"]
    q = common.normalize_query(IsccQuery(iscc_code=code))  # 188 True: derive units
    assert q.units
    q2 = common.normalize_query(IsccQuery(iscc_code=code, units=q.units))  # 178 both
    assert q2.iscc_code == code


# ---------------------------------------------------------- engine/simprint


def test_simprint_engine_empty_add_and_sizes(tmp_path):
    from iscc_search_tpu.engine.simprint import SimprintEngine

    eng = SimprintEngine(tmp_path / "sp", ndim=128)
    eng.add_raw([], [])  # simprint.py:63 False arm
    assert eng.size == 0
    assert eng.data_size == 0  # 181: path missing + no rows
    eng.close()


def test_simprint_best_per_asset_tie_handling(tmp_path):
    """Two chunks of one asset matching the same query: only the best-scoring
    chunk survives per (query, asset) (simprint.py:99)."""
    from iscc_search_tpu.engine import simprint_ops as sp_ops
    from iscc_search_tpu.engine.simprint import SimprintEngine

    rng = np.random.default_rng(35)
    eng = SimprintEngine(tmp_path / "sp", ndim=128)
    base = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
    near = bytes([base[0] ^ 0x01]) + base[1:]
    asset = b"\x00" * 8
    keys = [sp_ops.pack_chunk_pointer(asset, 0, 10), sp_ops.pack_chunk_pointer(asset, 10, 10)]
    eng.add_raw(keys, [base, near])
    matches = eng.search_raw([base], limit=5, threshold=0.5, detailed=True,
                             doc_freq_fn=lambda k: 1, total_assets=1)
    assert len(matches) == 1  # one asset, best chunk only
    assert matches[0].score > 0
    eng.close()


# ----------------------------------------------------------- engine/batcher


def test_batcher_oversized_single_request(tmp_path):
    """A request larger than max_batch dispatches alone (batcher.py:106)."""
    from iscc_search_tpu.engine.batcher import SearchBatcher
    from iscc_search_tpu.engine.device_index import DeviceNphdIndex

    rng = np.random.default_rng(36)
    idx = DeviceNphdIndex(tmp_path / "d")
    vs = [rng.integers(0, 256, 8, dtype=np.uint8).tobytes() for i in range(8)]
    idx.add(list(range(8)), vs)
    b = SearchBatcher(idx, max_batch=2, window_ms=5.0)
    try:
        res = b.search(vs[:4], 2)  # 4 bodies > max_batch 2
        assert len(res) == 4
        keys, scores = res[0]
        assert scores[0] == pytest.approx(1.0)
    finally:
        b.close()
        idx.close()
