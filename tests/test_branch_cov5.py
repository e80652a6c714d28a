"""Branch-coverage round 5: sharded recall path, hier helpers, serve() edges.

Targets the remaining uncovered branches reported by scripts/pycov.py in
parallel/pm1_sharded.py (recall-target local scan, uneven-shard rejection),
parallel/hier.py (make_global_array single-process, pm1 merge_k), and
server/httpd.py (runner-start failure cleanup, stop-before-start, scale-out
dispatch).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from iscc_search_tpu.ops import nphd_scores
from iscc_search_tpu.ops.nphd import NEG_SCORE
from iscc_search_tpu.ops.pm1_scan import prepare_queries
from iscc_search_tpu.parallel import make_mesh
from iscc_search_tpu.parallel.hier import hier_pm1_topk, make_global_array, make_mesh_2d, shard_database_2d
from iscc_search_tpu.parallel.pm1_sharded import shard_pm1_database, sharded_pm1_topk


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_sharded_pm1_recall_target_path(mesh):
    """The approx (recall_target) local scan runs under shard_map and still
    surfaces a planted exact match at rank 0."""
    rng = np.random.default_rng(51)
    n, chunk, k = 8 * 512, 256, 4
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    q_packed = packed[1234:1235].copy()
    q_pm1, q_scale = prepare_queries(q_packed, np.array([8], np.int32), 256)
    db_s, valid_s = shard_pm1_database(mesh, jnp.asarray(packed), jnp.asarray(valid))
    scores, idx = sharded_pm1_topk(
        mesh, jnp.asarray(q_pm1), jnp.asarray(q_scale), db_s, valid_s, k, 256,
        chunk_size=chunk, recall_target=0.95,
    )
    scores, idx = np.asarray(scores), np.asarray(idx)
    assert idx[0, 0] == 1234
    assert scores[0, 0] == pytest.approx(1.0, abs=2e-3)
    # every reported score matches its reported row's true score
    lanes = np.full(n, 8, np.int32)
    ref = np.array(nphd_scores(jnp.asarray(q_packed), jnp.asarray(np.array([8], np.int32)),
                               jnp.asarray(packed), jnp.asarray(lanes)))
    for r in range(k):
        if idx[0, r] >= 0:
            assert ref[0, idx[0, r]] == pytest.approx(scores[0, r], abs=2e-3)


def test_sharded_pm1_rejects_uneven_rows(mesh):
    rng = np.random.default_rng(52)
    packed = rng.integers(0, 2**32, (8 * 16 + 1, 8), dtype=np.uint32)
    valid = np.ones(packed.shape[0], bool)
    with pytest.raises(ValueError, match="not divisible"):
        shard_pm1_database(mesh, jnp.asarray(packed), jnp.asarray(valid))


def test_make_global_array_single_process_roundtrip():
    """make_global_array assembles the same row-sharded layout device_put
    produces when every shard is process-local (with and without columns)."""
    mesh2d = make_mesh_2d(2, 4)
    rng = np.random.default_rng(53)
    n = 2 * 4 * 8
    codes = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    lanes = np.full(n, 8, np.int32)
    valid = np.ones(n, bool)
    gc = make_global_array(mesh2d, codes, (n, 8))
    gl = make_global_array(mesh2d, lanes, (n,), with_cols=False)
    gv = make_global_array(mesh2d, valid, (n,), with_cols=False)
    ec, el, ev = shard_database_2d(mesh2d, jnp.asarray(codes), jnp.asarray(lanes), jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(gc), np.asarray(ec))
    np.testing.assert_array_equal(np.asarray(gl), np.asarray(el))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(ev))
    assert gc.sharding == ec.sharding and gl.sharding == el.sharding


def test_hier_pm1_merge_k_wider_than_k():
    """hier_pm1_topk with merge_k > k returns merge_k globally-correct rows."""
    mesh2d = make_mesh_2d(2, 4)
    rng = np.random.default_rng(54)
    n, k, merge_k = 2 * 4 * 1024, 2, 6
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    lanes = np.full(n, 8, np.int32)
    valid = np.ones(n, bool)
    q_packed = packed[7:8].copy()
    q_pm1, q_scale = prepare_queries(q_packed, np.array([8], np.int32), 256)
    gc, _, gv = shard_database_2d(mesh2d, jnp.asarray(packed), jnp.asarray(lanes), jnp.asarray(valid))
    scores, idx = hier_pm1_topk(
        mesh2d, jnp.asarray(q_pm1), jnp.asarray(q_scale), gc, gv, k, 256,
        chunk_size=512, merge_k=merge_k,
    )
    scores, idx = np.asarray(scores), np.asarray(idx)
    assert scores.shape == (1, merge_k) and idx.shape == (1, merge_k)
    ref = np.array(nphd_scores(jnp.asarray(q_packed), jnp.asarray(np.array([8], np.int32)),
                               jnp.asarray(packed), jnp.asarray(lanes)))
    # merge_k > per-shard k: each row the merge reports must carry its true
    # score and the global best (the planted self-match) must lead.
    assert idx[0, 0] == 7
    for r in range(merge_k):
        if scores[0, r] > NEG_SCORE:
            assert ref[0, idx[0, r]] == pytest.approx(scores[0, r], abs=2e-3)


# -------------------------------------------------- server/httpd.py edges


def test_aggregator_runner_stop_before_start():
    from iscc_search_tpu.server.httpd import AggregatorRunner

    runner = AggregatorRunner(index=None, opts=None, status={})
    runner.stop()  # no loop yet: must be a no-op, not a crash


def test_serve_cleans_up_when_runner_start_fails(tmp_path, monkeypatch):
    """A poller that fails to start must not leak the bound socket or the
    index: serve() closes both and re-raises."""
    from iscc_search_tpu import options as optmod
    from iscc_search_tpu.server import httpd as httpd_mod

    closed = {"index": 0, "httpd": 0}

    class FakeIndex:
        def close(self):
            closed["index"] += 1

    class FakeHttpd:
        def server_close(self):
            closed["httpd"] += 1

        def serve_forever(self):  # pragma: no cover - must never be reached
            raise AssertionError("serve_forever must not run")

    class BoomRunner:
        def __init__(self, index, opts, status):
            pass

        def start(self):
            raise RuntimeError("poller boom")

    opts = optmod.SearchOptions(
        index_uri=f"tpu://{tmp_path}/idx", aggregator_network="testnet",
        http_backend="wsgiref", port=0,
    )
    assert opts.aggregator_mode
    monkeypatch.setattr(httpd_mod, "AggregatorRunner", BoomRunner)
    monkeypatch.setattr(optmod, "get_index", lambda uri: FakeIndex())
    monkeypatch.setattr(
        "iscc_search_tpu.server.app.create_app",
        lambda index, opts: type("A", (), {"state": type("S", (), {"aggregator_status": {}})()})(),
    )
    monkeypatch.setattr(httpd_mod, "make_server", lambda *a, **kw: FakeHttpd())
    with pytest.raises(RuntimeError, match="poller boom"):
        httpd_mod.serve(opts)
    assert closed == {"index": 1, "httpd": 1}


def test_serve_dispatches_to_scaleout(monkeypatch, tmp_path):
    from iscc_search_tpu import options as optmod
    from iscc_search_tpu.server import httpd as httpd_mod

    called = {}

    def fake_scaleout(opts):
        called["opts"] = opts

    monkeypatch.setattr("iscc_search_tpu.server.scaleout.serve_scaleout", fake_scaleout)
    opts = optmod.SearchOptions(index_uri=f"tpu://{tmp_path}/idx", workers=3, port=0)
    httpd_mod.serve(opts)
    assert called["opts"] is opts
