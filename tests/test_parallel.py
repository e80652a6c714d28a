"""Sharded search tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iscc_search_tpu.ops import pack_codes, nphd_scores
from iscc_search_tpu.ops.nphd import NEG_SCORE
from iscc_search_tpu.parallel import make_mesh, shard_database, sharded_topk


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_mesh_has_8_devices(mesh):
    assert mesh.shape["shards"] == 8


def test_sharded_topk_matches_brute_force(mesh):
    rng = np.random.default_rng(21)
    n_per_shard, chunk, k = 256, 128, 10
    n = n_per_shard * 8
    bodies = [rng.integers(0, 256, int(rng.choice([8, 16, 32])), dtype=np.uint8).tobytes() for _ in range(n)]
    q_bodies = bodies[:4]
    dc, dl = pack_codes(bodies)
    qc, ql = pack_codes(q_bodies)
    valid = np.ones(n, dtype=bool)
    valid[rng.integers(0, n, 50)] = False

    dcs, dls, dvs = shard_database(mesh, jnp.asarray(dc), jnp.asarray(dl), jnp.asarray(valid))
    scores, idx = sharded_topk(mesh, jnp.asarray(qc), jnp.asarray(ql), dcs, dls, dvs, k, chunk_size=chunk)
    scores, idx = np.asarray(scores), np.asarray(idx)

    full = np.array(nphd_scores(jnp.asarray(qc), jnp.asarray(ql), jnp.asarray(dc), jnp.asarray(dl)))
    full[:, ~valid] = NEG_SCORE
    for qi in range(4):
        expected = np.sort(full[qi])[::-1][:k]
        assert np.allclose(np.sort(scores[qi])[::-1], expected, atol=1e-6)
        for r in range(k):
            if idx[qi, r] >= 0:
                assert full[qi, idx[qi, r]] == pytest.approx(scores[qi, r], abs=1e-6)


def test_sharded_topk_fewer_valid_than_k(mesh):
    rng = np.random.default_rng(22)
    n = 128 * 8
    bodies = [rng.integers(0, 256, 8, dtype=np.uint8).tobytes() for _ in range(n)]
    dc, dl = pack_codes(bodies)
    valid = np.zeros(n, dtype=bool)
    valid[[3, 500, 900]] = True
    qc, ql = pack_codes(bodies[:1])
    dcs, dls, dvs = shard_database(mesh, jnp.asarray(dc), jnp.asarray(dl), jnp.asarray(valid))
    scores, idx = sharded_topk(mesh, jnp.asarray(qc), jnp.asarray(ql), dcs, dls, dvs, 10, chunk_size=128)
    idx = np.asarray(idx)
    assert set(idx[0][idx[0] >= 0]) == {3, 500, 900}


def test_shard_database_rejects_uneven(mesh):
    rng = np.random.default_rng(23)
    bodies = [rng.integers(0, 256, 8, dtype=np.uint8).tobytes() for _ in range(100)]
    dc, dl = pack_codes(bodies)
    with pytest.raises(ValueError):
        shard_database(mesh, jnp.asarray(dc), jnp.asarray(dl), jnp.asarray(np.ones(100, bool)))


def test_init_distributed_single_host_noop(monkeypatch, caplog):
    """Without coordinator config, init is a logged no-op (single host)."""
    from iscc_search_tpu.parallel.distributed import init_distributed

    monkeypatch.delenv("ISCC_SEARCH_COORDINATOR", raising=False)
    monkeypatch.delenv("ISCC_SEARCH_NUM_HOSTS", raising=False)
    init_distributed()  # must not raise or call jax.distributed.initialize


def test_init_distributed_passes_cluster_args(monkeypatch):
    """Coordinator config reaches jax.distributed.initialize verbatim."""
    import jax

    from iscc_search_tpu.parallel import distributed

    seen = {}

    def fake_init(coordinator_address=None, num_processes=None, process_id=None):
        seen.update(addr=coordinator_address, n=num_processes, pid=process_id)
        raise RuntimeError("stop before real networking")

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setenv("ISCC_SEARCH_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("ISCC_SEARCH_NUM_HOSTS", "4")
    monkeypatch.setenv("ISCC_SEARCH_HOST_ID", "2")
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="stop before real networking"):
        distributed.init_distributed()
    assert seen == {"addr": "10.0.0.1:1234", "n": 4, "pid": 2}


def test_global_mesh_spans_all_devices():
    from iscc_search_tpu.parallel.distributed import global_mesh

    mesh = global_mesh()
    assert int(np.prod(list(mesh.shape.values()))) == len(jax.devices())
