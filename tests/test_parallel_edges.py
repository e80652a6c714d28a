"""Edge/error arms of the parallel modules (mesh shapes, guards, env glue)."""

import numpy as np
import pytest

from iscc_search_tpu.parallel import make_mesh
from iscc_search_tpu.parallel.hier import make_mesh_2d, shard_database_2d
from iscc_search_tpu.parallel.mesh import SHARD_AXIS


def test_make_mesh_defaults_to_all_devices():
    import jax

    mesh = make_mesh()
    assert mesh.shape[SHARD_AXIS] == len(jax.devices())


def test_make_mesh_too_many_devices():
    with pytest.raises(ValueError, match="only"):
        make_mesh(10_000)


def test_make_mesh_2d_explicit_and_default():
    mesh = make_mesh_2d(2, 4)
    assert mesh.shape == {"dcn": 2, "ici": 4}
    default = make_mesh_2d()  # n_hosts=1 single process -> 1 x all
    assert default.shape["dcn"] == 1


def test_make_mesh_2d_indivisible_hosts():
    with pytest.raises(ValueError, match="not divisible"):
        make_mesh_2d(3)  # 8 virtual devices don't split over 3 hosts


def test_make_mesh_2d_over_capacity():
    with pytest.raises(ValueError, match="only"):
        make_mesh_2d(2, 4096)


def test_shard_database_2d_indivisible_rows():
    mesh = make_mesh_2d(2, 4)
    codes = np.zeros((100, 8), np.uint32)  # not divisible by 8 shards
    with pytest.raises(ValueError, match="not divisible"):
        shard_database_2d(mesh, codes, np.full(100, 8, np.int32), np.ones(100, bool))


def test_int_env_parsing(monkeypatch):
    from iscc_search_tpu.parallel.distributed import _int_env

    monkeypatch.delenv("ISCC_TEST_INT", raising=False)
    assert _int_env("ISCC_TEST_INT") is None
    monkeypatch.setenv("ISCC_TEST_INT", "")
    assert _int_env("ISCC_TEST_INT") is None
    monkeypatch.setenv("ISCC_TEST_INT", "7")
    assert _int_env("ISCC_TEST_INT") == 7


def test_init_distributed_explicit_process_id_zero(monkeypatch):
    """process_id=0 is falsy but explicit: must NOT fall back to the env."""
    import jax

    from iscc_search_tpu.parallel import distributed

    seen = {}

    def fake_init(coordinator_address=None, num_processes=None, process_id=None):
        seen.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        raise RuntimeError("stop before real cluster join")

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setenv("ISCC_SEARCH_HOST_ID", "3")
    with pytest.raises(RuntimeError):
        distributed.init_distributed("127.0.0.1:9999", 2, 0)
    assert seen["process_id"] == 0
    assert seen["num_processes"] == 2


def test_global_mesh_spans_all_devices():
    import jax

    from iscc_search_tpu.parallel.distributed import global_mesh

    mesh = global_mesh()
    assert mesh.shape[SHARD_AXIS] == len(jax.devices())
