"""Branch coverage round 14: poller pipeline edges (orphan worker, up-to-date
hub, pre-set stop), simprint engine arms (empty remove, empty-corpus IDF,
non-file residue in data_size), pm1 scan dtype/validation arms."""

import asyncio
import io

import httpx
import jax.numpy as jnp
import numpy as np
import pytest

from iscc_search_tpu.aggregator import hublist, poller, tlog
from iscc_search_tpu.indexes.memory import MemoryIndex
from iscc_search_tpu.options import SearchOptions
from iscc_search_tpu.schema import IsccIndex


# ------------------------------------------------------------- poller arms


class _FakeWorkerProc:
    """Quacks like a convert-worker Popen whose stdout hit EOF."""

    def __init__(self):
        self.stdin = io.BytesIO()
        self.stdout = io.BytesIO()  # empty -> read_frame returns None
        self.pid = 777

    def wait(self, timeout=None):
        return 0

    def poll(self):
        return 0


def test_convert_pool_orphan_proc_not_in_roster():
    """A checked-out worker that is no longer in the roster (pool closed
    concurrently) still gets reaped, without a remove() crash."""
    pool = poller.ConvertPool(1)
    fake = _FakeWorkerProc()
    pool._idle.append(fake)  # idle but never registered in _procs
    with pytest.raises(EOFError, match="conversion worker exited"):
        pool._roundtrip([b"r"], 0, "testnet")
    assert fake not in pool._idle


def _checkpoint_client(tree_size):
    def handler(request):
        if request.url.path == "/log/checkpoint":
            return httpx.Response(200, text=f"origin\n{tree_size}\nhash\n")
        raise AssertionError(f"unexpected fetch: {request.url.path}")  # pragma: no cover

    return httpx.AsyncClient(transport=httpx.MockTransport(handler))


def test_poll_hub_once_already_up_to_date():
    """tree_size == cursor: zero groups, the prefetch task slot stays None."""
    index = MemoryIndex()
    index.create_index(IsccIndex(name="idptest"))
    client = _checkpoint_client(300)
    hub = hublist.Hub(hub_id=0, url="https://hub0.example")

    async def go():
        stop = asyncio.Event()
        return await poller.poll_hub_once(client, hub, 300, index, "idptest", "testnet", stop)

    result = asyncio.run(go())
    assert result.error is None and result.last_size == 300
    index.close()


def test_poll_loop_with_stop_preset():
    index = MemoryIndex()
    opts = SearchOptions(
        index_uri="memory://",
        aggregator_network="testnet",
        aggregator_hub_list_url="https://hub0.example/hubs.yaml",
    )

    async def go():
        stop = asyncio.Event()
        stop.set()
        await poller.poll_loop(index, opts, stop, client=None, status={})

    asyncio.run(go())
    index.close()


# ------------------------------------------------------------ simprint arms


def test_simprint_remove_empty_and_data_size_residue(tmp_path):
    from iscc_search_tpu.engine import simprint_ops as sp_ops
    from iscc_search_tpu.engine.simprint import SimprintEngine

    rng = np.random.default_rng(41)
    eng = SimprintEngine(tmp_path / "sp", ndim=128)
    eng.remove([])  # empty removal is a no-op, not an engine call
    keys = [sp_ops.pack_chunk_pointer(b"\x01" * 8, 0, 10)]
    eng.add_raw(keys, [rng.integers(0, 256, 16, dtype=np.uint8).tobytes()])
    eng.save()
    (eng.path / "residue-dir").mkdir()  # non-file glob hit in data_size
    assert eng.data_size > 0
    eng.close()


def test_simprint_empty_corpus_scores_zero(tmp_path):
    """total_assets=0 makes every IDF 0.0: the zero-denominator arm."""
    from iscc_search_tpu.engine import simprint_ops as sp_ops
    from iscc_search_tpu.engine.simprint import SimprintEngine

    rng = np.random.default_rng(42)
    eng = SimprintEngine(tmp_path / "sp", ndim=128)
    vec = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
    eng.add_raw([sp_ops.pack_chunk_pointer(b"\x02" * 8, 0, 5)], [vec])
    matches = eng.search_raw([vec], limit=5, threshold=0.5, total_assets=0)
    assert matches and matches[0].score == 0.0
    eng.close()


# ----------------------------------------------------------- pm1 scan arms


def test_pm1_paths_with_float32_dtype():
    from iscc_search_tpu.ops.pm1_scan import pm1_blockmax_topk, pm1_topk, prepare_queries

    rng = np.random.default_rng(43)
    n = 1024
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    q_pm1, q_scale = prepare_queries(packed[:4], np.full(4, 8, np.int32), 256)
    args = (jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed), jnp.asarray(valid))
    s_bf, _ = pm1_topk(*args, 5, 256, chunk_size=256, dtype=jnp.bfloat16)
    s_f32, _ = pm1_topk(*args, 5, 256, chunk_size=256, dtype=jnp.float32)
    assert np.allclose(np.asarray(s_bf), np.asarray(s_f32), atol=2e-3)
    s_bm, _ = pm1_blockmax_topk(*args, 5, 256, chunk_size=256, block=128, dtype=jnp.float32)
    assert np.allclose(np.sort(np.asarray(s_bm), 1), np.sort(np.asarray(s_f32), 1), atol=2e-3)


def test_pm1_blockmax_rejects_misaligned_block():
    from iscc_search_tpu.ops.pm1_scan import pm1_blockmax_topk, prepare_queries

    rng = np.random.default_rng(44)
    n = 1024
    packed = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    q_pm1, q_scale = prepare_queries(packed[:2], np.full(2, 8, np.int32), 256)
    with pytest.raises(ValueError, match="divide"):
        pm1_blockmax_topk(
            jnp.asarray(q_pm1), jnp.asarray(q_scale), jnp.asarray(packed),
            jnp.asarray(np.ones(n, bool)), 5, 256, chunk_size=256, block=96,
        )
