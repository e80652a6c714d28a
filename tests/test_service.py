"""Multi-host SPMD control plane (parallel/service.py) and its product
wiring, exercised in-process: a coordinator and a follower instance connected
over localhost with the follower loop on a thread, driving a recording dummy
engine. The real two-process cluster runs in test_multihost.py (slow)."""

import threading
import time

import pytest

from iscc_search_tpu.parallel.service import MultihostService


def _free_port():
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


class DummyEngine:
    """Records the impl-level calls the follower loop applies."""

    def __init__(self, rows=0, live=0):
        self.calls = []
        self._rows = rows
        self._live = live
        self.save_enabled = True
        self.control_hook = None

    def _search_impl(self, bodies, count):
        self.calls.append(("search", bodies, count))
        return [("keys", "scores")] * len(bodies)

    def _add_impl(self, keys, vectors):
        self.calls.append(("add", keys, vectors))
        self._rows += len(keys)
        self._live += len(keys)

    def _remove_impl(self, keys):
        self.calls.append(("remove", keys))
        self._live -= len(keys)
        return len(keys)


@pytest.fixture
def pair():
    port = _free_port()
    results = {}

    def make_coord():
        results["coord"] = MultihostService(True, n_followers=1, host="127.0.0.1", port=port, timeout=30)

    t = threading.Thread(target=make_coord)
    t.start()
    follower = MultihostService(False, coordinator_host="127.0.0.1", port=port, timeout=30)
    t.join(timeout=30)
    coord = results["coord"]
    yield coord, follower
    coord.stop()
    follower.stop()


def test_ops_mirror_in_order(pair):
    coord, follower = pair
    engine = DummyEngine()
    loop = threading.Thread(target=follower.follow, args=(lambda name: engine,))
    loop.start()

    local = DummyEngine()
    coord.hook("idx:DATA", local)
    # Mutations wait for the follower ack, so ordering is deterministic
    local.control_hook("add", ([1, 2], [b"aaaa", b"bbbb"]), lambda: local._add_impl([1, 2], [b"aaaa", b"bbbb"]))
    local.control_hook("remove", ([2],), lambda: local._remove_impl([2]))
    coord.check("idx:DATA", rows=2, live=1)
    result = local.control_hook("search", ([b"aaaa"], 5), lambda: local._search_impl([b"aaaa"], 5))
    assert result == [("keys", "scores")]

    coord.stop()
    loop.join(timeout=30)
    assert not loop.is_alive()
    # search has no ack; the stop broadcast flushes it through the socket
    assert engine.calls == [
        ("add", [1, 2], [b"aaaa", b"bbbb"]),
        ("remove", [2]),
        ("search", [b"aaaa"], 5),
    ]
    assert local.calls == engine.calls
    assert engine.save_enabled is False  # follower replicas never persist


def test_check_mismatch_fails_follower_loudly(pair):
    coord, follower = pair
    engine = DummyEngine(rows=7, live=7)
    errors = []

    def run():
        try:
            follower.follow(lambda name: engine)
        except RuntimeError as e:
            errors.append(e)

    loop = threading.Thread(target=run)
    loop.start()
    with pytest.raises((RuntimeError, ConnectionError, OSError)):
        coord.check("idx:DATA", rows=99, live=99)
        # The follower closes its socket instead of acking; a second op then
        # surfaces the dead channel even if the first send won the race.
        coord.check("idx:DATA", rows=99, live=99)
    loop.join(timeout=30)
    assert errors and "replica state mismatch" in str(errors[0])


def test_unknown_op_fails_follower(pair):
    coord, follower = pair
    errors = []

    def run():
        try:
            follower.follow(lambda name: DummyEngine())
        except ValueError as e:
            errors.append(e)

    loop = threading.Thread(target=run)
    loop.start()
    with pytest.raises((RuntimeError, ConnectionError, OSError)):
        coord.run_op(("frobnicate", "idx:DATA"), lambda: None)
        coord.run_op(("frobnicate", "idx:DATA"), lambda: None)
    loop.join(timeout=30)
    assert errors and "unknown control op" in str(errors[0])


def test_channel_close_releases_follower(pair):
    coord, follower = pair
    loop = threading.Thread(target=follower.follow, args=(lambda name: DummyEngine(),))
    loop.start()
    for conn in coord._conns:
        conn.close()
    loop.join(timeout=30)
    assert not loop.is_alive()


def test_stop_is_idempotent(pair):
    coord, follower = pair
    coord.stop()
    coord.stop()
    follower.stop()
    follower.stop()


def test_follower_connect_times_out():
    with pytest.raises(OSError):
        MultihostService(False, coordinator_host="127.0.0.1", port=_free_port(), timeout=0.5)


def test_coordinator_accept_times_out():
    import socket

    with pytest.raises(socket.timeout):
        MultihostService(True, n_followers=1, host="127.0.0.1", port=_free_port(), timeout=0.3)


def test_oversize_message_rejected(pair):
    coord, follower = pair
    from iscc_search_tpu.parallel import service as svc

    sock = follower._sock
    # Forge a length prefix beyond the cap directly on the wire
    coord._conns[0].sendall(svc._LEN.pack(svc._MAX_OP_BYTES + 1))
    with pytest.raises(ValueError):
        svc._recv_msg(sock)


class TestTpuIndexWiring:
    def test_mesh_hosts_option_builds_2d_mesh(self, tmp_path):
        from iscc_search_tpu.indexes.tpu import TpuIndex

        idx = TpuIndex(tmp_path / "i", mesh_hosts=2, mesh_devices=4)
        mesh = idx._device_mesh()
        assert tuple(mesh.axis_names) == ("dcn", "ici")
        assert mesh.shape == {"dcn": 2, "ici": 4}
        # Single process: no control plane, even with a 2-D mesh
        assert idx._service is None
        idx.close()

    def test_follow_requires_follower_service(self, tmp_path):
        from iscc_search_tpu.indexes.tpu import TpuIndex

        idx = TpuIndex(tmp_path / "i")
        with pytest.raises(RuntimeError, match="follower processes"):
            idx.follow()
        idx.close()

    def test_rebuild_guard_under_multihost(self, tmp_path):
        from iscc_search_tpu.indexes.tpu import TpuIndex

        idx = TpuIndex(tmp_path / "i")
        idx._service = object()  # pretend the control plane is live
        with pytest.raises(RuntimeError, match="rebuild is unsupported"):
            idx.rebuild(["DATA_NONE_V0"], [])
        idx._service = None
        idx.close()

    def test_resolve_replica_rejects_foreign_index(self, tmp_path):
        from iscc_search_tpu.indexes.tpu import TpuIndex

        idx = TpuIndex(tmp_path / "mine")
        with pytest.raises(ValueError, match="this follower serves"):
            idx._resolve_replica("other:DATA_NONE_V0")
        # Matching prefix resolves (and creates) the replica engine
        engine = idx._resolve_replica("mine:DATA_NONE_V0")
        assert engine is idx._nphd_indexes["DATA_NONE_V0"]
        idx.close()

    def test_end_to_end_search_on_2d_mesh(self, tmp_path, entry_factory):
        """TpuIndex search_assets through the 2-D mesh path, single process."""
        from iscc_search_tpu.indexes.tpu import TpuIndex
        from iscc_search_tpu.schema import IsccEntry, IsccQuery

        idx = TpuIndex(tmp_path / "i", mesh_hosts=2, mesh_devices=4)
        entries = [IsccEntry(**entry_factory()) for _ in range(40)]
        idx.add_assets(entries)
        res = idx.search_assets(IsccQuery(units=entries[0].units), limit=5)
        assert res.global_matches and res.global_matches[0].iscc_id == entries[0].iscc_id
        idx.close()


class TestServeWiring:
    def test_multihost_index_name_fallbacks(self):
        from iscc_search_tpu.options import SearchOptions
        from iscc_search_tpu.server.httpd import _multihost_index_name

        assert _multihost_index_name(SearchOptions(multihost_index="abc")) == "abc"
        assert _multihost_index_name(SearchOptions()) is None
        agg = SearchOptions(aggregator_network="testnet")
        assert _multihost_index_name(agg) == agg.aggregator_index_name

    def test_serve_follower_requires_index_name(self):
        from iscc_search_tpu.options import SearchOptions
        from iscc_search_tpu.server.httpd import _serve_follower

        with pytest.raises(ValueError, match="MULTIHOST_INDEX"):
            _serve_follower(SearchOptions())

    def test_serve_follower_requires_tpu_backend(self):
        from iscc_search_tpu.options import SearchOptions
        from iscc_search_tpu.server.httpd import _serve_follower

        with pytest.raises(ValueError, match="does not support multi-host"):
            _serve_follower(SearchOptions(multihost_index="x", index_uri="memory://"))

    def test_manager_open_index_eagerly_loads(self, tmp_path):
        from iscc_search_tpu.indexes.tpu import TpuIndexManager

        mgr = TpuIndexManager(tmp_path)
        idx = mgr.open_index("warm")
        assert "warm" in mgr._index_cache and idx is mgr._index_cache["warm"]
        mgr.close()

    def test_manager_follow_index_without_cluster_raises(self, tmp_path):
        from iscc_search_tpu.indexes.tpu import TpuIndexManager

        mgr = TpuIndexManager(tmp_path)
        with pytest.raises(RuntimeError, match="follower processes"):
            mgr.follow_index("solo")
        mgr.close()
