"""AggregatorRunner lifecycle: index creation, poller thread start/stop."""

import time

import pytest

from iscc_search_tpu.indexes.memory import MemoryIndex
from iscc_search_tpu.options import SearchOptions
from iscc_search_tpu.server.httpd import AggregatorRunner

EMPTY_HUBS = """
version: 1
network: testnet
hubs: []
"""


@pytest.fixture
def hub_list_file(tmp_path):
    f = tmp_path / "hubs.yaml"
    f.write_text(EMPTY_HUBS)
    return str(f)


def test_runner_creates_index_and_stops(hub_list_file):
    index = MemoryIndex()
    opts = SearchOptions(
        index_uri="memory://",
        aggregator_network="testnet",
        aggregator_hub_list_url=hub_list_file,
        aggregator_poll_interval=1,
    )
    status = {}
    runner = AggregatorRunner(index, opts, status)
    runner.start()
    try:
        # The aggregator index was created on start
        assert index.get_index("idptest").assets == 0
        assert runner._thread.is_alive()
        time.sleep(0.2)  # let the loop run at least once (empty hub list = idle)
    finally:
        runner.stop(timeout=10)
    assert not runner._thread.is_alive()


def test_runner_idempotent_index_creation(hub_list_file):
    from iscc_search_tpu.schema import IsccIndex

    index = MemoryIndex()
    index.create_index(IsccIndex(name="idptest"))
    opts = SearchOptions(
        index_uri="memory://",
        aggregator_network="testnet",
        aggregator_hub_list_url=hub_list_file,
        aggregator_poll_interval=1,
    )
    runner = AggregatorRunner(index, opts, {})
    runner.start()  # FileExistsError swallowed
    runner.stop(timeout=10)


def test_runner_stop_before_start_is_noop():
    runner = AggregatorRunner(MemoryIndex(), SearchOptions(index_uri="memory://"), {})
    runner.stop()
