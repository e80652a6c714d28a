"""Branch-coverage round 7: device-index edges.

Covers the engine's recall-target (approx) scan path, the atomic-write
failure cleanup, and recall_target normalization.
"""

import numpy as np
import pytest

from iscc_search_tpu.engine.device_index import DeviceNphdIndex, _atomic_write


@pytest.fixture
def rng():
    return np.random.default_rng(77)


def test_engine_recall_target_scan_path(tmp_path, rng):
    """A recall_target routes the scan through the approx XLA path and still
    surfaces a planted exact match at rank 0 with correct scores."""
    idx = DeviceNphdIndex(tmp_path / "i", recall_target=0.95)
    assert idx.recall_target == 0.95
    bodies = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes() for _ in range(4096)]
    idx.add(list(range(4096)), bodies)
    res = idx.search([bodies[1234]], count=8)
    keys, scores = res[0]
    assert scores[0] == pytest.approx(1.0, abs=2e-3)
    got = int.from_bytes(bytes(keys[0][: idx.key_bytes]), "big")
    assert got == 1234
    # reported scores are the true per-row scores (not estimates)
    one = idx.search_one(bodies[1234], count=3)
    assert one[1234] == pytest.approx(1.0, abs=2e-3)
    idx.close()


def test_recall_target_one_means_exact(tmp_path):
    """recall_target >= 1.0 normalizes to None (the exact path)."""
    idx = DeviceNphdIndex(tmp_path / "i", recall_target=1.0)
    assert idx.recall_target is None
    idx.close()


def test_atomic_write_cleans_tmp_on_failure(tmp_path, monkeypatch):
    """A failed atomic write must not leave the temp file behind or the
    destination created."""
    target = tmp_path / "out.bin"

    import iscc_search_tpu.engine.device_index as di

    def boom(_src, _dst):
        raise OSError("replace failed")

    monkeypatch.setattr(di.os, "replace", boom)
    with pytest.raises(OSError, match="replace failed"):
        _atomic_write(target, b"payload")
    monkeypatch.undo()
    assert not target.exists()
    assert list(tmp_path.iterdir()) == []  # temp file removed
    # and the unpatched writer works in the same directory afterwards
    _atomic_write(target, b"payload")
    assert target.read_bytes() == b"payload"


def test_str_from_int_parity_with_model_path():
    from iscc_search_tpu.models import IsccID

    for rid in (0, 1):
        for key in (0, 1, 2**64 - 1, 1234567890123456789, 0x8000000000000000):
            assert IsccID.str_from_int(key, rid) == str(IsccID.from_int(key, rid))
    with pytest.raises(ValueError, match="realm_id"):
        IsccID.str_from_int(1, 2)


def test_metadata_from_asset_bytes_contract():
    from iscc_search_tpu.indexes import common

    raw = b'{"iscc_id": "ISCC:MAAJU3PXJ3Y5EXGA", "metadata": {"name": "n", "x": [1]}}'
    assert common.metadata_from_asset_bytes(raw) == {"name": "n", "x": [1]}
    assert common.metadata_from_asset_bytes(b'{"iscc_id": "ISCC:MAAJU3PXJ3Y5EXGA"}') is None
    with pytest.raises(RuntimeError, match="corrupt stored asset"):
        common.metadata_from_asset_bytes(b"not json")


def test_metadata_corruption_never_becomes_client_error():
    """Non-dict metadata in a stored record is server-side corruption: it
    must raise RuntimeError (-> 500) here, not leak into response-model
    validation (-> 422, blaming the client)."""
    from iscc_search_tpu.indexes import common

    for blob in (b'{"metadata": "garbage"}', b'{"metadata": [1]}', b'["not", "a", "record"]'):
        with pytest.raises(RuntimeError, match="corrupt stored asset"):
            common.metadata_from_asset_bytes(blob)


def test_str_from_int_rejects_out_of_range_keys():
    from iscc_search_tpu.models import IsccID

    for bad in (-1, 2**64, 2**65 + 5):
        with pytest.raises(OverflowError):
            IsccID.str_from_int(bad, 0)
