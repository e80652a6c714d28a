"""Device index engine tests: add/remove/update/search/persistence.

These are the contract tests of the scan engine, mirroring the role of the
reference's usearch characterization tests (tests/test_usearch_*.py)."""

import numpy as np
import pytest

from iscc_search_tpu.engine import DeviceHammingIndex, DeviceNphdIndex


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def rand_body(rng, nbytes=32):
    return rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes()


def test_add_search_exact_match(tmp_path, rng):
    idx = DeviceNphdIndex(tmp_path / "i")
    bodies = [rand_body(rng) for _ in range(100)]
    idx.add(list(range(100)), bodies)
    assert idx.size == 100
    assert len(idx) == 100
    res = idx.search_one(bodies[42], count=5)
    assert res[42] == pytest.approx(1.0)
    assert max(res.values()) == res[42]


def test_contains_and_get(tmp_path, rng):
    idx = DeviceNphdIndex(tmp_path / "i")
    body = rand_body(rng, 16)
    idx.add([7], [body])
    assert 7 in idx
    assert 8 not in idx
    assert idx.get(7) == body
    assert idx.get(8) is None


def test_update_replaces_vector(tmp_path, rng):
    idx = DeviceNphdIndex(tmp_path / "i")
    b1, b2 = rand_body(rng), rand_body(rng)
    idx.add([1], [b1])
    idx.add([1], [b2])  # same key -> update
    assert idx.size == 1
    assert idx.get(1) == b2
    res = idx.search_one(b2, count=3)
    assert res[1] == pytest.approx(1.0)
    # Old vector no longer matches at 1.0
    res_old = idx.search_one(b1, count=3)
    assert res_old.get(1, 0.0) < 1.0


def test_remove(tmp_path, rng):
    idx = DeviceNphdIndex(tmp_path / "i")
    bodies = [rand_body(rng) for _ in range(10)]
    idx.add(list(range(10)), bodies)
    assert idx.remove([3, 4, 99]) == 2
    assert idx.size == 8
    assert 3 not in idx
    res = idx.search_one(bodies[3], count=10)
    assert 3 not in res


def test_variable_lengths_nphd(tmp_path, rng):
    idx = DeviceNphdIndex(tmp_path / "i")
    long_body = rand_body(rng, 32)
    idx.add([1], [long_body])
    idx.add([2], [rand_body(rng, 8)])
    # 64-bit prefix query matches the stored 256-bit code at 1.0
    res = idx.search_one(long_body[:8], count=2)
    assert res[1] == pytest.approx(1.0)


def test_search_batch(tmp_path, rng):
    idx = DeviceNphdIndex(tmp_path / "i")
    bodies = [rand_body(rng) for _ in range(50)]
    idx.add(list(range(50)), bodies)
    results = idx.search([bodies[0], bodies[1], bodies[2]], count=4)
    assert len(results) == 3
    for qi, (keys, scores) in enumerate(results):
        top_key = int.from_bytes(keys[0].tobytes(), "big")
        assert top_key == qi
        assert scores[0] == pytest.approx(1.0)


def test_empty_index_search(tmp_path, rng):
    idx = DeviceNphdIndex(tmp_path / "i")
    res = idx.search_one(rand_body(rng), count=5)
    assert res == {}


def test_persistence_roundtrip(tmp_path, rng):
    path = tmp_path / "i"
    idx = DeviceNphdIndex(path)
    bodies = [rand_body(rng) for _ in range(30)]
    idx.add(list(range(30)), bodies)
    idx.remove([5])
    assert idx.dirty == 31
    idx.save()
    assert idx.dirty == 0
    idx.close()

    idx2 = DeviceNphdIndex(path)
    assert idx2.size == 29
    assert 5 not in idx2
    assert idx2.get(7) == bodies[7]
    res = idx2.search_one(bodies[10], count=3)
    assert res[10] == pytest.approx(1.0)
    idx2.close()


def test_close_saves_dirty(tmp_path, rng):
    path = tmp_path / "i"
    idx = DeviceNphdIndex(path)
    idx.add([1], [rand_body(rng)])
    idx.close()  # implicit save
    idx2 = DeviceNphdIndex(path)
    assert idx2.size == 1
    idx2.close()


def test_update_persists_after_reload(tmp_path, rng):
    path = tmp_path / "i"
    idx = DeviceNphdIndex(path)
    b1, b2 = rand_body(rng), rand_body(rng)
    idx.add([1], [b1])
    idx.save()
    idx.add([1], [b2])
    idx.save()
    idx.close()
    idx2 = DeviceNphdIndex(path)
    assert idx2.size == 1
    assert idx2.get(1) == b2
    idx2.close()


def test_segment_sealing(tmp_path, rng):
    # Tiny shard size forces sealing
    idx = DeviceNphdIndex(tmp_path / "i", shard_size=1)  # floor = 1024 rows
    n = 3000
    keys = list(range(n))
    bodies = [rand_body(rng, 8) for _ in range(n)]
    idx.add(keys, bodies)
    idx.save()
    assert idx.shard_count >= 2
    files = list((tmp_path / "i").glob("seg-*.npz"))
    assert len(files) >= 2
    idx.close()
    idx2 = DeviceNphdIndex(tmp_path / "i", shard_size=1)
    assert idx2.size == n
    assert idx2.get(2500) == bodies[2500]
    idx2.close()


def test_compaction(tmp_path, rng):
    idx = DeviceNphdIndex(tmp_path / "i")
    bodies = [rand_body(rng, 8) for _ in range(100)]
    idx.add(list(range(100)), bodies)
    idx.remove(list(range(90)))
    assert idx.tombstone_fraction > 0.5
    idx.compact()
    assert idx.tombstone_fraction == 0.0
    assert idx.size == 10
    assert idx.get(95) == bodies[95]
    res = idx.search_one(bodies[95], count=3)
    assert res[95] == pytest.approx(1.0)


def test_reset(tmp_path, rng):
    idx = DeviceNphdIndex(tmp_path / "i")
    idx.add([1], [rand_body(rng)])
    idx.reset()
    assert idx.size == 0
    assert 1 not in idx


def test_hamming_index_composite_keys(tmp_path, rng):
    idx = DeviceHammingIndex(tmp_path / "sp", ndim=128)
    keys = [bytes([i]) * 8 + (i).to_bytes(4, "big") + (100 + i).to_bytes(4, "big") for i in range(20)]
    vecs = [rand_body(rng, 16) for _ in range(20)]
    idx.add(keys, vecs)
    assert idx.size == 20
    assert keys[3] in idx
    assert idx.get(keys[3]) == vecs[3]
    results = idx.search([vecs[5]], count=3)
    top_keys, top_scores = results[0]
    assert top_keys[0].tobytes() == keys[5]
    assert top_scores[0] == pytest.approx(1.0)


def test_hamming_persistence(tmp_path, rng):
    path = tmp_path / "sp"
    idx = DeviceHammingIndex(path, ndim=64)
    key = bytes(range(16))
    idx.add([key], [rand_body(rng, 8)])
    idx.close()
    idx2 = DeviceHammingIndex(path, ndim=64)
    assert idx2.ndim == 64
    assert key in idx2
    idx2.close()


def test_key_width_validation(tmp_path, rng):
    idx = DeviceNphdIndex(tmp_path / "i")
    with pytest.raises(ValueError):
        idx.add([b"short"], [rand_body(rng, 8)])


def test_mismatched_key_bytes_on_load(tmp_path, rng):
    path = tmp_path / "i"
    idx = DeviceNphdIndex(path)
    idx.add([1], [rand_body(rng, 8)])
    idx.close()
    with pytest.raises(ValueError):
        DeviceHammingIndex(path)


def test_concurrent_search_during_appends(tmp_path, rng):
    """Readers must always see a consistent snapshot while a writer appends.

    Guards the non-donating functional device-append design: a search that
    started against snapshot S must not crash or return corrupt scores when
    the writer extends the partition concurrently (donated buffers would be
    invalidated under the reader).
    """
    import threading

    idx = DeviceNphdIndex(tmp_path / "i")
    base = [rand_body(rng) for _ in range(512)]
    idx.add(list(range(512)), base)

    errors = []
    stop = threading.Event()

    def reader(tid):
        r = np.random.default_rng(tid)
        while not stop.is_set():
            i = int(r.integers(0, 512))
            try:
                res = idx.search([base[i]], 3)
                keys, scores = res[0]
                if not (scores[0] >= 0.999):
                    errors.append(f"reader{tid}: bad top score {scores[0]} for {i}")
                    return
            except Exception as exc:  # pragma: no cover - the failure we guard
                errors.append(f"reader{tid}: {exc!r}")
                return

    readers = [threading.Thread(target=reader, args=(t,)) for t in range(4)]
    for t in readers:
        t.start()
    try:
        for batch in range(8):  # appends force device syncs under the readers
            start = 512 + batch * 256
            idx.add(list(range(start, start + 256)), [rand_body(rng) for _ in range(256)])
            idx.search([base[0]], 1)  # force a sync + search from this thread too
    finally:
        stop.set()
        for t in readers:
            t.join(timeout=30)
    assert not errors, errors[:3]
    assert idx.size == 512 + 8 * 256
    # Everything added during the run is searchable afterwards
    res = idx.search([base[100]], 1)
    assert res[0][1][0] >= 0.999
    idx.close()


def _nphd_brute(model, qbody, k):
    """Python brute-force NPHD top-k over {key: body} (variable length)."""
    scored = []
    for key, body in model.items():
        nb = min(len(qbody), len(body))
        ham = sum((qbody[i] ^ body[i]).bit_count() for i in range(nb))
        scored.append((1.0 - ham / (nb * 8), key))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return scored[:k]


def test_device_index_model_fuzz(tmp_path):
    """Random add/update/remove/search/persist sequence vs a brute-force
    model — hardens the tombstone/compaction/segment-reload interplay."""
    import random

    rnd = random.Random(77)
    model = {}  # key -> body bytes
    path = tmp_path / "m"
    idx = DeviceNphdIndex(path)
    next_key = 1

    def rand_bodies(n):
        return [bytes(rnd.randint(0, 255) for _ in range(rnd.choice([8, 16, 32]))) for _ in range(n)]

    for step in range(40):
        r = rnd.random()
        if r < 0.45 or not model:
            n = rnd.randint(1, 60)
            keys = list(range(next_key, next_key + n))
            next_key += n
            bodies = rand_bodies(n)
            idx.add(keys, bodies)
            model.update(zip(keys, bodies))
        elif r < 0.60:
            keys = rnd.sample(sorted(model), min(len(model), rnd.randint(1, 20)))
            bodies = rand_bodies(len(keys))
            idx.add(keys, bodies)  # update = re-add same key
            model.update(zip(keys, bodies))
        elif r < 0.75:
            keys = rnd.sample(sorted(model), min(len(model), rnd.randint(1, 15)))
            idx.remove(keys)
            for key in keys:
                del model[key]
        elif r < 0.90 and model:
            qkey = rnd.choice(sorted(model))
            qbody = model[qkey] if rnd.random() < 0.7 else bytes(
                rnd.randint(0, 255) for _ in range(rnd.choice([8, 16, 32])))
            k = rnd.choice([1, 3, 10])
            (keys_arr, scores), = idx.search([qbody], k)
            got = [(round(float(scores[i]), 4), int.from_bytes(keys_arr[i].tobytes(), "big"))
                   for i in range(len(scores))]
            exp = [(round(sc, 4), key) for sc, key in _nphd_brute(model, qbody, k)]
            # Compare score multisets (ties make key sets interchangeable)
            assert [g[0] for g in got] == [e[0] for e in exp], (step, got, exp)
            for g_score, g_key in got:  # each returned key's true score matches
                nb = min(len(qbody), len(model[g_key]))
                ham = sum((qbody[i] ^ model[g_key][i]).bit_count() for i in range(nb))
                assert round(1.0 - ham / (nb * 8), 4) == g_score, (step, g_key)
        else:
            idx.save()
            idx.close()
            idx = DeviceNphdIndex(path)
            assert idx.size == len(model), (step, idx.size, len(model))

    assert idx.size == len(model)
    idx.close()


# ---------------------------------------------------------- bulk ingest path


def test_add_packed_bulk_rows_searchable(tmp_path, rng):
    """add_packed appends whole arrays; rows are searchable, persistable,
    and mutable afterwards (the bulk-ingest fast path for rebuilds and the
    100M-chunk BASELINE config 4 build)."""
    from iscc_search_tpu.ops import pack_codes

    idx = DeviceHammingIndex(tmp_path / "h", ndim=128)
    n = 300
    keys = rng.integers(0, 256, (n, 16), dtype=np.uint8)
    vecs = rng.integers(0, 256, (n, 16), dtype=np.uint8)
    packed, nlanes = pack_codes([v.tobytes() for v in vecs])
    idx.add_packed(keys, packed[:, :4], 4)
    assert idx.size == n and len(idx) == n

    (kk, ss), = idx.search([vecs[7].tobytes()], 3)
    assert ss[0] == pytest.approx(1.0)
    assert kk[0].tobytes() == keys[7].tobytes()

    # Lazy keymap builds correctly over bulk rows
    assert keys[5].tobytes() in idx
    assert idx.get(keys[5].tobytes()) == vecs[5].tobytes()

    # Mutations after bulk load behave normally (update + remove)
    idx.add([keys[7].tobytes()], [vecs[8].tobytes()])
    assert idx.size == n
    assert idx.get(keys[7].tobytes()) == vecs[8].tobytes()
    assert idx.remove([keys[3].tobytes()]) == 1
    assert idx.size == n - 1

    # Persistence roundtrip
    idx.save()
    idx.close()
    idx2 = DeviceHammingIndex(tmp_path / "h", ndim=128)
    assert idx2.size == n - 1
    assert idx2.get(keys[7].tobytes()) == vecs[8].tobytes()
    idx2.close()


def test_add_packed_variable_lanes_nphd(tmp_path, rng):
    """Bulk path with per-row lane counts (variable-length NPHD rows)."""
    idx = DeviceNphdIndex(tmp_path / "v")
    bodies = [rand_body(rng, nb) for nb in (8, 16, 32, 32, 24)]
    from iscc_search_tpu.ops import pack_codes

    packed, nlanes = pack_codes(bodies)
    keys = np.array([np.frombuffer(int(i).to_bytes(8, "big"), np.uint8) for i in range(5)])
    idx.add_packed(keys, packed, nlanes)
    assert idx.size == 5
    res = idx.search_one(bodies[1], count=2)
    assert res[1] == pytest.approx(1.0)
    idx.close()


def test_add_packed_validation_and_empty(tmp_path, rng):
    idx = DeviceHammingIndex(tmp_path / "h", ndim=128)
    idx.add_packed(np.zeros((0, 16), np.uint8), np.zeros((0, 4), np.uint32), 4)
    assert idx.size == 0
    with pytest.raises(ValueError):  # wrong key width
        idx.add_packed(np.zeros((2, 8), np.uint8), np.zeros((2, 4), np.uint32), 4)
    with pytest.raises(ValueError):  # too many lanes
        idx.add_packed(np.zeros((2, 16), np.uint8), np.zeros((2, 9), np.uint32), 9)
    with pytest.raises(ValueError):  # nlanes shape mismatch
        idx.add_packed(np.zeros((2, 16), np.uint8), np.zeros((2, 4), np.uint32), np.array([4], np.int32))
    with pytest.raises(ValueError):  # nlanes out of range
        idx.add_packed(np.zeros((2, 16), np.uint8), np.zeros((2, 4), np.uint32), 0)
    idx.close()


def test_simprint_add_packed_matches_add_raw(tmp_path, rng):
    """SimprintEngine.add_packed packs bit-exactly like the per-item path."""
    from iscc_search_tpu.engine.simprint import SimprintEngine

    n = 64
    keys = rng.integers(0, 256, (n, 16), dtype=np.uint8)
    vecs = rng.integers(0, 256, (n, 16), dtype=np.uint8)

    a = SimprintEngine(tmp_path / "a", ndim=128)
    a.add_raw([k.tobytes() for k in keys], [v.tobytes() for v in vecs])
    b = SimprintEngine(tmp_path / "b", ndim=128)
    b.add_packed(keys, vecs)
    assert a.size == b.size == n

    qa = a.search_raw([vecs[9].tobytes()], limit=5, total_assets=n)
    qb = b.search_raw([vecs[9].tobytes()], limit=5, total_assets=n)
    assert [(r.iscc_id_body, round(r.score, 6)) for r in qa] == [
        (r.iscc_id_body, round(r.score, 6)) for r in qb
    ]
    with pytest.raises(ValueError):  # wrong vector width
        b.add_packed(keys[:1], vecs[:1, :8])
    a.close()
    b.close()


def test_body_at_rows_and_stale_fallback(tmp_path, rng):
    """body_at returns stored bytes for rows from search(return_rows=True)
    and None for rows that no longer exist (rebuild raced the snapshot)."""
    idx = DeviceHammingIndex(tmp_path / "h", ndim=128)
    keys = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes() for _ in range(50)]
    vecs = [rand_body(rng, 16) for _ in range(50)]
    idx.add(keys, vecs)
    ((kk, ss, rows),) = idx.search([vecs[9]], 1, return_rows=True)
    assert kk[0].tobytes() == keys[9]
    assert idx.body_at(int(rows[0])) == vecs[9]
    # Stale rows (out of range / reset) return None instead of empty bytes
    assert idx.body_at(10_000) is None
    assert idx.body_at(-1) is None
    idx.reset()
    assert idx.body_at(int(rows[0])) is None
    idx.close()


def test_body_at_generation_guard(tmp_path, rng):
    """A compact() between search(return_rows=True) and body_at renumbers the
    row space: with the captured generation, body_at returns None (safe
    fallback) instead of silently reading a DIFFERENT key's body."""
    idx = DeviceHammingIndex(tmp_path / "h", ndim=128)
    keys = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes() for _ in range(50)]
    vecs = [rand_body(rng, 16) for _ in range(50)]
    idx.add(keys, vecs)
    gen = idx.row_generation
    ((kk, ss, rows),) = idx.search([vecs[25]], 1, return_rows=True)
    row = int(rows[0])
    assert idx.body_at(row, gen) == vecs[25]  # matching gen: real read
    # Tombstone earlier rows, then compact: live rows are renumbered and the
    # captured row id (25) now names a different key (old row 45) on the
    # post-compact 30-row layout — in range, so nothing but the generation
    # check can catch the mismatch.
    idx.remove(keys[:20])
    idx.compact()
    assert idx.row_generation != gen
    assert idx.body_at(row, gen) is None  # stale gen: guarded
    stale_unguarded = idx.body_at(row)  # legacy call: in-range row reads SOME body
    assert stale_unguarded is not None and stale_unguarded != vecs[25]
    # Fresh capture against the compacted space works again.
    gen2 = idx.row_generation
    ((kk2, ss2, rows2),) = idx.search([vecs[25]], 1, return_rows=True)
    assert idx.body_at(int(rows2[0]), gen2) == vecs[25]
    # reset() and reload both renumber: generation must move.
    idx.save(wait=True)
    idx.reset()
    gen3 = idx.row_generation
    assert gen3 != gen2
    idx.close()
    idx2 = DeviceHammingIndex(tmp_path / "h", ndim=128)
    assert idx2.row_generation not in (gen, gen2, gen3)
    idx2.close()


def test_add_packed_nlanes_exceeding_packed_width_rejected(tmp_path, rng):
    """nlanes may not claim more lanes than the packed matrix carries — the
    zero-filled tail would otherwise be scored as real code bits."""
    idx = DeviceHammingIndex(tmp_path / "h", ndim=256)
    keys = rng.integers(0, 256, (2, 16), dtype=np.uint8)
    packed = rng.integers(0, 2**32, (2, 4), dtype=np.uint32)  # 128-bit rows
    with pytest.raises(ValueError):  # 8 lanes claimed, 4 provided (<= max_lanes)
        idx.add_packed(keys, packed, 8)
    with pytest.raises(ValueError):  # per-row variant
        idx.add_packed(keys, packed, np.array([4, 5], np.int32))
    idx.add_packed(keys, packed, 4)  # exactly the provided width is fine
    assert len(idx) == 2
    idx.close()
