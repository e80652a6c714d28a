"""
Multi-host cluster worker: one process of a ``jax.distributed`` CPU cluster.

Spawned by tests/test_multihost.py and __graft_entry__.dryrun_multihost with
N processes x M virtual CPU devices each (env must be prepared BEFORE python
starts: JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=M,
JAX_CPU_COLLECTIVES_IMPLEMENTATION=gloo). Two layers run end-to-end:

1. Kernel layer: each process contributes only its own row block via
   jax.make_array_from_process_local_data — no process ever holds the full
   database on device — then runs the hierarchical (ici -> dcn) top-k merge
   and verifies the replicated result against an independent numpy brute
   force mirror built from the shared RNG seed.
2. Engine layer (production-shaped at scale="prod"): the PRODUCT's
   DeviceNphdIndex opens over the 2-D mesh with three length partitions
   (64/128/256-bit, the 256-bit one at >= 64Ki rows per shard), tombstones
   via remove(), and symmetric SPMD search calls; top-k scores and
   index<->score consistency are verified against a chunked numpy mirror.

This is the executable proof of the multi-host leg (BASELINE config 5): the
reference cannot serve one index from multiple processes at all
(/root/reference/iscc_search/indexes/usearch/manager.py:43-47).

Usage: python multihost_worker.py <process_id> <num_processes> <port> [scale]
       scale: "quick" (default, pytest) or "prod" (driver dryrun shape)
"""

import sys
import tempfile

import numpy as np


def brute_force_nphd(q_codes, q_lanes, db_codes, db_lanes, valid):
    """Vectorized numpy NPHD similarity mirror (independent of the JAX path)."""
    q_codes = np.asarray(q_codes, np.uint32)
    db_codes = np.asarray(db_codes, np.uint32)
    nq, nl = q_codes.shape
    nd = db_codes.shape[0]
    xor = q_codes[:, None, :].view(np.uint8).reshape(nq, 1, nl * 4) ^ db_codes[None, :, :].view(np.uint8).reshape(
        1, nd, nl * 4
    )
    lane_pops = np.unpackbits(xor, axis=-1).reshape(nq, nd, nl, 32).sum(-1)  # (Q, N, L)
    prefix = np.cumsum(lane_pops, axis=-1)  # hamming over first l lanes
    min_lanes = np.minimum(np.asarray(q_lanes, np.int64)[:, None], np.asarray(db_lanes, np.int64)[None, :])
    ham = np.take_along_axis(prefix, np.maximum(min_lanes, 1)[:, :, None] - 1, axis=-1)[:, :, 0]
    scores = 1.0 - ham / np.maximum(min_lanes * 32, 1)
    return np.where(np.asarray(valid, bool)[None, :], scores, -1.0)


def brute_topk_scores(q_codes, q_lanes, db_codes, db_lanes, valid, k, chunk=65536):
    """Global top-k expected SCORES per query, streamed in row chunks (the
    monolithic mirror would materialize Q x N x bits at production scale)."""
    parts = []
    for lo in range(0, db_codes.shape[0], chunk):
        s = brute_force_nphd(
            q_codes, q_lanes, db_codes[lo : lo + chunk], db_lanes[lo : lo + chunk], valid[lo : lo + chunk]
        )
        kk = min(k, s.shape[1])
        parts.append(np.sort(s, axis=1)[:, -kk:])
    cat = np.concatenate(parts, axis=1)
    return np.sort(cat, axis=1)[:, ::-1][:, :k]


def brute_row_score(q_body, db_body):
    """Exact NPHD of one query body vs one stored body (index<->score check)."""
    n = min(len(q_body), len(db_body))
    n -= n % 4  # lane-granular prefix, matching partition semantics
    n = max(n, 4)
    x = np.frombuffer(q_body[:n], np.uint8) ^ np.frombuffer(db_body[:n], np.uint8)
    return 1.0 - int(np.unpackbits(x).sum()) / (n * 8)


def _kernel_layer(process_id, num_processes):
    import jax
    import jax.numpy as jnp

    from iscc_search_tpu.ops import pack_codes
    from iscc_search_tpu.ops.pm1_scan import prepare_queries
    from iscc_search_tpu.parallel import hier_pm1_topk, hier_topk, make_global_array, make_mesh_2d

    local = jax.local_device_count()
    mesh = make_mesh_2d()
    assert mesh.shape["dcn"] == num_processes and mesh.shape["ici"] == local

    chunk, k = 128, 10
    n_shards = num_processes * local
    rows_per_host = local * chunk * 2
    n_db = num_processes * rows_per_host

    # Shared seed -> every process derives the same global database, then
    # feeds ONLY its own row block to the global array constructor.
    rng = np.random.default_rng(7)
    bodies = [rng.integers(0, 256, int(rng.choice([8, 16, 24, 32])), dtype=np.uint8).tobytes() for _ in range(n_db)]
    db_codes, db_lanes = pack_codes(bodies)
    valid = np.ones(n_db, dtype=bool)
    valid[rng.integers(0, n_db, n_db // 20)] = False  # tombstones
    q_codes, q_lanes = pack_codes(bodies[:4])

    lo, hi = process_id * rows_per_host, (process_id + 1) * rows_per_host
    g_codes = make_global_array(mesh, db_codes[lo:hi], db_codes.shape)
    g_lanes = make_global_array(mesh, db_lanes[lo:hi], db_lanes.shape, with_cols=False)
    g_valid = make_global_array(mesh, valid[lo:hi], valid.shape, with_cols=False)

    ref = brute_force_nphd(q_codes, q_lanes, db_codes, db_lanes, valid)
    scores, idx = hier_topk(
        mesh, jnp.asarray(q_codes), jnp.asarray(q_lanes), g_codes, g_lanes, g_valid, k, chunk_size=chunk
    )
    scores, idx = np.asarray(jax.block_until_ready(scores)), np.asarray(idx)
    for qi in range(scores.shape[0]):
        expected = np.sort(ref[qi])[::-1][:k]
        got = np.sort(scores[qi])[::-1]
        assert np.allclose(got, expected, atol=1e-5), f"hier popcount q{qi}: {got} vs {expected}"
        for r in range(k):
            if idx[qi, r] >= 0:
                assert abs(ref[qi, idx[qi, r]] - scores[qi, r]) < 1e-5

    # pm1-matmul scan over a single 256-bit partition: brute-force mirror
    # fixes db lanes at full width to match partition semantics.
    ref_pm1 = brute_force_nphd(q_codes, q_lanes, db_codes, np.full(n_db, 8, np.int32), valid)
    q_pm1, q_scale = prepare_queries(q_codes, q_lanes, 256)
    g_packed = make_global_array(mesh, db_codes[lo:hi], db_codes.shape)
    scores2, idx2 = hier_pm1_topk(
        mesh, jnp.asarray(q_pm1), jnp.asarray(q_scale), g_packed, g_valid, k, 256, chunk_size=chunk
    )
    scores2, idx2 = np.asarray(jax.block_until_ready(scores2)), np.asarray(idx2)
    for qi in range(scores2.shape[0]):
        expected = np.sort(ref_pm1[qi])[::-1][:k]
        got = np.sort(scores2[qi])[::-1]
        assert np.allclose(got, expected, atol=2e-3), f"hier pm1 q{qi}: {got} vs {expected}"
        for r in range(k):
            if idx2[qi, r] >= 0:
                assert abs(ref_pm1[qi, idx2[qi, r]] - scores2[qi, r]) < 2e-3
    return n_db, n_shards


def _engine_layer(process_id, num_processes, scale):
    """DeviceNphdIndex over the 2-D mesh, symmetric SPMD on every process."""
    from iscc_search_tpu.engine import DeviceNphdIndex
    from iscc_search_tpu.parallel import make_mesh_2d

    mesh = make_mesh_2d()
    n_shards = int(np.prod(list(mesh.shape.values())))
    if scale == "prod":
        parts = {32: 65536 * n_shards, 16: 4096 * n_shards, 8: 4096 * n_shards}
    else:
        parts = {32: 2048 * n_shards, 16: 512 * n_shards, 8: 512 * n_shards}

    # Shared seed: identical host state on every process (SPMD symmetric).
    rng = np.random.default_rng(23)
    bodies = []
    for nbytes, n_rows in parts.items():
        arr = rng.integers(0, 256, (n_rows, nbytes), dtype=np.uint8)
        bodies.extend(bytes(row) for row in arr)
    n_db = len(bodies)
    keys = list(range(n_db))

    idx = DeviceNphdIndex(tempfile.mkdtemp(prefix=f"mh-engine-p{process_id}-"), mesh=mesh)
    idx.add(keys, bodies)
    dead = rng.integers(0, n_db, n_db // 20)
    idx.remove([int(d) for d in set(dead.tolist())])
    valid = np.ones(n_db, bool)
    valid[dead] = False

    k = 10
    q_rows = [5, parts[32] // 2, n_db - 3]
    queries = [bodies[q_rows[0]], bodies[q_rows[1]], bodies[q_rows[2]], bodies[q_rows[0]][:8]]
    results = idx.search(queries, k)

    # Expected global top-k scores via the chunked mirror, per partition
    # (engine semantics: each row scores within its own length partition).
    from iscc_search_tpu.ops import pack_codes

    q_codes, q_lanes = pack_codes(queries)
    expected_parts = []
    row0 = 0
    for nbytes, n_rows in parts.items():
        codes, lanes = pack_codes(bodies[row0 : row0 + n_rows])
        expected_parts.append(
            brute_topk_scores(q_codes, q_lanes, codes, lanes, valid[row0 : row0 + n_rows], k)
        )
        row0 += n_rows
    expected = np.sort(np.concatenate(expected_parts, axis=1), axis=1)[:, ::-1][:, :k]

    for qi, (rkeys, rscores) in enumerate(results):
        got = np.sort(rscores)[::-1]
        assert np.allclose(got, expected[qi][: len(got)], atol=2e-3), (
            f"engine q{qi}: {got} vs {expected[qi]}"
        )
        for j in range(len(rscores)):
            row = int.from_bytes(rkeys[j].tobytes(), "big")
            assert valid[row], f"engine q{qi} returned tombstoned row {row}"
            direct = brute_row_score(queries[qi], bodies[row])
            assert abs(direct - rscores[j]) < 2e-3, (
                f"engine q{qi} rank {j}: row {row} score {rscores[j]} != direct {direct}"
            )
    idx.close()
    per_shard_256 = parts[32] // n_shards
    return n_db, per_shard_256


def main(process_id, num_processes, port, scale="quick"):
    import jax

    jax.distributed.initialize(f"localhost:{port}", num_processes=num_processes, process_id=process_id)
    assert jax.process_count() == num_processes, f"cluster came up with {jax.process_count()} processes"

    n_db, n_shards = _kernel_layer(process_id, num_processes)
    n_engine, per_shard_256 = _engine_layer(process_id, num_processes, scale)

    print(
        f"multihost p{process_id}: OK — {num_processes} processes x {jax.local_device_count()} devices; "
        f"kernel layer db={n_db} rows ({n_shards} shards, host-local feed, hierarchical ici->dcn merge, "
        f"popcount + pm1 top-10 vs numpy brute force); engine layer DeviceNphdIndex db={n_engine} rows, "
        f"3 length partitions (256-bit at {per_shard_256} rows/shard), tombstones, "
        f"top-10 + index<->score consistency verified [{scale}]",
        flush=True,
    )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4] if len(sys.argv) > 4 else "quick")
