"""
Multi-host cluster worker: one process of a ``jax.distributed`` CPU cluster.

Spawned by tests/test_multihost.py and __graft_entry__.dryrun_multihost with
N processes x M virtual CPU devices each (env must be prepared BEFORE python
starts: JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=M,
JAX_CPU_COLLECTIVES_IMPLEMENTATION=gloo). Each process contributes only its
own row block via jax.make_array_from_process_local_data — no process ever
holds the full database — then runs the hierarchical (ici -> dcn) top-k
merge end-to-end and verifies the replicated result against an independent
numpy brute-force NPHD mirror built from the shared RNG seed.

This is the executable proof of the multi-host leg (BASELINE config 5): the
reference cannot serve one index from multiple processes at all
(/root/reference/iscc_search/indexes/usearch/manager.py:43-47).

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import sys

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


def main(process_id, num_processes, port):
    import jax

    jax.distributed.initialize(f"localhost:{port}", num_processes=num_processes, process_id=process_id)
    import jax.numpy as jnp

    from iscc_search_tpu.ops import pack_codes
    from iscc_search_tpu.ops.pm1_scan import prepare_queries
    from iscc_search_tpu.parallel import hier_pm1_topk, hier_topk, make_global_array, make_mesh_2d

    assert jax.process_count() == num_processes, f"cluster came up with {jax.process_count()} processes"
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
    q_codes, q_lanes = pack_codes(bodies[: 4])

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

    # Production pm1-matmul scan over a single 256-bit partition: brute-force
    # mirror fixes db lanes at full width to match partition semantics.
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

    print(
        f"multihost p{process_id}: OK — {num_processes} processes x {local} devices, "
        f"db={n_db} rows ({n_shards} shards, host-local feed), hierarchical ici->dcn merge, "
        f"popcount + pm1 top-{k} verified vs numpy brute force",
        flush=True,
    )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
