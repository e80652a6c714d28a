"""
Shared shard-merge helpers for row-sharded top-k scans.

Every sharded scan follows the same shape: a local top-k per device, local row
indices lifted to global rows, then a candidate merge across the mesh's row
axes. For a 1-D mesh this is one all-gather + top-k (flat merge over ICI). For
the 2-D multi-host (dcn, ici) mesh the merge is HIERARCHICAL: gather + reduce
over the fast ICI axis first (intra-host), then over DCN (inter-host) — only
``n_hosts * merge_k`` candidates per query cross the slow network instead of
``n_hosts * chips_per_host * merge_k`` (see parallel/hier.py for the design
rationale; the reference cannot run this configuration at all —
/root/reference/iscc_search/indexes/usearch/manager.py:43-47).

These helpers run INSIDE a shard_map body; ``axes`` is the mesh's row-axis
tuple ordered outer-to-inner (e.g. ``("dcn", "ici")``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from iscc_search_tpu.ops.nphd import NEG_SCORE


def flat_shard_index(axes):
    # type: (tuple) -> jax.Array
    """Row-major flat shard id of this device over the mesh's row axes."""
    shard = jax.lax.axis_index(axes[0])
    for ax in axes[1:]:
        shard = shard * jax.lax.psum(1, ax) + jax.lax.axis_index(ax)
    return shard


def lift_rows(idx, local_rows, axes):
    # type: (jax.Array, int, tuple) -> jax.Array
    """Map local row indices (-1 = empty) to global rows (host-major order)."""
    return jnp.where(idx >= 0, idx + flat_shard_index(axes) * local_rows, -1)


def merge_topk(scores, idx, axes, merge_k):
    # type: (jax.Array, jax.Array, tuple, int) -> tuple
    """
    Merge per-shard (Q, k) candidates to a replicated global top-``merge_k``.

    Reduces over the INNERMOST axis first: on a (dcn, ici) mesh the ICI
    gather+select runs per host before anything touches DCN, so DCN traffic
    is ``merge_k`` floats per query per host, independent of chips per host.
    On a 1-D mesh this is exactly the flat all-gather merge.
    """
    for ax in reversed(axes):
        s = jax.lax.all_gather(scores, ax, axis=1, tiled=True)
        i = jax.lax.all_gather(idx, ax, axis=1, tiled=True)
        scores, pos = jax.lax.top_k(s, min(merge_k, s.shape[1]))
        idx = jnp.take_along_axis(i, pos, axis=1)
    return scores, jnp.where(scores > NEG_SCORE, idx, -1)
