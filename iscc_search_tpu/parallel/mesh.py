"""Device mesh construction for sharded search."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

SHARD_AXIS = "shards"


def make_mesh(n_devices=None, axis_name=SHARD_AXIS):
    # type: (int | None, str) -> Mesh
    """
    1-D device mesh over the first ``n_devices`` devices.

    The database rows shard along this single axis (capacity scaling — the
    analog of the reference's file-level shard rotation, SURVEY §2.3); queries
    replicate. On a pod slice the axis rides ICI; across hosts jax.distributed
    extends the same mesh over DCN.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, only {len(devices)} available")
    return Mesh(np.array(devices[:n_devices]), (axis_name,))
