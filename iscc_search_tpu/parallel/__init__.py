"""Multi-chip sharding: mesh helpers and collective top-k merge over ICI."""

from iscc_search_tpu.parallel.mesh import make_mesh
from iscc_search_tpu.parallel.sharded import shard_database, sharded_topk

__all__ = ["make_mesh", "shard_database", "sharded_topk"]
