"""
iscc-search-tpu — TPU-native similarity-search framework for ISCC codes.

A ground-up JAX/XLA/Pallas redesign of the capabilities of iscc/iscc-search:
device-resident bit-packed ISCC-UNIT codes in HBM, exhaustive XOR+popcount
NPHD scan kernels with fused top-k (exact search, recall 1.0), per-unit-type
partitioning, granular SIMPRINT chunk matching, multi-chip sharding over a
``jax.sharding.Mesh`` with collective top-k merge, plus the full product
surface: protocol backends, REST server, CLI, remote client, and the IDP
transparency-log aggregator.
"""

import platformdirs as _platformdirs

__version__ = "0.5.0"

#: Platform dirs for default data locations (mirrors reference iscc_search.dirs)
dirs = _platformdirs.PlatformDirs(appname="iscc-search-tpu", appauthor="iscc")
