#!/bin/sh
# Pending round-3 TPU measurements — run when the device tunnel is healthy.
# One window covers everything:
#   sh benchmarks/run_pending_r3.sh
# Probe first: a dead tunnel hangs every device op (give the probe 120s —
# a cold first compile over the tunnel can take 30-60s by itself).
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH=".:/root/.axon_site"

echo "== tunnel probe =="
timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
y = jnp.ones((64,64)) @ jnp.ones((64,64))
print('tunnel OK', float(np.asarray(y)[0,0]))"

echo "== open-loop serving sweep: pooled single-process =="
ISCC_OL_TOPOLOGY=pooled ISCC_OL_RATES=200,400,800,1600,3200,6400 \
  python benchmarks/latency_openloop.py

echo "== open-loop serving sweep: scale-out (engine + 4 workers) =="
ISCC_OL_TOPOLOGY=scaleout ISCC_OL_WORKERS=4 \
  ISCC_OL_RATES=200,400,800,1600,3200,6400 \
  python benchmarks/latency_openloop.py

echo "== config sweep refresh (incl. config 4 at 100k assets / 10M chunks) =="
ISCC_BENCH_SP_ASSETS=100000 python benchmarks/run_all.py

echo "== headline bench =="
python bench.py
