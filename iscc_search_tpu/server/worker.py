"""HTTP worker process entry point: `python -m iscc_search_tpu.server.worker`.

Spawned by server/scaleout.py with ISCC_SCALEOUT_CONFIG in the environment;
binds the public port with SO_REUSEPORT and serves the full WSGI app with
every index call routed to the engine process over its unix socket.
"""

from iscc_search_tpu.server.scaleout import worker_main

if __name__ == "__main__":  # pragma: no cover - exercised as a subprocess
    worker_main()
