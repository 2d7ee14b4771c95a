"""Diagnose cross-process persistent-compile-cache misses on the axon tunnel.

Run 4 of the build found identical programs recompiling in every process
(BASELINE.md config-5 note): e.g. `bench.py --user-scene` compiled the
1024x1024x16 lane_chunks=8 frame program at 11:52, and the daemon recompiled
the same program (38-byte-different executable, different cache key) at 12:43
the same day. jax's cache key (jax/_src/cache_key.py) hashes, besides the
canonicalized module:
  - backend.platform_version        (_hash_platform)
  - serialized compile options      (_hash_serialized_compile_options)
  - topology.serialize()            (_hash_accelerator_config)
and the axon plugin registers with session_id=str(uuid.uuid4()) per process
(sitecustomize.py) — if that uuid (or anything else per-process) leaks into
platform_version or the serialized topology, every process gets fresh keys
and the persistent cache never hits across restarts.

This script prints each ingredient plus the per-entry hashes jax logs at
DEBUG while compiling a trivial program. Run it TWICE (two processes) and
diff the output: the first differing entry is the culprit.

    python scripts/diag_cachekey.py > /tmp/ck1.txt 2>&1
    python scripts/diag_cachekey.py > /tmp/ck2.txt 2>&1
    diff /tmp/ck1.txt /tmp/ck2.txt
"""

from __future__ import annotations

import hashlib
import logging
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    logging.basicConfig(stream=sys.stderr)
    for name in ("jax._src.cache_key", "jax._src.compilation_cache"):
        logging.getLogger(name).setLevel(logging.DEBUG)

    from particle_simulator_tpu.utils.compile_cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    print("cache_dir:", cache_dir, flush=True)

    import jax

    dev = jax.devices()[0]
    client = dev.client
    print("platform:", dev.platform)
    print("platform_version:", repr(client.platform_version))
    print("device_kind:", dev.device_kind)
    print("runtime_type:", getattr(client, "runtime_type", "?"))

    from jax._src.lib import xla_client

    try:
        topo = xla_client.get_topology_for_devices([dev])
        blob = topo.serialize()
        print("topology_platform_version:", repr(topo.platform_version))
        print("topology_serialized_sha256:", hashlib.sha256(blob).hexdigest(),
              "len", len(blob))
    except Exception as e:  # backends without serializable topology
        print("topology serialize failed:", type(e).__name__, e)

    import jax.numpy as jnp

    # tiny but unique-enough program; the DEBUG log prints the cumulative
    # cache-key hash after each ingredient — diff two runs to find the
    # first ingredient that diverges
    f = jax.jit(lambda a: (a @ a + 1.5).sum())
    x = jnp.ones((128, 128), jnp.float32)
    print("result:", float(f(x)), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
