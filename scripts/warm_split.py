"""Decompose the pinned-mode warm-restart floor (VERDICT r4 item 6).

Config-5's `first_frames_wait_s` under `--no-progressive-compile` is, at
HEAD, almost entirely the warm-compile thread (queue r5f: first dispatch
waited 19.7 / 106.1 / 72.0 s across three back-to-back windows while
bucketize 1.0-2.5 s hid completely). That thread's work is opaque from the
daemon logs: it traces + lowers the 100-step frame program (host CPU),
looks up the persistent compile cache, deserializes the executable (tunnel
+ server), and runs one dummy dispatch. This probe splits those phases with
the AOT API on the EXACT jit signature the 1M user scene selects
(1024x1024x16, block_rows 16, lane_chunks 8), so BASELINE can attribute
the floor — and its 3.6x window variance — to the real phase.

Usage (TPU host, tunnel idle):  python scripts/warm_split.py
Run it twice back-to-back: both runs hit the persistent cache; the delta
is the window variance the cfg5 legs see.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    t_start = time.perf_counter()
    from particle_simulator_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from particle_simulator_tpu.engine.simulator import _run_bucket_pallas
    from particle_simulator_tpu.engine.state import SimParams, empty_state
    from particle_simulator_tpu.io.frame import default_metadata
    from particle_simulator_tpu.physics.bucket import GridConfig

    accel = jax.devices()[0]
    t_init = time.perf_counter() - t_start  # import + backend/tunnel handshake

    # the 1M user-lattice signature (warm_last_scene's exact key): cap-16
    # grid from _grid_for's 2x-headroom rule, lane_chunks 8, block_rows 16
    cfg = GridConfig(10, 10, 16, 16)
    params = SimParams.from_record(default_metadata())

    t0 = time.perf_counter()
    dummy = jax.device_put(empty_state(cfg.grid_shape), accel)
    jax.block_until_ready(dummy)
    t_upload = time.perf_counter() - t0

    t0 = time.perf_counter()
    lowered = _run_bucket_pallas.lower(
        dummy, params, block_rows=16, lane_chunks=8,
        ext_io=False, compact_tiles=True,
    )
    t_lower = time.perf_counter() - t0  # trace + lower (host CPU, 1 core)

    t0 = time.perf_counter()
    compiled = lowered.compile()  # persistent-cache hit -> deserialize
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = compiled(dummy, params)
    jax.block_until_ready(out)
    t_exec = time.perf_counter() - t0

    print(json.dumps({
        "metric": "warm-restart-split",
        "grid": [cfg.bx, cfg.by, cfg.cap],
        "init_s": round(t_init, 2),
        "state_upload_s": round(t_upload, 2),
        "trace_lower_s": round(t_lower, 2),
        "compile_deserialize_s": round(t_compile, 2),
        "first_exec_s": round(t_exec, 2),
        "total_s": round(time.perf_counter() - t_start, 2),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
