"""Isolate per-step kernel cost across grid shapes (diagnosis tool).

Times ONLY bucket_step_pallas (no move, no frame machinery) via an on-device
100-iteration fori loop, for the same ~262k-particle sparse lattice bucketized
into different grid geometries. Separates the cost drivers: pass count (cap),
lane width (L = bx*cap), row count, slot count.

Usage (TPU host): python scripts/probe_step_cost.py [--iters 100]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--side", type=int, default=512)
    ap.add_argument("--grids", default="9x9x16,10x9x8,9x10x8,9x9x8",
                    help="comma list of bxlog2 x bylog2 x cap")
    args = ap.parse_args(argv)

    value = os.environ.get("JAX_PLATFORMS")
    if value and all(p in ("cpu", "tpu", "gpu", "cuda") for p in value.split(",")):
        import jax

        jax.config.update("jax_platforms", value)
    import jax
    import jax.numpy as jnp

    from particle_simulator_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from particle_simulator_tpu.engine.state import SimParams, state_from_numpy
    from particle_simulator_tpu.ops.bucket_pallas import bucket_step_pallas
    from particle_simulator_tpu.physics.bucket import GridConfig, bucketize_numpy, state_to_grid
    from particle_simulator_tpu.scenes.library import _scene

    frame = _scene(args.side, args.side, distance_factor=1.1, speed=1.0, box_fill=0.5)
    meta = frame.metadata
    live = frame.particles[frame.particles["ty"] >= 0]
    p = SimParams.from_record(meta.copy())

    for g in args.grids.split(","):
        kx, ky, cap = (int(v) for v in g.split("x"))
        cfg = GridConfig(kx, ky, cap)
        layout = bucketize_numpy(live, cfg)
        dropped = len(live) - int(np.count_nonzero(layout["ty"] >= 0))
        state = state_to_grid(state_from_numpy(layout, cfg.capacity), cfg)
        state = jax.device_put(state, jax.devices()[0])

        loop = jax.jit(
            lambda s, p: jax.lax.fori_loop(
                0, args.iters, lambda i, t: bucket_step_pallas(t, p), s
            ),
            donate_argnums=(0,),
        )
        t0 = time.perf_counter()
        state = loop(state, p)
        np.asarray(jax.device_get(state.vx[:1, :1]))
        compile_and_first = time.perf_counter() - t0

        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            state = loop(state, p)
            np.asarray(jax.device_get(state.vx[:1, :1]))
            times.append(time.perf_counter() - t0)
        per_step_ms = min(times) / args.iters * 1e3
        by, bx = cfg.by, cfg.bx
        L = bx * cfg.cap
        passes = 3 * (4 * cfg.cap - 1)
        print(
            f"grid {by}x{bx}x{cfg.cap}: L={L} slots={cfg.capacity/1e6:.1f}M "
            f"passes={passes} dropped={dropped} "
            f"step={per_step_ms:.3f} ms  per-pass-lane={per_step_ms*1e6/ (by*L*passes):.4f} ns "
            f"(first+compile {compile_and_first:.1f} s)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
