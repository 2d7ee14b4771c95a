"""Decompose the rebucket/move pass cost at the 1M user grid (1024x1024x16).

The r3 userscene_decomp measured the move at 24.9 ms live / ~9 ms on an
all-tombstone grid (amortized /16 = ~13% of user-scene step cost). This
probe splits that into:

  dest   move_dest_direct alone (XLA elementwise + bit-packed cumsums)
  place  the pull-place pallas kernel with a PRECOMPUTED destid input
  move   the full bucket_move_pallas (dest + place fused in one jit)

each timed live (the 22%-occupancy editor lattice) and on an all-tombstone
grid (the vacuum floor: input DMA + reduces + dest math, no pull passes).
Reference for the work being skipped: kernel_bucket.cuh:5-39 (the pull scan).

Usage: python scripts/move_decomp.py [--cap 16] [--reps 30]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honor JAX_PLATFORMS before any device probe: the axon plugin ignores the
# env var alone, and with the tunnel down an unpinned import hangs
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from particle_simulator_tpu.engine.simulator import GridConfig
from particle_simulator_tpu.engine.state import empty_state, state_from_numpy
from particle_simulator_tpu.io.frame import Frame
from particle_simulator_tpu.io.presets import ParticleLattice
from particle_simulator_tpu.physics.bucket import (
    bucketize_numpy,
    move_dest_direct,
    state_to_grid,
)
from particle_simulator_tpu.ops.bucket_pallas import bucket_move_pallas


def barrier(x):
    # block_until_ready doesn't sync over the tunnel; tiny device_get does
    jax.device_get(jax.tree.leaves(x)[0].ravel()[:1])


def timeit(fn, *args, reps=30):
    out = fn(*args)
    barrier(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    barrier(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=16)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--side", type=int, default=1024, help="lattice side (particles = side^2)")
    ap.add_argument("--grid-log2", type=int, default=10, help="bucket grid log2 per axis")
    ap.add_argument("--interpret", action="store_true", help="CPU smoke (interpret-mode kernel)")
    ap.add_argument("--lane-chunks", type=int, default=1,
                    help="column-skip chunks for the pull-place kernel (must "
                         "divide bx with a 128-multiple chunk width)")
    args = ap.parse_args()

    cfg = GridConfig(args.grid_log2, args.grid_log2, args.cap)  # default: the 1M user grid
    frame = Frame.new()
    meta = frame.metadata
    lat = ParticleLattice((args.side, args.side), distance_factor=1.3,
                          velocity=(0.0, 0.0))
    lat.hex_square(frame, (meta.box_width / 2, meta.box_height / 2),
                   rng=np.random.default_rng(3))
    layout = bucketize_numpy(frame.particles, cfg)
    live = state_to_grid(state_from_numpy(layout, cfg.capacity), cfg)
    live = jax.device_put(live)
    dead = jax.device_put(empty_state(cfg.grid_shape))

    from particle_simulator_tpu.ops.bucket_pallas import move_dest_pallas

    dest_fn = jax.jit(move_dest_direct)
    destp_fn = functools.partial(move_dest_pallas, interpret=args.interpret)
    move_fn = functools.partial(
        bucket_move_pallas, interpret=args.interpret,
        lane_chunks=args.lane_chunks,
    )

    results = {}
    for name, st in (("live", live), ("dead", dead)):
        d = timeit(dest_fn, st, reps=args.reps)
        dp = timeit(destp_fn, st, reps=args.reps)
        m = timeit(move_fn, st, reps=args.reps)
        results[f"dest_ms_{name}"] = round(d, 3)
        results[f"destp_ms_{name}"] = round(dp, 3)  # Pallas dest kernel (r5)
        results[f"move_ms_{name}"] = round(m, 3)
        results[f"place_ms_{name}"] = round(m - d, 3)  # upper bound: no fusion credit

    n_live = int(np.asarray(jax.device_get(live.ty) >= 0).sum())
    import json

    print(json.dumps({
        "metric": "move-pass-decomposition",
        "grid": list(cfg.grid_shape),
        "live_particles": n_live,
        "lane_chunks": args.lane_chunks,
        **results,
        "device": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
