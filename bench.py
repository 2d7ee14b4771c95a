"""Headline benchmark: bucket-path particle-steps/sec on one chip.

Scene: a full 1M-particle bucket grid (256x256 buckets x 16 slots — the LARGE
config; the reference caps at 65,536 = 64x64x16, kernel.cuh:14-20) at liquid
density, advanced with the production frame runner (100 leapfrog steps per
dispatch, rebucket every 16 — the reference's defaults).

Prints ONE JSON line. ``vs_baseline`` is measured against the BASELINE.json
north star: 1M particles x 60 sim-steps/sec = 6.0e7 particle-steps/sec/chip.

Usage: python bench.py [--particles N] [--frames K] [--steps S]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


NORTH_STAR = 6.0e7  # particle-steps/sec: >=1M particles x >=60 steps/s


def dense_grid_scene(cfg, fill: int):
    """Fill every bucket with ``fill`` particles jittered inside the bucket,
    box sized so mean spacing ~= 1.1 equilibrium distances (liquid density) —
    every bucket interaction is live, no NaN-prone overlaps."""
    from particle_simulator_tpu.engine.state import SimParams, state_from_numpy
    from particle_simulator_tpu.io.frame import PARTICLE_DTYPE, MieParams, default_metadata
    from particle_simulator_tpu.physics.bucket import state_to_grid

    meta = default_metadata()
    n = cfg.buckets * fill
    r0 = MieParams.nitrogen().force0_r()
    box = float(np.sqrt(n) * r0 * 1.1)
    meta["box_width"] = box
    meta["box_height"] = box
    # the reference's stability envelope: leapfrog is stable at dt = 10 fs for
    # >10 ns sim-time (doc/project.typ:209); the 50 fs metadata default blows
    # up at liquid density
    meta["step_dt"] = 10e-15

    rng = np.random.default_rng(0)
    # per-bucket lattice-ish jitter: fill slots at distinct sub-positions
    bxs = np.arange(cfg.bx, dtype=np.uint64)
    bys = np.arange(cfg.by, dtype=np.uint64)
    cell_w = np.uint64(1 << (32 - cfg.bx_log2))
    cell_h = np.uint64(1 << (32 - cfg.by_log2))

    parts = np.zeros(n, dtype=PARTICLE_DTYPE)
    gx, gy, gs = np.meshgrid(bxs, bys, np.arange(fill, dtype=np.uint64), indexing="xy")
    gx, gy, gs = gx.ravel(), gy.ravel(), gs.ravel()
    # sub-grid inside each bucket: ceil(sqrt(fill))^2 sites, take first `fill`
    side = int(np.ceil(np.sqrt(fill)))
    sub_x = (gs % side).astype(np.uint64)
    sub_y = (gs // side).astype(np.uint64)
    # keep jitter ~3% of the lattice spacing: larger overlaps blow up the
    # stiff r^-13 repulsion at dt = 50 fs
    jitter = rng.integers(0, max(int(cell_w) // (32 * side), 1), size=(2, n)).astype(np.uint64)
    parts["x"] = (gx * cell_w + (sub_x * cell_w) // side + cell_w // (2 * side) + jitter[0]).astype(np.uint32)
    parts["y"] = (gy * cell_h + (sub_y * cell_h) // side + cell_h // (2 * side) + jitter[1]).astype(np.uint32)
    parts["vx"] = rng.normal(0, 30, n).astype(np.float32)
    parts["vy"] = rng.normal(0, 30, n).astype(np.float32)
    parts["ty"] = 0

    state = state_to_grid(state_from_numpy(parts, cfg.capacity), cfg)
    params = SimParams.from_record(meta)
    return state, params, n


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=1_048_576)
    ap.add_argument("--frames", type=int, default=10, help="timed frame dispatches")
    ap.add_argument("--steps", type=int, default=100, help="physics steps per frame")
    ap.add_argument("--fill", type=int, default=16, help="particles per bucket")
    args = ap.parse_args(argv)

    import jax

    from particle_simulator_tpu.physics.bucket import GridConfig, run_frame_bucket
    from particle_simulator_tpu.ops.bucket_pallas import run_frame_bucket_pallas

    # smallest square power-of-two grid holding the particle target at `fill`/bucket
    k = 2
    while (1 << (2 * k)) * args.fill < args.particles:
        k += 1
    cfg = GridConfig(k, k, args.fill)

    state, params, n = dense_grid_scene(cfg, args.fill)
    params = params._replace(steps_per_frame=np.int32(args.steps))
    state = jax.device_put(state, jax.devices()[0])

    # Pallas kernel on the accelerator; jnp path on CPU (where Mosaic can't run)
    on_tpu = jax.devices()[0].platform != "cpu"
    runner = run_frame_bucket_pallas if on_tpu else run_frame_bucket
    frame_fn = jax.jit(
        lambda s, p: runner(s, p, move_every=cfg.move_every),
        donate_argnums=(0,),
    )

    def barrier(s):
        # block_until_ready is not a reliable sync on the remote-tunnel
        # platform; a host readback of one field is
        return np.asarray(jax.device_get(s.vx))

    # warmup/compile
    state = frame_fn(state, params)
    barrier(state)

    t0 = time.perf_counter()
    for _ in range(args.frames):
        state = frame_fn(state, params)
    vx = barrier(state)
    elapsed = time.perf_counter() - t0
    assert np.isfinite(vx).all(), "benchmark scene diverged"

    value = n * args.steps * args.frames / elapsed
    print(
        json.dumps(
            {
                "metric": "particle-steps/sec/chip",
                "value": round(value, 1),
                "unit": "particle*steps/s",
                "vs_baseline": round(value / NORTH_STAR, 3),
                "particles": n,
                "steps_per_frame": args.steps,
                "frames": args.frames,
                "elapsed_s": round(elapsed, 3),
                "sim_steps_per_sec": round(args.steps * args.frames / elapsed, 2),
                "device": str(jax.devices()[0].platform),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
