"""Headline benchmark: bucket-path particle-steps/sec on one chip.

Scene: a full 1M-particle bucket grid (256x512 buckets x 8 slots; the
reference caps at 65,536 = 64x64x16, kernel.cuh:14-20) at condensed-phase
density, advanced with the production frame runner (100 leapfrog steps per
dispatch, rebucket every 16 — the reference's defaults). Grid choice: the
step kernel's roll-pass count scales with bucket capacity, so cap 8 over a
2x-finer grid does half the pair-enumeration work of cap 16 at the same slot
count, with the 3x3 window still covering the full force range.

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
    """Fill every interior bucket with ``fill`` particles jittered inside the
    bucket at ~equilibrium spacing (condensed phase: every bucket interaction
    is live, no NaN-prone overlaps), cold (sigma = 1 m/s), with the boundary
    bucket ring left empty as a wall margin. Spacing 1.0 r0 + cold + margin
    minimize bucket-overflow drops over long runs (an attractive 1.1-spacing
    scene slowly condenses and sheds ~14%/1000 steps; this one ~5-7%, mostly
    the square->hex lattice relaxation transient). Returns the LIVE count."""
    from particle_simulator_tpu.engine.state import SimParams, state_from_numpy
    from particle_simulator_tpu.io.frame import PARTICLE_DTYPE, MieParams, default_metadata
    from particle_simulator_tpu.physics.bucket import state_to_grid

    meta = default_metadata()
    n = cfg.buckets * fill
    r0 = MieParams.nitrogen().force0_r()

    # Bucket-ALIGNED hexagonal lattice — the 2D ground state — so the crystal
    # neither relaxes (a square lattice is a saddle point: it melts, clumps,
    # and overflows buckets over thousands of steps) nor straddles bucket
    # boundaries: each bucket holds exactly `fill` particles as `cols` hex
    # columns x `rows` hex rows, at spacing d = r0.
    rows = 2 if fill <= 8 else 4
    assert fill % rows == 0, "fill must split into hex rows"
    cols = fill // rows
    d = r0
    box_w = float(cfg.bx * cols * d)
    box_h = float(cfg.by * rows * (np.sqrt(3.0) / 2.0) * d)
    meta["box_width"] = box_w
    meta["box_height"] = box_h
    # the reference's stability envelope: leapfrog is stable at dt = 10 fs for
    # >10 ns sim-time (doc/project.typ:209); the 50 fs metadata default blows
    # up at condensed-phase density
    meta["step_dt"] = 10e-15

    rng = np.random.default_rng(0)
    bxs = np.arange(cfg.bx, dtype=np.int64)
    bys = np.arange(cfg.by, dtype=np.int64)
    parts = np.zeros(n, dtype=PARTICLE_DTYPE)
    gx, gy, gs = np.meshgrid(bxs, bys, np.arange(fill, dtype=np.int64), indexing="xy")
    gx, gy, gs = gx.ravel(), gy.ravel(), gs.ravel()
    col = gs % cols
    row = gs // cols
    ixg = gx * cols + col  # global hex column
    iyg = gy * rows + row  # global hex row
    # odd rows offset by d/2; +d/4 centering keeps every particle inside its
    # own bucket's [4k, 4k+4) d window
    px = (ixg + 0.5 * (iyg % 2) + 0.25) * d
    py = (iyg + 0.5) * (np.sqrt(3.0) / 2.0) * d
    # ~1% of the spacing of jitter to break exact symmetry
    px = px + rng.uniform(-0.01, 0.01, n) * d
    py = py + rng.uniform(-0.01, 0.01, n) * d
    parts["x"] = np.clip(px / box_w * 2**32, 0, 2**32 - 1).astype(np.uint64).astype(np.uint32)
    parts["y"] = np.clip(py / box_h * 2**32, 0, 2**32 - 1).astype(np.uint64).astype(np.uint32)
    parts["vx"] = rng.normal(0, 1.0, n).astype(np.float32)
    parts["vy"] = rng.normal(0, 1.0, n).astype(np.float32)
    parts["ty"] = 0
    # wall margin: the outer bucket ring stays empty, else the repulsive walls
    # compress the edge rows and the resulting density wave overflows buckets
    interior = (gx > 0) & (gx < cfg.bx - 1) & (gy > 0) & (gy < cfg.by - 1)
    parts["ty"][~interior] = -1

    state = state_to_grid(state_from_numpy(parts, cfg.capacity), cfg)
    params = SimParams.from_record(meta)
    return state, params, int(np.count_nonzero(interior))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=1_048_576)
    ap.add_argument("--frames", type=int, default=10, help="timed frame dispatches")
    ap.add_argument("--steps", type=int, default=100, help="physics steps per frame")
    ap.add_argument("--fill", type=int, default=8, help="particles per bucket")
    ap.add_argument("--sharded", action="store_true",
                    help="run the multi-chip program (shard_map + halo "
                         "exchange + edge-rows kernel) over a mesh of the "
                         "available devices — on one chip this measures the "
                         "shard overhead vs the single-chip runner")
    ap.add_argument("--user-scene", action="store_true",
                    help="bench the editor-drawn configuration instead of the "
                         "dense grid: a hex lattice at 1.1 r0 spacing filling "
                         "half the box, grid chosen by the engine's own "
                         "density-aware _grid_for (2x occupancy headroom -> "
                         "cap-16 at this density) — the honest interactive "
                         "number, and the case the kernel's occupancy/dead-"
                         "block pass skips exist for")
    ap.add_argument("--warm-siblings", default=True,
                    action=argparse.BooleanOptionalAction,
                    help="[--user-scene only] after measuring, compile the "
                         "grid's other lane-chunk signature into the "
                         "persistent cache (de-fragments warm restarts)")
    ap.add_argument("--lane-chunks", type=int, default=0,
                    help="[--user-scene only] override the engine's "
                         "occupancy-chosen lane-chunk count (0 = auto) — "
                         "for same-window A/B of the column-chunk skip")
    ap.add_argument("--ext-io", choices=("auto", "off", "compact", "nocompact"),
                    default="auto",
                    help="[--user-scene only] lane-chunked step layout "
                         "(sets PS_EXT_IO): auto/off = the classic per-step "
                         "ext (the measured winner), compact = persistent "
                         "pad-extended state + live-tile-compacted schedule, "
                         "nocompact = persistent layout, plain tile grid — "
                         "the same-window A/B knob")
    ap.add_argument("--per-frame", action="store_true",
                    help="barrier every frame (1-element readback) and report "
                         "the per-frame time distribution — run-to-run "
                         "variance / throttling diagnosis. Adds one tunnel "
                         "RTT per frame, so the aggregate rate reads low; "
                         "the distribution shape is the point")
    args = ap.parse_args(argv)

    import os

    if args.ext_io != "auto":
        os.environ["PS_EXT_IO"] = args.ext_io

    import jax

    value = os.environ.get("JAX_PLATFORMS")
    if value and all(p in ("cpu", "tpu", "gpu", "cuda") for p in value.split(",")):
        # the TPU tunnel plugin overrides the env var; pin via config too —
        # without this a JAX_PLATFORMS=cpu bench run lands on the chip (and
        # blocks on the single-tenant tunnel if anything else is using it)
        jax.config.update("jax_platforms", value)

    from particle_simulator_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()  # warm re-runs skip the 45-90 s Mosaic compile

    from particle_simulator_tpu.physics.bucket import GridConfig, run_frame_bucket
    from particle_simulator_tpu.ops.bucket_pallas import run_frame_bucket_pallas

    if args.user_scene:
        return bench_user_scene(args)

    # Smallest power-of-two grid holding the particle target at `fill`/bucket,
    # grown x-first so buckets are (2:1 wide or square) — cap 8 over a finer
    # grid: the roll-pass count scales with cap (3*(4*cap-1)), so at equal
    # slot count a cap-8 grid does HALF the pair-enumeration work of cap-16
    # while the 3x3 window (>= 2 bucket widths >= 4.4 sigma) still covers the
    # full force range like the reference's own ~2-sigma buckets
    # (kernel.cuh:14-20).
    kx = ky = 2
    while (1 << (kx + ky)) * args.fill < args.particles:
        if kx == ky:
            ky += 1
        else:
            kx += 1
    cfg = GridConfig(kx, ky, args.fill)

    state, params, n = dense_grid_scene(cfg, args.fill)
    params = params._replace(steps_per_frame=np.int32(args.steps))
    state = jax.device_put(state, jax.devices()[0])

    # Pallas kernel on the accelerator; jnp path on CPU (where Mosaic can't run)
    on_tpu = jax.devices()[0].platform != "cpu"
    if args.sharded:
        from particle_simulator_tpu.parallel.domain import (
            grid_sharding,
            make_mesh,
            make_sharded_frame_fn,
        )

        mesh = make_mesh()
        frame_fn = make_sharded_frame_fn(
            cfg, mesh, donate=True, kernel="pallas" if on_tpu else "jnp"
        )
        state = jax.device_put(state, grid_sharding(mesh))
    else:
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

    frame_times = []
    t0 = time.perf_counter()
    if args.per_frame:
        # tiny readback as the per-frame barrier: a full-field barrier would
        # ship 67 MB/frame at 16M over the tunnel and drown the signal
        import jax.numpy as jnp

        probe = jax.jit(lambda s: jnp.sum(s.vx[0, :1]))
        for _ in range(args.frames):
            tf = time.perf_counter()
            state = frame_fn(state, params)
            float(jax.device_get(probe(state)))
            frame_times.append(time.perf_counter() - tf)
        vx = barrier(state)
    else:
        for _ in range(args.frames):
            state = frame_fn(state, params)
        vx = barrier(state)
    elapsed = time.perf_counter() - t0
    assert np.isfinite(vx).all(), "benchmark scene diverged"
    live_end = int(np.count_nonzero(np.asarray(jax.device_get(state.ty)) >= 0))

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
                # bucket-overflow drops are reference semantics
                # (kernel_bucket.cuh:30-31); reported for transparency —
                # per-step compute is slot-based and unaffected by drops
                "live_fraction_end": round(live_end / n, 4),
                "device": str(jax.devices()[0].platform),
                **(
                    {"sharded_mesh": list(mesh.devices.shape)}
                    if args.sharded
                    else {}
                ),
                **(
                    {
                        "frame_s": {
                            "min": round(min(frame_times), 3),
                            "p50": round(float(np.median(frame_times)), 3),
                            "max": round(max(frame_times), 3),
                            "cv": round(
                                float(np.std(frame_times) / np.mean(frame_times)), 3
                            ),
                        },
                        "frame_s_series": [round(t, 3) for t in frame_times],
                    }
                    if frame_times
                    else {}
                ),
            }
        )
    )
    return 0


def bench_user_scene(args) -> int:
    """Editor-drawn configuration: lattice scene through the engine's own
    Simulator (grid via _grid_for, per-frame dispatch like the daemon)."""
    import jax

    from particle_simulator_tpu.engine.simulator import Simulator
    from particle_simulator_tpu.scenes.library import _scene

    side = max(2, int(round(args.particles ** 0.5)))
    frame = _scene(side, side, distance_factor=1.1, speed=1.0, box_fill=0.5)
    frame.metadata.steps_per_frame = args.steps
    mesh = None
    if args.sharded:
        # the full multi-chip program on this host's mesh (1x1 on the single
        # dev chip): the sparse user scene is where the sharded lane-chunk
        # column skip (parallel/domain.py tombstone-margin x-pad) engages —
        # A/B against --lane-chunks 1 measures it on hardware
        from particle_simulator_tpu.parallel.domain import make_mesh

        mesh = make_mesh()
    sim = Simulator(mesh=mesh)
    sim.load_frame(frame)
    if args.lane_chunks:
        sim._lane_chunks = args.lane_chunks
    n = int(np.count_nonzero(frame.particles["ty"] >= 0))

    # Warmup: compile AND warm the host-transfer path. The tunnel's first
    # two large device_gets run 25-85x slow (measured 9.1 s / 2.7 s / 107 ms
    # for the same 84 MB readback) — a single cold read_frame inside the
    # timed window used to under-report this bench by ~2.6x.
    sim.frame_async()
    for _ in range(3):
        sim.read_frame()

    def barrier():
        return np.asarray(jax.device_get(sim.state.vx.reshape(-1)[:1]))

    t0 = time.perf_counter()
    for _ in range(args.frames):
        sim.frame_async()
    barrier()  # tiny readback: syncs without shipping the grid
    elapsed = time.perf_counter() - t0

    # per-frame readback measured separately (the daemon overlaps it with
    # compute via the ticket pipeline; serializing it into the step-rate
    # window would double-count)
    t0 = time.perf_counter()
    out = sim.read_frame()
    readback_s = time.perf_counter() - t0
    assert np.isfinite(out.particles["vx"]).all(), "benchmark scene diverged"

    g = sim.grid
    value = n * args.steps * args.frames / elapsed
    print(
        json.dumps(
            {
                "metric": "particle-steps/sec/chip",
                "scene": "user-lattice",
                "value": round(value, 1),
                "unit": "particle*steps/s",
                "vs_baseline": round(value / NORTH_STAR, 3),
                "particles": n,
                "steps_per_frame": args.steps,
                "frames": args.frames,
                "elapsed_s": round(elapsed, 3),
                "sim_steps_per_sec": round(args.steps * args.frames / elapsed, 2),
                "readback_ms": round(readback_s * 1e3, 1),
                "readback_k": sim._readback_k,
                "readback_ncap": sim._readback_ncap,
                "grid": [g.by, g.bx, g.cap],
                # column-chunk skip factor chosen from scene occupancy
                # (ops/bucket_pallas.py lane_chunks); 1 = unchunked kernel
                "lane_chunks": sim._lane_chunks,
                # persistent pad-extended layout mode (PS_EXT_IO / --ext-io)
                "ext_io": args.ext_io,
                "device": str(jax.devices()[0].platform),
                **(
                    {"sharded_mesh": list(mesh.devices.shape)}
                    if mesh is not None
                    else {}
                ),
            }
        )
    )
    if args.warm_siblings:
        # AFTER the measurement window: compile the grid's other lane-chunk
        # signature so the persistent compile cache covers this grid for any
        # scene occupancy (e.g. a webview-drawn lattice that picks the other
        # variant) — the r3 warm-restart fragmentation fix
        n_warm = sim.warm_sibling_lane_chunks()
        if n_warm:
            print(f"bench: warmed {n_warm} sibling lane-chunk signature(s)",
                  file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
