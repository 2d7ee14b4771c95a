"""Scene builders + a headless runner.

The reference demonstrates solid/liquid/gas phases interactively
(doc/project.typ:169-191). These builders reproduce those regimes — phase is
set by lattice spacing (potential energy) and initial speed (kinetic energy /
temperature) — at the benchmark sizes from BASELINE.json. Boxes are sized to
the particle count so density, not count, selects the phase.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

from particle_simulator_tpu.io.frame import DataStructure, Frame, MieParams
from particle_simulator_tpu.io.presets import ParticleLattice

# leapfrog stability envelope: dt = 10 fs is stable long-horizon
# (doc/project.typ:209); the 50 fs default is only safe for sparse scenes
STABLE_DT = 10e-15


def _scene(
    nx: int,
    ny: int,
    distance_factor: float,
    speed: float,
    box_fill: float = 0.5,
    dt: float = STABLE_DT,
    steps_per_frame: int = 100,
    seed: int = 0,
) -> Frame:
    """Lattice scene centered in a box sized so the lattice spans ``box_fill``
    of the box diagonal-wise."""
    frame = Frame.new()
    meta = frame.metadata
    r0 = MieParams.nitrogen().force0_r()
    span = max(nx, ny) * r0 * distance_factor
    box = span / box_fill
    meta.box_width = box
    meta.box_height = box
    meta.step_dt = dt
    meta.steps_per_frame = steps_per_frame
    lat = ParticleLattice((nx, ny), distance_factor=distance_factor, velocity=(0.0, speed))
    lat.hex_square(frame, (box / 2, box / 2), rng=np.random.default_rng(seed))
    return frame


def liquid_droplet(n_side: int = 45) -> Frame:
    """~2k-particle droplet: near-equilibrium spacing, warm enough to flow
    (the reference's default interactive regime)."""
    return _scene(n_side, n_side, distance_factor=1.1, speed=80.0, box_fill=0.45)


def gas_diffusion(n_side: int = 128) -> Frame:
    """16k-particle gas: sparse start, hot — particles fill the box."""
    return _scene(n_side, n_side, distance_factor=2.5, speed=400.0, box_fill=0.7)


def solid_crystal(n_side: int = 256) -> Frame:
    """64k-particle crystal: equilibrium spacing, cold — the hex lattice holds."""
    return _scene(n_side, n_side, distance_factor=1.0, speed=5.0, box_fill=0.6)


def phase_sweep_frames(n_side: int = 512, temps=(5.0, 80.0, 250.0, 600.0)) -> list[tuple[str, Frame]]:
    """States-of-matter temperature ramp at 256k particles: the same lattice
    re-thermalized at increasing speeds (kinetic temperature). Send each frame
    in sequence to sweep solid -> liquid -> gas."""
    return [
        (f"T{int(v)}", _scene(n_side, n_side, distance_factor=1.05, speed=v, box_fill=0.5, seed=i))
        for i, v in enumerate(temps)
    ]


SCENES = {
    "liquid_droplet": liquid_droplet,
    "gas_diffusion": gas_diffusion,
    "solid_crystal": solid_crystal,
}


@dataclasses.dataclass
class SceneStats:
    frames: int
    particles: int
    steps_per_frame: int
    elapsed_s: float
    steps_per_sec: float
    mean_speed: float

    def json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


def run_scene(
    frame: Frame,
    frames: int = 10,
    render_dir: str | None = None,
    size: int = 512,
    data_structure: DataStructure = DataStructure.MATRIX_BUCKETS,
    device=None,
    gif: str | None = None,
    gif_delay_cs: int = 8,
) -> SceneStats:
    """Advance a scene on-device with the production Simulator; optionally
    render each produced frame to PNG and/or an animated GIF (the analog of
    the reference's doc/*.gif demos)."""
    from particle_simulator_tpu.engine.simulator import Simulator
    from particle_simulator_tpu.editor.render import render_frame, write_gif, write_png

    frame.metadata.data_structure = data_structure
    if device is not None:
        frame.metadata.device = device
    sim = Simulator()
    sim.load_frame(frame)

    outputs = []
    t0 = time.perf_counter()
    for _ in range(frames):
        sim.frame_async()
        outputs.append(sim.read_frame())
    elapsed = time.perf_counter() - t0

    if render_dir:
        import os

        os.makedirs(render_dir, exist_ok=True)
        for i, f in enumerate(outputs):
            write_png(os.path.join(render_dir, f"frame_{i:05d}.png"), render_frame(f, size, size))
    if gif:
        write_gif(gif, (render_frame(f, size, size) for f in outputs),
                  delay_cs=gif_delay_cs)

    last = outputs[-1]
    speed = np.hypot(last.particles["vx"], last.particles["vy"])
    spf = frame.metadata.steps_per_frame
    return SceneStats(
        frames=frames,
        particles=last.particle_count,
        steps_per_frame=spf,
        elapsed_s=round(elapsed, 4),
        steps_per_sec=round(frames * spf / elapsed, 2),
        mean_speed=float(speed.mean()) if len(speed) else 0.0,
    )


def main(argv=None) -> int:
    import os

    value = os.environ.get("JAX_PLATFORMS")
    if value and all(p in ("cpu", "tpu", "gpu", "cuda") for p in value.split(",")):
        # the TPU tunnel plugin overrides the env var; pin via config too
        # (plugin-specific names are left to the plugin)
        import jax

        jax.config.update("jax_platforms", value)

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("scene", choices=sorted(SCENES) + ["phase_sweep"])
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--render", default=None, help="directory for PNG output")
    ap.add_argument("--gif", default=None, help="write an animated GIF here")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--device", type=int, default=None,
                    help="0 = accelerator (default), 1 = CPU (jnp path)")
    args = ap.parse_args(argv)

    if args.scene == "phase_sweep":
        for label, frame in phase_sweep_frames():
            stats = run_scene(frame, frames=args.frames,
                              render_dir=f"{args.render}/{label}" if args.render else None,
                              size=args.size, device=args.device)
            print(label, stats.json())
        return 0

    stats = run_scene(SCENES[args.scene](), frames=args.frames,
                      render_dir=args.render, size=args.size, device=args.device,
                      gif=args.gif)
    print(stats.json())
    return 0


if __name__ == "__main__":
    sys.exit(main())
