"""Demo scene library: the states-of-matter workloads from the reference's
report (doc/project.typ:169-191 — solid/liquid/gas GIFs) and the benchmark
configs (BASELINE.json), as reproducible Frame builders.

Each builder returns a ready-to-send scene Frame; ``run_scene`` advances one
on-device and can dump rendered PNGs — the headless analog of watching the
editor.
"""

from particle_simulator_tpu.scenes.library import (
    SCENES,
    gas_diffusion,
    liquid_droplet,
    phase_sweep_frames,
    run_scene,
    solid_crystal,
)

__all__ = [
    "SCENES",
    "gas_diffusion",
    "liquid_droplet",
    "phase_sweep_frames",
    "run_scene",
    "solid_crystal",
]
