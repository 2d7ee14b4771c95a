"""Decompose the user-scene (cap-16 editor lattice) frame cost on the chip.

BASELINE.md's user-scene row (83.7 sim-steps/s at 1M on the 1024x1024x16
grid) is a single end-to-end number; this script splits it so optimization
effort aims at the real sink:

- V0  full frame on the live lattice (the bench number, same compiled
      program as `bench.py --user-scene`)
- V1  the SAME compiled program on an all-tombstone state of the same
      shape: every (row-block, lane-chunk) is dead, so pair math vanishes
      and what remains is the structural floor — XLA prologue (ext copies,
      flags/omax reduces, halo build), block DMA, copy-through writes, the
      chunked schedule, and the move pass on an empty grid. No recompile:
      only input DATA differs from V0.
- V2  the rebucket pass alone (bucket_move_pallas) on the live state —
      amortized into frames at the move_every=16 cadence by the runner.

It also snapshots bucket occupancy after V0's ~1000 steps and reports the
global vs per-(row-block, lane-chunk) omax distribution: the occupancy
residue skip (ops/bucket_pallas.py) keys on the GLOBAL max live slot, so
if relaxation spreads occupancy (global omax -> cap) while typical blocks
stay sparse, a per-block omax would recover the skip — this measures that
headroom instead of guessing.

Usage (TPU host, tunnel idle):  python scripts/userscene_decomp.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=1 << 20)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args(argv)

    import jax

    from particle_simulator_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()  # V0 reuses bench.py --user-scene's executable

    from particle_simulator_tpu.engine.simulator import (
        Simulator,
        _run_bucket_pallas,
    )
    from particle_simulator_tpu.engine.state import empty_state
    from particle_simulator_tpu.ops.bucket_pallas import bucket_move_pallas
    from particle_simulator_tpu.scenes.library import _scene

    side = max(2, int(round(args.particles ** 0.5)))
    frame = _scene(side, side, distance_factor=1.1, speed=1.0, box_fill=0.5)
    frame.metadata.steps_per_frame = args.steps
    sim = Simulator()
    sim.load_frame(frame)
    g = sim.grid
    n_live = int(np.count_nonzero(frame.particles["ty"] >= 0))
    k = int(sim.meta_record["gpu_threads_per_block_log2"])
    block_rows = max(1, 1 << max(0, k - 4))
    print(
        f"grid {g.by}x{g.bx}x{g.cap} lane_chunks {sim._lane_chunks} "
        f"block_rows {block_rows} live {n_live}",
        file=sys.stderr,
    )

    def barrier():
        return np.asarray(jax.device_get(sim.state.vx.reshape(-1)[:1]))

    def timed_frames(label, state_holder):
        t0 = time.perf_counter()
        for _ in range(args.frames):
            sim.frame_async()
        barrier()
        dt = time.perf_counter() - t0
        per_step_ms = dt / (args.frames * args.steps) * 1e3
        print(json.dumps({
            "variant": label,
            "elapsed_s": round(dt, 3),
            "per_step_ms": round(per_step_ms, 4),
            "sim_steps_per_sec": round(args.frames * args.steps / dt, 2),
        }))
        return per_step_ms

    # ---- V0: live lattice ----
    sim.frame_async()  # compile (persistent-cache warm from bench runs)
    barrier()
    v0 = timed_frames("V0-live-frame", sim)

    # ---- occupancy snapshot after ~1000 steps ----
    ty = np.asarray(jax.device_get(sim.state.ty))
    occ3 = ty >= 0
    slotno = np.arange(g.cap) + 1
    top = np.where(occ3, slotno, 0).max(axis=2)  # (by, bx) per-bucket omax
    C = sim._lane_chunks
    tr = block_rows
    padb = max(128, 2 * g.cap) // g.cap
    Wb = g.bx // C
    nb = g.by // tr
    tp = np.pad(top, ((0, 0), (padb, padb)))
    rowchunk = np.stack(
        [tp[:, c * Wb : c * Wb + Wb + 2 * padb].max(axis=1) for c in range(C)],
        axis=1,
    )
    rp = np.pad(rowchunk, ((1, 1), (0, 0)))
    blk = np.stack(
        [rp[i * tr : i * tr + tr + 2].max(axis=0) for i in range(nb)], axis=0
    )
    occ2 = occ3.sum(axis=2)
    flags = np.stack(
        [
            (occ2[:, c * Wb : (c + 1) * Wb] > 0)
            .reshape(nb, tr, Wb)
            .any(axis=(1, 2))
            for c in range(C)
        ],
        axis=1,
    )
    live_blk = blk[flags]

    cap = g.cap

    def passes_for(om):
        cnt = 0
        for dy in (-1, 0, 1):
            for t in range(-(2 * cap - 1), 2 * cap):
                if dy == 0 and t == 0:
                    continue
                r = t % cap
                key = min(r, cap - r)
                if key == 0 or key < om:
                    cnt += 1
        return cnt

    glob_omax = int(top.max())
    per_blk_passes = float(
        np.mean([passes_for(int(o)) for o in live_blk])
    ) if live_blk.size else 0.0
    print(json.dumps({
        "variant": "occupancy-after-1000-steps",
        "live_particles": int(occ3.sum()),
        "global_omax": glob_omax,
        "passes_full": passes_for(cap),
        "passes_global_omax": passes_for(glob_omax),
        "passes_per_block_mean": round(per_blk_passes, 1),
        "live_block_frac": round(float(flags.mean()), 4),
        "per_block_omax_hist": np.bincount(
            live_blk, minlength=cap + 1
        ).tolist(),
        "occ_hist": np.bincount(occ2.ravel(), minlength=cap + 1).tolist(),
    }))

    # ---- V1: all-tombstone state, SAME program (data-only change) ----
    sim.state = jax.device_put(empty_state(g.grid_shape), sim.accel)
    sim.state_is_dispatched = False
    sim.frame_async()  # no recompile: same jit signature
    barrier()
    v1 = timed_frames("V1-vacuum-floor", sim)

    # ---- V2: rebucket pass alone on the live state ----
    sim.load_frame(frame)  # restore the live lattice
    t0 = time.perf_counter()
    out = bucket_move_pallas(sim.state)
    np.asarray(jax.device_get(out.vx.reshape(-1)[:1]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = 50
    for _ in range(reps):
        out = bucket_move_pallas(out)
    np.asarray(jax.device_get(out.vx.reshape(-1)[:1]))
    dt = time.perf_counter() - t0
    move_ms = dt / reps * 1e3
    print(json.dumps({
        "variant": "V2-move-pass",
        "per_move_ms": round(move_ms, 3),
        "amortized_per_step_ms": round(move_ms / 16, 4),
        "compile_s": round(compile_s, 1),
    }))

    pair_ms = v0 - v1
    print(json.dumps({
        "variant": "decomposition",
        "per_step_ms": {
            "total_V0": round(v0, 4),
            "vacuum_floor_V1": round(v1, 4),
            "pair_math_est_V0_minus_V1": round(pair_ms, 4),
            "move_amortized_V2": round(move_ms / 16, 4),
        },
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
