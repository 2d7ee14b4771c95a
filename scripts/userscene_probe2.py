"""Time the user-scene step's COMPONENTS standalone on the chip.

The r3b A/B (BASELINE.md) falsified the "vacuum floor = ext-build + dead-tile
DMA" model: the persistent-ext/compacted path moved neither the live frame
(83.7 -> 81.9 steps/s) nor the all-tombstone floor (5.67 -> 5.78 ms/step).
This probe times each piece in isolation to find where the floor actually
lives — in particular the per-grid-step overhead hypothesis: the user grid
at block_rows=8 x lane_chunks=8 runs 1024 pallas grid iterations per step
(the dense headline grid runs 16), so ~5 us of scalar-core bookkeeping per
iteration would BE the floor. The block_rows sweep measures us/iteration
directly; if it dominates, the fix is fewer, taller blocks — not less DMA.

Usage (TPU host, tunnel idle):  python scripts/userscene_probe2.py
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
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from particle_simulator_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from particle_simulator_tpu.engine.simulator import Simulator
    from particle_simulator_tpu.engine.state import empty_state
    from particle_simulator_tpu.ops.bucket_pallas import (
        bucket_move_pallas,
        bucket_step_pallas,
        bucket_step_pallas_ext,
        ext_state_chunks,
        ext_step_aux,
        refresh_ext_pads,
        unext_state_chunks,
    )
    from particle_simulator_tpu.scenes.library import _scene

    side = max(2, int(round(args.particles ** 0.5)))
    frame = _scene(side, side, distance_factor=1.1, speed=1.0, box_fill=0.5)
    sim = Simulator()
    sim.load_frame(frame)
    g = sim.grid
    C = sim._lane_chunks
    p = sim.params
    live = sim.state
    dead = jax.device_put(empty_state(g.grid_shape), sim.accel)
    print(f"grid {g.by}x{g.bx}x{g.cap} C={C}", file=sys.stderr)

    def bench(label, fn, *a, reps=args.reps, **kw):
        out = fn(*a, **kw)  # compile
        np.asarray(jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1]))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a, **kw)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1]))
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(json.dumps({"component": label, "ms": round(ms, 4)}))
        return ms

    import functools

    # --- XLA prologue pieces on the ext layout -------------------------------
    e_live = ext_state_chunks(live, C)
    aux = ext_step_aux(e_live, p, C, 8)
    e_dead = ext_state_chunks(dead, C)
    aux_dead = ext_step_aux(e_dead, p, C, 8)

    bench("ext_state_chunks", jax.jit(functools.partial(ext_state_chunks, lane_chunks=C)), live)
    bench("unext_state_chunks", jax.jit(functools.partial(unext_state_chunks, lane_chunks=C)), e_live)
    bench("refresh_ext_pads", jax.jit(functools.partial(refresh_ext_pads, lane_chunks=C)), e_live)
    bench("ext_step_aux", jax.jit(functools.partial(ext_step_aux, lane_chunks=C, block_rows=8)), e_live, p)

    # the classic per-step halo build + ext, isolated: reuse the step's own
    # prologue by running the kernel on a dead grid minus... instead, time the
    # halo construction the way bucket_step_pallas_ext builds it
    def halo_build(e):
        by, bxe, cap = e.x.shape
        Le = bxe * cap
        ty_rows = 8

        def flat(a):
            return a.reshape(by, Le)

        def neighbor_rows(a2):
            return (
                jnp.roll(a2, 1, axis=0)[::ty_rows],
                jnp.roll(a2, -1, axis=0)[ty_rows - 1 :: ty_rows],
            )

        xa, xb = neighbor_rows(flat(e.x))
        ya, yb = neighbor_rows(flat(e.y))
        tya, tyb = neighbor_rows(flat(jax.lax.bitcast_convert_type(e.ty, jnp.uint32)))
        dead_r = jnp.full((1, Le), 0xFFFFFFFF, jnp.uint32)
        tya = jnp.concatenate([dead_r, tya[1:]], axis=0)
        tyb = jnp.concatenate([tyb[:-1], dead_r], axis=0)
        n_blocks = by // ty_rows
        zero = jnp.zeros((n_blocks, Le), xa.dtype)
        return jnp.stack([xa, xb, ya, yb, tya, tyb, zero, zero], axis=1).reshape(
            n_blocks * 8, Le
        )

    bench("halo_build_rolls", jax.jit(halo_build), e_live)

    # --- bare pallas step calls (no frame schedule, no move) -----------------
    for br in (8, 16, 32):
        if g.by % br:
            continue
        for label, st in (("dead", dead), ("live", live)):
            try:
                bench(
                    f"classic_step_C{C}_br{br}_{label}",
                    functools.partial(
                        bucket_step_pallas, block_rows=br, lane_chunks=C
                    ),
                    st, p,
                )
            except Exception as ex:
                print(json.dumps({
                    "component": f"classic_step_C{C}_br{br}_{label}",
                    "error": f"{type(ex).__name__}",
                }))

    # unchunked (C=1) at the same block heights: separates the lane-chunk
    # grid-dimension cost from the row-block count
    for br in (8, 16, 32):
        if g.by % br:
            continue
        try:
            bench(
                f"classic_step_C1_br{br}_dead",
                functools.partial(bucket_step_pallas, block_rows=br, lane_chunks=1),
                dead, p,
            )
        except Exception as ex:
            print(json.dumps({
                "component": f"classic_step_C1_br{br}_dead",
                "error": f"{type(ex).__name__}",
            }))

    for compact in (False, True):
        bench(
            f"ext_step_compact{int(compact)}_dead",
            functools.partial(
                bucket_step_pallas_ext, lane_chunks=C, block_rows=8,
                compact=compact,
            ),
            e_dead, p, aux_dead,
        )
        bench(
            f"ext_step_compact{int(compact)}_live",
            functools.partial(
                bucket_step_pallas_ext, lane_chunks=C, block_rows=8,
                compact=compact,
            ),
            e_live, p, aux,
        )

    # --- move pass ------------------------------------------------------------
    bench("move_dead", bucket_move_pallas, dead, reps=10)
    bench("move_live", bucket_move_pallas, live, reps=10)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
