"""Pure-XLA micro-benches for the user-scene step's prologue ops, each as a
single dispatch of a 20-iteration fori chain (no per-call dispatch overhead,
no Mosaic compiles — these all build in seconds).

probe2 put ~2.4 ms/step in the halo build and ~2.4 ms in the classic ext()
round trip. Hypothesis: `jnp.roll(a, +-1, axis=0)[::ty_rows]` materializes
the WHOLE rolled array before slicing (450 MB of pointless traffic across
the 3 fields x 2 directions); a strided-slice + 1-row-concat construction
reads only the 2/ty_rows rows actually shipped. This measures both forms,
plus the ty-halo (constant between moves, hoistable) and the other small
prologue pieces, all in-loop.

Usage (TPU host, tunnel idle):  python scripts/userscene_probe3.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ITERS = 20


def main(argv=None) -> int:
    import jax
    import jax.numpy as jnp

    from particle_simulator_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from particle_simulator_tpu.engine.simulator import Simulator
    from particle_simulator_tpu.ops.bucket_pallas import (
        ext_state_chunks,
        ext_step_aux,
        refresh_ext_pads,
        unext_state_chunks,
    )
    from particle_simulator_tpu.scenes.library import _scene

    side = 1 << 10
    frame = _scene(side, side, distance_factor=1.1, speed=1.0, box_fill=0.5)
    sim = Simulator()
    sim.load_frame(frame)
    g = sim.grid
    C = sim._lane_chunks
    p = sim.params
    live = sim.state
    e_live = ext_state_chunks(live, C)
    by, bxe, cap = e_live.x.shape
    Le = bxe * cap
    ty_rows = 8
    n_blocks = by // ty_rows
    print(f"grid {g.by}x{g.bx}x{g.cap} C={C} Le={Le}", file=sys.stderr)

    def bench(label, fn, *args):
        out = jax.jit(fn)(*args)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1]))
        t0 = time.perf_counter()
        out = jax.jit(fn)(*args)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1]))
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        print(json.dumps({"component": label, "ms_per_iter": round(ms, 4)}))

    def chain(body):
        """20 dependent iterations of body(x)->x, one dispatch."""
        def outer(x0):
            return jax.lax.fori_loop(0, ITERS, lambda i, x: body(x), x0)
        return outer

    flat = lambda a: a.reshape(by, Le)

    # --- halo builds (x/y/ty -> packed (n_blocks*8, Le)), chained by feeding
    # a halo-derived perturbation back into x so iterations stay dependent ---
    def rolls_rows(a2):
        return (
            jnp.roll(a2, 1, axis=0)[::ty_rows],
            jnp.roll(a2, -1, axis=0)[ty_rows - 1 :: ty_rows],
        )

    def strided_rows(a2):
        above = jnp.concatenate([a2[by - 1 :], a2[ty_rows - 1 : by - 1 : ty_rows]])
        below = jnp.concatenate([a2[ty_rows::ty_rows], a2[:1]])
        return above, below

    def halo_from(rows_fn, x2, y2, tyu2):
        xa, xb = rows_fn(x2)
        ya, yb = rows_fn(y2)
        tya, tyb = rows_fn(tyu2)
        dead_r = jnp.full((1, Le), 0xFFFFFFFF, jnp.uint32)
        tya = jnp.concatenate([dead_r, tya[1:]], axis=0)
        tyb = jnp.concatenate([tyb[:-1], dead_r], axis=0)
        zero = jnp.zeros((n_blocks, Le), x2.dtype)
        return jnp.stack([xa, xb, ya, yb, tya, tyb, zero, zero], axis=1).reshape(
            n_blocks * 8, Le
        )

    tyu = flat(jax.lax.bitcast_convert_type(e_live.ty, jnp.uint32))

    def mk_halo_bench(rows_fn, n_fields=3):
        def body(x2):
            if n_fields == 3:
                h = halo_from(rows_fn, x2, flat(e_live.y), tyu)
            else:  # x/y only: ty rows hoisted out of the per-step path
                xa, xb = rows_fn(x2)
                ya, yb = rows_fn(flat(e_live.y))
                zero = jnp.zeros((n_blocks, Le), x2.dtype)
                h = jnp.stack([xa, xb, ya, yb, zero, zero, zero, zero], axis=1
                              ).reshape(n_blocks * 8, Le)
            return x2 + h[:1, :]  # dependence: tiny broadcast add
        return body

    x2 = flat(e_live.x)
    bench("halo_rolls_xyty", chain(mk_halo_bench(rolls_rows, 3)), x2)
    bench("halo_strided_xyty", chain(mk_halo_bench(strided_rows, 3)), x2)
    bench("halo_strided_xy_only", chain(mk_halo_bench(strided_rows, 2)), x2)

    # sanity: both forms build identical halos
    ha = jax.jit(lambda a: halo_from(rolls_rows, a, flat(e_live.y), tyu))(x2)
    hb = jax.jit(lambda a: halo_from(strided_rows, a, flat(e_live.y), tyu))(x2)
    same = bool(jnp.array_equal(ha, hb))
    print(json.dumps({"component": "halo_forms_bit_identical", "ok": same}))

    # --- ext/unext round trip, refresh, aux — in-loop --------------------------
    bench("ext_unext_roundtrip",
          chain(lambda s: unext_state_chunks(ext_state_chunks(s, C), C)), live)
    bench("refresh_ext_pads", chain(lambda s: refresh_ext_pads(s, C)), e_live)
    bench("ext_step_aux",
          chain(lambda s: s._replace(
              x=s.x + ext_step_aux(s, p, C, 8).params[10].astype(jnp.uint32))),
          e_live)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
