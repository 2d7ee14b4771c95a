"""Pallas TPU kernel for the all-pairs (CompactArray) physics step.

The reference's CompactArray kernel is an exact O(N^2) force loop, one thread
per particle (kernel_compact.cuh:4-42). The jnp transliteration materializes
(N, N) pair intermediates in HBM — ~1 GB at 16k particles. This kernel tiles
the pair space (TI x TJ tiles resident in VMEM) with the classic
revisit-accumulate pattern: grid = (N/TI, N/TJ), j innermost; force partial
sums accumulate in VMEM scratch across the j sweep, and the leapfrog update
fires on the last j tile. HBM traffic drops from O(N^2) to O(N^2 / TI)
(j tiles re-read per i tile) with no quadratic intermediates.

Same physics as ops/bucket_pallas.py (cursor + wall + Mie + leapfrog,
reference: particle.cuh:49-144, kernel_compact.cuh:10-33); positions are
passed as (N, 1) u32 so tiles broadcast to (TI, TJ) pair grids on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from particle_simulator_tpu.engine.state import PARTICLE_MASS, ParticleState, SimParams, U32_MAX_F
from particle_simulator_tpu.physics.mie import mie_log_coeffs_scalars
from particle_simulator_tpu.ops.bucket_pallas import (
    _params_vector,
    _BH,
    _BW,
    _DT,
    _EPS,
    _M,
    _N,
    _SIGMA,
)
from particle_simulator_tpu.physics.step import external_forces

F32 = jnp.float32


def _allpairs_kernel(
    params_ref,
    xi_ref, yi_ref, tyi_ref, vxi_ref, vyi_ref, fx0_ref, fy0_ref,
    xj_ref, yj_ref, tyj_ref,
    ox_ref, oy_ref, ovx_ref, ovy_ref,
    fx_acc, fy_acc,
    *, tile_i: int, tile_j: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    sigma = params_ref[_SIGMA]
    eps = params_ref[_EPS]
    n = params_ref[_N]
    m = params_ref[_M]
    bw = params_ref[_BW]
    bh = params_ref[_BH]
    dt = params_ref[_DT]
    # log-domain pair-force constants; shared derivation (incl. the
    # garbage-metadata sign/clamp handling): physics/mie.py
    A1, B1, A2, B2, inv_s2, sg1, sg2 = mie_log_coeffs_scalars(sigma, eps, n, m)

    x0 = xi_ref[:]  # (TI, 1) u32
    y0 = yi_ref[:]
    ty0 = tyi_ref[:]
    live_i = ty0 >= 0

    # ---- j == 0: seed accumulators with the cursor + wall forces, computed
    # outside the kernel (O(N) elementwise jnp that XLA fuses; Mosaic chokes
    # on transcendentals over 1-lane column tiles) ----
    @pl.when(j == 0)
    def _():
        fx_acc[:] = fx0_ref[:]
        fy_acc[:] = fy0_ref[:]

    # ---- pair tile (TI, TJ) ----
    # j inputs arrive as (1, TJ) row blocks: the (TI,1) x (1,TJ) outer
    # broadcast is a native sublane x lane broadcast on the VPU (a 1-lane
    # column broadcast instead makes Mosaic materialize relayout temps and
    # blow VMEM)
    xj = xj_ref[:]
    yj = yj_ref[:]
    tyj = tyj_ref[:]

    # self-pair mask: global row index == global col index
    gi = i * tile_i + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 0)
    gj = j * tile_j + jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 1)
    valid = (gi != gj) & (tyj >= 0) & live_i

    dxy = jax.lax.bitcast_convert_type(xj - x0, jnp.int32).astype(F32)
    dyy = jax.lax.bitcast_convert_type(yj - y0, jnp.int32).astype(F32)
    # i32 reinterpretation of the u32 wrap-difference = the reference's
    # wrap-free signed displacement for |d| < 2^31; beyond that (opposite box
    # halves) the sign flips — that regime has |force| < 1e-30 of the near
    # field and both branches round to zero force contribution in f32
    dx = dxy * (bw / U32_MAX_F)
    dyv = dyy * (bh / U32_MAX_F)

    d2 = dx * dx + dyv * dyv
    d2 = jnp.where(valid, d2, F32(1.0))
    lu = jnp.log(d2 * inv_s2)
    f_over_r = sg1 * jnp.exp(A1 - B1 * lu) - sg2 * jnp.exp(A2 - B2 * lu)
    f_over_r = jnp.where(valid, f_over_r, F32(0.0))

    fx_acc[:] = fx_acc[:] + jnp.sum(f_over_r * dx, axis=1, keepdims=True)
    fy_acc[:] = fy_acc[:] + jnp.sum(f_over_r * dyv, axis=1, keepdims=True)

    # ---- last j tile: leapfrog + write outputs ----
    @pl.when(j == nj - 1)
    def _():
        vx0 = vxi_ref[:]
        vy0 = vyi_ref[:]
        nvx = vx0 + (fx_acc[:] / PARTICLE_MASS) * dt
        nvy = vy0 + (fy_acc[:] / PARTICLE_MASS) * dt
        ddx = jnp.round((nvx * dt / bw) * U32_MAX_F)
        ddy = jnp.round((nvy * dt / bh) * U32_MAX_F)
        nx = x0 + jax.lax.bitcast_convert_type(ddx.astype(jnp.int32), jnp.uint32)
        ny = y0 + jax.lax.bitcast_convert_type(ddy.astype(jnp.int32), jnp.uint32)
        ox_ref[:] = jnp.where(live_i, nx, x0)
        oy_ref[:] = jnp.where(live_i, ny, y0)
        ovx_ref[:] = jnp.where(live_i, nvx, vx0)
        ovy_ref[:] = jnp.where(live_i, nvy, vy0)


def _pick_tile(n: int) -> int:
    for t in (512, 256, 128):
        if n % t == 0:
            return t
    return n


@functools.partial(jax.jit, static_argnames=("interpret",))
def allpairs_step_pallas(state: ParticleState, p: SimParams, interpret: bool = False) -> ParticleState:
    """One all-pairs physics step. Drop-in for physics.step.allpairs_step;
    capacity must be a multiple of 128 (pad with tombstones)."""
    n = state.x.shape[0]
    ti = tj = _pick_tile(n)
    grid = (n // ti, n // tj)

    params = _params_vector(p)

    def col(a):
        return a.reshape(n, 1)

    def row(a):
        return a.reshape(1, n)

    ispec = lambda: pl.BlockSpec((ti, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    jspec = lambda: pl.BlockSpec((1, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((ti, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)

    fx0, fy0 = external_forces(state, p)

    kernel = functools.partial(_allpairs_kernel, tile_i=ti, tile_j=tj)
    nx, ny, nvx, nvy = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            ispec(), ispec(), ispec(), ispec(), ispec(), ispec(), ispec(),
            jspec(), jspec(), jspec(),
        ],
        out_specs=[ospec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.uint32),
            jax.ShapeDtypeStruct((n, 1), jnp.uint32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ti, 1), jnp.float32),
            pltpu.VMEM((ti, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        params,
        col(state.x), col(state.y), col(state.ty), col(state.vx), col(state.vy),
        col(fx0), col(fy0),
        row(state.x), row(state.y), row(state.ty),
    )

    return ParticleState(
        nx.reshape(n), ny.reshape(n), nvx.reshape(n), nvy.reshape(n), state.ty
    )


def run_frame_allpairs_pallas(
    state: ParticleState, p: SimParams, interpret: bool = False
) -> ParticleState:
    """Whole-frame runner for the CompactArray path."""
    return jax.lax.fori_loop(
        0, p.steps_per_frame, lambda _, s: allpairs_step_pallas(s, p, interpret=interpret), state
    )
