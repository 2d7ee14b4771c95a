"""Pallas TPU kernel for the bucket-path physics step (the hot loop).

The jnp bucket path (physics/bucket.py) is semantically exact but HBM-bound:
XLA materializes the (BY, BX, 9*CAP) neighborhood stacks in HBM every step.
This kernel computes the identical step — cursor + wall + 3x3-neighborhood Mie
forces + leapfrog (reference: kernel_bucket.cuh:40-94, particle.cuh:49-144) —
entirely in VMEM.

TPU-native layout: the (BY, BX, CAP) grid is viewed as (BY, BX*CAP) so the
lane axis is a full row of buckets (BX*CAP = 1024 for the reference grid,
4096 for the 1M grid — perfectly 128-lane aligned, zero padding waste).

Pair enumeration by static lane rolls: a particle at lane i (bucket i//CAP,
slot i%CAP) must interact with every slot of buckets i//CAP + {-1,0,1} in the
three bucket rows above/at/below. For a lane shift t, roll(row, -t) aligns
candidate lane i+t with lane i; the union of needed shifts is
t in [-(2*CAP-1), 2*CAP-1]. Per (row_offset dy, shift t) pass, a cheap mask
keeps exactly the pairs whose bucket delta is in {-1,0,1} and that don't cross
the row boundary — reproducing the jnp path's candidate set exactly
(144 candidates per particle, self excluded at (dy=0, t=0)).

The y-neighborhood crosses program-block boundaries; each of x/y/ty is passed
three times with block index maps p-1, p, p+1 (clamped; out-of-grid rows are
masked in-kernel), so no manual DMA is needed.

Force math uses the log/exp form of the Mie power law:
    F/r = C*eps*(m*(s/r)^m - n*(s/r)^n) / r^2,   (s/r)^k = exp(k*log(s/r))
one log + two exp per pair instead of two pow (= 2 log + 2 exp); agreement
with the jnp path is within f32 rounding (tests use the same ulp envelopes as
the jnp-vs-oracle comparisons).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from particle_simulator_tpu.engine.state import PARTICLE_MASS, ParticleState, SimParams, U32_MAX_F
from particle_simulator_tpu.physics.mie import mie_log_coeffs_scalars

F32 = jnp.float32

# params vector layout (SMEM). _OMAX (bucket-step kernel only, appended at its
# call site — allpairs ships the bare 10) = global max live slot index + 1:
# pair passes whose lane-shift residue cannot reach a live slot are skipped at
# runtime (see _step_kernel's occupancy predicate).
_SIGMA, _EPS, _N, _M, _CURX, _CURY, _CURSZ, _DT, _BW, _BH, _OMAX = range(11)
_NPARAMS = 10


def _params_vector(p: SimParams) -> jnp.ndarray:
    return jnp.stack(
        [
            jnp.asarray(p.sigma, F32),
            jnp.asarray(p.epsilon, F32),
            jnp.asarray(p.n, F32),
            jnp.asarray(p.m, F32),
            jnp.asarray(p.cursor_x, F32),
            jnp.asarray(p.cursor_y, F32),
            jnp.asarray(p.cursor_size, F32),
            jnp.asarray(p.step_dt, F32),
            jnp.asarray(p.box_width, F32),
            jnp.asarray(p.box_height, F32),
        ]
    )


def _u32_to_f32(v: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> float32, correctly rounded (Mosaic has no direct u32->f32
    cast). Split into two halves that convert EXACTLY (both < 2^16 mantissa
    bits), scale the high half by an exact power of two, and round once at the
    sum — bit-identical to XLA's own u32->f32. (A convert-then-fixup version
    double-rounds by 1 ulp, which is enough to flip the cursor-radius boundary
    test and diverge by a full cursor kick.)"""
    hi = jax.lax.bitcast_convert_type(
        jax.lax.shift_right_logical(v, jnp.uint32(16)), jnp.int32
    ).astype(F32)
    lo = jax.lax.bitcast_convert_type(v & jnp.uint32(0xFFFF), jnp.int32).astype(F32)
    return hi * F32(65536.0) + lo


def _wrap_dist(a_u32: jnp.ndarray, b_u32: jnp.ndarray, scale) -> jnp.ndarray:
    """Signed displacement b-a in meters. The u32 wrap-subtraction reinterpreted
    as i32 gives the signed difference exactly whenever |b-a| < 2^31 — always
    true for 3x3-bucket neighbors (<= 3/BX of the box); farther (wrapped-lane)
    candidates are masked out before use (reference math: particle.cuh:33-47)."""
    d = jax.lax.bitcast_convert_type(b_u32 - a_u32, jnp.int32)
    return d.astype(F32) * scale


def _roll_lanes(a: jnp.ndarray, t: int) -> jnp.ndarray:
    """roll(a, -t, axis=1) with static t: lane i takes original lane i+t."""
    L = a.shape[1]
    k = t % L
    if k == 0:
        return a
    return jnp.concatenate([a[:, k:], a[:, :k]], axis=1)


@functools.lru_cache(maxsize=16)
def _lane_bad_table(cap: int, L: int) -> np.ndarray:
    """(4*cap, L) i32: row t+2*cap-1 is 0 where a lane-shift-t candidate is
    valid (in-row, neighboring bucket), else INT32_MIN — OR-ing it onto the
    candidate species turns invalid lanes into tombstones in one op. Row
    count 4*cap keeps the sublane dim a multiple of 8 (one spare row)."""
    lane = np.arange(L, dtype=np.int64)
    slot = lane % cap
    table = np.full((4 * cap, L), np.int32(-(2**31)), dtype=np.int32)
    for t in range(-(2 * cap - 1), 2 * cap):
        delta = (slot + (t + 2 * cap)) // cap - 2
        ok = (lane + t >= 0) & (lane + t < L) & (delta >= -1) & (delta <= 1)
        table[t + 2 * cap - 1] = np.where(ok, 0, np.int32(-(2**31)))
    return table


def _step_kernel(
    params_ref, flags_ref,
    x_ref, y_ref, ty_ref, vx_ref, vy_ref, halo_ref, badmask_ref,
    *rest,
    ty_rows: int, by: int, cap: int, dynamic_passes: bool = False,
    n_chunks: int = 1, pad: int = 0, out_off: int | None = None,
    has_cols: bool = False, col_s0: int = 0, col_s1: int = 0,
    col_segw: int = 128,
):
    if has_cols:
        cols_ref, rest = rest[0], rest[1:]
    else:
        cols_ref = None
    ox_ref, oy_ref, ovx_ref, ovy_ref, fx_acc, fy_acc = rest
    # chunk window origin in true-lane coordinates (halo-column splice);
    # program_id must be read at kernel top level — inside the pl.when
    # branch it fails to interpret on CPU
    col_base = (
        pl.program_id(1) * (x_ref.shape[1] - 2 * pad) - pad
        if (has_cols and n_chunks > 1) else 0
    )
    if out_off is None:
        out_off = pad  # classic layout: outputs cover the interior lanes
    # Whole-block liveness skip: a block whose every slot is a tombstone has
    # no receivers — every output select below would pick the old value — so
    # copy inputs through and skip all 3*(4*cap-1) pair passes. Spatially
    # sparse scenes (a droplet in a big box, the phase-sweep half-filled
    # lattice) make this the common case. With lane chunking (n_chunks > 1)
    # the flag is per (row-block, lane-chunk): inputs arrive pre-extended by
    # ``pad`` tombstoned lanes each side (so cross-chunk candidates exist in
    # VMEM) and outputs cover the interior only — empty COLUMNS of a sparse
    # scene skip their pair math too, not just empty row stripes.
    flag_idx = pl.program_id(0) * n_chunks + (
        pl.program_id(1) if n_chunks > 1 else 0
    )
    block_live = flags_ref[flag_idx] != 0
    w_out = ox_ref.shape[1]

    @pl.when(jnp.logical_not(block_live))
    def _dead_block():
        ox_ref[:] = x_ref[:, out_off : out_off + w_out]
        oy_ref[:] = y_ref[:, out_off : out_off + w_out]
        ovx_ref[:] = vx_ref[:, out_off : out_off + w_out]
        ovy_ref[:] = vy_ref[:, out_off : out_off + w_out]

    @pl.when(block_live)
    def _live_block():
        _step_block(
            params_ref, x_ref, y_ref, ty_ref, vx_ref, vy_ref, halo_ref,
            badmask_ref, ox_ref, oy_ref, ovx_ref, ovy_ref, fx_acc, fy_acc,
            ty_rows=ty_rows, by=by, cap=cap, dynamic_passes=dynamic_passes,
            pad=pad, out_off=out_off, cols_ref=cols_ref, n_chunks=n_chunks,
            col_s0=col_s0, col_s1=col_s1, col_segw=col_segw,
            col_base=col_base,
        )


def _step_block(
    params_ref,
    x_ref, y_ref, ty_ref, vx_ref, vy_ref, halo_ref, badmask_ref,
    ox_ref, oy_ref, ovx_ref, ovy_ref,
    fx_acc, fy_acc,
    *, ty_rows: int, by: int, cap: int, dynamic_passes: bool = False,
    pad: int = 0, out_off: int | None = None, cols_ref=None,
    n_chunks: int = 1, col_s0: int = 0, col_s1: int = 0, col_segw: int = 128,
    col_base=0,
):
    if out_off is None:
        out_off = pad
    x0, y0, ty0 = x_ref[:], y_ref[:], ty_ref[:]
    L = x0.shape[1]

    if cols_ref is not None:
        # Fresh x-halo COLUMN substitution (the sharded "refs" refresh form,
        # parallel/domain.py): the HBM state's two halo columns go stale
        # between moves — instead of a whole-grid rewrite per step, the fresh
        # neighbor columns arrive as a small (ty_rows, 4*segw) ref
        # [x_lo | x_hi | y_lo | y_hi] and are spliced over the halo-column
        # lanes here, in VMEM. ty needs no splice: it is invariant between
        # moves, so the HBM halo-column ty is always current (candidate
        # validity and the flags/omax reduces stay exact).
        segw = col_segw
        cols = cols_ref[:]
        if cols.shape[1] < L:
            cols = jnp.concatenate(
                [cols, jnp.zeros((ty_rows, L - cols.shape[1]), cols.dtype)], 1
            )
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        if n_chunks == 1:
            glane = lane
            r_lo = _roll_lanes(cols, -col_s0)
            r_hi = _roll_lanes(cols, col_segw - col_s1)
        else:
            glane = lane + col_base
            r_lo = pltpu.roll(cols, col_s0 - col_base, axis=1)
            r_hi = pltpu.roll(cols, col_s1 - segw - col_base, axis=1)
        m_lo = (glane >= col_s0) & (glane < col_s0 + cap)
        m_hi = (glane >= col_s1) & (glane < col_s1 + cap)
        x0 = jnp.where(m_lo, r_lo, jnp.where(m_hi, r_hi, x0))
        y_lo = _roll_lanes(r_lo, 2 * segw)
        y_hi = _roll_lanes(r_hi, 2 * segw)
        y0 = jnp.where(m_lo, y_lo, jnp.where(m_hi, y_hi, y0))

    sigma = params_ref[_SIGMA]
    eps = params_ref[_EPS]
    n = params_ref[_N]
    m = params_ref[_M]
    bw = params_ref[_BW]
    bh = params_ref[_BH]
    dt = params_ref[_DT]
    # C = (n/(n-m)) * (n/m)^(m/(n-m))  (particle.cuh:54) — for the wall force
    C = (n / (n - m)) * jnp.exp((m / (n - m)) * jnp.log(n / m))
    Ce = C * eps
    # log-domain pair-force constants: F/r = s1*exp(A1 - B1*lu) -
    # s2*exp(A2 - B2*lu), lu = log(d2/sigma^2) — one log + two exp + two
    # FMAs + two sign muls per pair; the rsqrt and five muls of the direct
    # form hoist into these per-dispatch scalars. Shared derivation (incl.
    # the garbage-metadata sign/clamp handling): physics/mie.py
    A1, B1, A2, B2, inv_s2, sg1, sg2 = mie_log_coeffs_scalars(sigma, eps, n, m)

    live_i = ty0 >= 0
    xf = _u32_to_f32(x0)
    yf = _u32_to_f32(y0)

    # ---- cursor force (kernel_bucket.cuh:54-67) ----
    dxc = params_ref[_CURX] - xf / U32_MAX_F
    dyc = params_ref[_CURY] - yf / U32_MAX_F
    sq = dxc * dxc + dyc * dyc
    inside = sq < params_ref[_CURSZ] * params_ref[_CURSZ] * F32(0.25)
    mag = F32(8e-12) / (sq + F32(1.0))
    fx = jnp.where(inside, jnp.where(dxc > F32(0.0), -mag, mag), F32(0.0))
    fy = jnp.where(inside, jnp.where(dyc > F32(0.0), -mag, mag), F32(0.0))

    # ---- wall force, repulsive-only Mie (particle.cuh:125-144) ----
    def rep(dist):
        lsr = jnp.log(sigma / dist)
        return Ce * m * jnp.exp(m * lsr) / dist

    half = jnp.uint32(2147483647)
    in_left = x0 < half
    dist_x = jnp.where(in_left, xf, U32_MAX_F - xf) / U32_MAX_F * bw
    fx = fx + jnp.where(in_left, F32(1.0), F32(-1.0)) * rep(dist_x)
    in_bottom = y0 < half
    dist_y = jnp.where(in_bottom, yf, U32_MAX_F - yf) / U32_MAX_F * bh
    fy = fy + jnp.where(in_bottom, F32(1.0), F32(-1.0)) * rep(dist_y)

    # accumulate pair forces through scratch refs: value-carried accumulators
    # keep hundreds of unrolled-pass temps live and blow the VMEM stack
    fx_acc[:] = fx
    fy_acc[:] = fy

    # ---- 3x3-neighborhood pair forces ----
    # the six rows above/below the block arrive packed in ONE 8-sublane halo
    # block (Mosaic requires sublane block dims of 8; fetching whole neighbor
    # blocks instead would triple VMEM + HBM traffic for one row of data)
    halo = halo_ref[:]
    xa, xb = halo[0:1], halo[1:2]
    ya, yb = halo[2:3], halo[3:4]
    tya = jax.lax.bitcast_convert_type(halo[4:5], jnp.int32)
    tyb = jax.lax.bitcast_convert_type(halo[5:6], jnp.int32)

    def above(a_row, a):
        return jnp.concatenate([a_row, a[: ty_rows - 1]], axis=0)

    def below(a, b_row):
        return jnp.concatenate([a[1:], b_row], axis=0)

    rows = {
        -1: (above(xa, x0), above(ya, y0), above(tya, ty0)),
        0: (x0, y0, ty0),
        1: (below(x0, xb), below(y0, yb), below(ty0, tyb)),
    }

    inv_u32_bw = bw / U32_MAX_F
    inv_u32_bh = bh / U32_MAX_F

    # Static-shift lane validity (in-row + neighboring-bucket) arrives as a
    # precomputed (4*cap, L) i32 table (_lane_bad_table): row for shift t
    # forces invalid lanes' candidate species negative (sign bit OR), so
    # `(jty | bad_t) >= 0` replaces the ~10 integer vector ops the mask
    # arithmetic cost per pass.
    def lane_bad_const(t: int) -> jnp.ndarray:
        i = t + 2 * cap - 1
        return badmask_ref[i : i + 1]

    def pair_pass(valid_extra, *, rolled):
        jx = rolled[:ty_rows]
        jy = rolled[ty_rows : 2 * ty_rows]
        jty = jax.lax.bitcast_convert_type(rolled[2 * ty_rows :], jnp.int32)

        if valid_extra.dtype == jnp.int32:  # static table row: OR onto species
            valid = (jty | valid_extra) >= 0
        else:  # dynamic boolean mask
            valid = (jty >= 0) & valid_extra

        dx = _wrap_dist(x0, jx, inv_u32_bw)
        dyy = _wrap_dist(y0, jy, inv_u32_bh)

        d2 = dx * dx + dyy * dyy
        d2 = jnp.where(valid, d2, F32(1.0))
        lu = jnp.log(d2 * inv_s2)
        f_over_r = sg1 * jnp.exp(A1 - B1 * lu) - sg2 * jnp.exp(A2 - B2 * lu)
        f_over_r = jnp.where(valid, f_over_r, F32(0.0))
        fx_acc[:] = fx_acc[:] + f_over_r * dx
        fy_acc[:] = fy_acc[:] + f_over_r * dyy

    # No receiver-side mask: a dead receiver lane may compute garbage force,
    # but the final outputs select on live_i, and garbage is elementwise (no
    # cross-lane propagation). Rows beyond the grid edge arrive TOMBSTONED
    # (the caller replaces the roll-wrapped edge halo rows' ty with -1), so
    # candidate validity is entirely `(jty | bad_t) >= 0` — one OR + compare.
    def stack3(dy):
        cx_row, cy_row, cty_row = rows[dy]
        # stack the three candidate fields along sublanes so each pass needs
        # ONE lane roll instead of three (lanes are untouched by the stack)
        return jnp.concatenate(
            [cx_row, cy_row, jax.lax.bitcast_convert_type(cty_row, jnp.uint32)], axis=0
        )

    # Occupancy pass skip: rebucketing fills slots ascending, so live slots
    # are < omax = (global max live slot index + 1), recomputed per dispatch.
    # A shift-t candidate pairs receiver slot s with slot s' = s + t (mod cap,
    # bucket carry absorbed by the bucket-delta mask); both live needs
    # s' - s ≡ t (mod cap) with |s' - s| <= omax-1, i.e.
    # min(r, cap - r) < omax for the residue r = t mod cap. Other passes have
    # zero valid pairs — skip them at runtime. Exact, not approximate: a
    # skipped pass could only have added 0.0 force. At omax << cap (sparse
    # scenes pinned at the 2*r0 bucket-side floor) this cuts the pass count
    # from 3*(4*cap-1) to ~9*(2*omax-1).
    #
    # Granularity matters: one pl.when PER PASS measured -25% at 1M dense
    # (93 control regions break Mosaic's cross-pass software pipelining), so
    # passes are grouped by predicate equivalence class (key = min(r, cap-r):
    # ~cap/2 scalar conds per step, each wrapping a long pipelineable pass
    # run). At cap <= 8 the classes are too small to ever pay for their
    # conds (a 2x-headroom cap-8 scene skips at most 1/5 of passes) — the
    # residue skip compiles out entirely and only the dead-block skip stays.
    omax = params_ref[_OMAX]

    if not dynamic_passes:
        stacked_by_dy = {dy: stack3(dy) for dy in (-1, 0, 1)}
        groups: dict[int, list] = {}
        for dy in (-1, 0, 1):
            for t in range(-(2 * cap - 1), 2 * cap):
                if dy == 0 and t == 0:
                    continue  # self pair (kernel loop's j != i)
                r = t % cap
                groups.setdefault(min(r, cap - r), []).append((dy, t))

        def run_group(passes):
            for dy, t in passes:
                pair_pass(lane_bad_const(t), rolled=_roll_lanes(stacked_by_dy[dy], t))

        for key in sorted(groups):
            if cap <= 8 or key == 0:  # r = 0 pairs slot s with s: live blocks
                run_group(groups[key])  # have omax >= 1, so always useful
            else:

                @pl.when(F32(key) < omax)
                def _group(passes=groups[key]):
                    run_group(passes)
    else:
        # Dynamic-pass variant: one pass body PER dy (3 total), fori over the
        # shift t — the Mosaic program is ~(4*CAP-1)x smaller, turning the
        # ~570 s compile of a cap-16 grid into tens of seconds at some
        # per-pass overhead (dynamic pltpu.roll + arithmetic masks instead
        # of the static table). dy stays a Python loop: Mosaic has no
        # dynamic_slice-of-value lowering to select a stack at runtime.
        # Opt-in via bucket_step_pallas(dynamic_passes=True).
        n_shift = 4 * cap - 1
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        slot = lane % cap

        for dy in (-1, 0, 1):
            stacked = stack3(dy)

            def pass_body(i, carry, stacked=stacked, dy=dy):
                t = i - (2 * cap - 1)
                r = jax.lax.rem(jax.lax.rem(t, cap) + cap, cap)
                live = (r.astype(F32) < omax) | (F32(cap) - r.astype(F32) < omax)

                @pl.when(live)  # same occupancy residue skip as the static path
                def _pass():
                    rolled = pltpu.roll(stacked, -t, axis=1)
                    delta = (slot + t + 2 * cap) // cap - 2
                    ok = (
                        (lane + t >= 0) & (lane + t < L)
                        & (delta >= -1) & (delta <= 1)
                    )
                    if dy == 0:
                        ok = ok & (t != 0)  # self pair (kernel loop's j != i)
                    pair_pass(ok, rolled=rolled)

                return carry

            jax.lax.fori_loop(0, n_shift, pass_body, 0)

    # ---- leapfrog kick-drift in u32 fixed point (particle.cuh:105-123) ----
    vx0, vy0 = vx_ref[:], vy_ref[:]
    nvx = vx0 + (fx_acc[:] / PARTICLE_MASS) * dt
    nvy = vy0 + (fy_acc[:] / PARTICLE_MASS) * dt
    ddx = jnp.round((nvx * dt / bw) * U32_MAX_F)
    ddy = jnp.round((nvy * dt / bh) * U32_MAX_F)
    nx = x0 + jax.lax.bitcast_convert_type(ddx.astype(jnp.int32), jnp.uint32)
    ny = y0 + jax.lax.bitcast_convert_type(ddy.astype(jnp.int32), jnp.uint32)

    # lane-chunked blocks compute on the pad-extended width; classic-layout
    # outputs cover the interior only (out_off = pad), persistent-ext outputs
    # the full extended width (out_off = 0; dead pad receivers select their
    # input values, so the true-grid-end fill lanes pass through unchanged)
    w_out = ox_ref.shape[1]
    ox_ref[:] = jnp.where(live_i, nx, x0)[:, out_off : out_off + w_out]
    oy_ref[:] = jnp.where(live_i, ny, y0)[:, out_off : out_off + w_out]
    ovx_ref[:] = jnp.where(live_i, nvx, vx0)[:, out_off : out_off + w_out]
    ovy_ref[:] = jnp.where(live_i, nvy, vy0)[:, out_off : out_off + w_out]


def _pick_ty_rows(by: int, lanes: int, requested: int | None = None) -> int:
    """Rows per program block, sized so the ~20 (TY, L) f32 buffers the kernel
    holds (triple-read x/y/ty, vx/vy, 4 outputs, double-buffered + temps) stay
    well under the 16 MB VMEM budget: TY*L <= 32k lanes.

    ``requested`` is the runtime-tunable analog of the reference's
    ``gpu_threads_per_block_log2`` launch width (particle_io/src/particle.rs:127,
    kernel_bucket.cuh:118-121) — honored when it divides the grid and fits
    the budget.
    """
    # Mosaic requires the sublane block dim be a multiple of 8 (or the whole
    # array), so 8 is the floor even when the lane budget asks for less
    budget = max(8, 32768 // lanes)
    candidates = (requested,) if requested else ()
    for ty in (*candidates, 16, 8):
        if ty and ty <= budget and by % ty == 0 and by >= ty:
            return ty
    return by


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "block_rows", "dynamic_passes", "lane_chunks", "col_xpad",
    ),
)
def bucket_step_pallas(
    state: ParticleState,
    p: SimParams,
    interpret: bool = False,
    block_rows: int | None = None,
    edge_rows: tuple[ParticleState, ParticleState] | None = None,
    dynamic_passes: bool | None = None,
    lane_chunks: int = 1,
    halo_cols: jnp.ndarray | None = None,
    col_xpad: int = 1,
) -> ParticleState:
    """One bucket-path physics step, Pallas TPU kernel. Drop-in replacement for
    physics.bucket.bucket_step (same candidate set; f32 rounding may differ by
    summation order). ``block_rows`` tunes the launch width (the
    gpu_threads_per_block_log2 analog); changing it recompiles.

    ``lane_chunks`` = C > 1 splits the lane axis into C chunks and makes the
    chunk a second pallas grid dimension with its own receiver-liveness flag:
    inputs are pre-extended with ``pad`` lanes each side (cross-chunk pair
    candidates, tombstoned at the true grid ends) so each (row-block, chunk)
    program is self-contained, and a chunk whose interior holds no live
    receiver skips all pair math — the column analog of the whole-block row
    skip, for spatially sparse scenes whose live region doesn't span the box
    (e.g. an editor-drawn lattice filling a quarter of the area). Pass order
    per receiver lane is unchanged, so outputs stay bit-identical to the
    unchunked kernel. Per-step overhead: one extra grid copy to materialize
    the extended inputs (~(1 + 2*pad/W)x reads), so C > 1 only pays off when
    a meaningful fraction of chunks is empty — the caller decides
    (engine/simulator.py picks it from scene occupancy at load).

    ``edge_rows`` = ((1, BX, CAP) top, (1, BX, CAP) bottom) external neighbor
    rows for the sharded path (parallel/domain.py): the shard's y-halo rides
    the existing packed-halo input instead of growing the grid to (ly+2) rows
    — which would defeat the 8/16-row blocking and force a whole-array VMEM
    block at production shard sizes. With edge rows, the kernel treats rows
    beyond the local grid as real (tombstones mark the global boundary)."""
    by, bx, cap = state.x.shape
    L = bx * cap
    ty_rows = _pick_ty_rows(by, L, block_rows)
    n_blocks = by // ty_rows

    def flat(a):
        return a.reshape(by, L)

    # Occupancy bound for the kernel's pass-skip predicate: global max live
    # slot index + 1 (NOT the live count — robust to non-contiguous slot
    # layouts even though rebucketing always packs slots ascending). Candidate
    # rows from a neighbor shard count too. One tiny elementwise reduce per
    # dispatch; at omax == cap every pass runs like before.
    slot_no = jnp.arange(cap, dtype=jnp.int32) + 1

    def top_slot(ty):
        return jnp.max(jnp.where(ty >= 0, slot_no, 0))

    omax = top_slot(state.ty)
    if edge_rows is not None:
        omax = jnp.maximum(
            omax, jnp.maximum(top_slot(edge_rows[0].ty), top_slot(edge_rows[1].ty))
        )
    params = jnp.concatenate([_params_vector(p), omax.astype(F32)[None]])
    C = int(lane_chunks)
    if C > 1 and (bx % C or (L // C) % 128):
        raise ValueError(
            f"lane_chunks={C} must divide bx={bx} with a 128-multiple chunk "
            f"width (got {L // C})"
        )
    W = L // C
    # per-(row-block, lane-chunk) any-live flags (receivers only: a block of
    # tombstones writes pass-through outputs regardless of its neighbors)
    flags = (
        (flat(state.ty).reshape(n_blocks, ty_rows, C, W).max(axis=(1, 3)) >= 0)
        .reshape(-1)
        .astype(jnp.int32)
    )

    if edge_rows is None:

        def neighbor_rows(a, _lo=None, _hi=None):
            # rows[p] above/below block p: global rows p*ty-1 and (p+1)*ty
            # (wrapped rows at the grid edges are NOT masked in-kernel: the
            # tombstoning below is the only edge protection). Strided slices
            # + a 1-row wrap concat, NOT roll-then-slice: the rolls
            # materialize the whole rotated array first — measured 2.19 vs
            # 1.49 ms/step of prologue at the 1M cap-16 user grid
            # (scripts/userscene_probe3.py, bit-identical by construction)
            a2 = a.reshape(by, L)
            above = jnp.concatenate(
                [a2[by - 1 :], a2[ty_rows - 1 : by - 1 : ty_rows]], axis=0
            )
            below = jnp.concatenate([a2[ty_rows::ty_rows], a2[:1]], axis=0)
            return above, below

        xa, xb = neighbor_rows(state.x)
        ya, yb = neighbor_rows(state.y)
        tya, tyb = neighbor_rows(jax.lax.bitcast_convert_type(state.ty, jnp.uint32))
        # the roll wraps at the grid edges: tombstone those halo rows so the
        # kernel's candidate-ty check rejects them (no in-kernel row masking)
        dead = jnp.full((1, L), 0xFFFFFFFF, jnp.uint32)  # bitcast(-1)
        tya = jnp.concatenate([dead, tya[1:]], axis=0)
        tyb = jnp.concatenate([tyb[:-1], dead], axis=0)
    else:
        top, bottom = edge_rows

        # "refs" halo-column geometry (sharded path, parallel/domain.py): the
        # HBM grid's x/y halo columns are stale between moves; ``halo_cols``
        # = (by, 4*segw) [x_lo | x_hi | y_lo | y_hi] carries the fresh
        # neighbor columns. The big x/y field blocks are spliced in-kernel;
        # the small strided halo ROWS built here (which can also contain
        # halo-column lanes) are patched XLA-side. External edge rows arrive
        # pre-patched from the caller (their corners are the y-neighbor's
        # fresh columns, unknowable here).
        if halo_cols is not None:
            segw = halo_cols.shape[1] // 4
            col_s0 = (col_xpad - 1) * cap
            col_s1 = (bx - col_xpad) * cap
            if 4 * cap > L:
                raise ValueError("halo_cols needs a grid at least 4 buckets wide")
            cols2 = halo_cols

            def patch(rows2d, crows, seg_lo, seg_hi):
                lo = crows[:, seg_lo * segw : seg_lo * segw + cap]
                hi = crows[:, seg_hi * segw : seg_hi * segw + cap]
                return jnp.concatenate(
                    [rows2d[:, :col_s0], lo.astype(rows2d.dtype),
                     rows2d[:, col_s0 + cap : col_s1], hi.astype(rows2d.dtype),
                     rows2d[:, col_s1 + cap :]], axis=1,
                )

        def neighbor_rows(a, lo, hi, segs=None):
            # above-row of block i = local row i*ty-1 (the external ``lo`` for
            # block 0), below-row = local row (i+1)*ty (the external ``hi``
            # for the last block). Strided slices + 1-row concats — NOT a
            # (by+2, L) concat-then-slice, which materializes a full grid
            # copy per field per step (the same prologue tax the edge_rows
            # = None branch's strided form was measured to remove:
            # 2.19 -> 1.49 ms/step at the 1M cap-16 user grid).
            a2 = a.reshape(by, L)
            up = a2[ty_rows - 1 : by - 1 : ty_rows]
            dn = a2[ty_rows::ty_rows]
            if segs is not None:
                up = patch(up, cols2[ty_rows - 1 : by - 1 : ty_rows], *segs)
                dn = patch(dn, cols2[ty_rows::ty_rows], *segs)
            above = jnp.concatenate([lo.reshape(1, L), up], axis=0)
            below = jnp.concatenate([dn, hi.reshape(1, L)], axis=0)
            return above, below

        xy_segs = ((0, 1), (2, 3)) if halo_cols is not None else (None, None)
        xa, xb = neighbor_rows(state.x, top.x, bottom.x, xy_segs[0])
        ya, yb = neighbor_rows(state.y, top.y, bottom.y, xy_segs[1])
        tya, tyb = neighbor_rows(
            jax.lax.bitcast_convert_type(state.ty, jnp.uint32),
            jax.lax.bitcast_convert_type(top.ty, jnp.uint32),
            jax.lax.bitcast_convert_type(bottom.ty, jnp.uint32),
        )
    if dynamic_passes is None:
        # Dense grids (cap >= 16) pay ~10x the Mosaic compile time of cap 8
        # with the fully unrolled pass pipeline (569 s vs 54 s at 64x64 over
        # the dev tunnel). The compact dynamic-roll program compiles and runs
        # on real hardware (measured: 229 s compile at cap 16 — better, not
        # great; Mosaic's per-body cost doesn't shrink linearly) with
        # summation-order f32 deltas vs the unrolled program. It stays
        # opt-in: the in-place cap refinement (_grid_for) already steers
        # sparse scenes to cap 8, which is where the engine actually lands.
        dynamic_passes = False

    # pad-extend a (rows, L) array to (rows, C*We): chunk c's slice holds the
    # true lanes [c*W - pad, c*W + W + pad) with ``fill`` (tombstones for ty)
    # past the grid ends — every chunk program's pair candidates live in its
    # own block, no cross-block lane access needed
    pad = 0 if C == 1 else max(128, 2 * cap)
    We = W + 2 * pad

    def ext(a2d, fill):
        if C == 1:
            return a2d
        p = jnp.full((a2d.shape[0], pad), fill, a2d.dtype)
        padded = jnp.concatenate([p, a2d, p], axis=1)
        return jnp.concatenate(
            [padded[:, c * W : c * W + We] for c in range(C)], axis=1
        )

    dead_u32 = jnp.uint32(0xFFFFFFFF)  # bitcast(-1)
    zero = jnp.zeros((n_blocks, C * We), xa.dtype)
    # (n_blocks, 8, C*We): [xa, xb, ya, yb, tya, tyb, 0, 0] per block
    halo = jnp.stack(
        [
            ext(xa, 0), ext(xb, 0), ext(ya, 0), ext(yb, 0),
            ext(tya, dead_u32), ext(tyb, dead_u32), zero, zero,
        ],
        axis=1,
    ).reshape(n_blocks * 8, C * We)

    # the dynamic-pass kernel computes lane validity arithmetically and never
    # reads the table: ship a minimal stub instead of 4*cap x We of VMEM
    if dynamic_passes:
        badmask = jnp.zeros((8, We), jnp.int32)
    else:
        badmask = jnp.asarray(_lane_bad_table(cap, We))

    out_shape = [
        jax.ShapeDtypeStruct((by, L), jnp.uint32),
        jax.ShapeDtypeStruct((by, L), jnp.uint32),
        jax.ShapeDtypeStruct((by, L), jnp.float32),
        jax.ShapeDtypeStruct((by, L), jnp.float32),
    ]
    if C == 1:
        grid = (n_blocks,)
        in_map, halo_map, const_map = (
            lambda i: (i, 0), lambda i: (i, 0), lambda i: (0, 0))
        out_map = lambda i: (i, 0)
    else:
        grid = (n_blocks, C)
        in_map, halo_map, const_map = (
            lambda i, c: (i, c), lambda i, c: (i, c), lambda i, c: (0, 0))
        out_map = lambda i, c: (i, c)
    in_spec = pl.BlockSpec((ty_rows, We), in_map, memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((8, We), halo_map, memory_space=pltpu.VMEM)
    badmask_spec = pl.BlockSpec(
        (badmask.shape[0], We), const_map, memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((ty_rows, W), out_map, memory_space=pltpu.VMEM)

    col_kw = {}
    if halo_cols is not None:
        if edge_rows is None:
            raise ValueError("halo_cols is only meaningful with edge_rows "
                             "(the sharded x-padded layout)")
        if 4 * segw > L:
            raise ValueError(f"halo_cols segments (4*{segw}) wider than the "
                             f"lane axis ({L})")
        if C > 1:
            # halo columns must fall inside the EDGE chunks' windows only —
            # the in-kernel splice runs per program on its own window
            if not (col_s0 + cap <= W - pad and col_s1 >= (C - 1) * W + pad):
                raise ValueError(
                    f"halo columns (lanes {col_s0}/{col_s1}) cross a "
                    f"non-edge chunk window (W={W}, pad={pad}, C={C})"
                )
        col_kw = dict(has_cols=True, col_s0=col_s0, col_s1=col_s1,
                      col_segw=segw)

    kernel = functools.partial(
        _step_kernel, ty_rows=ty_rows, by=by, cap=cap,
        dynamic_passes=dynamic_passes, n_chunks=C, pad=pad, **col_kw,
    )
    # Input fusion (default ON; PS_STEP_INPUT_FUSION=0 opts out): XLA fuses
    # the ext()/halo-stack producers into the pallas call instead of
    # materializing them in HBM each step. Same-window chip A/B at the 1M
    # cap-16 user grid: 94.5 -> 96.2 steps/s on top of the strided halo
    # build (data-movement producers only — values are unchanged). Baked in
    # at trace time; interpret mode ignores compiler params.
    fuse = (
        (False, False, True, True, True, True, True, True, False)
        if os.environ.get("PS_STEP_INPUT_FUSION", "1") == "1"
        else None
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # params (+ omax)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # per-(block, chunk) liveness
        in_spec, in_spec, in_spec, in_spec, in_spec,  # x, y, ty, vx, vy
        halo_spec,  # packed neighbor rows
        badmask_spec,  # static lane-validity table
    ]
    operands = [
        params,
        flags,
        ext(flat(state.x), 0), ext(flat(state.y), 0),
        ext(flat(state.ty), -1),
        ext(flat(state.vx), 0), ext(flat(state.vy), 0),
        halo,
        badmask,
    ]
    if halo_cols is not None:
        in_specs.append(
            pl.BlockSpec((ty_rows, 4 * segw), in_map, memory_space=pltpu.VMEM)
            if C == 1
            else pl.BlockSpec(
                (ty_rows, 4 * segw), lambda i, c: (i, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(halo_cols)
        if fuse is not None:
            fuse = fuse + (False,)
    nx, ny, nvx, nvy = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((ty_rows, We), jnp.float32),
            pltpu.VMEM((ty_rows, We), jnp.float32),
        ],
        # the unrolled pass pipeline legitimately holds ~20 MB of stack at
        # wide rows (L = 8192, the 4M-particle grid); the 16 MB scoped
        # default is a compiler heuristic, not the hardware VMEM size
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            allow_input_fusion=fuse,
        ),
        interpret=interpret,
    )(*operands)

    shape = state.x.shape
    return ParticleState(
        nx.reshape(shape), ny.reshape(shape), nvx.reshape(shape), nvy.reshape(shape), state.ty
    )


# ---------------------------------------------------------------------------
# Persistent pad-extended lane-chunk layout
#
# The classic lane-chunked call (bucket_step_pallas, lane_chunks > 1) pays a
# whole-grid copy PER STEP to materialize the pad-extended inputs (ext()) and
# another to slice interiors back out — scripts/userscene_decomp.py measured
# that structural floor at 47% of the user-scene step cost (5.67 of
# 11.94 ms/step on an all-tombstone grid). These helpers instead keep the
# state pad-extended ACROSS a whole move-cadence chunk of steps: the ext/unext
# copies happen every move_every steps, and per step only the x/y pad lanes at
# chunk boundaries are refreshed from their owning chunk's interior (ty never
# changes inside a chunk; candidate passes never read vx/vy, so neither needs
# a refresh; true-grid-end pads stay at their fill values because dead
# receivers pass inputs through).
# ---------------------------------------------------------------------------


class ExtGeom(NamedTuple):
    """Static geometry of a pad-extended (by, C*We/cap, cap) grid."""

    by: int
    cap: int
    C: int
    pad: int   # tombstoned/mirror lanes each side of every chunk
    W: int     # true lanes per chunk
    We: int    # extended lanes per chunk (W + 2*pad)

    @property
    def L(self) -> int:  # true lane count
        return self.C * self.W

    @property
    def Le(self) -> int:  # extended lane count
        return self.C * self.We


def _ext_geom_of(e: ParticleState, lane_chunks: int) -> ExtGeom:
    by, bxe, cap = e.x.shape
    C = int(lane_chunks)
    Le = bxe * cap
    if Le % C:
        raise ValueError(f"extended lanes {Le} not divisible by C={C}")
    We = Le // C
    pad = max(128, 2 * cap)
    W = We - 2 * pad
    if W <= 0 or W % 128:
        raise ValueError(f"bad extended geometry: We={We}, pad={pad}")
    return ExtGeom(by, cap, C, pad, W, We)


def ext_state_chunks(state: ParticleState, lane_chunks: int) -> ParticleState:
    """(by, bx, cap) -> the pad-extended (by, C*We/cap, cap) layout: chunk c's
    slice holds the true lanes [c*W - pad, c*W + W + pad) with fill values
    (tombstones for ty) past the grid ends — the persistent form of
    bucket_step_pallas's per-step ext(). pad is a multiple of cap, so the
    extended layout remains a whole-bucket 3D state."""
    by, bx, cap = state.x.shape
    C = int(lane_chunks)
    L = bx * cap
    W = L // C
    pad = max(128, 2 * cap)
    We = W + 2 * pad

    def ext(a3d, fill):
        a2d = a3d.reshape(by, L)
        p = jnp.full((by, pad), fill, a2d.dtype)
        padded = jnp.concatenate([p, a2d, p], axis=1)
        out = jnp.concatenate(
            [padded[:, c * W : c * W + We] for c in range(C)], axis=1
        )
        return out.reshape(by, C * We // cap, cap)

    return ParticleState(
        ext(state.x, 0), ext(state.y, 0),
        ext(state.vx, 0), ext(state.vy, 0), ext(state.ty, -1),
    )


def unext_state_chunks(e: ParticleState, lane_chunks: int) -> ParticleState:
    """Slice the chunk interiors back out of a pad-extended state."""
    g = _ext_geom_of(e, lane_chunks)

    def interior(a3d):
        a = a3d.reshape(g.by, g.C, g.We)[:, :, g.pad : g.pad + g.W]
        return a.reshape(g.by, g.L // g.cap, g.cap)

    return ParticleState(*(interior(a) for a in e))


def refresh_ext_pads(e: ParticleState, lane_chunks: int) -> ParticleState:
    """Refresh the chunk-boundary pad lanes of x and y from their owning
    chunk's freshly-stepped interior (one (by, 2*pad) slab write per interior
    boundary instead of the whole-grid re-ext). ty is never written by the
    step kernel and pair passes never read candidate vx/vy, so only the
    position fields need current pads; true-grid-end pads keep their fill
    values because the kernel passes dead receivers through."""
    g = _ext_geom_of(e, lane_chunks)

    def refresh(a3d):
        a = a3d.reshape(g.by, g.Le)
        for c in range(1, g.C):
            b = c * g.We
            slab = jnp.concatenate(
                [
                    a[:, b + g.pad : b + 2 * g.pad],      # right pad of c-1 <- head of c
                    a[:, b - 2 * g.pad : b - g.pad],      # left pad of c <- tail of c-1
                ],
                axis=1,
            )
            a = jax.lax.dynamic_update_slice_in_dim(a, slab, b - g.pad, axis=1)
        return a.reshape(a3d.shape)

    return ParticleState(refresh(e.x), refresh(e.y), e.vx, e.vy, e.ty)


class ExtStepAux(NamedTuple):
    """ty-derived inputs of the ext-layout step, hoisted once per move-cadence
    chunk (ty is constant between rebucket passes): the params vector with the
    occupancy bound appended, the per-(row-block, lane-chunk) receiver flags,
    and the compacted tile schedule (live tiles first, ascending; the dead
    tail repeats the last live tile so its block DMA is skipped)."""

    params: jnp.ndarray  # (11,) f32, _params_vector + omax
    flags: jnp.ndarray   # (n_tiles,) i32
    order: jnp.ndarray   # (n_tiles,) i32 tile visit order
    sizes: jnp.ndarray   # (1,) i32 = number of real (non-repeat) iterations


def ext_step_aux(
    e: ParticleState, p: SimParams, lane_chunks: int,
    block_rows: int | None = None,
) -> ExtStepAux:
    g = _ext_geom_of(e, lane_chunks)
    ty_rows = _pick_ty_rows(g.by, g.L, block_rows)
    n_blocks = g.by // ty_rows
    n_tiles = n_blocks * g.C

    # pad lanes mirror a neighbor chunk's interior (or are tombstones at the
    # grid ends), so the occupancy bound over the FULL extended ty equals the
    # interior bound the classic path computes
    slot_no = jnp.arange(g.cap, dtype=jnp.int32) + 1
    omax = jnp.max(jnp.where(e.ty >= 0, slot_no, 0))
    params = jnp.concatenate([_params_vector(p), omax.astype(F32)[None]])

    ty_int = (
        e.ty.reshape(g.by, g.C, g.We)[:, :, g.pad : g.pad + g.W]
        .reshape(n_blocks, ty_rows, g.C, g.W)
    )
    flags = (ty_int.max(axis=(1, 3)) >= 0).reshape(-1).astype(jnp.int32)

    live = flags > 0
    n_live = jnp.sum(live.astype(jnp.int32))
    n_real = jnp.maximum(n_live, 1)
    order0 = jnp.argsort(jnp.logical_not(live).astype(jnp.int32), stable=True)
    last_live = jax.lax.dynamic_slice(order0, (n_real - 1,), (1,))[0]
    idx = jnp.arange(n_tiles, dtype=jnp.int32)
    order = jnp.where(idx < n_real, order0, last_live).astype(jnp.int32)
    return ExtStepAux(params, flags, order, n_real.astype(jnp.int32)[None])


def _step_kernel_compact(
    order_ref, sizes_ref, params_ref, flags_ref,
    x_ref, y_ref, ty_ref, vx_ref, vy_ref, halo_ref, badmask_ref,
    ox_ref, oy_ref, ovx_ref, ovy_ref,
    fx_acc, fy_acc,
    *, ty_rows: int, by: int, cap: int, pad: int,
):
    """Ext-layout step over a compacted tile schedule: grid iteration i
    visits tile order[i]. Iterations past sizes[0] repeat the last live tile
    — same block index, so the pipeline skips their DMA entirely — and with
    the x/y/vx/vy inputs aliased onto the outputs, tiles never visited keep
    their input bytes, which IS the dead-block copy-through. The only real
    iteration over a dead tile is the all-dead fallback (tile 0), which
    copies through explicitly so the write-back is defined."""
    i = pl.program_id(0)
    tile = order_ref[i]
    is_real = i < sizes_ref[0]
    live = flags_ref[tile] != 0

    @pl.when(is_real & jnp.logical_not(live))
    def _dead_fallback():
        ox_ref[:] = x_ref[:]
        oy_ref[:] = y_ref[:]
        ovx_ref[:] = vx_ref[:]
        ovy_ref[:] = vy_ref[:]

    @pl.when(is_real & live)
    def _live_block():
        _step_block(
            params_ref, x_ref, y_ref, ty_ref, vx_ref, vy_ref, halo_ref,
            badmask_ref, ox_ref, oy_ref, ovx_ref, ovy_ref, fx_acc, fy_acc,
            ty_rows=ty_rows, by=by, cap=cap, pad=pad, out_off=0,
        )


@functools.partial(
    jax.jit,
    static_argnames=("lane_chunks", "block_rows", "compact", "interpret"),
)
def bucket_step_pallas_ext(
    e: ParticleState,
    p: SimParams,
    aux: ExtStepAux | None = None,
    *,
    lane_chunks: int,
    block_rows: int | None = None,
    compact: bool = True,
    interpret: bool = False,
) -> ParticleState:
    """One physics step on the persistent pad-extended layout. Interior lanes
    are bit-identical to bucket_step_pallas on the equivalent unextended
    state (same block partition, same pass order, same op order); pad lanes
    of x/y are refreshed from the interiors afterwards, ty threads through
    unchanged, and vx/vy pads are never read (candidates use x/y/ty only).

    ``compact=True`` schedules the pallas grid through ExtStepAux.order so
    dead tiles cost no HBM traffic at all (see _step_kernel_compact);
    ``compact=False`` keeps the classic (row-block, chunk) grid with the
    in-kernel dead-block copy-through, for A/B measurement.

    The jax.jit decorator is LOAD-BEARING for the bit-identity contract, not
    a convenience: in interpret mode the kernel's float ops inline into the
    enclosing XLA computation, where CPU fusion context changes their
    contraction/rounding — measured ulp-level drift vs bucket_step_pallas
    when this function was traced bare inside the frame runner's loops. The
    jit boundary pins the kernel math into its own compilation unit exactly
    like bucket_step_pallas's own decorator does."""
    g = _ext_geom_of(e, lane_chunks)
    ty_rows = _pick_ty_rows(g.by, g.L, block_rows)
    n_blocks = g.by // ty_rows
    if aux is None:
        aux = ext_step_aux(e, p, lane_chunks, block_rows)

    def flat(a):
        return a.reshape(g.by, g.Le)

    # packed neighbor rows, built directly on the extended layout: pad lanes
    # of each shipped row already mirror the neighbor chunk (refresh
    # invariant), which is exactly what the classic path's ext(rows)
    # produced. Strided slices, not roll-then-slice (see bucket_step_pallas)
    def neighbor_rows(a2):
        above = jnp.concatenate(
            [a2[g.by - 1 :], a2[ty_rows - 1 : g.by - 1 : ty_rows]], axis=0
        )
        below = jnp.concatenate([a2[ty_rows::ty_rows], a2[:1]], axis=0)
        return above, below

    xa, xb = neighbor_rows(flat(e.x))
    ya, yb = neighbor_rows(flat(e.y))
    tya, tyb = neighbor_rows(flat(jax.lax.bitcast_convert_type(e.ty, jnp.uint32)))
    dead = jnp.full((1, g.Le), 0xFFFFFFFF, jnp.uint32)
    tya = jnp.concatenate([dead, tya[1:]], axis=0)
    tyb = jnp.concatenate([tyb[:-1], dead], axis=0)
    zero = jnp.zeros((n_blocks, g.Le), xa.dtype)
    halo = jnp.stack(
        [xa, xb, ya, yb, tya, tyb, zero, zero], axis=1
    ).reshape(n_blocks * 8, g.Le)

    badmask = jnp.asarray(_lane_bad_table(g.cap, g.We))

    out_shape = [
        jax.ShapeDtypeStruct((g.by, g.Le), jnp.uint32),
        jax.ShapeDtypeStruct((g.by, g.Le), jnp.uint32),
        jax.ShapeDtypeStruct((g.by, g.Le), jnp.float32),
        jax.ShapeDtypeStruct((g.by, g.Le), jnp.float32),
    ]
    in_spec_shape = (ty_rows, g.We)
    halo_shape = (8, g.We)
    bad_shape = (badmask.shape[0], g.We)
    vmem = dict(memory_space=pltpu.VMEM)
    C = g.C

    if compact:
        tile_map = lambda i, order, sizes: (order[i] // C, order[i] % C)
        const_map = lambda i, order, sizes: (0, 0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks * C,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # params (+ omax)
                pl.BlockSpec(memory_space=pltpu.SMEM),  # per-tile liveness
                pl.BlockSpec(in_spec_shape, tile_map, **vmem),  # x
                pl.BlockSpec(in_spec_shape, tile_map, **vmem),  # y
                pl.BlockSpec(in_spec_shape, tile_map, **vmem),  # ty
                pl.BlockSpec(in_spec_shape, tile_map, **vmem),  # vx
                pl.BlockSpec(in_spec_shape, tile_map, **vmem),  # vy
                pl.BlockSpec(halo_shape, tile_map, **vmem),
                pl.BlockSpec(bad_shape, const_map, **vmem),
            ],
            out_specs=[pl.BlockSpec(in_spec_shape, tile_map, **vmem)] * 4,
            scratch_shapes=[
                pltpu.VMEM((ty_rows, g.We), jnp.float32),
                pltpu.VMEM((ty_rows, g.We), jnp.float32),
            ],
        )
        kernel = functools.partial(
            _step_kernel_compact, ty_rows=ty_rows, by=g.by, cap=g.cap,
            pad=g.pad,
        )
        # operand indices COUNT the scalar-prefetch args: order=0, sizes=1,
        # params=2, flags=3, x=4, y=5, ty=6, vx=7, vy=8. Aliasing the field
        # inputs onto the outputs is what lets never-visited tiles keep their
        # bytes (= copy-through) without any DMA.
        nx, ny, nvx, nvy = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            input_output_aliases={4: 0, 5: 1, 7: 2, 8: 3},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                # the repeated-tile tail relies on sequential grid order for
                # the same-index DMA/write-back skip — never a parallel dim
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(
            aux.order, aux.sizes, aux.params, aux.flags,
            flat(e.x), flat(e.y), flat(e.ty), flat(e.vx), flat(e.vy),
            halo, badmask,
        )
    else:
        in_map = lambda i, c: (i, c)
        const_map2 = lambda i, c: (0, 0)
        kernel = functools.partial(
            _step_kernel, ty_rows=ty_rows, by=g.by, cap=g.cap,
            n_chunks=C, pad=g.pad, out_off=0,
        )
        nx, ny, nvx, nvy = pl.pallas_call(
            kernel,
            grid=(n_blocks, C),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # params (+ omax)
                pl.BlockSpec(memory_space=pltpu.SMEM),  # per-tile liveness
                pl.BlockSpec(in_spec_shape, in_map, **vmem),
                pl.BlockSpec(in_spec_shape, in_map, **vmem),
                pl.BlockSpec(in_spec_shape, in_map, **vmem),
                pl.BlockSpec(in_spec_shape, in_map, **vmem),
                pl.BlockSpec(in_spec_shape, in_map, **vmem),
                pl.BlockSpec(halo_shape, in_map, **vmem),
                pl.BlockSpec(bad_shape, const_map2, **vmem),
            ],
            out_specs=[pl.BlockSpec(in_spec_shape, in_map, **vmem)] * 4,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((ty_rows, g.We), jnp.float32),
                pltpu.VMEM((ty_rows, g.We), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            aux.params, aux.flags,
            flat(e.x), flat(e.y), flat(e.ty), flat(e.vx), flat(e.vy),
            halo, badmask,
        )

    shape = e.x.shape
    out = ParticleState(
        nx.reshape(shape), ny.reshape(shape),
        nvx.reshape(shape), nvy.reshape(shape), e.ty,
    )
    return refresh_ext_pads(out, lane_chunks)


_AUX_BIG = np.int32(2**30)


def _move_pass_aux(
    destid2d: jnp.ndarray, ty_rows: int, n_blocks: int, C: int, Wp: int,
    L: int, src_row_shift: int, win_lo: int,
) -> jnp.ndarray:
    """Per-(dest row-block, lane-chunk) pull-pass bounds from the dest pass.

    The place kernels enumerate 3*(4*cap-1) static (dy, t) pull passes per
    live tile, but each KEPT candidate needs exactly one: dy = source row -
    dest row, t = source lane - dest lane (the roll shift that aligns them).
    In steady state most tiles have no bucket-crossers at all (their only
    pass is dy=0, t=0 — dest slot == source slot when nothing enters or
    leaves the 3x3 neighborhood scan), so per-tile bounds let the kernel
    skip almost the whole pass pipeline. This computes, per source row and
    lane-chunk, [tmin, tmax] and a dy-presence bitmask over kept candidates
    (cheap reshape reduces — no scatter), then takes each DEST tile's union
    over its source window (the block's rows +-1 and chunks +-1 — a strict
    superset of the candidates its passes can see, so a pass outside the
    bounds can match nothing and skipping it is exact; matching stays by
    value, hence bit-identical).

    ``src_row_shift`` maps source row index to dest-row coordinates (0 for
    the in-grid kernel, -1 when source rows are halo-padded); ``win_lo`` is
    the first source row of dest block 0's window in source coordinates.
    Returns i32 (3 * n_blocks * C,): [tmin... | tmax... | dymask...].
    """
    rows = destid2d.shape[0]
    kept = destid2d >= 0
    src_lane = jax.lax.broadcasted_iota(jnp.int32, destid2d.shape, 1)
    src_row = jax.lax.broadcasted_iota(jnp.int32, destid2d.shape, 0) + src_row_shift
    d_lane = jnp.where(kept, destid2d % L, 0)
    d_row = jnp.where(kept, destid2d // L, 0)
    t = src_lane - d_lane
    dyv = src_row - d_row

    def to_chunks(a, fill):
        # pad the lane axis to C*Wp (halo rounding) so rows chunk evenly
        if C * Wp > a.shape[1]:
            a = jnp.concatenate(
                [a, jnp.full((rows, C * Wp - a.shape[1]), fill, a.dtype)], 1
            )
        return a.reshape(rows, C, Wp)

    tmin_rc = to_chunks(jnp.where(kept, t, _AUX_BIG), _AUX_BIG).min(axis=2)
    tmax_rc = to_chunks(jnp.where(kept, t, -_AUX_BIG), -_AUX_BIG).max(axis=2)

    # dest tile (i, c) window: source rows win_lo + i*ty_rows .. + ty_rows+1
    # (clipped like the kernels' clamped block specs), source chunks c-1..c+1
    win = np.clip(
        np.arange(n_blocks)[:, None] * ty_rows
        + win_lo + np.arange(ty_rows + 2)[None, :],
        0, rows - 1,
    )

    def win_red(a, red, fill):
        aw = red(a[win], axis=1)  # (n_blocks, C)
        p = jnp.pad(aw, ((0, 0), (1, 1)), constant_values=fill)
        return red(jnp.stack([p[:, :-2], p[:, 1:-1], p[:, 2:]], 0), axis=0)

    tmin_b = win_red(tmin_rc, jnp.min, _AUX_BIG)
    tmax_b = win_red(tmax_rc, jnp.max, -_AUX_BIG)
    dym_b = jnp.zeros((n_blocks, C), jnp.int32)
    for dv in (-1, 0, 1):
        anyv = to_chunks((kept & (dyv == dv)).astype(jnp.int32), 0).max(axis=2)
        dym_b = dym_b | (win_red(anyv, jnp.max, 0) << (dv + 1))
    return jnp.concatenate(
        [tmin_b.reshape(-1), tmax_b.reshape(-1), dym_b.reshape(-1)]
    ).astype(jnp.int32)


def _move_pass_aux_or_full(destid2d, ty_rows, n_blocks, C, Wp, L,
                           src_row_shift, win_lo) -> jnp.ndarray:
    """_move_pass_aux, or all-passes-run constants when PS_MOVE_PASS_SKIP=0
    (A/B hook: same kernel, every group predicate true)."""
    if os.environ.get("PS_MOVE_PASS_SKIP", "1") == "1":
        return _move_pass_aux(destid2d, ty_rows, n_blocks, C, Wp, L,
                              src_row_shift, win_lo)
    nt = n_blocks * C
    return jnp.concatenate([
        jnp.full((nt,), -_AUX_BIG, jnp.int32),
        jnp.full((nt,), _AUX_BIG, jnp.int32),
        jnp.full((nt,), 7, jnp.int32),
    ])


def _dest_kernel(
    flags_ref,
    *rest,
    ty_rows: int, by: int, bx: int, cap: int,
    halo: bool = False, bx_log2: int | None = None, by_log2: int | None = None,
    px_out: int | None = None,
):
    if halo:
        offs_ref, halo_ref = rest[0], rest[1]
        (xm_ref, x_ref, xp_ref, ym_ref, y_ref, yp_ref,
         tym_ref, ty_ref, typ_ref, oid_ref) = rest[2:]
    else:
        offs_ref = halo_ref = None
        (xm_ref, x_ref, xp_ref, ym_ref, y_ref, yp_ref,
         tym_ref, ty_ref, typ_ref, oid_ref) = rest
    """Destination slot of every source slot under the reference's pull
    order (kernel_bucket.cuh:5-39 scan: blocks in (dy, dx) order, slots
    ascending) — the Pallas port of physics.bucket.move_dest_direct,
    bit-identical by construction (integer ops only, same scan order).

    Why a kernel: the XLA form materializes its packed cumsums and the
    9-step rank chain in HBM — measured 6.6 ms per move at 16.7M slots,
    ~18x its own input/output traffic bound (BASELINE.md queue r5b). Here
    everything lives in VMEM: the 9 per-block within-bucket prefix sums and
    segment totals ride the same 2 bit-packed words as the XLA version
    (each field's count <= cap fits in `bits`), computed by log2(cap)
    masked shift-add rounds (prefix) and monotone suffix-max rounds
    (segment-total broadcast — valid because a packed prefix word is
    nondecreasing along slots in every field at once).

    The rank's cross-cell term (counts at the TARGET's 3x3 neighborhood)
    spans source rows r-2..r+2, so the block computes on an extended
    ty_rows+4 row window built from the clamped prev/self/next block
    inputs; rows outside the global grid are mask-zeroed, which reproduces
    move_dest_direct's shift_pad zero-fill edge semantics exactly.

    Output: packed destid (dest slot id, or -1 for dropped/dead) — the
    _place_kernel's match key."""
    i = pl.program_id(0)
    L = x_ref.shape[1]

    @pl.when(flags_ref[i] == 0)
    def _dead_block():
        oid_ref[:] = jnp.full((ty_rows, L), -1, jnp.int32)

    @pl.when(flags_ref[i] != 0)
    def _live_block():
        bxl = int(np.log2(bx)) if bx_log2 is None else bx_log2
        byl = int(np.log2(by)) if by_log2 is None else by_log2
        E = ty_rows + 4

        def ext(am, a, ap):
            return jnp.concatenate([am[-2:], a, ap[:2]], axis=0)

        xw = ext(xm_ref[:], x_ref[:], xp_ref[:])
        yw = ext(ym_ref[:], y_ref[:], yp_ref[:])
        tyw = ext(tym_ref[:], ty_ref[:], typ_ref[:])

        # row of ext row e is i*ty_rows + e - 2 (grid rows when single-chip,
        # LOCAL interior rows in halo mode); the clamped prev/next blocks
        # duplicate edge rows, so mask rows outside the candidate range
        erow = jax.lax.broadcasted_iota(jnp.int32, (E, 1), 0)
        grow = i * ty_rows + erow - 2

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        slot = lane % cap

        if halo:
            # candidates include the two y-halo rows (local rows -1 and by);
            # splice their real data over the clamp-duplicated ext rows
            row_ok = (grow >= -1) & (grow <= by)
            hx_t, hx_b = halo_ref[0:1], halo_ref[1:2]
            hy_t, hy_b = halo_ref[2:3], halo_ref[3:4]
            hty_t = jax.lax.bitcast_convert_type(halo_ref[4:5], jnp.int32)
            hty_b = jax.lax.bitcast_convert_type(halo_ref[5:6], jnp.int32)
            is_t, is_b = grow == -1, grow == by
            xw = jnp.where(is_t, hx_t, jnp.where(is_b, hx_b, xw))
            yw = jnp.where(is_t, hy_t, jnp.where(is_b, hy_b, yw))
            tyw = jnp.where(is_t, hty_t, jnp.where(is_b, hty_b, tyw))
            cur_bx = lane // cap - 1  # x-halo column at local bucket -1
            row_off, col_off = offs_ref[0], offs_ref[1]
        else:
            row_ok = (grow >= 0) & (grow < by)
            cur_bx = lane // cap
            row_off = col_off = 0

        tgt_bx = (xw >> jnp.uint32(32 - bxl)).astype(jnp.int32) - col_off
        tgt_by = (yw >> jnp.uint32(32 - byl)).astype(jnp.int32) - row_off
        dy = grow - tgt_by
        dx = cur_bx - tgt_bx
        pullable = (
            (tyw >= 0) & row_ok
            & (jnp.abs(dy) <= 1) & (jnp.abs(dx) <= 1)
        )
        if halo:
            # targets must be this shard's own interior buckets
            pullable = pullable & (
                (tgt_by >= 0) & (tgt_by < by) & (tgt_bx >= 0) & (tgt_bx < bx)
            )

        masks = []
        for k in range(9):
            dyk, dxk = k // 3 - 1, k % 3 - 1
            masks.append(
                (pullable & (dy == dyk) & (dx == dxk)).astype(jnp.int32)
            )

        # packed within-bucket prefix sums + segment totals (2 words at
        # cap 16; same packing as move_dest_direct)
        bits = int(cap).bit_length()
        per_word = max(1, 31 // bits)
        field_max = (1 << bits) - 1
        rounds = []
        d = 1
        while d < cap:
            rounds.append(d)
            d *= 2
        prefs, totals = [], []
        for w in range(0, 9, per_word):
            packed = masks[w]
            shift = bits
            for k in range(w + 1, min(w + per_word, 9)):
                packed = packed + (masks[k] << shift)
                shift += bits
            s = packed
            for d in rounds:  # inclusive prefix within the bucket
                s = s + jnp.where(slot >= d, _roll_lanes(s, -d), 0)
            t = s
            for d in rounds:  # total broadcast: monotone suffix-max
                t = jnp.maximum(t, jnp.where(slot + d < cap, _roll_lanes(t, d), 0))
            prefs.append(s)
            totals.append(t)

        def unpack(words, k):
            return (words[k // per_word] >> (bits * (k % per_word))) & field_max

        def shift_rows(a, s):  # result[e] = a[e - s], zero fill
            if s == 0:
                return a
            z = jnp.zeros((abs(s), L), a.dtype)
            return (
                jnp.concatenate([z, a[:-s]], 0)
                if s > 0
                else jnp.concatenate([a[-s:], z], 0)
            )

        def shift_lanes(a, t):  # result[l] = a[l + t], zero past row ends
            if t == 0:
                return a
            ok = (lane + t >= 0) & (lane + t < L)
            return jnp.where(ok, _roll_lanes(a, t), 0)

        # the (dy, dx)-ordered scan: rank(p) = block_prefix at p's target
        # (before p's block) + within-cell exclusive prefix; block_prefix
        # accumulates each block's per-target counts
        rank = jnp.zeros((E, L), jnp.int32)
        bp = jnp.zeros((E, L), jnp.int32)  # indexed by target cell
        for k in range(9):
            dyk, dxk = k // 3 - 1, k % 3 - 1
            mk = masks[k]
            r_k = unpack(prefs, k) - mk  # exclusive
            bs_at_c = shift_lanes(shift_rows(bp, dyk), -dxk * cap)
            rank = rank + mk * (bs_at_c + r_k)
            cnt = shift_lanes(shift_rows(unpack(totals, k), -dyk), dxk * cap)
            bp = bp + cnt

        keep = pullable & (rank < cap)
        if halo:
            # output slot id in the padded lane layout (x-halo columns in
            # the lane axis: target lane bucket = tgt_bx + 1)
            dest = (tgt_by * px_out + tgt_bx + 1) * cap + rank
        else:
            dest = (tgt_by * bx + tgt_bx) * cap + rank
        destid = jnp.where(keep, dest, -1)
        oid_ref[:] = destid[2 : 2 + ty_rows]


@functools.partial(jax.jit, static_argnames=("interpret",))
def move_dest_pallas(state: ParticleState, interpret: bool = False) -> jnp.ndarray:
    """Packed destination slot ids for the rebucket pass, computed in a
    Pallas kernel (see _dest_kernel). Returns (by, bx*cap) i32: the flat
    dest slot id per source slot, -1 for dropped/dead — exactly
    ``jnp.where(keep, dest, -1)`` of physics.bucket.move_dest_direct."""
    by, bx, cap = state.x.shape
    L = bx * cap
    ty_rows = _pick_ty_rows(by, L)
    n_blocks = by // ty_rows

    # dead-block skip: a block with no live INTERIOR slot outputs all -1
    # (pullable is false everywhere) regardless of its neighbors
    flags = (
        (state.ty.reshape(n_blocks, ty_rows * bx * cap).max(axis=1) >= 0)
        .astype(jnp.int32)
    )

    def spec(offset):
        if offset == 0:
            return pl.BlockSpec((ty_rows, L), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        if offset < 0:
            return pl.BlockSpec(
                (ty_rows, L), lambda i: (jnp.maximum(i - 1, 0), 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (ty_rows, L), lambda i: (jnp.minimum(i + 1, n_blocks - 1), 0),
            memory_space=pltpu.VMEM,
        )

    def triplet(a):
        a2 = a.reshape(by, L)
        return (a2, a2, a2)

    kernel = functools.partial(
        _dest_kernel, ty_rows=ty_rows, by=by, bx=bx, cap=cap,
    )
    (destid,) = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [spec(o) for _ in range(3) for o in (-1, 0, +1)],
        out_specs=[pl.BlockSpec((ty_rows, L), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((by, L), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(flags, *triplet(state.x), *triplet(state.y), *triplet(state.ty))
    return destid


@functools.partial(
    jax.jit, static_argnames=("bx_log2", "by_log2", "interpret")
)
def move_dest_pallas_halo(
    padded: ParticleState,
    bx_log2: int,
    by_log2: int,
    row_offset,
    col_offset,
    interpret: bool = False,
) -> jnp.ndarray:
    """Packed destination slot ids for the SHARDED rebucket/migration pass —
    the halo-grid analog of move_dest_pallas, bit-identical to composing
    physics.bucket.move_ranks_direct_halo into
    ``where(keep, (tgt_by*px + tgt_bx + 1)*cap + rank, -1)``.

    The interior rows' ids come from _dest_kernel in halo mode: candidates
    include the x-halo columns (in the lane axis) and the two y-halo rows
    (spliced from a packed (8, L) input over the clamp-duplicated ext
    window rows); targets are bounds-checked against this shard's interior;
    the shard's global offsets ride SMEM. The two y-halo ROWS' own ids
    (the place kernel reads them as pull candidates) are computed XLA-side
    on 3-row slices — a halo-row particle can only target the adjacent
    interior row, whose full (dy, dx) scan lives inside those 3 rows, so
    the slice ranks equal the full-grid ranks exactly."""
    from particle_simulator_tpu.physics.bucket import move_ranks_direct_halo

    py, px, cap = padded.x.shape
    ly, lx = py - 2, px - 2
    L = px * cap
    ty_rows = _pick_ty_rows(ly, L)
    n_blocks = ly // ty_rows

    def rows2d(a):
        return a.reshape(py, L)

    x2, y2 = rows2d(padded.x), rows2d(padded.y)
    ty2 = rows2d(padded.ty)
    xi, yi, tyi = x2[1:-1], y2[1:-1], ty2[1:-1]  # interior (ly, L)

    flags = (
        (tyi.reshape(n_blocks, ty_rows * L).max(axis=1) >= 0).astype(jnp.int32)
    )
    offs = jnp.stack(
        [jnp.asarray(row_offset, jnp.int32), jnp.asarray(col_offset, jnp.int32)]
    )
    # packed y-halo rows: [x_top, x_bot, y_top, y_bot, ty_top, ty_bot, 0, 0]
    dead = jnp.full((1, L), 0xFFFFFFFF, jnp.uint32)
    halo = jnp.concatenate(
        [
            x2[0:1], x2[py - 1 :], y2[0:1], y2[py - 1 :],
            jax.lax.bitcast_convert_type(ty2[0:1], jnp.uint32),
            jax.lax.bitcast_convert_type(ty2[py - 1 :], jnp.uint32),
            dead * 0, dead * 0,
        ],
        axis=0,
    )

    def spec(offset):
        if offset == 0:
            return pl.BlockSpec((ty_rows, L), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        if offset < 0:
            return pl.BlockSpec(
                (ty_rows, L), lambda i: (jnp.maximum(i - 1, 0), 0),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (ty_rows, L), lambda i: (jnp.minimum(i + 1, n_blocks - 1), 0),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _dest_kernel, ty_rows=ty_rows, by=ly, bx=lx, cap=cap,
        halo=True, bx_log2=bx_log2, by_log2=by_log2, px_out=px,
    )
    (interior_id,) = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # flags
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (row_off, col_off)
            pl.BlockSpec((8, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        + [spec(o) for _ in range(3) for o in (-1, 0, +1)],
        out_specs=[pl.BlockSpec((ty_rows, L), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((ly, L), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        flags, offs, halo,
        xi, xi, xi, yi, yi, yi, tyi, tyi, tyi,
    )

    def edge_row_id(sl, local_row, offs_row):
        # 3-row padded slice whose single interior row is the halo row's
        # only possible target row; slice-local ranks == full-grid ranks
        tb, txc, rank, keep = move_ranks_direct_halo(
            ParticleState(*(a[sl] for a in padded)),
            bx_log2, by_log2, offs_row, col_offset,
        )
        dest = ((tb + local_row) * px + txc + 1) * cap + rank
        return jnp.where(keep, dest, -1).astype(jnp.int32).reshape(3, L)

    top3 = edge_row_id(slice(0, 3), 0, row_offset)
    bot3 = edge_row_id(slice(py - 3, py), ly - 1,
                       row_offset + jnp.asarray(ly - 1, jnp.int32))
    return jnp.concatenate([top3[0:1], interior_id, bot3[2:3]], axis=0)


def _place_kernel(
    flags_ref, aux_ref,
    xm_ref, x_ref, xp_ref,
    ym_ref, y_ref, yp_ref,
    tym_ref, ty_ref, typ_ref,
    vxm_ref, vx_ref, vxp_ref,
    vym_ref, vy_ref, vyp_ref,
    idm_ref, id_ref, idp_ref,
    ox_ref, oy_ref, ovx_ref, ovy_ref, oty_ref,
    *, ty_rows: int, by: int, cap: int, n_chunks: int = 1, pad: int = 0,
    n_tiles: int = 0,
):
    """Rebucket placement: each output slot pulls the (unique) candidate in
    its 3x3 neighborhood whose precomputed destination is this slot. Same
    roll-enumeration structure as the force kernel; ~10 select ops per
    candidate instead of an XLA scatter (which costs ~30 ms at 1M). The
    match key is the packed global destination slot id (row*L + lane), so a
    pass costs ONE compare instead of recomputing target buckets from the
    rolled coordinates.

    ``flags_ref[p]`` is the block's SOURCE liveness: any live particle in
    the block's rows OR the single adjacent row each side (the only rows a
    <=1-bucket move can pull from). A dead neighborhood can't match any
    output slot, so the all-tombstone init below IS the exact result and
    every pull pass is skipped — the move-pass analog of the step kernel's
    dead-block skip, for spatially sparse scenes.

    ``n_chunks`` > 1 adds the step kernel's COLUMN skip: the lane axis is
    split into chunks (second pallas grid dim), inputs arrive pre-extended
    with ``pad`` lanes each side (every candidate a <=1-bucket-x move can
    place in this chunk; pad >= 2*cap-1 also means no roll ever wraps), and
    a chunk with a dead source neighborhood skips its pull passes. Matching
    stays by VALUE (global slot id), so the pass set per output slot — and
    the output — is bit-identical to the unchunked kernel."""
    p_id = pl.program_id(0)
    We = x_ref.shape[1]  # chunk window incl. pads (= full row when unchunked)
    W = We - 2 * pad  # output chunk width
    L = n_chunks * W  # true flat row width (= the destid lane modulus)
    if n_chunks == 1:
        c_id = jnp.int32(0)
        idx = p_id
    else:
        c_id = pl.program_id(1).astype(jnp.int32)
        idx = p_id * n_chunks + pl.program_id(1)
    flag = flags_ref[idx]
    # per-tile pull-pass bounds (_move_pass_aux): lane-shift range + dy
    # bitmask over the kept candidates this tile's passes could match
    tmin = aux_ref[idx]
    tmax = aux_ref[n_tiles + idx]
    dymask = aux_ref[2 * n_tiles + idx]

    # start from an all-tombstone layout; accumulate THROUGH the output refs
    # (value-carried accumulators keep hundreds of pass intermediates live and
    # blow the VMEM stack)
    ox_ref[:] = jnp.zeros((ty_rows, W), jnp.uint32)
    oy_ref[:] = jnp.zeros((ty_rows, W), jnp.uint32)
    ovx_ref[:] = jnp.zeros((ty_rows, W), jnp.float32)
    ovy_ref[:] = jnp.zeros((ty_rows, W), jnp.float32)
    oty_ref[:] = jnp.full((ty_rows, W), -1, jnp.int32)

    @pl.when(flag != 0)
    def _live_block():
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (ty_rows, W), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (ty_rows, W), 1)
        my_by = p_id.astype(jnp.int32) * ty_rows + row_iota  # global bucket row
        # global flat slot id (C-order, = dest encoding). The unchunked form
        # omits the chunk-offset term so its trace — and compile-cache key —
        # stays byte-identical to the pre-lane-chunk kernel.
        if n_chunks == 1:
            my_id = my_by * L + lane
        else:
            my_id = my_by * L + c_id * W + lane

        def above(a_m, a):
            return jnp.concatenate([a_m[ty_rows - 1 :], a[: ty_rows - 1]], axis=0)

        def below(a, a_p):
            return jnp.concatenate([a[1:], a_p[:1]], axis=0)

        fields0 = (x_ref[:], y_ref[:], ty_ref[:], vx_ref[:], vy_ref[:], id_ref[:])
        fields_m = (xm_ref[:], ym_ref[:], tym_ref[:], vxm_ref[:], vym_ref[:], idm_ref[:])
        fields_p = (xp_ref[:], yp_ref[:], typ_ref[:], vxp_ref[:], vyp_ref[:], idp_ref[:])

        def run_pass(stacked, row_ok, t):
            rolled = _roll_lanes(stacked, t)
            if pad:
                # center window: the chunk's own W lanes. pad >= 2*cap-1
                # >= |t|, so every candidate reaching these lanes is in
                # the window and no roll wrapped across it
                rolled = rolled[:, pad : pad + W]
            jx = rolled[:ty_rows]
            jy = rolled[ty_rows : 2 * ty_rows]
            jty = jax.lax.bitcast_convert_type(rolled[2 * ty_rows : 3 * ty_rows], jnp.int32)
            jvx = jax.lax.bitcast_convert_type(rolled[3 * ty_rows : 4 * ty_rows], jnp.float32)
            jvy = jax.lax.bitcast_convert_type(rolled[4 * ty_rows : 5 * ty_rows], jnp.float32)
            jid = jax.lax.bitcast_convert_type(rolled[5 * ty_rows :], jnp.int32)

            # destid encodes keep: dropped = -1, never equal to any my_id
            match = row_ok & (jid == my_id)
            ox_ref[:] = jnp.where(match, jx, ox_ref[:])
            oy_ref[:] = jnp.where(match, jy, oy_ref[:])
            ovx_ref[:] = jnp.where(match, jvx, ovx_ref[:])
            ovy_ref[:] = jnp.where(match, jvy, ovy_ref[:])
            oty_ref[:] = jnp.where(match, jty, oty_ref[:])

        for dy in (-1, 0, 1):
            # skip the whole dy family when no kept candidate in this tile's
            # source window moves by that row delta (_move_pass_aux; pass
            # order is irrelevant to the output — dest ids are unique, so
            # matching is order-independent and skips stay bit-identical)
            @pl.when((dymask & (1 << (dy + 1))) != 0)
            def _dy_family(dy=dy):
                if dy == -1:
                    cx, cy, cty, cvx, cvy, crk = (
                        above(m, c) for m, c in zip(fields_m, fields0))
                elif dy == 0:
                    cx, cy, cty, cvx, cvy, crk = fields0
                else:
                    cx, cy, cty, cvx, cvy, crk = (
                        below(c, p) for c, p in zip(fields0, fields_p))
                row_ok = jnp.logical_and(my_by + dy >= 0, my_by + dy < by)
                # one roll per pass: stack the six 32-bit fields along sublanes
                stacked = jnp.concatenate(
                    [
                        cx, cy,
                        jax.lax.bitcast_convert_type(cty, jnp.uint32),
                        jax.lax.bitcast_convert_type(cvx, jnp.uint32),
                        jax.lax.bitcast_convert_type(cvy, jnp.uint32),
                        jax.lax.bitcast_convert_type(crk, jnp.uint32),
                    ],
                    axis=0,
                )
                # shift groups of 8: a group whose [lo, hi] misses the
                # tile's [tmin, tmax] has no candidate pair and skips; in
                # steady state (few bucket-crossers) most tiles run ONE
                # group instead of all 4*cap-1 shifts
                t0 = -(2 * cap - 1)
                for g_lo in range(t0, 2 * cap, 8):
                    ts = list(range(g_lo, min(g_lo + 8, 2 * cap)))

                    @pl.when((tmin <= ts[-1]) & (tmax >= ts[0]))
                    def _group(ts=ts, stacked=stacked, row_ok=row_ok):
                        for t in ts:
                            run_pass(stacked, row_ok, t)


@functools.partial(jax.jit, static_argnames=("interpret", "lane_chunks"))
def bucket_move_pallas(
    state: ParticleState, interpret: bool = False, lane_chunks: int = 1
) -> ParticleState:
    """Rebucketing pass, fully on-chip: destinations computed directly
    (physics.bucket.move_dest_direct, no sort) and placed by the pull-place
    kernel (no XLA scatter). Bit-identical to bucket_move.

    ``lane_chunks`` = C > 1 brings the step kernel's column skip to the
    move: the lane axis becomes a second pallas grid dimension, inputs are
    pre-extended with pad lanes each side (every cross-chunk candidate a
    <=1-bucket move can place here), and a chunk whose source neighborhood
    is dead skips all (2*(2*cap)-1)*3 pull passes. Output bit-identical to
    the unchunked kernel (tests/test_pallas.py); only worth it on spatially
    sparse scenes — the caller passes the same C the step kernel uses."""
    from particle_simulator_tpu.physics.bucket import move_dest_direct

    by, bx, cap = state.x.shape
    L = bx * cap
    ty_rows = _pick_ty_rows(by, L)
    n_blocks = by // ty_rows
    n = by * bx * cap

    C = int(lane_chunks)
    if C > 1 and (bx % C or (L // C) % 128):
        raise ValueError(
            f"lane_chunks={C} must divide bx={bx} with a 128-multiple chunk "
            f"width (got {L // C})"
        )
    W = L // C
    pad = 0 if C == 1 else max(128, 2 * cap)
    We = W + 2 * pad

    if os.environ.get("PS_DEST_PALLAS", "1") == "1":
        # dest pass in VMEM (_dest_kernel): the XLA form's packed cumsums +
        # 9-step rank chain materialize in HBM — 6.6 ms/move at 16.7M slots,
        # ~18x the traffic bound (queue r5b). Bit-identical (integer ops,
        # same scan order; the 3-impl move identity tests cover it).
        destid = move_dest_pallas(state, interpret=interpret)
    else:
        dest, keep = move_dest_direct(state)
        # packed destination slot id per source slot; -1 = dropped/dead
        # (never a real id, so the kernel's single compare handles keep too)
        destid = jnp.where(keep, dest, -1).astype(jnp.int32).reshape(by, L)

    def flat(a):
        return a.reshape(by, L)

    def ext(a2d, fill):
        # chunk c's slice holds true lanes [c*W - pad, c*W + W + pad) with
        # ``fill`` past the grid ends (same layout as bucket_step_pallas)
        if C == 1:
            return a2d
        p = jnp.full((a2d.shape[0], pad), fill, a2d.dtype)
        padded = jnp.concatenate([p, a2d, p], axis=1)
        return jnp.concatenate(
            [padded[:, c * W : c * W + We] for c in range(C)], axis=1
        )

    # per-block SOURCE liveness: the block's own rows plus the one adjacent
    # row each side (all a <=1-bucket move can pull from). Dead neighborhood
    # -> the kernel's tombstone init is the exact result (_place_kernel)
    if C == 1:
        live_row = (flat(state.ty) >= 0).any(axis=1).reshape(n_blocks, ty_rows)
        blk_any = live_row.any(axis=1)
        false1 = jnp.zeros((1,), bool)
        prev_last = jnp.concatenate([false1, live_row[:-1, -1]])
        next_first = jnp.concatenate([live_row[1:, 0], false1])
        flags = (blk_any | prev_last | next_first).astype(jnp.int32)
    else:
        # per-(block, chunk): any live source in the chunk's ext lane window
        # (pads included — cross-chunk pulls) over the block rows +- 1 row
        live_rc = (
            (ext(flat(state.ty), -1).reshape(by, C, We) >= 0)
            .any(axis=2)
            .reshape(n_blocks, ty_rows, C)
        )
        blk_any = live_rc.any(axis=1)
        false1 = jnp.zeros((1, C), bool)
        prev_last = jnp.concatenate([false1, live_rc[:-1, -1]], axis=0)
        next_first = jnp.concatenate([live_rc[1:, 0], false1], axis=0)
        flags = (blk_any | prev_last | next_first).astype(jnp.int32).reshape(-1)

    if C == 1:
        grid = (n_blocks,)

        def spec(offset):
            if offset == 0:
                return pl.BlockSpec((ty_rows, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
            if offset < 0:
                return pl.BlockSpec(
                    (ty_rows, L), lambda i: (jnp.maximum(i - 1, 0), 0), memory_space=pltpu.VMEM
                )
            return pl.BlockSpec(
                (ty_rows, L), lambda i: (jnp.minimum(i + 1, n_blocks - 1), 0), memory_space=pltpu.VMEM
            )

        out_spec = pl.BlockSpec((ty_rows, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    else:
        grid = (n_blocks, C)

        def spec(offset):
            if offset == 0:
                return pl.BlockSpec(
                    (ty_rows, We), lambda i, c: (i, c), memory_space=pltpu.VMEM
                )
            if offset < 0:
                return pl.BlockSpec(
                    (ty_rows, We),
                    lambda i, c: (jnp.maximum(i - 1, 0), c),
                    memory_space=pltpu.VMEM,
                )
            return pl.BlockSpec(
                (ty_rows, We),
                lambda i, c: (jnp.minimum(i + 1, n_blocks - 1), c),
                memory_space=pltpu.VMEM,
            )

        out_spec = pl.BlockSpec(
            (ty_rows, W), lambda i, c: (i, c), memory_space=pltpu.VMEM
        )

    kernel = functools.partial(
        _place_kernel, ty_rows=ty_rows, by=by, cap=cap, n_chunks=C, pad=pad,
        n_tiles=n_blocks * C,
    )
    # per-tile pull-pass bounds: dest-block source windows are rows +-1,
    # chunks +-1 of the true-lane layout (src rows are dest rows, shift 0)
    aux = _move_pass_aux_or_full(destid, ty_rows, n_blocks, C, W, L, 0, -1)

    def triplet(a, fill=0):
        e = ext(flat(a), fill)
        return (e, e, e)
    nx, ny, nvx, nvy, nty = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [spec(o) for _ in range(6) for o in (-1, 0, +1)],
        out_specs=[out_spec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((by, L), jnp.uint32),
            jax.ShapeDtypeStruct((by, L), jnp.uint32),
            jax.ShapeDtypeStruct((by, L), jnp.float32),
            jax.ShapeDtypeStruct((by, L), jnp.float32),
            jax.ShapeDtypeStruct((by, L), jnp.int32),
        ],
        # the 18+5 double-buffered (ty_rows, L) pipeline blocks pass ~22 MB at
        # L = 16k (1024x1024x16 user grids, 1024x2048x8 16M grids) — over the
        # 16 MB default scoped-vmem limit but well inside physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        flags, aux,
        *triplet(state.x), *triplet(state.y), *triplet(state.ty, -1),
        *triplet(state.vx, 0.0), *triplet(state.vy, 0.0), *triplet(destid, -1),
    )

    shape = state.x.shape
    return ParticleState(
        nx.reshape(shape), ny.reshape(shape), nvx.reshape(shape),
        nvy.reshape(shape), nty.reshape(shape),
    )


def _place_edge_kernel(
    flags_ref, aux_ref,
    x_ref, y_ref, ty_ref, vx_ref, vy_ref, id_ref, halo_ref,
    ox_ref, oy_ref, ovx_ref, ovy_ref, oty_ref,
    *, ty_rows: int, cap: int, n_chunks: int = 1, pad: int = 0, true_l: int = 0,
    n_tiles: int = 0,
):
    """_place_kernel variant for the sharded path: the rows above/below each
    block arrive in ONE packed halo block (12 of 16 sublanes used) instead of
    clamped +-1 block triplets — at the shard's top/bottom edge those rows are
    the NEIGHBOR shard's edge buckets (exchange_halo output), so no row_ok
    masking exists: out-of-box rows are tombstones with destid -1, which never
    matches an output slot id.

    ``flags_ref[p]``: any KEPT candidate (destid >= 0) among the block's
    source rows, halo rows included — a dead neighborhood skips every pull
    pass (the single-chip _place_kernel's dead-block skip, sharded form).

    ``n_chunks`` > 1 is the column skip. A shard's lane count L = (lx+2)*cap
    is rarely chunk-divisible, so inputs arrive in the ROUNDED layout:
    ``true_l`` real lanes + tombstone lanes appended to n_chunks * W' (W' a
    128 multiple), then pad-extended per chunk. Output ids for appended
    lanes would collide with the next row's real ids (row*L + L ==
    (row+1)*L), so they are masked to -2 — destid is always >= -1."""
    p_id = pl.program_id(0)
    We = x_ref.shape[1]
    W = We - 2 * pad  # output chunk width (= full row when unchunked)

    ox_ref[:] = jnp.zeros((ty_rows, W), jnp.uint32)
    oy_ref[:] = jnp.zeros((ty_rows, W), jnp.uint32)
    ovx_ref[:] = jnp.zeros((ty_rows, W), jnp.float32)
    ovy_ref[:] = jnp.zeros((ty_rows, W), jnp.float32)
    oty_ref[:] = jnp.full((ty_rows, W), -1, jnp.int32)

    if n_chunks == 1:
        c_id = None
        idx = p_id
    else:
        c_id = pl.program_id(1)  # hoisted: program_id can't trace inside when
        idx = p_id * n_chunks + c_id
    flag = flags_ref[idx]
    # per-tile pull-pass bounds (_move_pass_aux, sharded coords)
    tmin = aux_ref[idx]
    tmax = aux_ref[n_tiles + idx]
    dymask = aux_ref[2 * n_tiles + idx]

    @pl.when(flag != 0)
    def _live_block():
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (ty_rows, W), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (ty_rows, W), 1)
        my_row = p_id.astype(jnp.int32) * ty_rows + row_iota
        if n_chunks == 1:
            L = W
            my_id = my_row * L + lane
        else:
            L = true_l
            q = c_id.astype(jnp.int32) * W + lane
            my_id = jnp.where(q < L, my_row * L + q, -2)

        halo = halo_ref[:]
        above_f = tuple(halo[i : i + 1] for i in range(6))
        below_f = tuple(halo[i : i + 1] for i in range(6, 12))

        main = (
            x_ref[:], y_ref[:],
            jax.lax.bitcast_convert_type(ty_ref[:], jnp.uint32),
            jax.lax.bitcast_convert_type(vx_ref[:], jnp.uint32),
            jax.lax.bitcast_convert_type(vy_ref[:], jnp.uint32),
            jax.lax.bitcast_convert_type(id_ref[:], jnp.uint32),
        )

        def run_pass(stacked, t):
            rolled = _roll_lanes(stacked, t)
            if pad:
                # center window; pad >= 2*cap-1 >= |t| means every
                # candidate reaching it is in-window, no roll wrapped
                rolled = rolled[:, pad : pad + W]
            jx = rolled[:ty_rows]
            jy = rolled[ty_rows : 2 * ty_rows]
            jty = jax.lax.bitcast_convert_type(rolled[2 * ty_rows : 3 * ty_rows], jnp.int32)
            jvx = jax.lax.bitcast_convert_type(rolled[3 * ty_rows : 4 * ty_rows], jnp.float32)
            jvy = jax.lax.bitcast_convert_type(rolled[4 * ty_rows : 5 * ty_rows], jnp.float32)
            jid = jax.lax.bitcast_convert_type(rolled[5 * ty_rows :], jnp.int32)

            match = jid == my_id
            ox_ref[:] = jnp.where(match, jx, ox_ref[:])
            oy_ref[:] = jnp.where(match, jy, oy_ref[:])
            ovx_ref[:] = jnp.where(match, jvx, ovx_ref[:])
            ovy_ref[:] = jnp.where(match, jvy, ovy_ref[:])
            oty_ref[:] = jnp.where(match, jty, oty_ref[:])

        for dy in (-1, 0, 1):
            # per-tile (dy, shift-group) skips — same bounds machinery as
            # _place_kernel; matching is by unique value, so pass order and
            # skipped no-match passes never change the output
            @pl.when((dymask & (1 << (dy + 1))) != 0)
            def _dy_family(dy=dy):
                if dy == -1:
                    fields = tuple(
                        jnp.concatenate([a, c[: ty_rows - 1]], axis=0)
                        for a, c in zip(above_f, main)
                    )
                elif dy == 0:
                    fields = main
                else:
                    fields = tuple(
                        jnp.concatenate([c[1:], b], axis=0)
                        for c, b in zip(main, below_f)
                    )
                stacked = jnp.concatenate(fields, axis=0)
                t0 = -(2 * cap - 1)
                for g_lo in range(t0, 2 * cap, 8):
                    ts = list(range(g_lo, min(g_lo + 8, 2 * cap)))

                    @pl.when((tmin <= ts[-1]) & (tmax >= ts[0]))
                    def _group(ts=ts, stacked=stacked):
                        for t in ts:
                            run_pass(stacked, t)


@functools.partial(
    jax.jit, static_argnames=("bx_log2", "by_log2", "interpret", "lane_chunks")
)
def bucket_move_pallas_halo(
    padded: ParticleState,
    bx_log2: int,
    by_log2: int,
    row_offset,
    col_offset,
    interpret: bool = False,
    lane_chunks: int = 1,
) -> ParticleState:
    """Shard-local rebucketing/migration, fully on-chip: ranks from
    physics.bucket.move_ranks_direct_halo (no sort) + the pull-place kernel
    (no XLA scatter) — the sharded analog of bucket_move_pallas, bit-identical
    to bucket_move_direct_halo / bucket_move_nbr over the same halo.

    ``padded`` is the (ly+2, lx+2, cap) exchange_halo output. Like the
    sharded step kernel (parallel/domain.py), the x-halo columns join the
    lane axis and the y-halo rows ride the packed per-block halo input, so
    the local grid keeps its row blocking. Output is the (ly, lx, cap)
    interior.

    ``lane_chunks`` = C > 1 adds the column skip without any layout
    negotiation with the caller: the shard lane count L = (lx+2)*cap is
    rarely chunk-divisible, so lanes are ROUNDED — tombstone lanes appended
    up to C * W' (W' the smallest 128 multiple >= L/C) — then pad-extended
    per chunk exactly like bucket_move_pallas. Matching is by value and the
    appended lanes carry destid -1 / masked output ids, so the result is
    bit-identical to the unchunked kernel for ANY (lx, cap)."""
    from particle_simulator_tpu.physics.bucket import move_ranks_direct_halo

    py, px, cap = padded.x.shape
    ly, lx = py - 2, px - 2
    L = px * cap
    ty_rows = _pick_ty_rows(ly, L)
    n_blocks = ly // ty_rows

    C = int(lane_chunks)
    if C == 1:
        Wp, pad = L, 0
    else:
        Wp = -(-L // (C * 128)) * 128  # ceil(L/C) rounded up to a lane tile
        pad = max(128, 2 * cap)
    Lp = C * Wp  # rounded lane count (tombstone lanes appended past L)
    We = Wp + 2 * pad

    # destination slot id in OUTPUT coords — (py, px, cap) with the x-halo
    # columns still in the lane axis (target lane bucket = tgt_bx + 1); -1 =
    # dropped/dead, never equal to a real output id
    if os.environ.get("PS_DEST_PALLAS", "1") == "1":
        destid = move_dest_pallas_halo(
            padded, bx_log2, by_log2, row_offset, col_offset,
            interpret=interpret,
        ).reshape(py, px, cap)
    else:
        tgt_by, tgt_bx, rank, keep = move_ranks_direct_halo(
            padded, bx_log2, by_log2, row_offset, col_offset
        )
        destid = jnp.where(
            keep, (tgt_by * px + tgt_bx + 1) * cap + rank, -1
        ).astype(jnp.int32)

    def rows2d(a):
        return a.reshape(py, L)

    def ext(a2d, fill):
        # round the lane axis to Lp with fill, then window per chunk: chunk
        # c's slice holds rounded lanes [c*Wp - pad, c*Wp + Wp + pad)
        if C == 1:
            return a2d
        rows = a2d.shape[0]
        a2d = jnp.concatenate(
            [a2d, jnp.full((rows, Lp - L), fill, a2d.dtype)], axis=1
        ) if Lp > L else a2d
        p = jnp.full((rows, pad), fill, a2d.dtype)
        padded2 = jnp.concatenate([p, a2d, p], axis=1)
        return jnp.concatenate(
            [padded2[:, c * Wp : c * Wp + We] for c in range(C)], axis=1
        )

    dead_u32 = jnp.uint32(0xFFFFFFFF)  # bitcast(-1): tombstone ty / destid
    fields = (
        ext(rows2d(padded.x), 0),
        ext(rows2d(padded.y), 0),
        ext(rows2d(jax.lax.bitcast_convert_type(padded.ty, jnp.uint32)), dead_u32),
        ext(rows2d(jax.lax.bitcast_convert_type(padded.vx, jnp.uint32)), 0),
        ext(rows2d(jax.lax.bitcast_convert_type(padded.vy, jnp.uint32)), 0),
        ext(rows2d(jax.lax.bitcast_convert_type(destid, jnp.uint32)), dead_u32),
    )
    CW = fields[0].shape[1]  # C * We (= L when unchunked)
    mains = tuple(f[1:-1] for f in fields)  # interior rows (ly, CW)
    # packed per-block halo: block i's candidate rows above (= padded row
    # i*ty_rows) and below (= padded row (i+1)*ty_rows + 1), 6 fields each,
    # padded to 16 sublanes (Mosaic blocks want multiples of 8)
    above = jnp.stack([f[0:py - 2 : ty_rows] for f in fields], axis=1)
    below = jnp.stack([f[ty_rows + 1 :: ty_rows] for f in fields], axis=1)
    zero4 = jnp.zeros((n_blocks, 4, CW), jnp.uint32)
    halo = jnp.concatenate([above, below, zero4], axis=1).reshape(n_blocks * 16, CW)

    # per-block source liveness over padded rows [i*ty_rows, i*ty_rows +
    # ty_rows + 2): any KEPT candidate (destid >= 0; tombstones and halo
    # fill carry -1) — see _place_edge_kernel's dead-neighborhood skip
    if C == 1:
        src_live = (destid.reshape(py, L) >= 0).any(axis=1)
        win = jnp.arange(n_blocks)[:, None] * ty_rows + jnp.arange(ty_rows + 2)[None, :]
        flags = src_live[win].any(axis=1).astype(jnp.int32)
    else:
        # (py, C): kept candidate anywhere in the chunk's ext lane window
        src_rc = (
            jax.lax.bitcast_convert_type(fields[5], jnp.int32)
            .reshape(py, C, We) >= 0
        ).any(axis=2)
        win = jnp.arange(n_blocks)[:, None] * ty_rows + jnp.arange(ty_rows + 2)[None, :]
        flags = src_rc[win].any(axis=1).astype(jnp.int32).reshape(-1)

    if C == 1:
        grid = (n_blocks,)
        spec = lambda: pl.BlockSpec((ty_rows, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
        halo_spec = pl.BlockSpec((16, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((ty_rows, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    else:
        grid = (n_blocks, C)
        spec = lambda: pl.BlockSpec(
            (ty_rows, We), lambda i, c: (i, c), memory_space=pltpu.VMEM
        )
        halo_spec = pl.BlockSpec((16, We), lambda i, c: (i, c), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec(
            (ty_rows, Wp), lambda i, c: (i, c), memory_space=pltpu.VMEM
        )
    kernel = functools.partial(
        _place_edge_kernel, ty_rows=ty_rows, cap=cap, n_chunks=C, pad=pad,
        true_l=L, n_tiles=n_blocks * C,
    )
    # per-tile pull-pass bounds: source rows are halo-padded (padded row r
    # <-> output row r-1), block i's source window = padded rows
    # [i*ty_rows, i*ty_rows + ty_rows + 2) — the flags window above
    aux = _move_pass_aux_or_full(
        destid.reshape(py, L), ty_rows, n_blocks, C, Wp, L, -1, 0
    )
    nx, ny, nvx, nvy, nty = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [spec() for _ in range(6)]
        + [halo_spec],
        out_specs=[out_spec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((ly, Lp), jnp.uint32),
            jax.ShapeDtypeStruct((ly, Lp), jnp.uint32),
            jax.ShapeDtypeStruct((ly, Lp), jnp.float32),
            jax.ShapeDtypeStruct((ly, Lp), jnp.float32),
            jax.ShapeDtypeStruct((ly, Lp), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        flags, aux,
        mains[0],
        mains[1],
        jax.lax.bitcast_convert_type(mains[2], jnp.int32),
        jax.lax.bitcast_convert_type(mains[3], jnp.float32),
        jax.lax.bitcast_convert_type(mains[4], jnp.float32),
        jax.lax.bitcast_convert_type(mains[5], jnp.int32),
        halo,
    )

    # drop the appended rounding lanes, then the x-halo columns
    def interior(a):
        if C > 1:
            a = a[:, :L]
        return a.reshape(ly, px, cap)[:, 1:-1]

    return ParticleState(
        interior(nx), interior(ny), interior(nvx), interior(nvy), interior(nty)
    )


def run_frame_bucket_pallas(
    state: ParticleState,
    p: SimParams,
    move_every: int = 16,
    interpret: bool = False,
    block_rows: int | None = None,
    lane_chunks: int = 1,
    ext_io: bool | None = None,
    compact_tiles: bool = True,
) -> ParticleState:
    """Whole-frame runner: Pallas step kernel + Pallas rebucket pass on the
    reference cadence (every 16th step). The pull-place move kernel is
    bit-identical to bucket_move and ~3x the sort-based pass at 1M (no XLA
    scatter); multi-chip keeps the shard-local jnp pull pass.

    Chunked like run_frame_bucket (step 0 + (move, <= move_every unrolled
    steps) per chunk): the per-step `cond(i % k == 1, move)` branch it
    replaces measured ~15% of frame time at 1M. Interpret mode (CPU tests)
    keeps the small dynamic-loop trace, and so do grids above ~128 MB of
    state: the unrolled chunk body holds more live buffers and measured
    27 -> 16 steps/s at 16M (320 MB state), while 1M (20 MB) gains ~7%.

    ``ext_io=True`` (opt-in) threads lane-chunked frames through the
    PERSISTENT pad-extended layout: the whole-grid ext/unext copies ride the
    schedule's enter/exit hooks (once per move cadence instead of per step)
    and the flags/omax/tile-order prologue hoists with them;
    ``compact_tiles`` additionally schedules the pallas grid live-tiles
    first so dead tiles cost no HBM traffic (bucket_step_pallas_ext). It
    stays OFF by default: bit-identical on chip, but every same-window 1M
    user-scene A/B measured it at or below the classic path (the dead-tile
    DMA it removes already hides under pair math; see engine/simulator.py
    _ext_io_mode)."""
    by, bx, cap = state.x.shape
    big_state = by * bx * cap * 20 > 128 * 2**20
    if ext_io is None:
        ext_io = False

    def move(s):
        # same column skip as the step kernel (bit-identical to unchunked;
        # the r3 userscene decomposition put the unchunked move at ~24.9 ms
        # live vs ~9 ms vacuum floor on the 22%-occupancy 1M user grid)
        return bucket_move_pallas(s, interpret=interpret, lane_chunks=lane_chunks)

    from particle_simulator_tpu.physics.bucket import chunked_frame_schedule

    if ext_io and lane_chunks > 1:

        def enter(s):
            e = ext_state_chunks(s, lane_chunks)
            aux = ext_step_aux(e, p, lane_chunks, block_rows)
            return (e, aux)

        def estep(carry):
            e, aux = carry
            e = bucket_step_pallas_ext(
                e, p, aux, lane_chunks=lane_chunks, block_rows=block_rows,
                compact=compact_tiles, interpret=interpret,
            )
            return (e, aux)

        def eexit(carry):
            return unext_state_chunks(carry[0], lane_chunks)

        return chunked_frame_schedule(
            state, p.steps_per_frame, move_every, estep, move,
            unroll=not interpret and not big_state, enter=enter, exit=eexit,
        )

    def step(s):
        return bucket_step_pallas(
            s, p, interpret=interpret, block_rows=block_rows,
            lane_chunks=lane_chunks,
        )

    return chunked_frame_schedule(
        state, p.steps_per_frame, move_every, step, move,
        unroll=not interpret and not big_state,
    )
