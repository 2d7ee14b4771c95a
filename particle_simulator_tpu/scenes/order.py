"""Identity-free structural order parameters for phase classification.

The reference demonstrates solid/liquid/gas visually (doc/project.typ:169-191,
doc/StatesOfMatterTransitions.svg); this module makes the claim quantitative.
The wire format carries no particle ids (particle_io/src/particle.rs:110-132),
so per-particle MSD across frames is unavailable — instead we use single-frame
structural measures, the standard toolkit for 2D melting:

- **psi6** (bond-orientational / hexatic order): |mean_j exp(6 i theta_ij)|
  over each particle's first-shell neighbors, averaged over particles with
  >= 3 neighbors. ~1 for a hex crystal, small for a liquid, ~0/undefined for
  a gas.
- **mean first-shell neighbor count** within ``r_cut`` (default 1.4 r0; the
  hex lattice's first shell sits at the lattice spacing, the second at
  ~1.8x): ~6 condensed, << 1 for an expanded gas.
- **occupied box fraction**: share of a coarse grid's cells holding any
  particle — condensed phases stay clustered, a gas fills the box.

All NumPy on the host readback; neighbor search is a cell list over a
``r_cut`` grid with a 3x3 scan (the same trick as the engine's buckets).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from particle_simulator_tpu.io.frame import MieParams

U32_MAX_F = 4294967295.0


@dataclasses.dataclass
class OrderParams:
    n: int
    psi6: float
    mean_neighbors: float
    occupied_fraction: float
    mean_speed: float

    def as_dict(self) -> dict:
        return {k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in dataclasses.asdict(self).items()}


def order_parameters(
    parts: np.ndarray,
    meta: np.ndarray,
    r_cut: float | None = None,
    sample: int = 4096,
    occupancy_cells: int = 64,
    seed: int = 0,
) -> OrderParams:
    """Compute the order parameters for a PARTICLE_DTYPE array (live rows).

    ``sample`` bounds the psi6/neighbor evaluation cost: statistics are taken
    over at most that many randomly chosen particles (every particle still
    participates as a neighbor via the cell list).
    """
    live = parts[parts["ty"] >= 0]
    n = len(live)
    bw = float(meta["box_width"])
    bh = float(meta["box_height"])
    if r_cut is None:
        r_cut = 1.4 * MieParams.nitrogen().force0_r()
    if n == 0:
        return OrderParams(0, 0.0, 0.0, 0.0, 0.0)

    x = live["x"].astype(np.float64) / U32_MAX_F * bw
    y = live["y"].astype(np.float64) / U32_MAX_F * bh
    speed = float(np.hypot(live["vx"], live["vy"]).mean())

    # occupancy on a coarse grid
    gx = np.clip((live["x"].astype(np.uint64) * occupancy_cells) >> 32, 0, occupancy_cells - 1)
    gy = np.clip((live["y"].astype(np.uint64) * occupancy_cells) >> 32, 0, occupancy_cells - 1)
    occupied = len(np.unique(gy * occupancy_cells + gx)) / occupancy_cells**2

    # cell list at r_cut resolution
    cx = np.minimum((x / r_cut).astype(np.int64), int(bw / r_cut))
    cy = np.minimum((y / r_cut).astype(np.int64), int(bh / r_cut))
    ncx = int(cx.max()) + 2
    cell = cy * ncx + cx
    order = np.argsort(cell, kind="stable")
    cell_sorted = cell[order]

    rng = np.random.default_rng(seed)
    pick = rng.choice(n, size=min(sample, n), replace=False)

    psi6_sum = 0.0
    psi6_cnt = 0
    nbr_total = 0
    for i in pick:
        cands = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                c = (cy[i] + dy) * ncx + (cx[i] + dx)
                lo = np.searchsorted(cell_sorted, c, side="left")
                hi = np.searchsorted(cell_sorted, c, side="right")
                if hi > lo:
                    cands.append(order[lo:hi])
        if not cands:
            continue
        j = np.concatenate(cands)
        dxv = x[j] - x[i]
        dyv = y[j] - y[i]
        r2 = dxv * dxv + dyv * dyv
        mask = (r2 > 0) & (r2 <= r_cut * r_cut)
        k = int(mask.sum())
        nbr_total += k
        if k >= 3:
            theta = np.arctan2(dyv[mask], dxv[mask])
            psi6_sum += abs(np.exp(6j * theta).mean())
            psi6_cnt += 1

    psi6 = psi6_sum / psi6_cnt if psi6_cnt else 0.0
    mean_nbrs = nbr_total / len(pick)
    return OrderParams(n, float(psi6), float(mean_nbrs), float(occupied), speed)
