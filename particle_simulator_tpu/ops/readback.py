"""Device-side readback compaction for the bucket grid.

The daemon ships a wire frame every compute frame (engine/daemon.py ship()),
and the wire only carries LIVE particles — but the grid state is mostly
tombstones (a 256k user scene lands on a 512x512x16 grid = 4.19M slots at 6%
occupancy), so the full-grid readback (``state_to_numpy``) moves 84 MB over
the host link per frame. The reference has no such asymmetry: its CUDA
kernel compacts into a dense device buffer and reads exactly ``len``
particles back (cuda_simulator/src/kernel.cuh:116-165,
kernel_compact.cuh:44-76).

TPU-native equivalent — **slot slicing**, not data movement: every bucket
keeps its live particles in ascending slots (bucketize_numpy and all three
rebucket passes share this invariant — CLAUDE.md), so all slots >= the
global max occupancy are tombstones. Ship per-bucket counts plus the
``state[:, :, :kcap]`` slice (kcap = power-of-two >= the fullest bucket,
sticky across frames) and the host reassembles the exact global scan order
(flattened (BY, BX, CAP) row-major) — outbound frames stay byte-identical
with the full-grid path. The slice costs ~zero device time and shrinks the
transfer by cap/kcap (2-4x at production grids, which matters because the
transfer must fit inside the compute window for the daemon's async-copy
overlap to hide it; see engine/daemon.py enqueue).

A rank-based butterfly compaction (move every live particle to its per-row
prefix with log2(L) lane-shift stages; ~4x better compression) was built
and measured on-chip in both XLA (32-44 ms execute — 13 stages x 6 full
arrays of HBM traffic) and Mosaic (55 ms execute, 372 s compile: the big
cross-tile lane shifts serialize) forms. Both cost more serial device time
than the transfer they saved; rejected in favor of the free slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from particle_simulator_tpu.engine.state import ParticleState
from particle_simulator_tpu.io.frame import PARTICLE_DTYPE


@functools.partial(jax.jit, static_argnames=("kcap",))
def compact_readback(
    state: ParticleState, kcap: int
) -> tuple[jnp.ndarray, ParticleState]:
    """Jitted: per-bucket live counts + the slot slice ``[:, :, :kcap]``.

    Returns ``(counts, sliced)`` with ``counts`` (BY, BX) i32 exact for
    every bucket regardless of ``kcap`` — a bucket outgrowing the slice is
    therefore detectable, and the host wrapper (engine/simulator.py
    read_frame) widens the sticky kcap and retries. Slots past a bucket's
    count are tombstoned in the slice (they already are in a well-formed
    state; the ``where`` also guards the contract against any future slot
    producer)."""
    by, bx, cap = state.ty.shape
    counts = (state.ty >= 0).sum(-1, dtype=jnp.int32)
    kcap = min(int(kcap), cap)
    slot = jnp.arange(kcap, dtype=jnp.int32)
    live = slot[None, None, :] < counts[:, :, None]
    sliced = ParticleState(*(a[:, :, :kcap] for a in state))
    return counts, sliced._replace(
        ty=jnp.where(live, sliced.ty, jnp.int32(-1))
    )


def assemble_buckets(counts: np.ndarray, sliced: ParticleState) -> np.ndarray:
    """Host: drop each bucket's dead slot tail, producing one live
    PARTICLE_DTYPE array in the global row-major scan order (== what
    ``state_to_numpy(state)[mask]`` produces)."""
    counts = np.asarray(counts)
    kcap = np.asarray(sliced.ty).shape[-1]
    live = np.arange(kcap, dtype=np.int64)[None, None, :] < counts[..., None]
    out = np.empty(int(counts.sum()), dtype=PARTICLE_DTYPE)
    out["x"] = np.asarray(sliced.x)[live]
    out["y"] = np.asarray(sliced.y)[live]
    out["vx"] = np.asarray(sliced.vx)[live]
    out["vy"] = np.asarray(sliced.vy)[live]
    out["ty"] = np.asarray(sliced.ty)[live]
    return out


def pow2_at_least(n: int, floor: int = 1) -> int:
    """Smallest power of two >= max(n, floor) — the kcap bucketing that
    bounds the number of distinct jit signatures per grid to log2(cap)."""
    n = max(int(n), floor, 1)
    return 1 << (n - 1).bit_length()
