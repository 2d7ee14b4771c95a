"""Pallas bucket kernel vs jnp bucket path: same candidate set, same physics,
f32 rounding within summation-order ulps. Runs the kernel in interpreter mode
(CPU CI has no Mosaic); the TPU-compiled kernel is exercised by bench.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from particle_simulator_tpu.engine.state import SimParams, state_from_numpy, state_to_numpy
from particle_simulator_tpu.io.frame import Frame
from particle_simulator_tpu.io.presets import ParticleLattice
from particle_simulator_tpu.ops.bucket_pallas import bucket_step_pallas, run_frame_bucket_pallas
from particle_simulator_tpu.physics.bucket import (
    GridConfig,
    bucket_step,
    bucketize_numpy,
    run_frame_bucket,
    state_to_grid,
)


def scene(cfg, nx=20, ny=20, vel=(0.0, 30.0), seed=1):
    frame = Frame.new()
    meta = frame.metadata
    lat = ParticleLattice((nx, ny), distance_factor=1.1, velocity=vel)
    lat.hex_square(frame, (meta.box_width / 2, meta.box_height / 2), rng=np.random.default_rng(seed))
    layout = bucketize_numpy(frame.particles, cfg)
    state = state_to_grid(state_from_numpy(layout, cfg.capacity), cfg)
    return state, SimParams.from_record(meta.copy())


@pytest.mark.parametrize("cfg", [GridConfig(4, 4, 16), GridConfig(3, 3, 8), GridConfig(5, 4, 4)])
def test_pallas_step_matches_jnp(cfg):
    state, p = scene(cfg, nx=16, ny=16)
    ref = jax.tree.map(np.asarray, bucket_step(state, p))
    got = jax.tree.map(np.asarray, bucket_step_pallas(state, p, interpret=True))

    np.testing.assert_array_equal(ref.ty, got.ty)
    np.testing.assert_allclose(ref.x.astype(np.int64), got.x.astype(np.int64), rtol=0, atol=2)
    np.testing.assert_allclose(ref.y.astype(np.int64), got.y.astype(np.int64), rtol=0, atol=2)
    np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(ref.vy, got.vy, rtol=1e-4, atol=1e-3)


def test_pallas_step_with_cursor():
    state, p = scene(GridConfig(4, 4, 16))
    p = p._replace(cursor_x=np.float32(0.5), cursor_y=np.float32(0.5), cursor_size=np.float32(0.3))
    ref = jax.tree.map(np.asarray, bucket_step(state, p))
    got = jax.tree.map(np.asarray, bucket_step_pallas(state, p, interpret=True))
    np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(ref.vy, got.vy, rtol=1e-4, atol=1e-3)


def test_pallas_frame_runner_matches_jnp():
    cfg = GridConfig(4, 4, 8, move_every=4)
    state, p = scene(cfg, nx=14, ny=14)
    p = p._replace(steps_per_frame=np.int32(10))
    ref = jax.tree.map(np.asarray, run_frame_bucket(state, p, move_every=cfg.move_every))
    got = jax.tree.map(
        np.asarray,
        run_frame_bucket_pallas(state, p, move_every=cfg.move_every, interpret=True),
    )
    np.testing.assert_array_equal(ref.ty, got.ty)
    np.testing.assert_allclose(ref.x.astype(np.int64), got.x.astype(np.int64), rtol=0, atol=16)
    np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-3, atol=0.05)


def test_pallas_tombstones_inert():
    cfg = GridConfig(4, 4, 16)
    state, p = scene(cfg, nx=8, ny=8)
    got = jax.tree.map(np.asarray, bucket_step_pallas(state, p, interpret=True))
    dead = np.asarray(state.ty) < 0
    np.testing.assert_array_equal(got.x[dead], np.asarray(state.x)[dead])
    np.testing.assert_array_equal(got.vx[dead], np.asarray(state.vx)[dead])


# ---------------------------------------------------------------------------
# all-pairs (CompactArray) kernel
# ---------------------------------------------------------------------------

def compact_scene(n_live=100, capacity=128):
    from particle_simulator_tpu.engine.state import state_from_numpy

    frame = Frame.new()
    meta = frame.metadata
    side = int(np.sqrt(n_live))
    lat = ParticleLattice((side, side), distance_factor=1.1, velocity=(0.0, 30.0))
    lat.hex_square(frame, (meta.box_width / 2, meta.box_height / 2), rng=np.random.default_rng(2))
    state = state_from_numpy(frame.particles, capacity)
    return state, SimParams.from_record(meta.copy())


def test_allpairs_pallas_matches_jnp():
    from particle_simulator_tpu.ops.allpairs_pallas import allpairs_step_pallas
    from particle_simulator_tpu.physics.step import allpairs_step

    state, p = compact_scene()
    ref = jax.tree.map(np.asarray, allpairs_step(state, p))
    got = jax.tree.map(np.asarray, allpairs_step_pallas(state, p, interpret=True))
    np.testing.assert_array_equal(ref.ty, got.ty)
    np.testing.assert_allclose(ref.x.astype(np.int64), got.x.astype(np.int64), rtol=0, atol=2)
    np.testing.assert_allclose(ref.y.astype(np.int64), got.y.astype(np.int64), rtol=0, atol=2)
    np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(ref.vy, got.vy, rtol=1e-4, atol=1e-3)


def test_allpairs_pallas_multi_tile():
    """capacity > tile: exercises the j-sweep accumulation across grid steps."""
    from particle_simulator_tpu.ops.allpairs_pallas import allpairs_step_pallas
    from particle_simulator_tpu.physics.step import allpairs_step

    state, p = compact_scene(n_live=144, capacity=256)
    ref = jax.tree.map(np.asarray, allpairs_step(state, p))
    got = jax.tree.map(np.asarray, allpairs_step_pallas(state, p, interpret=True))
    np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(ref.vy, got.vy, rtol=1e-4, atol=1e-3)


def test_allpairs_pallas_with_cursor():
    from particle_simulator_tpu.ops.allpairs_pallas import allpairs_step_pallas
    from particle_simulator_tpu.physics.step import allpairs_step

    state, p = compact_scene()
    p = p._replace(cursor_x=np.float32(0.5), cursor_y=np.float32(0.5), cursor_size=np.float32(0.3))
    ref = jax.tree.map(np.asarray, allpairs_step(state, p))
    got = jax.tree.map(np.asarray, allpairs_step_pallas(state, p, interpret=True))
    np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-4, atol=1e-3)


def test_pallas_move_matches_pull():
    """The on-chip pull-place rebucket kernel is bit-identical to bucket_move,
    including overflow-drop and drift-drop semantics."""
    from particle_simulator_tpu.ops.bucket_pallas import bucket_move_pallas
    from particle_simulator_tpu.physics.bucket import bucket_move

    cfg = GridConfig(4, 4, 8)
    state, p = scene(cfg, nx=20, ny=20, vel=(0.0, 400.0), seed=5)
    for _ in range(30):
        state = jax.jit(bucket_step)(state, p)

    a = jax.tree.map(np.asarray, jax.jit(bucket_move)(state))
    b = jax.tree.map(np.asarray, bucket_move_pallas(state, interpret=True))
    for name, u, v in zip(a._fields, a, b):
        np.testing.assert_array_equal(u, v, err_msg=f"field {name}")


@pytest.mark.parametrize(
    "cfg,chunks",
    [
        (GridConfig(5, 4, 8), 2),   # 32x16 cap-8: W = 128
        (GridConfig(4, 4, 16), 2),  # 16x16 cap-16: W = 128, pad = 128
    ],
)
def test_pallas_move_lane_chunked_bit_identical(cfg, chunks):
    """The lane-chunked move (column skip for sparse scenes) is bit-identical
    to the unchunked pull-place kernel and to bucket_move — including
    cross-chunk x-migrations, overflow drops, and drift drops."""
    from particle_simulator_tpu.ops.bucket_pallas import bucket_move_pallas
    from particle_simulator_tpu.physics.bucket import bucket_move

    # hot lattice: plenty of x- and y-crossings (incl. across the chunk seam)
    state, p = scene(cfg, nx=20, ny=20, vel=(500.0, 400.0), seed=7)
    for _ in range(30):
        state = jax.jit(bucket_step)(state, p)

    a = jax.tree.map(np.asarray, jax.jit(bucket_move)(state))
    b = jax.tree.map(
        np.asarray, bucket_move_pallas(state, interpret=True, lane_chunks=chunks)
    )
    for name, u, v in zip(a._fields, a, b):
        np.testing.assert_array_equal(u, v, err_msg=f"field {name}")


def test_pallas_move_lane_chunked_sparse_corner():
    """A scene confined to one corner: most chunks are vacuum (the skip path)
    and the all-tombstone init must be their exact result; the live chunk and
    its seam neighbors still place every particle."""
    from particle_simulator_tpu.ops.bucket_pallas import bucket_move_pallas
    from particle_simulator_tpu.physics.bucket import bucket_move

    cfg = GridConfig(5, 4, 8)
    frame = Frame.new()
    meta = frame.metadata
    lat = ParticleLattice((6, 6), distance_factor=1.1, velocity=(900.0, -700.0))
    # bottom-left corner of the box -> a single live lane chunk out of 2
    lat.hex_square(
        frame,
        (meta.box_width / 8, meta.box_height / 8),
        rng=np.random.default_rng(11),
    )
    layout = bucketize_numpy(frame.particles, cfg)
    state = state_to_grid(state_from_numpy(layout, cfg.capacity), cfg)
    p = SimParams.from_record(meta.copy())
    for _ in range(20):
        state = jax.jit(bucket_step)(state, p)

    a = jax.tree.map(np.asarray, jax.jit(bucket_move)(state))
    b = jax.tree.map(
        np.asarray, bucket_move_pallas(state, interpret=True, lane_chunks=2)
    )
    for name, u, v in zip(a._fields, a, b):
        np.testing.assert_array_equal(u, v, err_msg=f"field {name}")
    # the hot corner lattice drops some particles (drift semantics) but the
    # chunked kernel must still place the survivors the pull pass keeps
    live = (np.asarray(b.ty) >= 0).sum()
    assert live > 0 and live == (np.asarray(a.ty) >= 0).sum()


def test_move_dest_direct_matches_pull():
    """Direct destination computation (no sort/scan) reproduces the pull
    order exactly (via the scatter-based bucket_move_direct)."""
    from particle_simulator_tpu.physics.bucket import bucket_move, bucket_move_direct

    cfg = GridConfig(4, 4, 8)
    state, p = scene(cfg, nx=20, ny=20, vel=(0.0, 400.0), seed=5)
    for _ in range(30):
        state = jax.jit(bucket_step)(state, p)
    a = jax.tree.map(np.asarray, jax.jit(bucket_move)(state))
    b = jax.tree.map(np.asarray, jax.jit(bucket_move_direct)(state))
    for name, u, v in zip(a._fields, a, b):
        np.testing.assert_array_equal(u, v, err_msg=f"field {name}")


def test_pallas_step_random_scenes_property():
    """Randomized differential test: random boxes, species params, velocities,
    and occupancy patterns through jnp vs Pallas step (interpret mode)."""
    from particle_simulator_tpu.io.frame import PARTICLE_DTYPE, default_metadata

    rng = np.random.default_rng(42)
    for trial in range(3):
        cfg = GridConfig(4, 4, 8)
        meta = default_metadata()
        meta["box_width"] = rng.uniform(20e-9, 200e-9)
        meta["box_height"] = meta["box_width"]
        meta["step_dt"] = rng.uniform(1e-15, 10e-15)
        meta["particles"][0]["sigma"] = rng.uniform(2e-10, 5e-10)
        meta["particles"][0]["n"] = rng.uniform(10.0, 16.0)
        meta["particles"][0]["m"] = rng.uniform(5.0, 7.0)
        if trial == 2:  # cursor active
            meta["cursor_pos"] = (0.5, 0.5)
            meta["cursor_size"] = 0.4

        n = int(rng.integers(50, 400))
        parts = np.zeros(n, dtype=PARTICLE_DTYPE)
        # spread-out random positions (no overlapping pairs), confined to the
        # central 90% of the box: a particle jammed against a wall sits on the
        # r^-m singularity where one ulp of formulation difference (pow vs
        # exp*log) amplifies to huge absolute force deltas in BOTH valid
        # implementations
        side = int(np.ceil(np.sqrt(n)))
        cells = rng.choice(side * side, n, replace=False)
        jitter = rng.integers(0, 2**32 // (side * 8), (2, n), dtype=np.uint64)
        span = int(0.9 * 2**32)
        off = int(0.05 * 2**32)
        parts["x"] = (off + ((cells % side) * (span // side) + jitter[0])).astype(np.uint32)
        parts["y"] = (off + ((cells // side) * (span // side) + jitter[1])).astype(np.uint32)
        parts["vx"] = rng.normal(0, 100, n)
        parts["vy"] = rng.normal(0, 100, n)
        parts["ty"] = rng.integers(0, 2, n)
        parts["ty"][rng.random(n) < 0.1] = -1  # sprinkle tombstones

        from particle_simulator_tpu.physics.bucket import bucketize_numpy

        layout = bucketize_numpy(parts, cfg)
        state = state_to_grid(state_from_numpy(layout, cfg.capacity), cfg)
        p = SimParams.from_record(meta)

        ref = jax.tree.map(np.asarray, bucket_step(state, p))
        got = jax.tree.map(np.asarray, bucket_step_pallas(state, p, interpret=True))
        np.testing.assert_array_equal(ref.ty, got.ty, err_msg=f"trial {trial}")
        np.testing.assert_allclose(
            ref.x.astype(np.int64), got.x.astype(np.int64), rtol=0, atol=4,
            err_msg=f"trial {trial}",
        )
        np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-3, atol=1e-2, err_msg=f"trial {trial}")
        np.testing.assert_allclose(ref.vy, got.vy, rtol=1e-3, atol=1e-2, err_msg=f"trial {trial}")


def _sparse_scene(cfg, n=220, seed=5):
    """Spread-out particles confined to the lower 40% of the box: low
    per-bucket occupancy (omax << cap) AND entirely-dead upper bucket rows."""
    from particle_simulator_tpu.io.frame import PARTICLE_DTYPE, default_metadata

    rng = np.random.default_rng(seed)
    meta = default_metadata()
    parts = np.zeros(n, dtype=PARTICLE_DTYPE)
    side = int(np.ceil(np.sqrt(n)))
    cells = rng.choice(side * side, n, replace=False)
    jitter = rng.integers(0, 2**32 // (side * 8), (2, n), dtype=np.uint64)
    span_x = int(0.9 * 2**32)
    span_y = int(0.35 * 2**32)
    parts["x"] = (int(0.05 * 2**32) + ((cells % side) * (span_x // side) + jitter[0])).astype(np.uint32)
    parts["y"] = (int(0.05 * 2**32) + ((cells // side) * (span_y // side) + jitter[1])).astype(np.uint32)
    parts["vx"] = rng.normal(0, 100, n)
    parts["vy"] = rng.normal(0, 100, n)
    parts["ty"] = rng.integers(0, 2, n)
    layout = bucketize_numpy(parts, cfg)
    state = state_to_grid(state_from_numpy(layout, cfg.capacity), cfg)
    return state, SimParams.from_record(meta)


def test_pallas_step_sparse_occupancy_skip():
    """A sparse scene in a cap-16 grid exercises BOTH runtime skips (the
    occupancy residue predicate with omax << cap, and whole-dead-block
    passthrough) — the physics must still match the jnp path exactly as in
    the dense tests."""
    cfg = GridConfig(4, 4, 16)
    state, p = _sparse_scene(cfg)
    ty = np.asarray(state.ty)
    # preconditions: sparse occupancy and some entirely-dead bucket rows
    occ = (ty >= 0) * (np.arange(cfg.cap) + 1)
    assert occ.max() <= 8, "scene not sparse enough to exercise the skip"
    assert (ty.max(axis=(1, 2)) < 0).any(), "no dead rows to exercise block skip"

    ref = jax.tree.map(np.asarray, bucket_step(state, p))
    got = jax.tree.map(np.asarray, bucket_step_pallas(state, p, interpret=True))
    np.testing.assert_array_equal(ref.ty, got.ty)
    np.testing.assert_allclose(ref.x.astype(np.int64), got.x.astype(np.int64), rtol=0, atol=2)
    np.testing.assert_allclose(ref.y.astype(np.int64), got.y.astype(np.int64), rtol=0, atol=2)
    np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(ref.vy, got.vy, rtol=1e-4, atol=1e-3)

    got_dyn = jax.tree.map(
        np.asarray, bucket_step_pallas(state, p, interpret=True, dynamic_passes=True)
    )
    np.testing.assert_allclose(ref.vx, got_dyn.vx, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(ref.vy, got_dyn.vy, rtol=1e-4, atol=1e-3)


def test_pallas_step_non_contiguous_slots():
    """The occupancy bound is the max live SLOT INDEX + 1, not the live count:
    scatter a bucket's particles to high slots (legal states only arise packed,
    but the kernel must not silently mis-integrate a hand-built one) and check
    the skip predicate stays conservative."""
    cfg = GridConfig(4, 4, 16)
    state, p = _sparse_scene(cfg, seed=9)
    perm = np.random.default_rng(3).permutation(cfg.cap)
    state = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)[:, :, perm]), state)
    occ_count = int((np.asarray(state.ty) >= 0).sum(axis=2).max())
    top_slot = int(((np.asarray(state.ty) >= 0) * (np.arange(cfg.cap) + 1)).max())
    assert top_slot > occ_count, "permutation failed to break slot contiguity"

    ref = jax.tree.map(np.asarray, bucket_step(state, p))
    got = jax.tree.map(np.asarray, bucket_step_pallas(state, p, interpret=True))
    np.testing.assert_array_equal(ref.ty, got.ty)
    np.testing.assert_allclose(ref.x.astype(np.int64), got.x.astype(np.int64), rtol=0, atol=2)
    np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(ref.vy, got.vy, rtol=1e-4, atol=1e-3)


def test_pallas_move_random_scenes_property():
    """Randomized differential test for the rebucket pass: random drifts,
    occupancy, and tombstones — bit-identity against the pull-based oracle."""
    from particle_simulator_tpu.io.frame import PARTICLE_DTYPE, default_metadata
    from particle_simulator_tpu.ops.bucket_pallas import bucket_move_pallas
    from particle_simulator_tpu.physics.bucket import bucket_move, bucketize_numpy

    rng = np.random.default_rng(7)
    for trial in range(3):
        cfg = GridConfig(4, 4, 8)
        n = int(rng.integers(100, 800))
        parts = np.zeros(n, dtype=PARTICLE_DTYPE)
        parts["x"] = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        parts["y"] = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        parts["vx"] = rng.normal(0, 100, n)
        parts["ty"] = rng.integers(0, 3, n)
        layout = bucketize_numpy(parts, cfg)
        state = state_to_grid(state_from_numpy(layout, cfg.capacity), cfg)
        # perturb positions so some particles are mis-bucketed by +-1 bucket
        # (the post-drift state a move pass exists to fix) and some further
        # (must be dropped)
        drift = rng.integers(-(2**27), 2**27, state.x.shape, dtype=np.int64)
        x2 = (np.asarray(state.x).astype(np.int64) + drift) % 2**32
        state = state._replace(x=jnp.asarray(x2.astype(np.uint32)))

        a = jax.tree.map(np.asarray, jax.jit(bucket_move)(state))
        b = jax.tree.map(np.asarray, bucket_move_pallas(state, interpret=True))
        for name, u, v in zip(a._fields, a, b):
            np.testing.assert_array_equal(u, v, err_msg=f"trial {trial} field {name}")


def test_step_kernel_edge_rows_production_shard_shape():
    """VERDICT r1 item 7: at a realistic shard size (64 rows x 4096 lanes) the
    kernel must pick a real block (8 rows), not fall back to the whole array —
    and the external-edge-row mode (the sharded path's y-halo) must be
    bit-identical to the same rows computed inside a larger single-chip grid."""
    from particle_simulator_tpu.ops.bucket_pallas import (
        _pick_ty_rows,
        bucket_step_pallas,
    )

    # block sizing: the halo-padded (ly+2) shape was the round-1 VMEM trap
    assert _pick_ty_rows(64, 4096) == 8
    assert _pick_ty_rows(66, 4096) == 66  # the old whole-array fallback
    assert _pick_ty_rows(128, 2048) == 16

    # equality check at a multi-block slab (64 rows, 16-row blocks); the
    # 4096-lane block sizing itself is asserted above without paying the
    # interpret-mode cost of a 4096-lane kernel run
    cfg = GridConfig(6, 6, 8)  # 64 rows x 64 buckets, cap 8 -> 512 lanes
    from particle_simulator_tpu.engine.state import ParticleState
    from particle_simulator_tpu.io.frame import PARTICLE_DTYPE

    rng = np.random.default_rng(3)
    n = 2000
    parts = np.zeros(n, dtype=PARTICLE_DTYPE)
    parts["x"] = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    parts["y"] = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    parts["vx"] = rng.normal(0, 50, n).astype(np.float32)
    parts["vy"] = rng.normal(0, 50, n).astype(np.float32)
    parts["ty"] = 0
    layout = bucketize_numpy(parts, cfg)
    state = state_to_grid(state_from_numpy(layout, cfg.capacity), cfg)
    params = SimParams.from_record(Frame.new().metadata.copy())

    full = jax.tree.map(np.asarray, bucket_step_pallas(state, params, interpret=True))

    # a 32-row slab (16-row blocks x2) of the same grid, real edge rows.
    # The slab is block-ALIGNED (both runs use 16-row blocks): the symmetric
    # pair enumeration groups f32 sums per block, so only aligned slabs are
    # bit-identical; unaligned shards agree within the usual ulp envelopes
    lo, hi = 16, 48
    slab = ParticleState(*(a[lo:hi] for a in state))
    top = ParticleState(*(a[lo - 1 : lo] for a in state))
    bottom = ParticleState(*(a[hi : hi + 1] for a in state))
    got = jax.tree.map(
        np.asarray,
        bucket_step_pallas(slab, params, interpret=True, edge_rows=(top, bottom)),
    )
    for name, a, b in zip(full._fields, full, got):
        np.testing.assert_array_equal(a[lo:hi], b, err_msg=f"field {name}")


@pytest.mark.parametrize("cfg", [GridConfig(4, 4, 16), GridConfig(3, 3, 8)])
def test_pallas_step_dynamic_passes_matches_jnp(cfg):
    """The compact dynamic-roll program (opt-in; targets cap >= 16 grids,
    where the fully-unrolled pass pipeline costs ~10x the Mosaic compile
    time) computes the identical step."""
    state, p = scene(cfg, nx=16, ny=16)
    ref = jax.tree.map(np.asarray, bucket_step(state, p))
    got = jax.tree.map(
        np.asarray, bucket_step_pallas(state, p, interpret=True, dynamic_passes=True)
    )
    np.testing.assert_array_equal(ref.ty, got.ty)
    np.testing.assert_allclose(ref.x.astype(np.int64), got.x.astype(np.int64), rtol=0, atol=2)
    np.testing.assert_allclose(ref.y.astype(np.int64), got.y.astype(np.int64), rtol=0, atol=2)
    np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(ref.vy, got.vy, rtol=1e-4, atol=1e-3)


def test_pallas_step_dynamic_passes_with_tombstones_and_cursor():
    state, p = scene(GridConfig(4, 4, 16), nx=8, ny=8)
    p = p._replace(cursor_x=np.float32(0.5), cursor_y=np.float32(0.5), cursor_size=np.float32(0.3))
    ref = jax.tree.map(np.asarray, bucket_step(state, p))
    got = jax.tree.map(
        np.asarray, bucket_step_pallas(state, p, interpret=True, dynamic_passes=True)
    )
    np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-4, atol=1e-3)
    dead = np.asarray(state.ty) < 0
    np.testing.assert_array_equal(got.x[dead], np.asarray(state.x)[dead])


def test_bucket_pallas_calls_set_vmem_limit():
    """Every pallas_call in the bucket kernels must raise the scoped-VMEM
    limit explicitly: their (8, L) pipeline blocks pass ~22 MB at L = 16384
    (1024x1024x16 user grids, 1024x2048x8 16M grids), over Mosaic's 16 MB
    default. A call without compiler_params compiles fine on every CI shape
    and then VMEM-OOMs the daemon the first time a 1M interactive scene lands
    on a cap-16 grid — exactly how the omission in bucket_move_pallas shipped."""
    import re

    import particle_simulator_tpu.ops.bucket_pallas as mod

    src = open(mod.__file__).read()
    calls = [m.start() for m in re.finditer(r"pl\.pallas_call\(", src)]
    assert calls, "expected pallas_call sites in bucket_pallas"
    for pos in calls:
        # the closing `)(` of pallas_call bounds this call's kwargs
        body = src[pos : src.index(")(", pos)]
        line = src[: pos].count("\n") + 1
        assert "vmem_limit_bytes" in body, (
            f"pallas_call at bucket_pallas.py:{line} does not set "
            "compiler_params=CompilerParams(vmem_limit_bytes=...)"
        )


def test_pallas_step_lane_chunks_bit_identical():
    """The lane-chunked step kernel (chunk = second grid dim + pre-extended
    inputs, ops/bucket_pallas.py ``lane_chunks``) must be BIT-identical to
    the unchunked kernel: per-receiver pass order is unchanged, chunking only
    gates which tiles compute. Covers quarter-box sparsity (dead column
    chunks), full-random occupancy, cap 16, the 16-row block path, and the
    dynamic-pass variant."""
    from particle_simulator_tpu.io.frame import PARTICLE_DTYPE, default_metadata

    meta = default_metadata()
    meta["step_dt"] = 10e-15
    p = SimParams.from_record(meta)

    def rand_state(cfg, seed, quarter):
        rng = np.random.default_rng(seed)
        n = cfg.capacity
        parts = np.zeros(n, dtype=PARTICLE_DTYPE)
        parts["x"] = rng.integers(0, 2**32, n, dtype=np.uint32)
        parts["y"] = rng.integers(0, 2**32, n, dtype=np.uint32)
        parts["vx"] = rng.normal(0, 50, n).astype(np.float32)
        parts["vy"] = rng.normal(0, 50, n).astype(np.float32)
        parts["ty"] = np.where(rng.random(n) < 0.5, 0, -1)
        if quarter:  # live region spans only the upper-left quarter
            g = parts["ty"].reshape(cfg.by, cfg.bx, cfg.cap)
            g[:, cfg.bx // 2 :, :] = -1
            g[cfg.by // 2 :, :, :] = -1
        return state_to_grid(state_from_numpy(parts, cfg.capacity), cfg)

    cases = [
        (GridConfig(5, 4, 8), 2, True),   # L=256 quarter-box
        (GridConfig(5, 4, 8), 2, False),  # box-spanning random
        (GridConfig(6, 4, 16), 4, True),  # cap 16
        (GridConfig(6, 5, 8), 4, False),  # by=32: 16-row block path
    ]
    for cfg, chunks, quarter in cases:
        st = rand_state(cfg, 1, quarter)
        ref = jax.tree.map(np.asarray, bucket_step_pallas(st, p, interpret=True))
        got = jax.tree.map(
            np.asarray,
            bucket_step_pallas(st, p, interpret=True, lane_chunks=chunks),
        )
        for f in st._fields:
            np.testing.assert_array_equal(
                getattr(ref, f), getattr(got, f),
                err_msg=f"{cfg} chunks={chunks} quarter={quarter} field={f}",
            )
        refd = jax.tree.map(
            np.asarray,
            bucket_step_pallas(st, p, interpret=True, dynamic_passes=True),
        )
        gotd = jax.tree.map(
            np.asarray,
            bucket_step_pallas(
                st, p, interpret=True, dynamic_passes=True, lane_chunks=chunks
            ),
        )
        for f in st._fields:
            np.testing.assert_array_equal(
                getattr(refd, f), getattr(gotd, f),
                err_msg=f"dynamic {cfg} chunks={chunks} field={f}",
            )


def test_pallas_frame_runner_lane_chunks_bit_identical():
    """Whole-frame runner (steps + rebucket cadence) with lane chunking ==
    without, across a multi-chunk schedule."""
    cfg = GridConfig(5, 4, 8, move_every=4)
    state, p = scene(cfg, nx=14, ny=14)
    p = p._replace(steps_per_frame=np.int32(10))
    ref = jax.tree.map(np.asarray, run_frame_bucket_pallas(state, p, move_every=4, interpret=True))
    got = jax.tree.map(
        np.asarray,
        run_frame_bucket_pallas(state, p, move_every=4, interpret=True, lane_chunks=2),
    )
    for f in state._fields:
        np.testing.assert_array_equal(getattr(ref, f), getattr(got, f), err_msg=f)


def test_pallas_ext_layout_roundtrip_and_refresh():
    """ext_state_chunks/unext_state_chunks roundtrip, and refresh_ext_pads
    restores scrambled chunk-boundary x/y pads to exactly what a from-scratch
    re-ext builds (the per-step invariant the persistent layout rides on)."""
    from particle_simulator_tpu.ops.bucket_pallas import (
        ext_state_chunks,
        refresh_ext_pads,
        unext_state_chunks,
    )

    cfg = GridConfig(5, 4, 8)
    state, _ = scene(cfg, nx=12, ny=12)
    C = 2
    e = ext_state_chunks(state, C)
    back = unext_state_chunks(e, C)
    for f in state._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(state, f)), np.asarray(getattr(back, f)), err_msg=f
        )

    # scramble every pad lane of x/y, then refresh: interior-boundary pads
    # must match the fresh ext bit-for-bit (grid-end pads hold dead lanes the
    # kernel passes through, so refresh leaves them alone by design)
    by, bxe, cap = e.x.shape
    Le = bxe * cap
    We = Le // C
    pad = max(128, 2 * cap)
    x2 = np.asarray(e.x).reshape(by, Le).copy()
    y2 = np.asarray(e.y).reshape(by, Le).copy()
    mask = np.zeros(Le, bool)
    for c in range(C):
        mask[c * We : c * We + pad] = True
        mask[(c + 1) * We - pad : (c + 1) * We] = True
    x2[:, mask] = 0xDEADBEEF
    y2[:, mask] = 0xDEADBEEF
    scrambled = e._replace(
        x=jnp.asarray(x2.reshape(e.x.shape)), y=jnp.asarray(y2.reshape(e.x.shape))
    )
    fixed = refresh_ext_pads(scrambled, C)
    inner = mask.copy()
    inner[:pad] = False          # chunk 0's left pad = true grid end
    inner[-pad:] = False         # last chunk's right pad = true grid end
    for f in ("x", "y"):
        got = np.asarray(getattr(fixed, f)).reshape(by, Le)
        want = np.asarray(getattr(e, f)).reshape(by, Le)
        np.testing.assert_array_equal(got[:, inner], want[:, inner], err_msg=f)
        np.testing.assert_array_equal(got[:, ~mask], want[:, ~mask], err_msg=f)


def test_ext_step_aux_tile_order_compacts_live_tiles():
    """ExtStepAux.order must list live tiles first (ascending), repeat the
    last live tile through the dead tail (so the pipeline skips their DMA),
    and fall back to one real visit of tile 0 when everything is dead."""
    from particle_simulator_tpu.engine.state import empty_state
    from particle_simulator_tpu.io.frame import default_metadata
    from particle_simulator_tpu.ops.bucket_pallas import ext_state_chunks, ext_step_aux

    p = SimParams.from_record(default_metadata())
    cfg = GridConfig(5, 4, 8)
    C = 2

    state, _ = scene(cfg, nx=10, ny=10)
    e = ext_state_chunks(state, C)
    aux = ext_step_aux(e, p, C, 8)
    flags = np.asarray(aux.flags)
    order = np.asarray(aux.order)
    n_real = int(np.asarray(aux.sizes)[0])
    live_ids = np.nonzero(flags)[0]
    assert n_real == len(live_ids) > 0
    np.testing.assert_array_equal(order[:n_real], live_ids)
    np.testing.assert_array_equal(order[n_real:], live_ids[-1])

    e0 = ext_state_chunks(empty_state(cfg.grid_shape), C)
    aux0 = ext_step_aux(e0, p, C, 8)
    assert int(np.asarray(aux0.sizes)[0]) == 1
    np.testing.assert_array_equal(np.asarray(aux0.order), 0)


@pytest.mark.parametrize("compact", [False, True])
def test_pallas_ext_step_bit_identical(compact):
    """The persistent pad-extended step (bucket_step_pallas_ext) must be
    BIT-identical to the classic per-step-ext chunked kernel on the chunk
    interiors, including across consecutive steps (which exercises the
    refresh_ext_pads invariant and, with compact=True, the live-tile-first
    schedule + aliased copy-through for never-visited tiles)."""
    from particle_simulator_tpu.engine.state import empty_state
    from particle_simulator_tpu.io.frame import PARTICLE_DTYPE, default_metadata
    from particle_simulator_tpu.ops.bucket_pallas import (
        bucket_step_pallas_ext,
        ext_state_chunks,
        ext_step_aux,
        unext_state_chunks,
    )

    meta = default_metadata()
    meta["step_dt"] = 10e-15
    p = SimParams.from_record(meta)
    cfg = GridConfig(5, 4, 8)
    C = 2

    def rand_state(seed, quarter):
        rng = np.random.default_rng(seed)
        n = cfg.capacity
        parts = np.zeros(n, dtype=PARTICLE_DTYPE)
        parts["x"] = rng.integers(0, 2**32, n, dtype=np.uint32)
        parts["y"] = rng.integers(0, 2**32, n, dtype=np.uint32)
        parts["vx"] = rng.normal(0, 50, n).astype(np.float32)
        parts["vy"] = rng.normal(0, 50, n).astype(np.float32)
        parts["ty"] = np.where(rng.random(n) < 0.5, 0, -1)
        if quarter:
            g = parts["ty"].reshape(cfg.by, cfg.bx, cfg.cap)
            g[:, cfg.bx // 2 :, :] = -1
            g[cfg.by // 2 :, :, :] = -1
        return state_to_grid(state_from_numpy(parts, cfg.capacity), cfg)

    for st in (rand_state(1, True), rand_state(2, False), empty_state(cfg.grid_shape)):
        ref = st
        e = ext_state_chunks(st, C)
        aux = ext_step_aux(e, p, C, 8)
        for k in range(2):
            ref = bucket_step_pallas(
                ref, p, interpret=True, block_rows=8, lane_chunks=C
            )
            e = bucket_step_pallas_ext(
                e, p, aux, lane_chunks=C, block_rows=8, compact=compact,
                interpret=True,
            )
            got = unext_state_chunks(e, C)
            for f in st._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(ref, f)), np.asarray(getattr(got, f)),
                    err_msg=f"step {k} field {f} compact={compact}",
                )


@pytest.mark.parametrize("compact", [False, True])
def test_pallas_frame_runner_ext_io_bit_identical(compact):
    """Whole-frame runner on the persistent pad-extended layout (ext_io,
    the lane_chunks>1 default) == the classic per-step-ext runner, across a
    multi-chunk schedule with rebucket passes between step runs."""
    cfg = GridConfig(5, 4, 8, move_every=4)
    state, p = scene(cfg, nx=14, ny=14)
    p = p._replace(steps_per_frame=np.int32(10))
    ref = jax.tree.map(
        np.asarray,
        run_frame_bucket_pallas(
            state, p, move_every=4, interpret=True, lane_chunks=2, ext_io=False
        ),
    )
    got = jax.tree.map(
        np.asarray,
        run_frame_bucket_pallas(
            state, p, move_every=4, interpret=True, lane_chunks=2, ext_io=True,
            compact_tiles=compact,
        ),
    )
    for f in state._fields:
        np.testing.assert_array_equal(getattr(ref, f), getattr(got, f), err_msg=f)


def test_pallas_step_lane_chunks_rejects_bad_split():
    state, p = scene(GridConfig(5, 4, 8), nx=8, ny=8)
    with pytest.raises(ValueError):
        bucket_step_pallas(state, p, interpret=True, lane_chunks=3)


def test_simulator_picks_lane_chunks_from_occupancy():
    """The engine chooses lane chunking for spatially sparse wide grids and
    leaves box-spanning or narrow grids unchunked."""
    from particle_simulator_tpu.engine.simulator import _lane_chunks_for

    wide = GridConfig(10, 10, 16)  # L = 16384 (the 1M editor-drawn grid)
    occ = np.zeros((wide.by, wide.bx), np.int64)
    occ[: wide.by // 2, : wide.bx // 2] = 6  # quarter-box lattice
    assert _lane_chunks_for(occ, wide) == 8

    occ_full = np.full((wide.by, wide.bx), 6, np.int64)  # box-spanning
    assert _lane_chunks_for(occ_full, wide) == 1

    narrow = GridConfig(6, 6, 8)  # L = 512: never worth chunking
    occ_n = np.zeros((narrow.by, narrow.bx), np.int64)
    occ_n[:8, :8] = 4
    assert _lane_chunks_for(occ_n, narrow) == 1


def test_pallas_move_dead_block_skip_bit_identical():
    """The move pass's dead-neighborhood skip (_place_kernel flags): a scene
    confined to a few bucket rows leaves whole output blocks with no live
    source in their 3-row neighborhood — those blocks must produce the exact
    all-tombstone layout the pull oracle produces, and live blocks must be
    untouched by the gating. by=32 so ty_rows=8 yields multiple fully-dead
    blocks, plus a block adjacent to live rows (flag via neighbor row only)."""
    from particle_simulator_tpu.io.frame import PARTICLE_DTYPE
    from particle_simulator_tpu.ops.bucket_pallas import bucket_move_pallas
    from particle_simulator_tpu.physics.bucket import bucket_move, bucketize_numpy

    rng = np.random.default_rng(11)
    cfg = GridConfig(4, 5, 8)  # 16x32 buckets
    n = 400
    parts = np.zeros(n, dtype=PARTICLE_DTYPE)
    # confine to the top ~3 bucket rows and left half of the box
    parts["x"] = rng.integers(0, 2**31, n, dtype=np.uint64).astype(np.uint32)
    parts["y"] = rng.integers(0, 2**32 // 10, n, dtype=np.uint64).astype(np.uint32)
    parts["vx"] = rng.normal(0, 100, n)
    parts["ty"] = rng.integers(0, 2, n)
    layout = bucketize_numpy(parts, cfg)
    state = state_to_grid(state_from_numpy(layout, cfg.capacity), cfg)
    drift = rng.integers(-(2**27), 2**27, state.x.shape, dtype=np.int64)
    y2 = (np.asarray(state.y).astype(np.int64) + drift) % 2**32
    state = state._replace(y=jnp.asarray(y2.astype(np.uint32)))

    live_rows = np.unique(np.nonzero((np.asarray(state.ty) >= 0).any(axis=(1, 2)))[0])
    assert live_rows.max() < 8, "scene must leave lower blocks fully dead"

    a = jax.tree.map(np.asarray, jax.jit(bucket_move)(state))
    b = jax.tree.map(np.asarray, bucket_move_pallas(state, interpret=True))
    for name, u, v in zip(a._fields, a, b):
        np.testing.assert_array_equal(u, v, err_msg=f"field {name}")


def test_move_dest_pallas_bit_identical():
    """The Pallas dest pass (_dest_kernel: VMEM packed prefix sums + the
    (dy, dx)-ordered block-prefix scan) must reproduce move_dest_direct's
    packed destid EXACTLY — including overflow drops (rank >= cap),
    >1-bucket drifters, tombstones, and grid-edge cells (its shift_pad
    zero-fill semantics). Random scenes with heavy inter-bucket drift over
    three grid geometries, crossing row-block boundaries (by > ty_rows)."""
    from particle_simulator_tpu.engine.state import ParticleState
    from particle_simulator_tpu.ops.bucket_pallas import move_dest_pallas
    from particle_simulator_tpu.physics.bucket import move_dest_direct

    rng = np.random.default_rng(0)
    for by, bx, cap in [(16, 8, 4), (32, 16, 8), (8, 32, 16)]:
        n = by * bx * cap
        bxb, byb = int(np.log2(bx)), int(np.log2(by))
        iy, ix, _ = np.meshgrid(
            np.arange(by), np.arange(bx), np.arange(cap), indexing="ij"
        )
        jx = rng.integers(-(1 << (32 - bxb)), 1 << (32 - bxb), n).astype(np.int64)
        jy = rng.integers(-(1 << (32 - byb)), 1 << (32 - byb), n).astype(np.int64)
        x = ((ix.ravel().astype(np.int64) << (32 - bxb))
             + (1 << (31 - bxb)) + jx * 2) % (1 << 32)
        y = ((iy.ravel().astype(np.int64) << (32 - byb))
             + (1 << (31 - byb)) + jy * 2) % (1 << 32)
        ty = np.where(rng.random(n) < 0.6, rng.integers(0, 2, n), -1).astype(np.int32)
        st = ParticleState(
            x=jnp.asarray(x.astype(np.uint32)).reshape(by, bx, cap),
            y=jnp.asarray(y.astype(np.uint32)).reshape(by, bx, cap),
            vx=jnp.zeros((by, bx, cap), jnp.float32),
            vy=jnp.zeros((by, bx, cap), jnp.float32),
            ty=jnp.asarray(ty).reshape(by, bx, cap),
        )
        dest, keep = move_dest_direct(st)
        ref = np.where(np.asarray(keep), np.asarray(dest), -1)
        ref = ref.astype(np.int32).reshape(by, bx * cap)
        got = np.asarray(move_dest_pallas(st, interpret=True))
        np.testing.assert_array_equal(ref, got, err_msg=f"{(by, bx, cap)}")


def test_move_dest_pallas_halo_bit_identical():
    """The sharded dest kernel (move_dest_pallas_halo: _dest_kernel in halo
    mode + XLA 3-row slices for the y-halo rows' own ids) must reproduce the
    move_ranks_direct_halo composition EXACTLY over random halo-padded
    shards with nonzero global offsets — including halo-row candidates
    (their targets clamp to the adjacent interior row), off-shard targets
    (dropped), overflow, and x-halo-column lanes."""
    from particle_simulator_tpu.engine.state import ParticleState
    from particle_simulator_tpu.ops.bucket_pallas import move_dest_pallas_halo
    from particle_simulator_tpu.physics.bucket import move_ranks_direct_halo

    rng = np.random.default_rng(1)
    for ly, lx, cap, bxl, byl, roff, coff in [
        (16, 6, 4, 4, 6, 8, 2),
        (32, 14, 8, 5, 6, 0, 16),
        (8, 30, 16, 6, 3, 0, 0),
    ]:
        py, px = ly + 2, lx + 2
        n = py * px * cap
        iy, ix, _ = np.meshgrid(
            np.arange(py), np.arange(px), np.arange(cap), indexing="ij"
        )
        gx = (ix.ravel() - 1 + coff) % (1 << bxl)
        gy = (iy.ravel() - 1 + roff) % (1 << byl)
        jx = rng.integers(-(1 << (32 - bxl)), 1 << (32 - bxl), n).astype(np.int64)
        jy = rng.integers(-(1 << (32 - byl)), 1 << (32 - byl), n).astype(np.int64)
        x = ((gx.astype(np.int64) << (32 - bxl))
             + (1 << (31 - bxl)) + jx * 2) % (1 << 32)
        y = ((gy.astype(np.int64) << (32 - byl))
             + (1 << (31 - byl)) + jy * 2) % (1 << 32)
        ty = np.where(rng.random(n) < 0.6, rng.integers(0, 2, n), -1).astype(np.int32)
        st = ParticleState(
            x=jnp.asarray(x.astype(np.uint32)).reshape(py, px, cap),
            y=jnp.asarray(y.astype(np.uint32)).reshape(py, px, cap),
            vx=jnp.zeros((py, px, cap), jnp.float32),
            vy=jnp.zeros((py, px, cap), jnp.float32),
            ty=jnp.asarray(ty).reshape(py, px, cap),
        )
        tb, tx, rank, keep = move_ranks_direct_halo(
            st, bxl, byl, jnp.int32(roff), jnp.int32(coff)
        )
        ref = np.where(
            np.asarray(keep), np.asarray((tb * px + tx + 1) * cap + rank), -1
        ).astype(np.int32).reshape(py, px * cap)
        got = np.asarray(move_dest_pallas_halo(
            st, bxl, byl, jnp.int32(roff), jnp.int32(coff), interpret=True
        ))
        np.testing.assert_array_equal(ref, got, err_msg=f"{(ly, lx, cap)}")
