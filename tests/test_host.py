"""Device::CpuMainThread — the single-threaded host kernel path.

The reference runs the SAME kernel functions sequentially on the caller's
thread for CpuMainThread (kernel_bucket.cuh:133-141, kernel_compact.cuh:
66-74). physics/host.py re-binds the shared kernel code objects to NumPy and
executes them eagerly — these tests pin (a) numerical agreement with the jit
paths, (b) bit-identity of the integer rebucket pass (4th implementation in
the move differential set), and (c) that the Simulator keeps the state
host-resident and never touches an XLA device on this path.
"""

import numpy as np
import pytest

import jax

from particle_simulator_tpu.engine.state import (
    SimParams,
    state_from_numpy,
    state_to_numpy,
)
from particle_simulator_tpu.io.frame import DataStructure, Device, Frame
from particle_simulator_tpu.io.presets import ParticleLattice
from particle_simulator_tpu.physics import host
from particle_simulator_tpu.physics.bucket import (
    GridConfig,
    bucket_move,
    bucket_step,
    bucketize_numpy,
    run_frame_bucket,
    state_to_grid,
)


def scene_grid(cfg, nx=14, ny=14, vel=(0.0, 30.0), seed=1, df=1.1):
    frame = Frame.new()
    meta = frame.metadata
    lat = ParticleLattice((nx, ny), distance_factor=df, velocity=vel)
    lat.hex_square(frame, (meta.box_width / 2, meta.box_height / 2),
                   rng=np.random.default_rng(seed))
    layout = bucketize_numpy(frame.particles, cfg)
    state = state_to_grid(state_from_numpy(layout, cfg.capacity), cfg)
    return frame, state, SimParams.from_record(meta.copy())


def test_host_move_bit_identical():
    """The host move joins the three jit rebucket implementations in the
    bit-identity set (CLAUDE.md invariant), including overflow-drop and
    drift-drop semantics."""
    cfg = GridConfig(4, 4, 8)
    _, state, p = scene_grid(cfg, nx=20, ny=20, vel=(0.0, 400.0), seed=5, df=1.3)
    for _ in range(30):
        state = jax.jit(bucket_step)(state, p)

    a = jax.tree.map(np.asarray, jax.jit(bucket_move)(state))
    b = host.host_bucket_move(host.to_host_state(state))
    for name, u, v in zip(a._fields, a, b):
        assert isinstance(v, np.ndarray)
        np.testing.assert_array_equal(u, np.asarray(v), err_msg=f"field {name}")


def test_host_bucket_frame_matches_jit():
    """Full-frame host run (step + cadenced move) vs the jit bucket runner,
    within the same reduction-order envelope the sharded tests use."""
    cfg = GridConfig(4, 4, 8, move_every=4)
    _, state, p = scene_grid(cfg)
    p = p._replace(steps_per_frame=np.int32(10))

    ref = jax.tree.map(
        np.asarray, jax.jit(lambda s, q: run_frame_bucket(s, q, move_every=cfg.move_every))(state, p)
    )
    got = host.host_run_frame_bucket(
        host.to_host_state(state), p, move_every=cfg.move_every
    )

    np.testing.assert_array_equal(ref.ty, got.ty)
    np.testing.assert_allclose(ref.x.astype(np.int64), got.x.astype(np.int64), rtol=0, atol=8)
    np.testing.assert_allclose(ref.y.astype(np.int64), got.y.astype(np.int64), rtol=0, atol=8)
    np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(ref.vy, got.vy, rtol=1e-3, atol=0.05)


def test_host_compact_step_matches_jit():
    from particle_simulator_tpu.physics.step import allpairs_step

    cfg = GridConfig(4, 4, 8)
    frame, _, p = scene_grid(cfg)
    parts = frame.particles
    flat = state_from_numpy(parts, 256)

    ref = jax.tree.map(np.asarray, jax.jit(allpairs_step)(flat, p))
    got = host.host_run_frame_compact(
        host.to_host_state(flat), p._replace(steps_per_frame=np.int32(1))
    )
    np.testing.assert_array_equal(ref.ty, got.ty)
    np.testing.assert_allclose(ref.x.astype(np.int64), got.x.astype(np.int64), rtol=0, atol=4)
    np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(ref.vy, got.vy, rtol=1e-3, atol=5e-3)


@pytest.mark.parametrize("ds", [DataStructure.MATRIX_BUCKETS, DataStructure.COMPACT_ARRAY])
def test_simulator_main_thread_is_host_resident(ds):
    """CpuMainThread through the engine: the state must stay plain NumPy
    (never an XLA buffer) and frames must flow; a live device switch to the
    thread pool re-layouts onto the XLA CPU backend and back."""
    from particle_simulator_tpu.engine.simulator import Simulator

    sim = Simulator()
    frame = Frame.new()
    meta = frame.metadata
    meta.data_structure = ds
    meta.device = Device.CPU_MAIN_THREAD
    meta.steps_per_frame = 5
    lat = ParticleLattice((8, 8), distance_factor=1.1)
    lat.hex_square(frame, (meta.box_width / 2, meta.box_height / 2),
                   rng=np.random.default_rng(0))
    sim.load_frame(frame)

    assert sim.active_device == Device.CPU_MAIN_THREAD
    assert all(isinstance(a, np.ndarray) for a in sim.state)

    sim.frame_async()  # synchronous on this thread by design
    assert all(isinstance(a, np.ndarray) for a in sim.state)
    out = sim.read_frame()
    assert out.particle_count == 64
    assert np.isfinite(out.particles["vx"]).all()
    assert out.metadata.device == Device.CPU_MAIN_THREAD

    # live switch to the pool: state moves onto the XLA CPU backend
    relayout = Frame.from_metadata(sim.meta_record.copy())
    relayout.metadata.device = Device.CPU_THREAD_POOL
    sim.update_metadata(relayout)
    assert sim.active_device == Device.CPU_THREAD_POOL
    assert any(isinstance(a, jax.Array) for a in sim.state)
    sim.frame_async()
    assert sim.read_frame().particle_count == 64

    # and back to the main thread
    back = Frame.from_metadata(sim.meta_record.copy())
    back.metadata.device = Device.CPU_MAIN_THREAD
    sim.update_metadata(back)
    assert sim.active_device == Device.CPU_MAIN_THREAD
    assert all(isinstance(a, np.ndarray) for a in sim.state)
    sim.frame_async()
    assert sim.read_frame().particle_count == 64


def test_host_trajectory_matches_oracle_compact():
    """The host compact path vs the NumPy oracle (the reference-transliterated
    ground truth): same math, same order — exact agreement is expected for a
    few steps (both are straight NumPy f32)."""
    from particle_simulator_tpu.physics import oracle

    cfg = GridConfig(4, 4, 8)
    frame, _, p = scene_grid(cfg, nx=6, ny=6)
    meta = frame.metadata.copy()
    parts = frame.particles.copy()

    ref = oracle.oracle_run(parts.copy(), meta, steps=3)

    flat = state_from_numpy(parts, len(parts))
    got_state = host.host_run_frame_compact(
        host.to_host_state(flat), p._replace(steps_per_frame=np.int32(3))
    )
    got = state_to_numpy(got_state)

    np.testing.assert_allclose(
        got["x"].astype(np.int64), ref["x"].astype(np.int64), rtol=0, atol=4
    )
    np.testing.assert_allclose(got["vx"], ref["vx"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got["vy"], ref["vy"], rtol=1e-4, atol=1e-4)
