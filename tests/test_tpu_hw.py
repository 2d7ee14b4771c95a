"""Real-hardware numerics validation (skipped in CPU CI).

The CPU suite exercises the Pallas kernels in INTERPRET mode only; a Mosaic
miscompile on real hardware would slip through (bench.py asserts finiteness,
not values). This module compares the actually-compiled TPU kernels against
the jnp reference path on the same scene, with the same ulp envelopes the
interpret-mode tests use.

Run manually on a TPU host:  python -m pytest tests/test_tpu_hw.py -q
(make test pins JAX_PLATFORMS=cpu, so these always skip in CI.)
"""

import numpy as np
import pytest

import jax

from particle_simulator_tpu.engine.state import SimParams, state_from_numpy
from particle_simulator_tpu.io.frame import Frame
from particle_simulator_tpu.io.presets import ParticleLattice
from particle_simulator_tpu.physics.bucket import (
    GridConfig,
    bucket_step,
    bucketize_numpy,
    run_frame_bucket,
    state_to_grid,
)

tpu = None
try:  # pragma: no cover - environment probe
    devs = jax.devices()
    if devs and devs[0].platform == "tpu":
        tpu = devs[0]
except RuntimeError:
    pass

pytestmark = pytest.mark.skipif(tpu is None, reason="no real TPU device")


def scene(cfg, nx=20, ny=20, vel=(0.0, 30.0), seed=1):
    frame = Frame.new()
    meta = frame.metadata
    lat = ParticleLattice((nx, ny), distance_factor=1.1, velocity=vel)
    lat.hex_square(frame, (meta.box_width / 2, meta.box_height / 2),
                   rng=np.random.default_rng(seed))
    layout = bucketize_numpy(frame.particles, cfg)
    state = state_to_grid(state_from_numpy(layout, cfg.capacity), cfg)
    return state, SimParams.from_record(meta.copy())


@pytest.mark.parametrize("cfg", [GridConfig(4, 4, 8), GridConfig(4, 4, 16)])
def test_compiled_step_matches_jnp_on_hardware(cfg):
    from particle_simulator_tpu.ops.bucket_pallas import bucket_step_pallas

    state, p = scene(cfg)
    cpu = jax.devices("cpu")[0]
    ref = jax.tree.map(
        np.asarray, jax.jit(bucket_step, device=cpu)(jax.device_put(state, cpu), p)
    )
    got = jax.tree.map(
        np.asarray, bucket_step_pallas(jax.device_put(state, tpu), p)
    )
    np.testing.assert_array_equal(ref.ty, got.ty)
    np.testing.assert_allclose(ref.x.astype(np.int64), got.x.astype(np.int64), rtol=0, atol=4)
    np.testing.assert_allclose(ref.y.astype(np.int64), got.y.astype(np.int64), rtol=0, atol=4)
    np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(ref.vy, got.vy, rtol=1e-3, atol=5e-3)


def test_compiled_move_bit_identical_on_hardware():
    from particle_simulator_tpu.ops.bucket_pallas import bucket_move_pallas
    from particle_simulator_tpu.physics.bucket import bucket_move

    cfg = GridConfig(4, 4, 8)
    state, p = scene(cfg, vel=(0.0, 400.0), seed=5)
    for _ in range(20):
        state = jax.jit(bucket_step)(state, p)
    a = jax.tree.map(np.asarray, jax.jit(bucket_move)(state))
    b = jax.tree.map(np.asarray, bucket_move_pallas(jax.device_put(state, tpu)))
    for name, u, v in zip(a._fields, a, b):
        np.testing.assert_array_equal(u, v, err_msg=f"field {name}")


def test_compiled_frame_runner_envelope_on_hardware():
    from particle_simulator_tpu.ops.bucket_pallas import run_frame_bucket_pallas

    cfg = GridConfig(4, 4, 8, move_every=4)
    state, p = scene(cfg, nx=14, ny=14)
    p = p._replace(steps_per_frame=np.int32(10))
    cpu = jax.devices("cpu")[0]
    ref = jax.tree.map(
        np.asarray,
        jax.jit(lambda s, q: run_frame_bucket(s, q, move_every=cfg.move_every),
                device=cpu)(jax.device_put(state, cpu), p),
    )
    got = jax.tree.map(
        np.asarray,
        jax.jit(lambda s, q: run_frame_bucket_pallas(s, q, move_every=cfg.move_every))(
            jax.device_put(state, tpu), p
        ),
    )
    np.testing.assert_array_equal(ref.ty, got.ty)
    # 10 steps of the stiff r^-14 force compound hardware-FMA/rounding
    # differences; observed max ~207 fixed-point units (5e-8 of the box)
    np.testing.assert_allclose(ref.x.astype(np.int64), got.x.astype(np.int64), rtol=0, atol=1024)
    np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-2, atol=0.5)
