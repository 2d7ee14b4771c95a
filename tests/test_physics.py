"""Physics tests: JAX all-pairs path vs NumPy oracle, leapfrog stability.

The fidelity bar comes from the reference's own claims (doc/project.typ:208-209):
leapfrog stays stable for long horizons where Euler explodes, and the build
target is matching CPU-reference trajectories to f32 tolerance.
"""

import numpy as np
import pytest

import jax

from particle_simulator_tpu.engine.state import SimParams, state_from_numpy, state_to_numpy
from particle_simulator_tpu.io.frame import Frame, default_metadata
from particle_simulator_tpu.io.presets import ParticleLattice
from particle_simulator_tpu.physics import oracle
from particle_simulator_tpu.physics.step import allpairs_step, run_frame_jit


def make_scene(nx=8, ny=8, vel=(0.0, 50.0), seed=0, distance_factor=1.1):
    frame = Frame.new()
    lat = ParticleLattice((nx, ny), distance_factor=distance_factor, velocity=vel)
    meta = frame.metadata
    lat.hex_square(frame, (meta.box_width / 2, meta.box_height / 2), rng=np.random.default_rng(seed))
    return frame


def jax_steps(parts, meta_record, steps):
    state = state_from_numpy(parts, capacity=len(parts))
    p = SimParams.from_record(meta_record)
    step = jax.jit(allpairs_step)
    for _ in range(steps):
        state = step(state, p)
    return state_to_numpy(jax.block_until_ready(state))


def test_single_step_matches_oracle_exactly_or_close():
    frame = make_scene()
    parts = frame.particles.copy()
    meta = frame.metadata.copy()

    got = jax_steps(parts, meta, 1)
    want = oracle.oracle_step(parts, meta)

    # velocities: f32-tolerance; positions: within a few fixed-point ulps
    np.testing.assert_allclose(got["vx"], want["vx"], rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(got["vy"], want["vy"], rtol=2e-5, atol=1e-4)
    dx = np.abs(got["x"].astype(np.int64) - want["x"].astype(np.int64))
    dy = np.abs(got["y"].astype(np.int64) - want["y"].astype(np.int64))
    assert dx.max() <= 2, dx.max()
    assert dy.max() <= 2, dy.max()


def test_trajectory_matches_oracle_100_steps():
    frame = make_scene(nx=6, ny=6, vel=(0.0, 20.0))
    parts = frame.particles.copy()
    meta = frame.metadata.copy()
    meta["step_dt"] = 10e-15  # tighter dt: the stiff r^-14 force amplifies f32 noise

    got = jax_steps(parts, meta, 100)
    want = oracle.oracle_run(parts.copy(), meta, 100)

    box = float(meta["box_width"])
    # trajectory envelope: positions agree within 1e-3 of the equilibrium distance
    r0 = frame.metadata.species(0).force0_r()
    tol_u32 = r0 * 1e-3 / box * 4294967295.0
    dx = np.abs(got["x"].astype(np.int64) - want["x"].astype(np.int64))
    dy = np.abs(got["y"].astype(np.int64) - want["y"].astype(np.int64))
    assert np.median(dx) <= tol_u32, (np.median(dx), tol_u32)
    assert np.median(dy) <= tol_u32, (np.median(dy), tol_u32)


def test_leapfrog_energy_stability_10k_steps():
    # Reference stability claim: leapfrog survives >10 ns at dt=10 fs
    # (doc/project.typ:209). 10k steps at 10 fs = 0.1 ns with bounded energy.
    frame = make_scene(nx=6, ny=6, vel=(0.0, 10.0), distance_factor=1.12)
    parts = frame.particles.copy()
    meta = frame.metadata.copy()
    meta["step_dt"] = 10e-15
    meta["steps_per_frame"] = 100
    meta["cursor_pos"] = (-1.0, -1.0)

    state = state_from_numpy(parts, capacity=len(parts))
    p = SimParams.from_record(meta)

    e0 = oracle.total_energy(parts, meta)
    energies = []
    for _ in range(100):  # 100 frames x 100 steps = 10k steps
        state = run_frame_jit(state, p)
        energies.append(oracle.total_energy(state_to_numpy(state), meta))

    e = np.array(energies)
    assert np.all(np.isfinite(e)), "energy blew up (NaN/inf)"
    # energy scale: |e0| or the kinetic energy floor, whichever larger
    scale = max(abs(e0), 1e-21)
    drift = np.abs(e - e0) / scale
    assert drift.max() < 0.05, f"energy drift {drift.max():.3%} exceeds 5%"

    # particles stayed inside the box (no wall tunneling / explosion)
    parts_end = state_to_numpy(state)
    assert np.all(parts_end["vx"] == parts_end["vx"])  # no NaN


def test_cursor_force_pushes_particles_away():
    frame = make_scene(nx=4, ny=4, vel=(0.0, 0.0))
    parts = frame.particles.copy()
    meta = frame.metadata.copy()
    meta["cursor_pos"] = (0.5, 0.5)  # center, where the lattice is
    meta["cursor_size"] = 0.5

    before = parts["x"].astype(np.float64) / 4294967295.0
    got = jax_steps(parts, meta, 50)
    after = got["x"].astype(np.float64) / 4294967295.0
    # mean distance from cursor center should grow
    d_before = np.abs(before - 0.5).mean()
    d_after = np.abs(after - 0.5).mean()
    assert d_after > d_before


def test_tombstones_are_inert():
    frame = make_scene(nx=4, ny=4, vel=(0.0, 30.0))
    parts = frame.particles.copy()
    meta = frame.metadata.copy()

    # same scene padded with tombstones must give identical live trajectories
    got_exact = jax_steps(parts, meta, 10)
    state = state_from_numpy(parts, capacity=len(parts) + 37)
    p = SimParams.from_record(meta)
    step = jax.jit(allpairs_step)
    for _ in range(10):
        state = step(state, p)
    got_padded = state_to_numpy(state)[: len(parts)]

    # tombstone lanes contribute exactly 0.0 force, but padding changes the
    # f32 reduction tree XLA picks, so live lanes can differ by a rounding ulp
    # (amplified to ~1 fixed-point unit over 10 steps) — anything beyond a few
    # ulps would mean tombstones actually exerted force.
    np.testing.assert_allclose(
        got_exact["x"].astype(np.int64), got_padded["x"].astype(np.int64), rtol=0, atol=4
    )
    np.testing.assert_allclose(got_exact["vx"], got_padded["vx"], rtol=1e-4, atol=1e-3)
    # tombstones unchanged
    tail = state_to_numpy(state)[len(parts):]
    assert np.all(tail["ty"] == -1)
    assert np.all(tail["x"] == 0)


def test_metadata_change_does_not_recompile():
    frame = make_scene(nx=4, ny=4)
    parts = frame.particles.copy()
    state = state_from_numpy(parts, capacity=len(parts))
    meta = frame.metadata.copy()
    p1 = SimParams.from_record(meta)
    meta2 = meta.copy()
    meta2["step_dt"] = 1e-15
    meta2["steps_per_frame"] = 7
    meta2["cursor_pos"] = (0.3, 0.3)
    p2 = SimParams.from_record(meta2)

    with jax.log_compiles():
        s1 = run_frame_jit(state, p1)
        n_before = run_frame_jit._cache_size()
        s2 = run_frame_jit(s1, p2)
        assert run_frame_jit._cache_size() == n_before, "metadata change recompiled!"


def test_precision_report():
    """The fixed-point-vs-float analysis (reference kernel.cuh:153-197):
    u32 fixed point must encode the equilibrium distance far more accurately
    than f32 absolute positions near the far wall, and u64/f64 must be
    essentially exact."""
    from particle_simulator_tpu.utils.precision import precision_report

    rep = precision_report()["reps"]
    assert rep["f64"]["r_rel_err"] < 1e-12
    assert rep["u64_fixed"]["r_rel_err"] < 1e-9
    assert rep["u32_fixed"]["r_rel_err"] < 1e-2
    # f32 absolute encoding at 90% of the box: resolution ~4nm vs r0 ~0.4nm
    assert rep["f32"]["r_rel_err"] > rep["u32_fixed"]["r_rel_err"]


def test_log_domain_force_matches_direct_form():
    """mie_log_coeffs' exp(A - B*lu) factorization == the direct
    C*eps*(m*sr^m - n*sr^n)/r^2 form within f32 rounding, over the whole
    physically reachable range (0.2 sigma overlap out to 16 sigma far field)
    and for non-default exponents (they are live-editable metadata)."""
    import jax.numpy as jnp

    from particle_simulator_tpu.engine.state import SimParams
    from particle_simulator_tpu.io.frame import Frame
    from particle_simulator_tpu.physics.mie import mie_force, mie_log_coeffs

    meta = Frame.new().metadata.copy()
    # n is the larger (repulsive) exponent in this layout (defaults 12/6);
    # the last pair is INVERTED garbage (m > n -> C*eps < 0): both forms
    # must agree AND stay finite (the sign factoring exists for this)
    for n_exp, m_exp in ((12.0, 6.0), (9.0, 4.0), (6.0, 12.0)):
        meta["particles"][0]["n"] = n_exp
        meta["particles"][0]["m"] = m_exp
        p = SimParams.from_record(meta)
        sigma = float(p.sigma)
        r = jnp.asarray(np.geomspace(0.2 * sigma, 16.0 * sigma, 4096), jnp.float32)

        direct = np.asarray(mie_force(r, p) / r, dtype=np.float64)
        A1, B1, A2, B2, inv_s2, s1, s2 = mie_log_coeffs(p)
        lu = jnp.log(r * r * inv_s2)
        got = np.asarray(s1 * jnp.exp(A1 - B1 * lu) - s2 * jnp.exp(A2 - B2 * lu),
                         dtype=np.float64)

        assert np.isfinite(got).all(), (n_exp, m_exp)
        # relative agreement where the force is non-negligible; the
        # equilibrium zero-crossing needs an absolute floor
        scale = np.abs(direct) + np.abs(direct).max() * 1e-6
        err = np.abs(got - direct) / scale
        assert err.max() < 5e-5, (n_exp, m_exp, err.max())


def test_log_domain_force_sigma_zero_gives_zero_not_nan():
    """sigma == 0 is a reachable live-edit slider value. The direct form
    yields ZERO force there (sr = 0, powf(0, m) = 0); the folded log-domain
    constants must yield the same zero — an unclamped s2 = 0 makes
    Ce/s2 = inf and then inf - inf = NaN in the pair loop, permanently
    poisoning every velocity it touches (the r3 advisor finding)."""
    import jax.numpy as jnp

    from particle_simulator_tpu.engine.state import SimParams
    from particle_simulator_tpu.io.frame import Frame
    from particle_simulator_tpu.physics.mie import mie_log_coeffs

    meta = Frame.new().metadata.copy()
    meta["particles"][0]["sigma"] = 0.0
    p = SimParams.from_record(meta)

    A1, B1, A2, B2, inv_s2, s1, s2 = mie_log_coeffs(p)
    # A1/A2 pin to -inf (that's what makes exp underflow to the exact zero);
    # everything else must be finite and nothing may be NaN
    for c in (B1, B2, inv_s2, s1, s2):
        assert np.isfinite(np.asarray(c)).all()
    assert not np.isnan(np.asarray(A1)).any() and not np.isnan(np.asarray(A2)).any()

    # every physically reachable distance (sub-pm overlap to the box scale)
    r = jnp.asarray(np.geomspace(1e-13, 5e-8, 512), jnp.float32)
    lu = jnp.log(r * r * inv_s2)
    got = np.asarray(s1 * jnp.exp(A1 - B1 * lu) - s2 * jnp.exp(A2 - B2 * lu))
    np.testing.assert_array_equal(got, np.zeros_like(got))

    # and through the full jnp pair path: two overlapping live particles
    from particle_simulator_tpu.physics.mie import pair_force_accum

    xi = np.array([2**31, 2**31 + 1000], dtype=np.uint32)
    yi = np.array([2**31, 2**31], dtype=np.uint32)
    tyi = np.array([0, 0], dtype=np.int32)
    self_mask = np.eye(2, dtype=bool)
    fx, fy = pair_force_accum(xi, yi, tyi, xi, yi, tyi, p, self_mask=self_mask)
    assert np.isfinite(np.asarray(fx)).all() and np.isfinite(np.asarray(fy)).all()
    np.testing.assert_array_equal(np.asarray(fx), 0.0)


def test_euler_explodes_where_leapfrog_holds():
    """The OTHER half of the reference report's integrator analysis
    (doc/project.typ:208): explicit Euler explodes within ~100 ps of
    sim-time at dt = 1 fs on a dense lattice, while symplectic leapfrog on
    the SAME scene / dt / horizon keeps bounded energy (the >10 ns claim at
    dt = 10 fs is test_leapfrog_energy_stability_10k_steps and the chip
    soak). Euler injects energy into every oscillation, so the r^-12 core
    pumps the lattice until it blows.

    "Explosion" is asserted the robust way (secular behavior, not a point
    threshold): Euler's energy drift grows monotonically across the whole
    horizon, reaches order unity (energy injection comparable to the
    scene's total energy scale — the lattice is unbound), and exceeds
    leapfrog's drift on the identical scene by >100x, while leapfrog stays
    under 5%."""
    from particle_simulator_tpu.physics.step import (
        allpairs_step,
        allpairs_step_euler,
    )

    def run(step_fn, frames=100, steps_per_frame=1000):
        # 6x6 hex lattice, mildly stretched (df=1.05) and hot (400 m/s):
        # probed so Euler crosses order-unity drift inside 100 ps while
        # leapfrog on the same scene holds to ~6e-4
        frame = make_scene(nx=6, ny=6, vel=(0.0, 400.0), distance_factor=1.05)
        parts = frame.particles.copy()
        meta = frame.metadata.copy()
        meta["step_dt"] = 1e-15  # the report's Euler operating point
        meta["steps_per_frame"] = steps_per_frame
        meta["cursor_pos"] = (-1.0, -1.0)
        state = state_from_numpy(parts, capacity=len(parts))
        p = SimParams.from_record(meta)
        e0 = oracle.total_energy(parts, meta)
        scale = max(abs(e0), 1e-21)
        drifts = []  # per-frame instantaneous drift, NOT a running max
        for _ in range(frames):  # frames x steps_per_frame steps = 100 ps
            state = run_frame_jit(state, p, step_fn=step_fn)
            e = oracle.total_energy(state_to_numpy(state), meta)
            if not np.isfinite(e):
                return [np.inf]
            drifts.append(abs(e - e0) / scale)
        return drifts

    euler = run(allpairs_step_euler)
    final = euler[-1]
    # secular monotone growth: quarter-horizon checkpoints strictly increase
    q = [euler[len(euler) // 4 - 1], euler[len(euler) // 2 - 1],
         euler[3 * len(euler) // 4 - 1], euler[-1]]
    assert final == np.inf or q[0] < q[1] < q[2] < q[3], (
        f"Euler drift not secular: checkpoints {q}"
    )
    assert final > 0.5, (
        f"Euler only drifted {final:.2%} in 100 ps — expected explosion"
    )
    leapfrog_drift = max(run(allpairs_step))
    assert leapfrog_drift < 0.05, (
        f"leapfrog drifted {leapfrog_drift:.2%} on the Euler scene"
    )
    assert final > 100 * leapfrog_drift, (
        f"no contrast: euler {final:.3g} vs leapfrog {leapfrog_drift:.3g}"
    )
