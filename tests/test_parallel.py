"""Multi-chip domain decomposition tests on a virtual 8-device CPU mesh.

The correctness bar: a sharded run over any mesh shape must be bit-identical to
the single-device bucket path — the halo exchange is exact (full one-bucket
ring), so no tolerance is needed (SURVEY.md section 4's multi-chip equivalence
test, the analog of the reference's same-kernel-on-all-devices oracle).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from particle_simulator_tpu.engine.state import SimParams, state_from_numpy, state_to_numpy
from particle_simulator_tpu.io.frame import Frame
from particle_simulator_tpu.io.presets import ParticleLattice
from particle_simulator_tpu.parallel.domain import (
    exchange_halo,
    factor_mesh,
    make_mesh,
    make_sharded_frame_fn,
    shard_state,
)
from particle_simulator_tpu.physics.bucket import (
    GridConfig,
    bucketize_numpy,
    gather_neighborhood,
    run_frame_bucket,
    stack9,
    state_to_grid,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def scene_grid(cfg: GridConfig, nx=20, ny=20, vel=(0.0, 30.0), seed=3):
    frame = Frame.new()
    meta = frame.metadata
    lat = ParticleLattice((nx, ny), distance_factor=1.1, velocity=vel)
    lat.hex_square(frame, (meta.box_width / 2, meta.box_height / 2), rng=np.random.default_rng(seed))
    layout = bucketize_numpy(frame.particles, cfg)
    state = state_to_grid(state_from_numpy(layout, cfg.capacity), cfg)
    params = SimParams.from_record(meta.copy())
    return state, params


def test_factor_mesh():
    # nx must be a power of two (it must divide the power-of-two bucket grid);
    # odd factors land on the (paddable) y axis
    assert factor_mesh(8) == (4, 2)
    assert factor_mesh(4) == (2, 2)
    assert factor_mesh(2) == (2, 1)
    assert factor_mesh(1) == (1, 1)
    assert factor_mesh(7) == (7, 1)
    assert factor_mesh(12) == (6, 2)
    assert factor_mesh(16) == (4, 4)
    for n in range(1, 20):
        ny, nx = factor_mesh(n)
        assert ny * nx == n
        assert nx & (nx - 1) == 0  # power of two


def test_halo_exchange_matches_tombstone_pad_interior():
    """On a mesh, exchange_halo must reconstruct exactly the neighborhoods the
    single-device tombstone pad produces — verified via the stacked 3x3 gather
    over the whole grid."""
    cfg = GridConfig(4, 4, 4)  # 16x16 grid of 4-cap buckets
    state, params = scene_grid(cfg, nx=12, ny=12)

    mesh = make_mesh(n_devices=8)
    ny, nx = mesh.devices.shape

    # single-device neighborhoods
    ref = gather_neighborhood(state)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from particle_simulator_tpu.engine.state import ParticleState

    spec = ParticleState(*([P("dy", "dx", None)] * 5))
    f = shard_map(
        lambda s: stack9(exchange_halo(s, ny, nx)),
        mesh=mesh, in_specs=(spec,), out_specs=spec,
    )
    got = f(shard_state(state, mesh))

    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_halo_exchange_x_rows_bit_identical_to_full_pad():
    """exchange_halo_x_rows (the Pallas step's copy-light exchange) must ship
    bit-identical data to exchange_halo followed by slicing the interior rows
    and the two edge rows back out — including the x-halo corners the shipped
    edge rows carry from the diagonal neighbor."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from particle_simulator_tpu.engine.state import ParticleState
    from particle_simulator_tpu.parallel.domain import exchange_halo_x_rows

    cfg = GridConfig(4, 4, 4)
    state, params = scene_grid(cfg, nx=12, ny=12, vel=(0.0, 80.0))

    mesh = make_mesh(n_devices=8)
    ny, nx = mesh.devices.shape
    spec = ParticleState(*([P("dy", "dx", None)] * 5))

    def via_full(s):
        padded = exchange_halo(s, ny, nx)
        return (
            ParticleState(*(a[1:-1] for a in padded)),
            ParticleState(*(a[:1] for a in padded)),
            ParticleState(*(a[-1:] for a in padded)),
        )

    def run(f):
        g = shard_map(
            f, mesh=mesh, in_specs=(spec,), out_specs=(spec, spec, spec)
        )
        return jax.tree.map(np.asarray, g(shard_state(state, mesh)))

    ref, got = run(via_full), run(lambda s: exchange_halo_x_rows(s, ny, nx))
    for part_ref, part_got, which in zip(ref, got, ("interior", "top", "bottom")):
        for name, a, b in zip(part_ref._fields, part_ref, part_got):
            np.testing.assert_array_equal(a, b, err_msg=f"{which}.{name}")


@pytest.mark.parametrize("form", ["dus", "select"])
@pytest.mark.parametrize("xpad", [1, 3])
def test_refresh_x_cols_matches_repad(form, xpad):
    """refresh_x_cols (the persistent-padded layout's per-step halo-column
    update) must leave the padded grid bit-identical to re-padding its
    interior from scratch — including the ty tombstone decode at the mesh
    boundary — after the interior has changed (as a step changes it) and the
    halo columns have gone stale. Both write forms (paired DUS vs the
    fusable broadcast+select) and margin-padded layouts (xpad > 1) must
    produce the same bytes."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    import jax.numpy as jnp
    from particle_simulator_tpu.engine.state import ParticleState
    from particle_simulator_tpu.parallel.domain import pad_x_state, refresh_x_cols

    cfg = GridConfig(4, 4, 4)
    state, params = scene_grid(cfg, nx=12, ny=12, vel=(0.0, 80.0))

    mesh = make_mesh(n_devices=8)
    ny, nx = mesh.devices.shape
    spec = ParticleState(*([P("dy", "dx", None)] * 5))

    def body(s):
        sp = pad_x_state(s, nx, xpad=xpad)
        # perturb EVERY field everywhere (halo columns included — they are
        # stale garbage the refresh must fully overwrite), like a step would
        sp = ParticleState(
            x=sp.x + jnp.uint32(3),
            y=sp.y ^ jnp.uint32(0x55),
            vx=sp.vx * jnp.float32(1.5) + jnp.float32(1.0),
            vy=sp.vy - jnp.float32(2.0),
            ty=jnp.where((sp.x % 7 == 0) & (sp.ty >= 0), 1, sp.ty),
        )
        got = refresh_x_cols(sp, nx, xpad=xpad, form=form)
        interior = ParticleState(
            *(a[:, xpad : a.shape[1] - xpad] for a in sp))
        ref = pad_x_state(interior, nx, xpad=xpad)
        # margin columns (xpad > 1) are untouched by the refresh but
        # re-tombstoned by pad_x_state: compare them from ref's layout
        return got, ref

    run = shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=(spec, spec))
    got, ref = jax.tree.map(np.asarray, run(shard_state(state, mesh)))
    # margin columns (xpad > 1) are permanently-dead filler the refresh
    # never touches (the perturbation above scribbled on them; a real step
    # leaves dead lanes alone) — compare halo + interior only. The gathered
    # global array concatenates each device's padded width, so the margin
    # positions repeat every w_local columns.
    w_local = ref.x.shape[1] // nx
    local_col = np.arange(ref.x.shape[1]) % w_local
    keep = (local_col >= xpad - 1) & (local_col < w_local - (xpad - 1))
    for name, a, b in zip(ref._fields, ref, got):
        np.testing.assert_array_equal(a[:, keep], b[:, keep], err_msg=name)


def test_sharded_frame_refresh_forms_bit_identical(monkeypatch):
    """The full sharded Pallas runner must produce the same bytes whichever
    halo-column refresh form is compiled in (PS_SHARD_REFRESH=dus|select|
    refs): the select form exists so XLA can fuse the refresh into the next
    step's pallas input DMA instead of materializing full-grid DUS copies
    (the r4 HLO census's dominant per-step data movement); the refs form
    goes further and never rewrites the halo columns in HBM between moves —
    the fresh x/y neighbor columns ride a small extra kernel ref that the
    step splices over the halo-column lanes in VMEM (ty is invariant
    between moves, so its columns never go stale)."""
    cfg = GridConfig(4, 4, 4, move_every=4)
    state, params = scene_grid(cfg, nx=14, ny=14, vel=(0.0, 80.0))
    params = params._replace(steps_per_frame=np.int32(10))
    mesh = make_mesh(n_devices=4)

    outs = {}
    for form in ("dus", "select", "refs"):
        monkeypatch.setenv("PS_SHARD_REFRESH", form)
        fn = make_sharded_frame_fn(cfg, mesh, donate=False, kernel="pallas")
        outs[form] = jax.tree.map(
            np.asarray, fn(shard_state(state, mesh), params))
    for other in ("select", "refs"):
        for name, a, b in zip(outs["dus"]._fields, outs["dus"], outs[other]):
            np.testing.assert_array_equal(a, b, err_msg=f"{other}:{name}")


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_sharded_frame_matches_single_device(n_devices):
    """Sharded multi-frame run == single-device run, including the
    migration/rebucket cadence crossing shard boundaries.

    The halo exchange is exact (every neighborhood sees identical values), but
    XLA picks a different f32 reduction tree for the sharded tile shape, so
    live lanes can differ by summation-order ulps — a few fixed-point units
    over 30 steps. Bucket assignments (ty layout) must agree exactly."""
    cfg = GridConfig(4, 4, 4, move_every=4)
    state, params = scene_grid(cfg, nx=14, ny=14, vel=(0.0, 80.0))
    params = params._replace(steps_per_frame=np.int32(10))

    # single-device: 3 frames
    ref = state
    for _ in range(3):
        ref = run_frame_bucket(ref, params, move_every=cfg.move_every)
    ref = jax.tree.map(np.asarray, ref)

    mesh = make_mesh(n_devices=n_devices)
    fn = make_sharded_frame_fn(cfg, mesh, donate=False)
    got = shard_state(state, mesh)
    for _ in range(3):
        got = fn(got, params)
    got = jax.tree.map(np.asarray, got)

    np.testing.assert_array_equal(ref.ty, got.ty)
    np.testing.assert_allclose(ref.x.astype(np.int64), got.x.astype(np.int64), rtol=0, atol=8)
    np.testing.assert_allclose(ref.y.astype(np.int64), got.y.astype(np.int64), rtol=0, atol=8)
    np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(ref.vy, got.vy, rtol=1e-3, atol=0.05)


@pytest.mark.parametrize("kernel", ["jnp", "pallas"])
def test_sharded_migration_across_boundary(kernel):
    """A particle drifting across a shard boundary is pulled by the new owner
    and dropped by the old one (pull-based migration via halo).

    The particle carries a nonzero vy while crossing the dx boundary: the
    pallas runner's per-step halo refresh skips velocity columns (forces
    never read them) and tops them up only before the move — if that
    pre-move refresh failed, the pulled particle would arrive with a stale
    or garbage velocity and diverge immediately."""
    cfg = GridConfig(4, 4, 4, move_every=2)
    frame = Frame.new()
    meta = frame.metadata
    # one particle near the vertical midline moving right: crosses the dx
    # shard boundary of a (4,2) mesh. Drift per move interval (2 steps) must
    # stay under one bucket (1/16 box) or the pull pass drops it — the
    # reference's own drift bound (kernel_bucket.cuh:30-31).
    bw = meta.box_width
    v = 0.125 * bw / (np.float32(meta.step_dt) * 8)  # 2 buckets over 8 steps
    frame.push(meta.new_particle((bw * 0.49, bw * 0.5), (float(v), float(v) / 3)))
    layout = bucketize_numpy(frame.particles, cfg)
    state = state_to_grid(state_from_numpy(layout, cfg.capacity), cfg)
    params = SimParams.from_record(meta.copy())._replace(steps_per_frame=np.int32(8))

    ref = jax.tree.map(np.asarray, run_frame_bucket(state, params, move_every=cfg.move_every))

    mesh = make_mesh(n_devices=8)
    fn = make_sharded_frame_fn(cfg, mesh, donate=False, kernel=kernel)
    got = jax.tree.map(np.asarray, fn(shard_state(state, mesh), params))

    # a single particle feels no pair forces. Compare LIVE slots only
    # (tombstone payloads are don't-care: the old owner's vacated slot keeps
    # stale bytes that differ between the paths). Velocities must match to
    # f32 op-order ulps — a stale/garbage halo velocity at the pull would be
    # off by orders of magnitude; positions tolerate the shape-dependent
    # integration ulps the other sharded tests calibrate (16 fixed-point
    # units ~ 7e-9 relative).
    np.testing.assert_array_equal(ref.ty, got.ty)
    live = np.asarray(ref.ty) >= 0
    np.testing.assert_allclose(
        ref.x[live].astype(np.int64), got.x[live].astype(np.int64),
        rtol=0, atol=16)
    np.testing.assert_allclose(
        ref.y[live].astype(np.int64), got.y[live].astype(np.int64),
        rtol=0, atol=16)
    np.testing.assert_allclose(ref.vx[live], got.vx[live], rtol=1e-4, atol=0)
    np.testing.assert_allclose(ref.vy[live], got.vy[live], rtol=1e-4, atol=0)
    # the particle survived and actually crossed into the right shard half
    live = np.asarray(got.ty).reshape(-1) >= 0
    assert live.sum() == 1
    assert np.asarray(got.x).reshape(-1)[live][0] > np.uint32(0.55 * 2**32)


def test_sharded_pallas_kernel_matches_single_device():
    """Sharded runner with the Pallas step kernel (interpret mode on the CPU
    mesh): halo-pad -> kernel -> interior slice must agree with the
    single-device jnp path within reduction-order ulps."""
    cfg = GridConfig(4, 4, 4, move_every=4)
    state, params = scene_grid(cfg, nx=14, ny=14, vel=(0.0, 80.0))
    params = params._replace(steps_per_frame=np.int32(6))

    ref = jax.tree.map(
        np.asarray, run_frame_bucket(state, params, move_every=cfg.move_every)
    )

    mesh = make_mesh(n_devices=4)
    fn = make_sharded_frame_fn(cfg, mesh, donate=False, kernel="pallas")
    got = jax.tree.map(np.asarray, fn(shard_state(state, mesh), params))

    np.testing.assert_array_equal(ref.ty, got.ty)
    np.testing.assert_allclose(ref.x.astype(np.int64), got.x.astype(np.int64), rtol=0, atol=8)
    np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-3, atol=0.05)


@pytest.mark.parametrize("n_devices", [2, 4, 8])
@pytest.mark.parametrize("impl", ["direct", "pallas", "pallas-chunked"])
def test_sharded_move_pass_bit_identical(n_devices, impl):
    """One isolated migration pass: the shard-aware direct move (and its
    pallas place variant) over a mesh must be BIT-identical to the
    single-device bucket_move — including cross-shard migration, overflow
    drops, and the reference's pull scan order (kernel_bucket.cuh:5-39).
    Drifted positions are synthesized so many particles target a different
    bucket (some across shard boundaries) and buckets overflow."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from particle_simulator_tpu.engine.state import ParticleState
    from particle_simulator_tpu.parallel.domain import AXIS_X, AXIS_Y, exchange_halo
    from particle_simulator_tpu.physics.bucket import (
        bucket_move,
        bucket_move_direct_halo,
    )

    cfg = GridConfig(4, 4, 4)
    rng = np.random.default_rng(11)
    by, bx, cap = cfg.grid_shape
    # positions anywhere in the box, then assigned to RANDOM source cells --
    # so targets drift up to the whole grid (>1-bucket drifters must drop),
    # with dense clumps that overflow the 4-slot buckets
    n = cfg.capacity
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    y = rng.integers(0, 2**32, n, dtype=np.uint32)
    # bias half the particles toward their own cell +-1 so plenty survive
    cell = np.arange(n) // cap
    cbx, cby = cell % bx, cell // bx
    half = n // 2
    x[:half] = ((cbx[:half] + rng.integers(-1, 2, half)) % bx).astype(np.uint32) << 28 | rng.integers(0, 1 << 28, half, dtype=np.uint32)
    y[:half] = ((cby[:half] + rng.integers(-1, 2, half)) % by).astype(np.uint32) << 28 | rng.integers(0, 1 << 28, half, dtype=np.uint32)
    ty = np.where(rng.random(n) < 0.8, 0, -1).astype(np.int32)
    state = ParticleState(
        x=jnp.asarray(x).reshape(by, bx, cap),
        y=jnp.asarray(y).reshape(by, bx, cap),
        vx=jnp.asarray(rng.normal(size=n).astype(np.float32)).reshape(by, bx, cap),
        vy=jnp.asarray(rng.normal(size=n).astype(np.float32)).reshape(by, bx, cap),
        ty=jnp.asarray(ty).reshape(by, bx, cap),
    )

    ref = jax.tree.map(np.asarray, bucket_move(state))

    mesh = make_mesh(n_devices=n_devices)
    ny, nx = mesh.devices.shape

    def body(s):
        ly, lx = s.x.shape[0], s.x.shape[1]
        row_offset = jax.lax.axis_index(AXIS_Y).astype(jnp.int32) * ly
        col_offset = jax.lax.axis_index(AXIS_X).astype(jnp.int32) * lx
        padded = exchange_halo(s, ny, nx)
        if impl.startswith("pallas"):
            from particle_simulator_tpu.ops.bucket_pallas import (
                bucket_move_pallas_halo,
            )

            # "pallas-chunked": the column skip's rounded lane layout —
            # (lx+2)*cap is never chunk-divisible at these shard sizes, so
            # this exercises the appended-tombstone-lane path end to end
            return bucket_move_pallas_halo(
                padded, cfg.bx_log2, cfg.by_log2, row_offset, col_offset,
                interpret=True,
                lane_chunks=2 if impl == "pallas-chunked" else 1,
            )
        return bucket_move_direct_halo(
            padded, cfg.bx_log2, cfg.by_log2, row_offset, col_offset
        )

    spec = ParticleState(*([P(AXIS_Y, AXIS_X, None)] * 5))
    fn = shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec,
                   check_vma=False)
    got = jax.tree.map(np.asarray, fn(shard_state(state, mesh)))

    for name, a, b in zip(ref._fields, ref, got):
        np.testing.assert_array_equal(a, b, err_msg=f"field {name} ({impl})")


def test_multihost_helpers_single_process():
    """API-level check: no coordinator env -> no-op init, global mesh covers
    all local devices, this process owns the editor connection."""
    from particle_simulator_tpu.parallel import multihost

    assert multihost.init_distributed() is False
    mesh = multihost.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert multihost.is_frame_owner()


def test_multihost_two_process_sharded_frame():
    """REAL multi-process check (VERDICT r1 item 8): two OS processes, 2
    virtual CPU devices each, jax.distributed over a local coordinator with
    gloo collectives; one sharded frame over the 4-device GLOBAL mesh must be
    bit-identical to the single-device bucket path (each child verifies)."""
    import socket
    import subprocess
    import sys
    from pathlib import Path

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    child = Path(__file__).parent / "multihost_child.py"
    env = dict(os.environ)
    env["PS_TPU_COORDINATOR"] = f"127.0.0.1:{port}"
    env["PS_TPU_NUM_PROCESSES"] = "2"
    procs = [
        subprocess.Popen(
            [sys.executable, str(child), str(i)],
            env=env,
            cwd=str(Path(__file__).parent.parent),
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost child timed out")
        outs.append((p.returncode, out, err))
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"child {i} rc={rc}\n{out[-1500:]}\n{err[-3000:]}"
        assert f"MULTIHOST_OK process={i}" in out


def test_multihost_daemon_editor_end_to_end():
    """The full production multi-host path (scripts/launch_multihost.sh): a
    headless editor + TWO engine daemon processes sharing one jax.distributed
    runtime. Process 0 owns the editor TCP connection; DistributedFrontend
    broadcasts editor input to process 1 so both run the identical sharded
    frame sequence over the 4-device global mesh, and the editor receives
    the simulated frames."""
    import json
    import socket
    import subprocess
    import sys
    from pathlib import Path

    def free_port():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            return s.getsockname()[1]

    coord_port, editor_port = free_port(), free_port()
    repo = Path(__file__).parent.parent

    base_env = dict(os.environ)
    base_env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in base_env.get("XLA_FLAGS", "").split() if "device_count" not in f]
    base_env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=2"])

    editor = subprocess.Popen(
        [sys.executable, "-m", "particle_simulator_tpu.editor.headless",
         "--addr", f"127.0.0.1:{editor_port}", "--frames", "3",
         "--lattice", "12x12", "--steps-per-frame", "10"],
        env=base_env, cwd=str(repo),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )

    daemons = []
    for i in range(2):
        env = dict(base_env)
        env["PS_TPU_COORDINATOR"] = f"127.0.0.1:{coord_port}"
        env["PS_TPU_NUM_PROCESSES"] = "2"
        env["PS_TPU_PROCESS_ID"] = str(i)
        daemons.append(subprocess.Popen(
            [sys.executable, "-m", "particle_simulator_tpu.engine.daemon",
             "--devices", "all", "--addr", f"127.0.0.1:{editor_port}",
             "--max-frames", "5", "--retry-s", "60"],
            env=env, cwd=str(repo),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))

    procs = [editor] + daemons
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost daemon/editor process timed out")
        outs.append((p.returncode, out, err))

    e_rc, e_out, e_err = outs[0]
    assert e_rc == 0, f"editor rc={e_rc}\n{e_out[-1500:]}\n{e_err[-3000:]}"
    stats = json.loads(e_out.strip().splitlines()[-1])
    assert stats["frame_count"] >= 3
    assert stats["particle_count"] == 144
    for i, (rc, out, err) in enumerate(outs[1:]):
        assert rc == 0, f"daemon {i} rc={rc}\n{out[-1500:]}\n{err[-3000:]}"
        assert "disconnected after" in err
        if i == 0:
            assert "sharding over a (2, 2) device mesh" in err


@pytest.mark.parametrize("impl", ["direct", "pallas", "pallas-chunked"])
def test_sharded_move_pass_sparse_scene_bit_identical(impl):
    """The sharded move's dead-neighborhood skip (_place_edge_kernel flags):
    a scene confined to one corner leaves whole shards (and blocks within
    live shards) with no kept candidate — their outputs must equal the pull
    oracle's all-tombstone layout bit-for-bit, across a 4-device mesh."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from particle_simulator_tpu.engine.state import ParticleState
    from particle_simulator_tpu.parallel.domain import AXIS_X, AXIS_Y, exchange_halo
    from particle_simulator_tpu.physics.bucket import (
        bucket_move,
        bucket_move_direct_halo,
    )

    cfg = GridConfig(4, 4, 4)
    rng = np.random.default_rng(23)
    by, bx, cap = cfg.grid_shape
    n = cfg.capacity
    # confine live particles to the top-left ~quarter, with +-1-bucket drift
    x = rng.integers(0, 2**30, n, dtype=np.uint32)
    y = rng.integers(0, 2**30, n, dtype=np.uint32)
    ty = np.where(rng.random(n) < 0.3, 0, -1).astype(np.int32)
    state = ParticleState(
        x=jnp.asarray(x).reshape(by, bx, cap),
        y=jnp.asarray(y).reshape(by, bx, cap),
        vx=jnp.asarray(rng.normal(size=n).astype(np.float32)).reshape(by, bx, cap),
        vy=jnp.asarray(rng.normal(size=n).astype(np.float32)).reshape(by, bx, cap),
        ty=jnp.asarray(ty).reshape(by, bx, cap),
    )
    # live sources only exist in the first quarter of bucket rows/cols
    live_mask = np.zeros((by, bx, cap), bool)
    live_mask[: by // 2, : bx // 2] = True
    state = state._replace(ty=jnp.where(jnp.asarray(live_mask), state.ty, -1))

    ref = jax.tree.map(np.asarray, bucket_move(state))

    mesh = make_mesh(n_devices=4)
    ny, nx = mesh.devices.shape

    def body(s):
        ly, lx = s.x.shape[0], s.x.shape[1]
        row_offset = jax.lax.axis_index(AXIS_Y).astype(jnp.int32) * ly
        col_offset = jax.lax.axis_index(AXIS_X).astype(jnp.int32) * lx
        padded = exchange_halo(s, ny, nx)
        if impl.startswith("pallas"):
            from particle_simulator_tpu.ops.bucket_pallas import (
                bucket_move_pallas_halo,
            )

            # "pallas-chunked": the column skip's rounded lane layout —
            # (lx+2)*cap is never chunk-divisible at these shard sizes, so
            # this exercises the appended-tombstone-lane path end to end
            return bucket_move_pallas_halo(
                padded, cfg.bx_log2, cfg.by_log2, row_offset, col_offset,
                interpret=True,
                lane_chunks=2 if impl == "pallas-chunked" else 1,
            )
        return bucket_move_direct_halo(
            padded, cfg.bx_log2, cfg.by_log2, row_offset, col_offset
        )

    spec = ParticleState(*([P(AXIS_Y, AXIS_X, None)] * 5))
    fn = shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec,
                   check_vma=False)
    got = jax.tree.map(np.asarray, fn(shard_state(state, mesh)))

    for name, a, b in zip(ref._fields, ref, got):
        np.testing.assert_array_equal(a, b, err_msg=f"field {name} ({impl})")


def test_x_pad_for_chunks_production_sizes():
    """The x-pad resolver (parallel/domain.py x_pad_for_chunks) finds an
    affordable tombstone margin at the config-5 production shard widths
    (1024x1024x16 over a v5p-8's (4,2) mesh -> lx=512) and correctly reports
    infeasible combinations as None."""
    from particle_simulator_tpu.parallel.domain import x_pad_for_chunks

    for C in (2, 4, 8):
        xpad = x_pad_for_chunks(512, 16, C)
        assert xpad is not None, f"C={C} infeasible at lx=512 cap=16"
        w = 512 + 2 * xpad
        assert w % C == 0 and (w * 16 // C) % 128 == 0
        assert 2 * xpad <= 512 // 4  # waste budget
    # unchunked always costs the plain one-column halo
    assert x_pad_for_chunks(512, 16, 1) == 1
    # a width too small to chunk affordably -> None (caller falls back)
    assert x_pad_for_chunks(32, 8, 2) is None


@pytest.mark.parametrize("form", ["select", "refs"])
def test_sharded_pallas_lane_chunks_bit_identical(form, monkeypatch):
    """The sharded Pallas runner with the lane-chunk column skip
    (lane_chunks > 1: tombstone-margin x-pad + chunked step kernel) must be
    BIT-identical to the unchunked sharded runner — the skip only gates
    which tiles compute (VERDICT r3 item 3: the +47% sparse-scene win now
    reaches the multi-chip path). Scene: a lattice confined to one quarter
    of the box, so column chunks actually die.

    ``form="refs"`` additionally runs the chunked side with the in-kernel
    halo-column splice (the C > 1 dynamic-roll path) — the unchunked
    reference stays on the select form, so this cross-checks forms AND
    chunking at once."""
    cfg = GridConfig(8, 2, 8, move_every=4)  # 256x4 buckets, cap 8
    frame = Frame.new()
    meta = frame.metadata
    # lattice in the left third of the box: live columns span < half the
    # grid, so the right-hand lane chunk of every shard is dead
    lat = ParticleLattice((24, 6), distance_factor=1.3, velocity=(0.0, 40.0))
    lat.hex_square(frame, (meta.box_width * 0.18, meta.box_height / 2),
                   rng=np.random.default_rng(7))
    layout = bucketize_numpy(frame.particles, cfg)
    state = state_to_grid(state_from_numpy(layout, cfg.capacity), cfg)
    params = SimParams.from_record(meta.copy())._replace(steps_per_frame=np.int32(6))

    mesh = make_mesh(n_devices=4)  # (2, 2): lx = 128 -> xpad 16, C=2 feasible
    from particle_simulator_tpu.parallel.domain import x_pad_for_chunks

    assert x_pad_for_chunks(128, 8, 2) is not None

    monkeypatch.setenv("PS_SHARD_REFRESH", "select")
    plain = make_sharded_frame_fn(cfg, mesh, donate=False, kernel="pallas")
    monkeypatch.setenv("PS_SHARD_REFRESH", form)
    chunked = make_sharded_frame_fn(cfg, mesh, donate=False, kernel="pallas",
                                    lane_chunks=2)
    ref = jax.tree.map(np.asarray, plain(shard_state(state, mesh), params))
    got = jax.tree.map(np.asarray, chunked(shard_state(state, mesh), params))
    for f in state._fields:
        np.testing.assert_array_equal(getattr(ref, f), getattr(got, f), err_msg=f)
