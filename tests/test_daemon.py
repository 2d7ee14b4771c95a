"""End-to-end engine-daemon tests: the full editor<->engine protocol loop over
a real TCP socket, in-process (editor stand-in on the main thread, daemon on a
worker thread) — the analog of running the reference's two binaries on one
machine (doc/project.typ:511-520).

Regression anchor: the daemon ships frame k's state while frame k+1 computes
from it, so the frame runner must NOT donate its input buffers.
"""

import os
import threading
import time

import numpy as np
import pytest

from particle_simulator_tpu.engine.daemon import Frontend, main_loop
from particle_simulator_tpu.engine.simulator import Simulator
from particle_simulator_tpu.io.frame import Frame
from particle_simulator_tpu.io.presets import ParticleLattice
from particle_simulator_tpu.io.transport import new_tcp_client, new_tcp_server
from particle_simulator_tpu.physics.bucket import GridConfig


def scene_frame(n=8, steps=5):
    """Sparse lattice: spacing ~4 equilibrium distances so no bucket of the
    16x16-cap-8 test grid overflows (overflow legitimately drops particles —
    that behavior is tested in test_bucket.py, not here)."""
    frame = Frame.new()
    meta = frame.metadata
    lat = ParticleLattice((n, n), distance_factor=4.0, velocity=(0.0, 10.0))
    lat.hex_square(frame, (meta.box_width / 2, meta.box_height / 2), rng=np.random.default_rng(0))
    meta.steps_per_frame = steps
    return frame


def accept_blocking(server, timeout=10.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        conn = server.try_accept()
        if conn:
            return conn
        time.sleep(0.005)
    raise TimeoutError("engine never connected")


def run_daemon(port, max_frames, grid=GridConfig(4, 4, 8)):
    """Daemon side: connect, wait for scene, run the main loop."""
    reader, writer = new_tcp_client(("127.0.0.1", port))
    frontend = Frontend(reader, writer, verbose=False)
    sim = Simulator(grid)
    while frontend.is_connected:
        f = frontend.read()
        if f is not None and f.particle_count > 0:
            sim.load_frame(f)
            break
        time.sleep(0.001)
    main_loop(frontend, sim, max_frames=max_frames)


def read_frames(reader, want, timeout=60.0):
    got = []
    deadline = time.monotonic() + timeout
    while len(got) < want and time.monotonic() < deadline:
        f = reader.read()
        if f is None:
            time.sleep(0.002)
            continue
        got.append(f)
    return got


def test_daemon_ships_live_frames_over_tcp():
    server = new_tcp_server(("127.0.0.1", 0))
    t = threading.Thread(target=run_daemon, args=(server.addr[1], 6), daemon=True)
    t.start()
    reader, writer = accept_blocking(server)

    scene = scene_frame()
    assert writer.write(scene)

    frames = read_frames(reader, want=5)
    assert len(frames) == 5, f"got {len(frames)} frames"
    for f in frames:
        assert f.is_valid()
        assert f.particle_count == scene.particle_count  # no particles lost
        assert np.isfinite(f.particles["vx"]).all()
        assert np.isfinite(f.particles["vy"]).all()

    # the simulation actually advances: positions change across frames
    assert not np.array_equal(frames[0].particles["x"], frames[-1].particles["x"])
    t.join(timeout=30)
    server.close()


def test_daemon_metadata_only_update_applies_live():
    server = new_tcp_server(("127.0.0.1", 0))
    t = threading.Thread(target=run_daemon, args=(server.addr[1], 64), daemon=True)
    t.start()
    reader, writer = accept_blocking(server)

    scene = scene_frame()
    assert writer.write(scene)
    read_frames(reader, want=2)

    # live reconfigure: cursor moves, dt changes — no scene reset
    update = Frame.new()
    update.header["metadata"] = scene.metadata.copy()
    update.metadata.step_dt = 1e-15
    update.metadata.cursor_pos = (0.5, 0.5)
    assert update.particle_count == 0
    assert writer.write(update)

    # frames in flight when the edit lands keep their old stamp (they were
    # computed under it); the new dt appears a couple of frames later
    later = []
    deadline = time.monotonic() + 60.0
    while time.monotonic() < deadline:
        later += read_frames(reader, want=1, timeout=10.0)
        if later and abs(later[-1].metadata.step_dt - 1e-15) < 1e-20:
            break
    assert later, "engine died after metadata-only frame"
    # metadata round-trips on outbound frames
    assert any(abs(f.metadata.step_dt - 1e-15) < 1e-20 for f in later)
    # particles were NOT reset
    assert all(f.particle_count == scene.particle_count for f in later)
    t.join(timeout=30)
    server.close()


def test_daemon_scene_reset_replaces_particles():
    server = new_tcp_server(("127.0.0.1", 0))
    # generous budget: the ship worker + readback pipeline run the wire a few
    # frames behind the main loop, so the reset echo lands several frames
    # after our write — the budget must not expire first (same flake guard
    # as test_daemon_data_structure_switch_mid_run)
    t = threading.Thread(target=run_daemon, args=(server.addr[1], 64), daemon=True)
    t.start()
    reader, writer = accept_blocking(server)

    assert writer.write(scene_frame(n=8))
    read_frames(reader, want=2)

    bigger = scene_frame(n=10)
    assert writer.write(bigger)

    # soon the stream switches to the new particle count (the reset is echoed
    # back, reference cuda_simulator.cu:15-21)
    deadline = time.monotonic() + 60.0
    found = False
    while time.monotonic() < deadline and not found:
        for f in read_frames(reader, want=1, timeout=10.0):
            if f.particle_count == bigger.particle_count:
                found = True
    assert found, "scene reset never echoed on the wire"
    t.join(timeout=60)
    server.close()


def test_daemon_data_structure_switch_mid_run():
    """A scene reset can switch CompactArray <-> MatrixBuckets live
    (the layout travels in-band; reference cuda_simulator.cu:15-21)."""
    from particle_simulator_tpu.io.frame import DataStructure

    server = new_tcp_server(("127.0.0.1", 0))
    # generous frame budget: under suite load the daemon can ship many
    # frames between our write() and its next frontend poll, and it must
    # not hit max_frames before the reset arrives (observed flake)
    t = threading.Thread(target=run_daemon, args=(server.addr[1], 200), daemon=True)
    t.start()
    reader, writer = accept_blocking(server)

    scene = scene_frame()
    scene.metadata.data_structure = DataStructure.MATRIX_BUCKETS
    assert writer.write(scene)
    first = read_frames(reader, want=2)
    assert all(f.metadata.data_structure == DataStructure.MATRIX_BUCKETS for f in first)

    scene2 = scene_frame(n=6)
    scene2.metadata.data_structure = DataStructure.COMPACT_ARRAY
    assert writer.write(scene2)
    switched = []
    deadline = time.monotonic() + 60.0
    while not switched and time.monotonic() < deadline:
        switched = [
            f for f in read_frames(reader, want=4, timeout=10.0)
            if f.particle_count == scene2.particle_count
        ]
    assert switched, "scene reset never took effect"
    assert all(
        f.metadata.data_structure == DataStructure.COMPACT_ARRAY for f in switched
    )
    assert all(np.isfinite(f.particles["vx"]).all() for f in switched)
    t.join(timeout=30)
    server.close()


def test_daemon_sharded_over_mesh():
    """End-to-end: the engine shards the bucket grid over the virtual 8-device
    mesh and streams frames over TCP — the multi-chip production topology
    (editor on host 0, spatial domain decomposition across chips)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    from particle_simulator_tpu.parallel.domain import make_mesh

    def run_sharded(port, max_frames):
        reader, writer = new_tcp_client(("127.0.0.1", port))
        frontend = Frontend(reader, writer, verbose=False)
        sim = Simulator(GridConfig(4, 4, 8), mesh=make_mesh(n_devices=8))
        while frontend.is_connected:
            f = frontend.read()
            if f is not None and f.particle_count > 0:
                sim.load_frame(f)
                break
            time.sleep(0.001)
        main_loop(frontend, sim, max_frames=max_frames)

    server = new_tcp_server(("127.0.0.1", 0))
    t = threading.Thread(target=run_sharded, args=(server.addr[1], 5), daemon=True)
    t.start()
    reader, writer = accept_blocking(server)
    scene = scene_frame()
    assert writer.write(scene)

    frames = read_frames(reader, want=4)
    assert len(frames) == 4
    for f in frames:
        assert f.particle_count == scene.particle_count
        assert np.isfinite(f.particles["vx"]).all()
    assert not np.array_equal(frames[0].particles["x"], frames[-1].particles["x"])
    t.join(timeout=60)
    server.close()


def test_sharded_read_frame_dense_pack_bit_identical():
    """read_frame on a single-host sharded mesh state takes the dense-pack
    fast path (ops/readback.py) and its wire frame is byte-identical to the
    full-grid slow path — including over an odd mesh with tombstone pad rows.
    The sharded frame fn returns the unpadded global grid P("dy","dx",None),
    on which dense_readback's cumsum/gather algebra is mesh-agnostic (GSPMD
    inserts the collectives); the editor wire order (global bucket scan,
    ascending slots — frontend.hpp:50-56) is unchanged because pad rows are
    all-tombstone and contribute zero counts."""
    import jax

    from particle_simulator_tpu.parallel.domain import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    for n_dev in (8, 3):
        sim = Simulator(GridConfig(4, 4, 8), mesh=make_mesh(n_devices=n_dev))
        sim.load_frame(scene_frame())
        sim.frame_async()  # state becomes a sharded jit output
        slow = sim.read_frame()  # CPU platform: full-grid slow path
        sim.force_device_readback = True
        ticket = sim.start_readback()
        assert ticket.packed is not None, (
            f"dense-pack fast path did not engage on the {n_dev}-device mesh state"
        )
        fast = sim.read_frame(ticket)
        assert fast.particle_count == slow.particle_count
        assert fast.particles.tobytes() == slow.particles.tobytes()


def test_grid_selection_is_density_aware():
    """A dense scene must not silently drop most of its particles: the engine
    grows the grid (finer buckets, then deeper buckets past the physics
    floor) until the scene fits."""
    from particle_simulator_tpu.io.frame import MieParams

    frame = Frame.new()
    meta = frame.metadata
    r0 = MieParams.nitrogen().force0_r()
    # 100x100 lattice at 1.05 r0 spacing, box sized so the lattice covers
    # only ~36% of the box area: per-bucket occupancy at 64x64 would overflow
    n = 100
    span = n * r0 * 1.05
    meta.box_width = span / 0.6
    meta.box_height = span / 0.6
    lat = ParticleLattice((n, n), distance_factor=1.05, velocity=(0.0, 0.0))
    lat.hex_square(frame, (meta.box_width / 2, meta.box_height / 2), rng=np.random.default_rng(0))

    sim = Simulator()
    sim.load_frame(frame)
    assert sim.live_count == n * n, f"dropped {n*n - sim.live_count} particles"
    # and the bucket width stayed at/above the physics floor
    assert meta.box_width / sim.grid.bx >= 2.0 * r0 or sim.grid.cap > 16


def test_daemon_sharded_odd_mesh():
    """Sharded engine over a 3-device mesh (odd y axis -> padded rows)."""
    import jax

    if len(jax.devices()) < 3:
        pytest.skip("needs 3 virtual devices")

    from particle_simulator_tpu.parallel.domain import make_mesh

    def run_sharded(port, max_frames):
        reader, writer = new_tcp_client(("127.0.0.1", port))
        frontend = Frontend(reader, writer, verbose=False)
        sim = Simulator(GridConfig(4, 4, 8), mesh=make_mesh(n_devices=3))
        while frontend.is_connected:
            f = frontend.read()
            if f is not None and f.particle_count > 0:
                sim.load_frame(f)
                break
            time.sleep(0.001)
        main_loop(frontend, sim, max_frames=max_frames)

    server = new_tcp_server(("127.0.0.1", 0))
    t = threading.Thread(target=run_sharded, args=(server.addr[1], 4), daemon=True)
    t.start()
    reader, writer = accept_blocking(server)
    scene = scene_frame()
    assert writer.write(scene)
    frames = read_frames(reader, want=3)
    assert len(frames) == 3
    assert all(f.particle_count == scene.particle_count for f in frames)
    assert all(np.isfinite(f.particles["vx"]).all() for f in frames)
    t.join(timeout=60)
    server.close()


def test_daemon_record_tee(tmp_path):
    """--record tees outbound frames to a replayable file."""
    from particle_simulator_tpu.io.transport import Reader, Writer

    record_path = str(tmp_path / "record.bin")

    def run_recording(port, max_frames):
        reader, writer = new_tcp_client(("127.0.0.1", port))
        frontend = Frontend(reader, writer, verbose=False,
                            record=Writer.open_file(record_path))
        sim = Simulator(GridConfig(4, 4, 8))
        while frontend.is_connected:
            f = frontend.read()
            if f is not None and f.particle_count > 0:
                sim.load_frame(f)
                break
            time.sleep(0.001)
        main_loop(frontend, sim, max_frames=max_frames)
        frontend.record.close()

    server = new_tcp_server(("127.0.0.1", 0))
    t = threading.Thread(target=run_recording, args=(server.addr[1], 4), daemon=True)
    t.start()
    reader, writer = accept_blocking(server)
    assert writer.write(scene_frame())
    live = read_frames(reader, want=3)
    t.join(timeout=30)
    server.close()

    # the recording replays to the same frames the editor saw live
    rec = Reader.open_file(record_path)
    recorded = read_frames(rec, want=3)
    assert len(recorded) >= 3
    for a, b in zip(live, recorded):
        assert a.bytes == b.bytes


def test_scene_reset_echoes_loaded_scene_without_duplicates():
    """A scene reset echoes the loaded scene itself (positions identical to the
    incoming frame, reference cuda_simulator.cu:16-20), and the stream does not
    ship the same state twice in a row afterwards."""
    server = new_tcp_server(("127.0.0.1", 0))
    # generous frame budget: the daemon ships at full speed while the reset
    # frame is still in the socket, so under CPU load it can burn many
    # old-scene frames before its newest-wins poll sees the reset — a small
    # budget makes the test flake on delivery latency, not on semantics
    t = threading.Thread(target=run_daemon, args=(server.addr[1], 64), daemon=True)
    t.start()
    reader, writer = accept_blocking(server)

    assert writer.write(scene_frame(n=8))
    read_frames(reader, want=2)

    bigger = scene_frame(n=10)
    assert writer.write(bigger)
    # read until 3 post-reset frames arrive (bounded by the helper timeout
    # and by the daemon's 64-frame exit), however many old-scene frames were
    # already in flight
    reset_stream = []
    deadline = time.monotonic() + 60.0
    while len(reset_stream) < 3 and time.monotonic() < deadline:
        got = read_frames(reader, want=1, timeout=10.0)
        if not got:
            break
        reset_stream += [f for f in got if f.particle_count == bigger.particle_count]
    assert len(reset_stream) >= 3

    def pos_set(f):
        return set(zip(f.particles["x"].tolist(), f.particles["y"].tolist()))

    # the first post-reset frame is the scene echo (same positions, any order)
    assert pos_set(reset_stream[0]) == pos_set(bigger)
    # and subsequent frames each advance (no duplicate sends of one state)
    for a, b in zip(reset_stream, reset_stream[1:]):
        assert pos_set(a) != pos_set(b)
    t.join(timeout=30)
    server.close()


def test_metadata_only_frame_switches_data_structure_live():
    """A count==0 frame that changes data_structure re-layouts the RUNNING
    scene without a reset (reference write_metadata copies the full metadata
    and run_async dispatches on it, cuda_simulator.cu:12-14 + kernel.cuh):
    MatrixBuckets -> CompactArray -> back, zero particle loss."""
    from particle_simulator_tpu.io.frame import DataStructure

    scene = scene_frame(n=8, steps=2)
    scene.metadata.data_structure = DataStructure.MATRIX_BUCKETS
    sim = Simulator(GridConfig(4, 4, 8))
    sim.load_frame(scene)
    n = scene.particle_count
    for _ in range(2):
        sim.frame_async()
    assert sim.data_structure == DataStructure.MATRIX_BUCKETS

    def metadata_only(ds):
        f = Frame.new()
        f.header["metadata"] = scene.metadata.copy()
        f.metadata.data_structure = ds
        assert f.particle_count == 0
        return f

    sim.update_metadata(metadata_only(DataStructure.COMPACT_ARRAY))
    assert sim.data_structure == DataStructure.COMPACT_ARRAY
    assert sim.live_count == n
    for _ in range(2):
        sim.frame_async()
    assert sim.live_count == n

    sim.update_metadata(metadata_only(DataStructure.MATRIX_BUCKETS))
    assert sim.data_structure == DataStructure.MATRIX_BUCKETS
    assert sim.live_count == n
    for _ in range(2):
        sim.frame_async()
    assert sim.live_count == n
    out = sim.read_frame()
    assert np.isfinite(out.particles["vx"]).all()


def test_metadata_only_frame_switches_device_live():
    """A count==0 frame that changes the device re-layouts onto the new device
    mid-run; pure parameter edits keep the running launch width (no recompile)."""
    from particle_simulator_tpu.io.frame import Device

    scene = scene_frame(n=6, steps=2)
    sim = Simulator(GridConfig(4, 4, 8))
    sim.load_frame(scene)
    n = scene.particle_count
    sim.frame_async()
    initial_device = sim.active_device

    f = Frame.new()
    f.header["metadata"] = scene.metadata.copy()
    f.metadata.device = Device.CPU_MAIN_THREAD
    sim.update_metadata(f)
    assert sim.active_device == Device.CPU_MAIN_THREAD
    assert sim.active_device != initial_device or initial_device == Device.CPU_MAIN_THREAD
    assert sim.live_count == n
    sim.frame_async()
    assert sim.live_count == n

    # a live launch-width edit alone must NOT change the running value
    # (recompile-free invariant; deferred to the next re-layout)
    g = Frame.new()
    g.header["metadata"] = sim.read_frame().metadata.copy()
    g.metadata.gpu_threads_per_block_log2 = 9
    sim.update_metadata(g)
    assert int(sim.meta_record["gpu_threads_per_block_log2"]) != 9


def test_grid_for_prefers_small_caps():
    """The density-aware grid picks the smallest capacity (>=8) that fits with
    drift headroom: the step kernel's pass count scales with cap, so cap-8
    grids run ~2x faster than cap-16 at equal slot count."""
    from particle_simulator_tpu.engine.simulator import _grid_for
    from particle_simulator_tpu.io.frame import MieParams, PARTICLE_DTYPE
    from particle_simulator_tpu.physics.bucket import REFERENCE_GRID

    r0 = MieParams.nitrogen().force0_r()
    rng = np.random.default_rng(5)
    # a dense uniform lattice (4.4 r0 buckets hold 4x4 particles at 1.1 r0):
    # exactly the regime where cap-8 over a finer grid halves the kernel work
    side = 256
    n = side * side
    parts = np.zeros(n, dtype=PARTICLE_DTYPE)
    box = side * 1.1 * r0
    ix, iy = np.meshgrid(np.arange(side), np.arange(side), indexing="xy")
    parts["x"] = ((ix.ravel() + 0.5) / side * 2**32).astype(np.uint64).astype(np.uint32)
    parts["y"] = ((iy.ravel() + 0.5) / side * 2**32).astype(np.uint64).astype(np.uint32)
    cfg = _grid_for(parts, REFERENCE_GRID, box, r0)
    assert cfg.cap <= 8
    assert cfg.capacity >= n
    # the 3x3 window still covers the force range: bucket side >= 2 r0
    assert box / cfg.bx >= 2.0 * r0
    # a pathologically clumped scene still escalates capacity instead
    clump = parts.copy()
    clump["x"] >>= np.uint32(8)  # squeeze everything into 1/256 of the box
    clump["y"] >>= np.uint32(8)
    cfg2 = _grid_for(clump, REFERENCE_GRID, box, r0)
    bx = (clump["x"] >> np.uint32(32 - cfg2.bx_log2)).astype(np.int64)
    by = (clump["y"] >> np.uint32(32 - cfg2.by_log2)).astype(np.int64)
    occ = np.bincount(by * cfg2.bx + bx, minlength=cfg2.buckets).max()
    assert occ <= cfg2.cap or cfg2.cap == 256


def test_metadata_only_frame_with_garbage_enums_is_ignored():
    """Out-of-range device/data_structure bytes in a metadata-only frame must
    not kill the engine: the running values are kept (pre-switch behavior)."""
    scene = scene_frame(n=6, steps=2)
    sim = Simulator(GridConfig(4, 4, 8))
    sim.load_frame(scene)
    n = scene.particle_count
    before_ds = sim.data_structure
    before_dev = sim.active_device

    f = Frame.new()
    f.header["metadata"] = scene.metadata.copy()
    f.header["metadata"]["device"] = 7  # not a Device
    f.header["metadata"]["data_structure"] = 9  # not a DataStructure
    f.header["metadata"]["steps_per_frame"] = 3
    sim.update_metadata(f)  # must not raise
    assert sim.data_structure == before_ds
    assert sim.active_device == before_dev
    assert int(sim.meta_record["steps_per_frame"]) == 3  # params still applied
    sim.frame_async()
    assert sim.live_count == n


def test_readback_pipeline_depths_ship_identical_streams():
    """The pipelined readback (depth N) must ship the exact same frame
    sequence as the reference's ship-while-computing cadence (depth 0) —
    only the wall-clock at which each frame leaves changes."""
    streams = {}
    for depth in (0, 2):
        server = new_tcp_server(("127.0.0.1", 0))

        def run(port, depth=depth):
            reader, writer = new_tcp_client(("127.0.0.1", port))
            frontend = Frontend(reader, writer, verbose=False)
            sim = Simulator(GridConfig(4, 4, 8))
            while frontend.is_connected:
                f = frontend.read()
                if f is not None and f.particle_count > 0:
                    sim.load_frame(f)
                    break
                time.sleep(0.001)
            main_loop(frontend, sim, max_frames=6, readback_depth=depth)

        t = threading.Thread(target=run, args=(server.addr[1],), daemon=True)
        t.start()
        reader, writer = accept_blocking(server)
        assert writer.write(scene_frame(n=6))
        frames = read_frames(reader, want=6)
        t.join(timeout=30)
        server.close()
        assert len(frames) >= 6
        streams[depth] = [f.bytes for f in frames[:6]]

    assert streams[0] == streams[2], "pipelining changed the shipped stream"


def _scripted_stream(ship_thread: bool, depth: int) -> list[bytes]:
    """Run main_loop over a deterministic scripted frontend and return the
    wire byte stream. The script injects the two reorder hazards mid-stream:
    a live metadata edit (poll 2) and a full scene reset (poll 4) — arrival
    is keyed to the poll count, which is iteration-deterministic, so every
    (ship_thread, depth) combination sees identical inputs."""

    class ScriptedFrontend:
        is_connected = True

        def __init__(self):
            self.polls = 0
            self.sent = []  # wire order (worker thread appends under the GIL)

        def read(self):
            self.polls += 1
            if self.polls == 2:
                edit = Frame.new()
                edit.metadata.steps_per_frame = 7
                assert edit.particle_count == 0
                return edit
            if self.polls == 4:
                return scene_frame(n=5, steps=3)
            return None

        def write(self, frame):
            self.sent.append(frame.bytes)

    frontend = ScriptedFrontend()
    sim = Simulator(GridConfig(4, 4, 8))
    sim.load_frame(scene_frame(n=6, steps=2))
    shipped = main_loop(frontend, sim, max_frames=8, readback_depth=depth,
                        ship_thread=ship_thread)
    assert shipped == 8
    assert len(frontend.sent) == 8
    return frontend.sent


def test_ship_worker_wire_stream_identical():
    """main_loop's docstring claims the ship worker leaves the wire byte
    stream IDENTICAL to inline shipping (engine/daemon.py: 'Single consumer,
    FIFO queue'). A/B ship_thread True vs False at depths 0 and 2, across a
    live metadata edit and a mid-stream scene reset — the two hazards where
    a reordering worker would diverge (the reference's overlap never
    reorders either, cuda_simulator.cu:7-26). VERDICT r4 item 4."""
    streams = {
        (ship, depth): _scripted_stream(ship, depth)
        for ship in (False, True)
        for depth in (0, 2)
    }
    for depth in (0, 2):
        assert streams[(True, depth)] == streams[(False, depth)], (
            f"ship worker changed the wire stream at depth {depth}")
    # and depth itself must not reorder (pending flushes before a reset)
    assert streams[(False, 0)] == streams[(False, 2)]


def test_ship_worker_exception_downgrades_to_disconnect():
    """A ship-worker crash (here: the TCP send raising) must mark the
    frontend disconnected and let main_loop drain and return — never
    deadlock on the bounded ship queue (engine/daemon.py:244-263)."""

    class ExplodingFrontend:
        is_connected = True

        def __init__(self):
            self.wrote = 0

        def read(self):
            return None

        def write(self, frame):
            self.wrote += 1
            if self.wrote >= 3:
                raise OSError("simulated broken pipe")

    frontend = ExplodingFrontend()
    sim = Simulator(GridConfig(4, 4, 8))
    sim.load_frame(scene_frame(n=6, steps=2))

    result = {}

    def run():
        result["shipped"] = main_loop(
            frontend, sim, max_frames=32, readback_depth=1, ship_thread=True)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=120)
    assert not t.is_alive(), "main_loop deadlocked after a ship-worker crash"
    assert frontend.is_connected is False
    # frames 1..2 hit the wire; the crashing 3rd (and later) never count
    assert result["shipped"] == 2


def test_compilation_cache_persists_executables(tmp_path):
    """VERDICT r2 item 6: the persistent jax compilation cache writes
    serialized executables so daemon restarts skip recompiles. Uses a
    subprocess so the cache config doesn't leak into other tests."""
    import subprocess
    import sys
    from pathlib import Path

    cache = tmp_path / "jax_cache"
    prog = (
        "from particle_simulator_tpu.utils.compile_cache import "
        "enable_compilation_cache\n"
        f"assert enable_compilation_cache({str(cache)!r})\n"
        "import jax, jax.numpy as jnp\n"
        # the env var alone is not enough: the axon TPU plugin self-selects
        # regardless, and its first device op BLOCKS on the single-tenant
        # tunnel lease if any chip job is running (observed: this subprocess
        # timing out at 300 s during a concurrent phase-sweep run)
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "f = jax.jit(lambda x: jnp.sin(x) * 2.0 + jnp.cumsum(x))\n"
        "np.asarray(f(jnp.arange(128, dtype=jnp.float32)))\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # min_compile_time gate is 0.5 s; force caching of this tiny program
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    subprocess.run(
        [sys.executable, "-c", prog],
        env=env, cwd=str(Path(__file__).parent.parent), check=True,
        timeout=300,  # a cold jax import can take minutes under CI load
    )
    entries = list(cache.iterdir())
    assert entries, "no cache entries written"

    # disabled via empty string: no config touched
    from particle_simulator_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    assert enable_compilation_cache("") is None


def test_pallas_cache_key_is_caller_stack_stable(tmp_path):
    """The persistent-cache key must not depend on WHO calls the frame
    program. Pallas serializes its Mosaic module into the custom call's
    backend_config with MLIR locations built from the full Python stack at
    trace time; jax's cache-key canonicalization (strip-debuginfo) cannot
    reach into that payload, so without the
    jax_include_full_tracebacks_in_locations=False pin in
    enable_compilation_cache the same program hashes differently from
    bench.py vs the daemon and every entry point pays its own multi-minute
    Mosaic compile (measured on chip r4: 282 s of first-frames in a daemon
    started 50 min after bench.py compiled the identical program; the two
    cached executables differed only in embedded source paths).

    Two subprocesses lower the SAME frame program for the TPU target
    through differently-named caller chains and print the canonicalized-IR
    sha the cache key hashes; the shas must match."""
    import subprocess
    import sys
    from pathlib import Path

    prog = (
        "import sys, hashlib\n"
        "from particle_simulator_tpu.utils.compile_cache import "
        "enable_compilation_cache\n"
        f"assert enable_compilation_cache({str(tmp_path / 'ck')!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from particle_simulator_tpu.physics.bucket import GridConfig\n"
        "from particle_simulator_tpu.engine.state import empty_state\n"
        "from particle_simulator_tpu.engine.simulator import "
        "_run_bucket_pallas, SimParams\n"
        "from particle_simulator_tpu.io.frame import default_metadata\n"
        "cfg = GridConfig(4, 4, 8)\n"
        "params = SimParams.from_record(default_metadata())\n"
        "state = empty_state(cfg.grid_shape)\n"
        "def lower_now():\n"
        "    t = _run_bucket_pallas.trace(state, params, block_rows=8,\n"
        "        lane_chunks=1, ext_io=False, compact_tiles=True)\n"
        "    return t.lower(lowering_platforms=('tpu',))\n"
        "def bench_like_caller():\n"
        "    return lower_now()\n"
        "def daemon_like_caller_with_another_name():\n"
        "    return bench_like_caller() if False else lower_now()\n"
        "low = (bench_like_caller() if sys.argv[1] == 'a'\n"
        "       else daemon_like_caller_with_another_name())\n"
        "from jax._src import cache_key as ck\n"
        "ir = ck._canonicalize_ir(low._lowering.stablehlo(),\n"
        "                         ck.IgnoreCallbacks.NO)\n"
        "print('CANON', hashlib.sha256(ir).hexdigest())\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    shas = {}
    for mode in ("a", "b"):
        out = subprocess.run(
            [sys.executable, "-c", prog, mode],
            env=env, cwd=str(Path(__file__).parent.parent), check=True,
            capture_output=True, text=True, timeout=600,
        )
        shas[mode] = [l for l in out.stdout.splitlines()
                      if l.startswith("CANON")][-1]
    assert shas["a"] == shas["b"], (
        "canonical IR depends on the caller stack — the Mosaic payload "
        "embeds trace-time source locations again; check the "
        "jax_include_full_tracebacks_in_locations pin in "
        "utils/compile_cache.py"
    )


def test_progressive_compile_serves_jnp_then_switches(monkeypatch):
    """Progressive kernel compile (engine/simulator.py _pallas_warm): a cold
    grid shape is served through the jnp runner while the Pallas program
    compiles on a background thread, then frame_async switches over. The
    Pallas entry point is stubbed with a gate so the compile window is
    deterministic."""
    import jax

    from particle_simulator_tpu.engine import simulator as sim_mod
    from particle_simulator_tpu.io.frame import Device

    gate = threading.Event()
    calls = []

    def fake_pallas(state, params, block_rows=None, lane_chunks=1, **kw):
        calls.append((block_rows, lane_chunks))
        assert gate.wait(30.0), "test gate never released"
        return sim_mod._run_bucket(state, params)

    monkeypatch.setattr(sim_mod, "_run_bucket_pallas", fake_pallas)

    sim = Simulator(GridConfig(4, 4, 8))
    # force the accelerator branch onto the CPU device so the GPU path runs
    sim.accel = jax.devices("cpu")[0]
    sim.progressive_compile = True
    sim.load_frame(scene_frame(n=6, steps=3))
    assert sim.active_device == Device.GPU

    # frame 1: cold shape -> compile thread spawned (blocked on the gate),
    # frame served by the jnp runner (the stub records no synchronous call)
    sim.frame_async()
    key = next(iter(sim._pallas_status))
    assert sim._pallas_status[key] == "compiling"
    # the compile call happens on the background thread — wait for it to
    # actually be scheduled (under full-suite load that can lag)
    deadline = time.monotonic() + 30.0
    while len(calls) < 1 and time.monotonic() < deadline:
        time.sleep(0.005)
    assert len(calls) == 1  # the background thread's compile call only
    before = sim.read_frame()
    assert before.particle_count > 0

    # frame 2: still compiling -> jnp again, no second compile thread
    sim.frame_async()
    assert len(calls) == 1
    assert sim._pallas_status[key] == "compiling"

    # release the compile; wait for the status flip
    gate.set()
    deadline = time.monotonic() + 30.0
    while sim._pallas_status[key] != "ok" and time.monotonic() < deadline:
        time.sleep(0.005)
    assert sim._pallas_status[key] == "ok"

    # frame 3: switched over — the Pallas entry point now runs synchronously
    sim.frame_async()
    assert len(calls) == 2
    after = sim.read_frame()
    assert np.isfinite(after.particles["vx"]).all()


def test_sharded_progressive_compile_serves_jnp_then_switches(monkeypatch):
    """Sharded-path progressive compile (engine/simulator.py _sharded_warm):
    a cold sharded Pallas signature is served through the sharded-jnp runner
    while the Pallas program compiles on a background thread, then
    frame_async switches over — the daemon with --devices N never blocks its
    loop on a multi-minute Mosaic compile. Kernel selection and the Pallas
    frame-fn builder are stubbed so the compile window is deterministic."""
    import jax

    from particle_simulator_tpu.engine import simulator as sim_mod
    from particle_simulator_tpu.parallel import domain as dom

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    gate = threading.Event()
    calls = []
    real_make = dom.make_sharded_frame_fn

    def fake_make(cfg, mesh, donate=True, kernel="jnp", lane_chunks=1):
        if kernel != "pallas":
            return real_make(cfg, mesh, donate=donate, kernel=kernel,
                             lane_chunks=lane_chunks)
        inner = real_make(cfg, mesh, donate=donate, kernel="jnp")

        def gated(state, p):
            calls.append(kernel)
            assert gate.wait(30.0), "test gate never released"
            return inner(state, p)

        return gated

    monkeypatch.setattr(dom, "make_sharded_frame_fn", fake_make)
    monkeypatch.setattr(sim_mod, "_sharded_step_kernel", lambda: "pallas")

    from particle_simulator_tpu.parallel.domain import make_mesh

    sim = Simulator(GridConfig(4, 4, 8), mesh=make_mesh(n_devices=8))
    sim.progressive_compile = True
    sim.load_frame(scene_frame(n=6, steps=3))

    # frame 1: cold sharded signature -> interim sharded-jnp + compile thread
    sim.frame_async()
    assert sim.active_kernel == "sharded-jnp-interim"
    key = ("sharded", sim.grid, sim.mesh, sim._lane_chunks)
    assert sim._pallas_status[key] == "compiling"
    deadline = time.monotonic() + 30.0
    while len(calls) < 1 and time.monotonic() < deadline:
        time.sleep(0.005)
    assert len(calls) == 1  # the background thread's dummy dispatch only
    before = sim.read_frame()
    assert before.particle_count > 0

    # frame 2: still compiling -> interim again, no second compile thread
    sim.frame_async()
    assert sim.active_kernel == "sharded-jnp-interim"
    assert len(calls) == 1

    gate.set()
    deadline = time.monotonic() + 30.0
    while sim._pallas_status[key] != "ok" and time.monotonic() < deadline:
        time.sleep(0.005)
    assert sim._pallas_status[key] == "ok"

    # frame 3: switched over to the (stubbed) sharded Pallas program
    sim.frame_async()
    assert sim.active_kernel == "sharded-pallas"
    assert len(calls) == 2
    after = sim.read_frame()
    assert np.isfinite(after.particles["vx"]).all()


def test_progressive_compile_failure_pins_jnp(monkeypatch):
    """A failed Pallas compile (device limits, etc.) must pin the signature
    to the jnp runner — no retry storm, no crash."""
    import jax

    from particle_simulator_tpu.engine import simulator as sim_mod

    def broken_pallas(state, params, block_rows=None, lane_chunks=1, **kw):
        raise RuntimeError("mosaic says no")

    monkeypatch.setattr(sim_mod, "_run_bucket_pallas", broken_pallas)

    sim = Simulator(GridConfig(4, 4, 8))
    sim.accel = jax.devices("cpu")[0]
    sim.progressive_compile = True
    sim.load_frame(scene_frame(n=6, steps=3))

    sim.frame_async()
    key = next(iter(sim._pallas_status))
    deadline = time.monotonic() + 30.0
    while sim._pallas_status[key] == "compiling" and time.monotonic() < deadline:
        time.sleep(0.005)
    assert sim._pallas_status[key] == "failed"

    # frames keep flowing on the jnp runner; the status stays pinned
    for _ in range(3):
        sim.frame_async()
    assert sim._pallas_status[key] == "failed"
    out = sim.read_frame()
    assert np.isfinite(out.particles["vx"]).all()


def test_warm_start_marks_progressive_signature_hot(monkeypatch):
    """The daemon's warm-start thread must register its compiled signature
    with the progressive-compile gate, so the out-of-box default scene's
    first frame goes straight to the Pallas kernel (no interim jnp detour)."""
    import jax

    from particle_simulator_tpu.engine import simulator as sim_mod
    from particle_simulator_tpu.io.frame import Frame
    from particle_simulator_tpu.io.presets import ParticleLattice

    calls = []

    def fake_pallas(state, params, block_rows=None, lane_chunks=1, **kw):
        calls.append((block_rows, lane_chunks))
        return sim_mod._run_bucket(state, params)

    monkeypatch.setattr(sim_mod, "_run_bucket_pallas", fake_pallas)

    sim = Simulator()
    sim.accel = jax.devices("cpu")[0]
    sim.progressive_compile = True
    sim.warm_default_grid()
    assert list(sim._pallas_status.values()) == ["ok"]
    assert len(calls) == 1

    # the ACTUAL default editor scene (the same lattice warm derives from)
    frame = Frame.new()
    meta = frame.metadata
    lat = ParticleLattice((50, 50), distance_factor=1.1)
    lat.hex_square(frame, (meta.box_width / 2, meta.box_height / 2),
                   rng=np.random.default_rng(0))
    frame.metadata.steps_per_frame = 2
    sim.load_frame(frame)
    sim.frame_async()
    # Pallas ran synchronously: warm key == frame key, no compile thread
    assert len(calls) == 2
    assert list(sim._pallas_status.values()) == ["ok"]


def test_sharded_warm_start_covers_default_grid(monkeypatch):
    """With a mesh (--devices N), the warm-start thread compiles the SHARDED
    Pallas program for the default grid and registers it with the
    progressive gate — the out-of-box default scene's first sharded frame
    goes straight to it, no interim sharded-jnp detour."""
    import jax

    from particle_simulator_tpu.engine import simulator as sim_mod
    from particle_simulator_tpu.io.frame import Frame
    from particle_simulator_tpu.io.presets import ParticleLattice
    from particle_simulator_tpu.parallel import domain as dom
    from particle_simulator_tpu.parallel.domain import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    calls = []
    real_make = dom.make_sharded_frame_fn

    def fake_make(cfg, mesh, donate=True, kernel="jnp", lane_chunks=1):
        if kernel != "pallas":
            return real_make(cfg, mesh, donate=donate, kernel=kernel,
                             lane_chunks=lane_chunks)
        inner = real_make(cfg, mesh, donate=donate, kernel="jnp")

        def fn(state, p):
            calls.append(cfg)
            return inner(state, p)

        return fn

    monkeypatch.setattr(dom, "make_sharded_frame_fn", fake_make)
    monkeypatch.setattr(sim_mod, "_sharded_step_kernel", lambda: "pallas")

    sim = Simulator(mesh=make_mesh(n_devices=8))
    sim.accel = jax.devices("cpu")[0]
    sim.progressive_compile = True
    sim.warm_default_grid()
    assert list(sim._pallas_status.values()) == ["ok"]
    assert len(calls) == 1

    # the ACTUAL default editor scene (the same lattice warm derives from)
    frame = Frame.new()
    meta = frame.metadata
    lat = ParticleLattice((50, 50), distance_factor=1.1)
    lat.hex_square(frame, (meta.box_width / 2, meta.box_height / 2),
                   rng=np.random.default_rng(0))
    frame.metadata.steps_per_frame = 2
    sim.load_frame(frame)
    sim.frame_async()
    # the sharded Pallas program ran synchronously: warm key == frame key
    assert sim.active_kernel == "sharded-pallas"
    assert len(calls) == 2
    assert list(sim._pallas_status.values()) == ["ok"]
    out = sim.read_frame()
    assert np.isfinite(out.particles["vx"]).all()


def test_sharded_sibling_lane_chunk_warm(monkeypatch):
    """warm_sibling_lane_chunks over a mesh compiles the grid's OTHER
    sharded lane-chunk signature (r3 weak item 4's sharded leg): the key it
    registers is exactly what frame_async's _sharded_warm would claim."""
    import jax

    from particle_simulator_tpu.engine import simulator as sim_mod
    from particle_simulator_tpu.parallel import domain as dom
    from particle_simulator_tpu.parallel.domain import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    real_make = dom.make_sharded_frame_fn

    def fake_make(cfg, mesh, donate=True, kernel="jnp", lane_chunks=1):
        if kernel != "pallas":
            return real_make(cfg, mesh, donate=donate, kernel=kernel,
                             lane_chunks=lane_chunks)
        return real_make(cfg, mesh, donate=donate, kernel="jnp")

    monkeypatch.setattr(dom, "make_sharded_frame_fn", fake_make)

    # a grid with a valid split: bx*cap = 256*8 = 2048, c=2 -> width 1024
    grid = GridConfig(8, 4, 8)
    assert sim_mod._lane_chunk_candidates(grid) == [2]

    sim = Simulator(grid, mesh=make_mesh(n_devices=8))
    sim.accel = jax.devices("cpu")[0]
    sim.load_frame(scene_frame(n=6, steps=2))
    sim.grid = grid  # pin: _grid_for may shrink the grid for a tiny scene
    sim._lane_chunks = 1
    n = sim.warm_sibling_lane_chunks()
    assert n == 1
    key = ("sharded", sim.grid, sim.mesh, 2)
    assert sim._pallas_status.get(key) == "ok"

    # idempotent — the claim is registered, nothing recompiles
    assert sim.warm_sibling_lane_chunks() == 0


def test_live_edit_never_restamps_inflight_frames():
    """A live metadata edit must only stamp frames DISPATCHED after it: the
    ticket queued for an in-flight frame carries the metadata snapshot taken
    at its dispatch, not whatever sim.meta_record says at enqueue time
    (r3 review finding: enqueue ran after update_metadata in the same
    iteration, restamping the old-params frame with the new record)."""

    class StubSim:
        """Tracks, per dispatched frame, the meta epoch it was computed
        under; read_frame logs what each shipped frame was stamped with."""

        def __init__(self):
            self.meta_record = {"steps_per_frame": 3}
            self.state_is_dispatched = True
            self.active_kernel = "bucket-pallas"
            self.dispatched_under = []  # frame id -> steps_per_frame at dispatch
            self.shipped_log = []  # (frame id | None, stamped steps | None)

        def frame_async(self):
            self.dispatched_under.append(self.meta_record["steps_per_frame"])

        def start_readback(self, state=None, hint=False):
            # ticket = last dispatched id; None before any dispatch (the
            # prime echo ships the loaded scene, not a computed frame)
            if not self.dispatched_under:
                return None
            return len(self.dispatched_under) - 1

        def update_metadata(self, frame):
            self.meta_record = {"steps_per_frame": int(frame.metadata.steps_per_frame)}

        def read_frame(self, state=None, meta=None):
            self.shipped_log.append(
                (state, None if meta is None else meta["steps_per_frame"]))
            f = Frame.new()
            if meta is not None:
                f.metadata.steps_per_frame = meta["steps_per_frame"]
            return f

    class ScriptedFrontend:
        """read() returns None except one metadata-only edit on poll #2."""

        is_connected = True

        def __init__(self):
            self.polls = 0
            self.frames = []

        def read(self):
            self.polls += 1
            if self.polls == 2:
                edit = Frame.new()
                edit.metadata.steps_per_frame = 7
                assert edit.particle_count == 0
                return edit
            return None

        def write(self, frame):
            self.frames.append(frame)

    sim = StubSim()
    main_loop(ScriptedFrontend(), sim, max_frames=8, readback_depth=1)

    checked = 0
    for ticket, stamped in sim.shipped_log:
        if ticket is None:
            continue  # the prime echo carries the current record by design
        assert stamped == sim.dispatched_under[ticket], (
            f"frame {ticket} computed under {sim.dispatched_under[ticket]} "
            f"but stamped {stamped}")
        checked += 1
    assert checked >= 5
    # and the edit did take effect for later dispatches
    assert sim.dispatched_under[0] == 3 and sim.dispatched_under[-1] == 7


def test_warm_ahead_overlaps_pinned_first_dispatch(monkeypatch):
    """load_frame must start the scene's Pallas compile on a thread as soon
    as the jit signature is known (grid + block_rows + lane_chunks — derived
    from bucket-id bincount BEFORE the full bucketize), and the pinned-mode
    first frame_async must JOIN that thread instead of tracing the same
    program twice (VERDICT r4 item 6: the warm-restart floor serialized
    executable-deserialize after scene-load)."""
    import jax

    from particle_simulator_tpu.engine import simulator as sim_mod

    monkeypatch.setenv("PS_WARM_AHEAD", "1")
    calls = []

    def fake_pallas(state, params, block_rows=None, lane_chunks=1, **kw):
        calls.append(lane_chunks)
        return sim_mod._run_bucket(state, params)

    monkeypatch.setattr(sim_mod, "_run_bucket_pallas", fake_pallas)

    sim = Simulator(GridConfig(4, 4, 8))
    sim.accel = jax.devices("cpu")[0]
    sim.load_frame(scene_frame(n=6, steps=2))

    key = next(k for k in sim._pallas_status if not isinstance(k[0], str))
    assert key == (sim.grid, 8, sim._lane_chunks)
    assert key in sim._warm_threads, "load_frame did not spawn the warm-ahead"

    sim.frame_async()  # pinned mode: joins the warm, then dispatches
    assert key not in sim._warm_threads
    assert sim._pallas_status[key] == "ok"
    assert sim.active_kernel == "bucket-pallas"
    # dummy warm + real dispatch — and the real one reused the warm claim
    # rather than re-claiming (no third call, no duplicate status key)
    assert len(calls) == 2
    assert len(sim._pallas_status) == 1

    # the shipped state is byte-identical to a run without warm-ahead
    ref_sim = Simulator(GridConfig(4, 4, 8))
    ref_sim.accel = jax.devices("cpu")[0]
    monkeypatch.setenv("PS_WARM_AHEAD", "0")
    ref_sim.load_frame(scene_frame(n=6, steps=2))
    ref_sim.frame_async()
    assert not ref_sim._warm_threads
    import numpy as np

    for name, a, b in zip(sim.state._fields, sim.state, ref_sim.state):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_last_scene_signature_persists_and_warms(monkeypatch, tmp_path):
    """load_frame persists the scene's jit signature next to the compile
    cache, and a FRESH Simulator's warm_last_scene pre-claims + compiles that
    exact signature (grid, block_rows, lane_chunks) — so a daemon restart
    deserializes the scene's executable during the handshake instead of
    inside first-frames (VERDICT r4 item 6). A pinned first dispatch then
    waits on that foreign claim via _join_warm instead of tracing the same
    program on a second thread."""
    import threading

    import jax

    from particle_simulator_tpu.engine import simulator as sim_mod

    monkeypatch.setenv("PS_TPU_COMPILE_CACHE", str(tmp_path / "jax_cache"))
    monkeypatch.setenv("PS_WARM_AHEAD", "0")
    calls = []

    def fake_pallas(state, params, block_rows=None, lane_chunks=1, **kw):
        calls.append((block_rows, lane_chunks))
        return sim_mod._run_bucket(state, params)

    monkeypatch.setattr(sim_mod, "_run_bucket_pallas", fake_pallas)

    sim = Simulator(GridConfig(4, 4, 8))
    sim.accel = jax.devices("cpu")[0]
    sim.load_frame(scene_frame(n=6, steps=2))
    sig_path = tmp_path / "last_scene.json"
    assert sig_path.exists(), "load_frame did not persist the signature"

    # "restarted daemon": a fresh Simulator warms the persisted signature
    sim2 = Simulator(GridConfig(4, 4, 8))
    sim2.accel = jax.devices("cpu")[0]
    key = (sim.grid, 8, sim._lane_chunks)
    # run the warmer on a thread (as serve() does) while the scene loads,
    # then dispatch pinned: _join_warm must wait out the foreign claim
    t = threading.Thread(target=sim2.warm_last_scene)
    t.start()
    sim2.load_frame(scene_frame(n=6, steps=2))
    sim2.frame_async()
    t.join(timeout=60)
    assert sim2._pallas_status.get(key) == "ok"
    assert sim2.active_kernel == "bucket-pallas"
    # exactly one warm dummy per Simulator + the real dispatch — no
    # duplicated compile claims
    assert len(sim2._pallas_status) == 1

    # a signature from a different mesh topology is skipped
    (tmp_path / "last_scene.json").write_text(
        sig_path.read_text().replace('"mesh": null', '"mesh": [2, 4]')
    )
    sim3 = Simulator(GridConfig(4, 4, 8))
    sim3.accel = jax.devices("cpu")[0]
    sim3.warm_last_scene()
    assert sim3._pallas_status == {}


def test_warm_sibling_lane_chunks_covers_the_other_signature(monkeypatch):
    """warm_sibling_lane_chunks compiles the grid's OTHER realistic
    lane-chunk signature ({largest valid split, 1} minus the active one) so
    'warm' compile caches are per-grid, not per-occupancy (r3: a webview
    lattice paid a fresh multi-minute Mosaic compile on a machine bench.py
    had just warmed). Idempotent: a second call finds the claims set."""
    import jax

    from particle_simulator_tpu.engine import simulator as sim_mod

    calls = []

    def fake_pallas(state, params, block_rows=None, lane_chunks=1, **kw):
        calls.append(lane_chunks)
        return sim_mod._run_bucket(state, params)

    monkeypatch.setattr(sim_mod, "_run_bucket_pallas", fake_pallas)

    # a grid with a valid split: bx*cap = 256*8 = 2048, c=2 -> width 1024
    grid = GridConfig(8, 4, 8)  # bx = 2^8 = 256, by = 16, cap 8
    assert sim_mod._lane_chunk_candidates(grid) == [2]

    sim = Simulator(grid)
    sim.accel = jax.devices("cpu")[0]
    frame = scene_frame(n=6, steps=2)
    sim.load_frame(frame)
    sim.grid = grid  # pin: _grid_for may shrink the grid for a tiny scene
    active = sim._lane_chunks

    n = sim.warm_sibling_lane_chunks()
    expect = sorted({2, 1} - {active})
    assert n == len(expect)
    assert calls == expect
    for c in expect:
        key = next(k for k in sim._pallas_status if k[2] == c)
        assert sim._pallas_status[key] == "ok"

    # idempotent — nothing recompiles
    assert sim.warm_sibling_lane_chunks() == 0
    assert calls == expect


def test_warm_sibling_lane_chunks_noops_off_accelerator():
    sim = Simulator(GridConfig(4, 4, 8))
    sim.accel = None
    sim.load_frame(scene_frame(n=6, steps=2))
    assert sim.warm_sibling_lane_chunks() == 0


def test_live_threads_per_block_edit_applies_without_reset(monkeypatch):
    """A live gpu_threads_per_block_log2 edit takes effect WITHOUT a scene
    reset when progressive compile is on (VERDICT r3 parity tail): the new
    block_rows is treated as a cold signature — frames keep flowing on the
    interim jnp runner while it compiles, then the Pallas kernel switches to
    the new launch width (the reference applies launch config every
    dispatch, kernel_bucket.cuh:118-121)."""
    import jax

    from particle_simulator_tpu.engine import simulator as sim_mod

    calls = []

    def fake_pallas(state, params, block_rows=None, lane_chunks=1, **kw):
        calls.append(block_rows)
        return sim_mod._run_bucket(state, params)

    monkeypatch.setattr(sim_mod, "_run_bucket_pallas", fake_pallas)

    sim = Simulator(GridConfig(4, 4, 8))
    sim.accel = jax.devices("cpu")[0]
    sim.progressive_compile = True
    scene = scene_frame(n=6, steps=2)
    scene.metadata.gpu_threads_per_block_log2 = 7  # -> block_rows 8
    sim.load_frame(scene)

    def wait_ok():
        deadline = time.monotonic() + 30.0
        while (any(v == "compiling" for v in sim._pallas_status.values())
               and time.monotonic() < deadline):
            time.sleep(0.005)

    sim.frame_async()  # cold signature A: interim jnp + background compile
    wait_ok()
    sim.frame_async()  # now on pallas, block_rows 8
    assert sim.active_kernel == "bucket-pallas"
    assert calls[-1] == 8

    # live edit: metadata-only frame changes the launch width (2^5 -> rows 2)
    edit = Frame.new()
    edit.header["metadata"] = scene.metadata.copy()
    edit.metadata.gpu_threads_per_block_log2 = 5
    assert edit.particle_count == 0
    sim.update_metadata(edit)
    assert int(sim.meta_record["gpu_threads_per_block_log2"]) == 5

    sim.frame_async()  # cold signature B: frames still flow (interim jnp)
    assert sim.active_kernel in ("bucket-jnp-interim", "bucket-pallas")
    wait_ok()
    sim.frame_async()
    assert sim.active_kernel == "bucket-pallas"
    assert calls[-1] == 2  # the NEW launch width is live — no scene reset
    out = sim.read_frame()
    assert np.isfinite(out.particles["vx"]).all()


def test_threads_per_block_edit_defers_without_progressive():
    """Without the progressive machinery the edit defers to the next
    re-layout (the zero-recompile invariant for measurement runs)."""
    sim = Simulator(GridConfig(4, 4, 8))
    scene = scene_frame(n=6, steps=2)
    scene.metadata.gpu_threads_per_block_log2 = 7
    sim.load_frame(scene)
    edit = Frame.new()
    edit.header["metadata"] = scene.metadata.copy()
    edit.metadata.gpu_threads_per_block_log2 = 5
    sim.update_metadata(edit)
    assert int(sim.meta_record["gpu_threads_per_block_log2"]) == 7
