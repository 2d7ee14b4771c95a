"""Frame codec tests: byte layout, roundtrips, compaction, metadata.

These are the unit tests the reference only sketched in comments
(particle_io/src/lib.rs:13-53, reader.rs:114-149, writer.rs:30-66), revived.
"""

import numpy as np
import pytest

from particle_simulator_tpu.io.frame import (
    DataStructure,
    Device,
    Frame,
    HEADER_SIZE,
    MieParams,
    PARTICLE_DTYPE,
    PARTICLE_SIZE,
    SIGNATURE_END,
    SIGNATURE_START,
    U32_MAX,
    default_metadata,
    packet_size,
)


def test_layout_sizes():
    # These sizes are the wire contract with the reference editor.
    assert HEADER_SIZE == 96
    assert PARTICLE_SIZE == 20
    assert packet_size(0) == 96
    assert packet_size(3) == 96 + 60


def test_signatures_and_field_offsets():
    f = Frame.new()
    raw = f.bytes
    assert raw[:4] == SIGNATURE_START
    assert raw[88:92] == SIGNATURE_END
    # particle_count at offset 4
    assert raw[4:8] == b"\x00\x00\x00\x00"
    # metadata starts at offset 8 with particles[0].sigma (Nitrogen)
    assert np.frombuffer(raw[8:12], dtype="<f4")[0] == np.float32(3.609e-10)


def test_default_metadata_matches_reference_defaults():
    m = Frame.new().metadata
    assert m.step_dt == np.float32(50e-15)
    assert m.steps_per_frame == 100
    assert m.box_width == np.float32(50e-9)
    assert m.box_height == np.float32(50e-9)
    assert m.data_structure == DataStructure.MATRIX_BUCKETS
    assert m.device == Device.GPU
    assert m.gpu_threads_per_block_log2 == 7
    assert tuple(m.cursor_pos) == (-1.0, -1.0)
    n = m.species(0)
    assert n.n == np.float32(14.08)
    ar = m.species(1)
    assert ar.sigma == np.float32(3.404e-10)


def test_force0_r():
    # Equilibrium distance: sigma * (n/m)^(1/(n-m))
    p = MieParams(sigma=2.0, epsilon=1.0, n=12.0, m=6.0)
    assert p.force0_r() == pytest.approx(2.0 * 2.0 ** (1.0 / 6.0))


def test_push_drop_clear_roundtrip():
    f = Frame.new()
    m = f.metadata
    for i in range(5):
        f.push(m.new_particle((i * 1e-9 + 1e-9, 2e-9), (1.0, -1.0), ty=0))
    assert f.particle_count == 5
    assert len(f.bytes) == packet_size(5)

    g = Frame.from_bytes(f.bytes)
    assert g == f
    assert g.is_valid()
    np.testing.assert_array_equal(g.particles, f.particles)

    f.drop(2)
    assert f.particle_count == 3
    f.clear()
    assert f.particle_count == 0
    assert len(f.bytes) == HEADER_SIZE


def test_new_particle_fixed_point():
    f = Frame.new()
    m = f.metadata
    p = m.new_particle((m.box_width / 2.0, m.box_height / 4.0), (3.0, 4.0), ty=1)
    assert p["x"] == round(U32_MAX / 2.0)
    assert p["y"] == round(U32_MAX / 4.0)
    assert p["vx"] == np.float32(3.0)
    assert p["ty"] == 1


def test_compact_drops_tombstones_in_order():
    f = Frame.new()
    parts = np.zeros(6, dtype=PARTICLE_DTYPE)
    parts["x"] = np.arange(6)
    parts["ty"] = [0, -1, 1, -1, -1, 2]
    f.extend(parts)
    f.compact()
    assert f.particle_count == 3
    np.testing.assert_array_equal(f.particles["x"], [0, 2, 5])
    np.testing.assert_array_equal(f.particles["ty"], [0, 1, 2])


def test_compact_into():
    f = Frame.new()
    f.metadata.step_dt = 1e-15
    parts = np.zeros(4, dtype=PARTICLE_DTYPE)
    parts["x"] = [10, 11, 12, 13]
    parts["ty"] = [-1, 0, -1, 0]
    f.extend(parts)

    dst = Frame.new()
    f.compact_into(dst)
    assert dst.particle_count == 2
    assert dst.metadata.step_dt == np.float32(1e-15)
    np.testing.assert_array_equal(dst.particles["x"], [11, 13])
    # source untouched
    assert f.particle_count == 4


def test_from_bytes_validation():
    with pytest.raises(ValueError):
        Frame.from_bytes(b"\x00" * 10)
    f = Frame.new()
    f.push(f.metadata.new_particle((1e-9, 1e-9), (0, 0)))
    with pytest.raises(ValueError):
        Frame.from_bytes(f.bytes[:-1] + b"")


def test_metadata_mutation_is_in_place():
    f = Frame.new()
    f.metadata.steps_per_frame = 7
    f.metadata.box_width = 1e-8
    g = Frame.from_bytes(f.bytes)
    assert g.metadata.steps_per_frame == 7
    assert g.metadata.box_width == np.float32(1e-8)


def test_metadata_only_frame_is_96_bytes():
    # particle_count == 0 frames are the live-reconfigure packets.
    f = Frame.from_metadata(default_metadata())
    assert len(f.bytes) == 96
    assert f.particle_count == 0


def test_codec_fuzz_roundtrip():
    """Property test: random metadata + random particles survive
    bytes -> Frame -> bytes exactly (both codec directions)."""
    import numpy as np
    from particle_simulator_tpu.io.frame import (
        Frame,
        HEADER_DTYPE,
        PARTICLE_DTYPE,
        default_metadata,
        packet_size,
    )

    rng = np.random.default_rng(123)
    for _ in range(50):
        n = int(rng.integers(0, 200))
        meta = default_metadata()
        meta["step_dt"] = rng.uniform(1e-16, 1e-13)
        meta["steps_per_frame"] = int(rng.integers(1, 1000))
        meta["box_width"] = rng.uniform(1e-9, 1e-6)
        meta["box_height"] = rng.uniform(1e-9, 1e-6)
        meta["cursor_pos"] = rng.uniform(-1, 2, 2)
        parts = np.zeros(n, dtype=PARTICLE_DTYPE)
        parts["x"] = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        parts["y"] = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        parts["vx"] = rng.normal(0, 1e3, n)
        parts["vy"] = rng.normal(0, 1e3, n)
        parts["ty"] = rng.integers(-2, 3, n)

        frame = Frame.from_particles(meta, parts)
        data = frame.bytes
        assert len(data) == packet_size(n)
        back = Frame.from_bytes(data)
        assert back.is_valid()
        assert back.bytes == data
        assert np.array_equal(back.particles, parts)


def test_presets_persist_roundtrip(tmp_path):
    import numpy as np
    from particle_simulator_tpu.io.frame import Frame
    from particle_simulator_tpu.io.presets import ParticleLattice, Preset, Presets

    frame = Frame.new()
    meta = frame.metadata
    lat = ParticleLattice((5, 5), distance_factor=1.2, velocity=(0.0, 10.0))
    lat.hex_square(frame, (meta.box_width / 2, meta.box_height / 2), rng=np.random.default_rng(0))

    presets = Presets()
    presets.add(Preset.from_frame("droplet scene", frame))
    presets.add(Preset.from_frame("empty/odd name!", Frame.new()))
    presets.save_dir(tmp_path)

    back = Presets.load_dir(tmp_path)
    assert len(back) == 2
    assert back[0].name == "droplet_scene" or back[0].name == "droplet scene".replace(" ", "_")
    assert np.array_equal(back[0].particles, frame.particles)
    assert back[0].to_frame().bytes == presets[0].to_frame().bytes
    assert len(back[1].particles) == 0


def test_from_buffer_zero_copy_and_wire_views():
    """from_buffer + wire_views are the ship-path fast constructors/serializers:
    byte-identical to from_bytes/.bytes, with the particle body a zero-copy
    view (no 20 MB copies at 1M)."""
    import numpy as np
    from particle_simulator_tpu.io.frame import Frame, PARTICLE_DTYPE

    frame = Frame.new()
    parts = np.zeros(7, dtype=PARTICLE_DTYPE)
    parts["x"] = np.arange(7, dtype=np.uint32) * 1000
    parts["y"] = np.arange(7, dtype=np.uint32)[::-1] * 999
    parts["vx"] = np.linspace(-3, 3, 7)
    parts["ty"] = [0, 1, -1, 0, 1, -1, 0]
    frame.extend(parts)
    wire = frame.bytes

    # wire_views reserializes identically, without the full concat
    header, body = frame.wire_views()
    assert header + body.tobytes() == wire

    # from_buffer parses identically to from_bytes and aliases the buffer
    buf = bytearray(wire)
    back = Frame.from_buffer(buf)
    assert back.bytes == wire
    assert np.array_equal(back.particles, frame.particles)
    # mutating the frame's particles writes through to the owned buffer
    back.particles["x"][0] = 0xDEADBEEF
    assert Frame.from_bytes(bytes(buf)).particles["x"][0] == 0xDEADBEEF

    # validation parity with from_bytes
    import pytest

    with pytest.raises(ValueError):
        Frame.from_buffer(bytearray(wire[:-1]))
    with pytest.raises(ValueError):
        Frame.from_buffer(bytearray(10))
