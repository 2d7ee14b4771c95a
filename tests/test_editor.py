"""Editor subsystem tests: timeline indexing, loopback backend, interactive
metadata flow, drawing tools, renderer, number formatter.
"""

import numpy as np
import pytest

from particle_simulator_tpu.editor.backend import Backend
from particle_simulator_tpu.editor.core import Editor
from particle_simulator_tpu.editor.render import render_frame, velocity_colors, write_png
from particle_simulator_tpu.editor.timeline import Timeline
from particle_simulator_tpu.editor.tools import (
    LatticeKind,
    Stroke,
    Tool,
    ToolOptions,
    apply_stroke,
    rasterize_stroke,
)
from particle_simulator_tpu.io.frame import Frame
from particle_simulator_tpu.io.presets import ParticleLattice
from particle_simulator_tpu.utils.numfmt import NumFormat, NumFormatter, format_with_underscores


def frame_with(dt=50e-15, spf=100, n=0):
    f = Frame.new()
    f.metadata.step_dt = dt
    f.metadata.steps_per_frame = spf
    if n:
        lat = ParticleLattice((n, n), distance_factor=2.0, velocity=(0.0, 20.0))
        m = f.metadata
        lat.hex_square(f, (m.box_width / 2, m.box_height / 2), rng=np.random.default_rng(0))
    return f


# ---------------------------------------------------------------------------
# timeline (simulation.rs analog)
# ---------------------------------------------------------------------------

def test_timeline_uniform_dt_lookup():
    tl = Timeline()
    for i in range(10):
        tl.push_frame(frame_with())
    dt = frame_with().metadata.frame_dt()
    assert tl.frame_count == 10
    assert tl.sim_len() == pytest.approx(9 * dt)
    # nearest-frame rounding
    frame, exact = tl.frame(3.4 * dt)
    assert exact == pytest.approx(3 * dt)
    frame, exact = tl.frame(3.6 * dt)
    assert exact == pytest.approx(4 * dt)
    # clamping
    _, exact = tl.frame(-1.0)
    assert exact == 0.0
    _, exact = tl.frame(100 * dt)
    assert exact == pytest.approx(9 * dt)


def test_timeline_dt_change_opens_interval():
    tl = Timeline()
    for _ in range(5):
        tl.push_frame(frame_with(dt=50e-15))
    for _ in range(5):
        tl.push_frame(frame_with(dt=10e-15))  # live dt change
    dt1 = frame_with(dt=50e-15).metadata.frame_dt()
    dt2 = frame_with(dt=10e-15).metadata.frame_dt()
    assert len(tl._intervals) == 2
    assert tl.sim_len() == pytest.approx(4 * dt1 + 5 * dt2)
    # a time inside the second interval finds the right frame spacing
    _, exact = tl.frame(4 * dt1 + 2.9 * dt2)
    assert exact == pytest.approx(4 * dt1 + 3 * dt2)


def test_timeline_ram_and_clear():
    tl = Timeline()
    f = frame_with(n=4)
    tl.push_frame(f)
    assert tl.timeline_ram == len(f.bytes)
    tl.clear()
    assert tl.timeline_ram == 0
    assert tl.frame(0.0) is None


# ---------------------------------------------------------------------------
# backend loopback (backend.rs:160-188)
# ---------------------------------------------------------------------------

def test_loopback_echoes_frames_without_engine():
    backend = Backend(tcp=False)
    assert not backend.is_connected
    scene = frame_with(n=3)
    backend.write(scene)
    got = backend.read()
    assert got is not None and got.bytes == scene.bytes
    assert backend.read() is None


def test_editor_standalone_drawing_appears_in_timeline():
    editor = Editor(Backend(tcp=False))
    editor.send_lattice(5, 5, rng=np.random.default_rng(0))
    editor.tick(0.016)
    assert editor.timeline.frame_count == 1
    assert editor.timeline.last_frame().particle_count == 25


# ---------------------------------------------------------------------------
# interactive metadata flow (editor.rs:223-273)
# ---------------------------------------------------------------------------

def test_interactive_sends_params_only_on_change():
    editor = Editor(Backend(tcp=False))
    # fill the timeline so interactive mode can engage (>2 frames, live edge)
    for _ in range(4):
        editor.backend.write(frame_with(n=2))
        editor.tick(0.016)
    editor.seek_live()  # the timeline's go-to-live button
    assert editor.is_interactive()

    editor.tick(0.016)  # params unchanged since last send
    first_pending = editor.backend.read()  # the one send from engaging
    assert first_pending is None or first_pending.particle_count == 0

    editor.sim_params["cursor_size"] = 0.25
    editor.tick(0.016)
    update = editor.backend.read()
    assert update is not None and update.particle_count == 0
    assert float(update.metadata.cursor_size) == pytest.approx(0.25)

    editor.tick(0.016)  # no further change -> no further send
    assert editor.backend.read() is None


def test_not_interactive_while_editing_or_looping():
    editor = Editor(Backend(tcp=False))
    for _ in range(4):
        editor.backend.write(frame_with(n=2))
        editor.tick(0.016)
    editor.seek_live()
    assert editor.is_interactive()
    editor.loop = True
    assert not editor.is_interactive()
    editor.loop = False
    editor.begin_editing()
    assert not editor.is_interactive()
    editor.cancel_editing()
    editor.seek(0.0)
    assert not editor.is_interactive()  # playhead off the live edge


# ---------------------------------------------------------------------------
# drawing tools (editor.rs:481-738)
# ---------------------------------------------------------------------------

def center_stroke(frame, w_frac=0.2, h_frac=0.2):
    m = frame.metadata
    return Stroke(
        points=[(m.box_width / 2, m.box_height / 2)],
        width=m.box_width * w_frac,
        height=m.box_height * h_frac,
    )


def test_brush_spawns_lattice_particles():
    frame = frame_with()
    opts = ToolOptions(tool=Tool.BRUSH, distance_factor=2.0)
    n = apply_stroke(frame, center_stroke(frame), opts, rng=np.random.default_rng(0))
    assert n > 0
    assert frame.particle_count == n
    # particles are inside the stroke AABB
    m = frame.metadata
    xs = frame.particles["x"].astype(float) / 2**32 * m.box_width
    assert np.all(np.abs(xs - m.box_width / 2) <= m.box_width * 0.13)


def test_brush_does_not_double_fill():
    frame = frame_with()
    opts = ToolOptions(tool=Tool.BRUSH, distance_factor=2.0)
    n1 = apply_stroke(frame, center_stroke(frame), opts, rng=np.random.default_rng(0))
    n2 = apply_stroke(frame, center_stroke(frame), opts, rng=np.random.default_rng(0))
    assert n1 > 0 and n2 == 0  # cells already occupied


def test_eraser_removes_only_inside_stroke():
    frame = frame_with(n=10)
    before = frame.particle_count
    opts = ToolOptions(tool=Tool.ERASER, distance_factor=2.0)
    removed = apply_stroke(frame, center_stroke(frame, 0.08, 0.08), opts)
    assert 0 < removed < before
    assert frame.particle_count == before - removed


def test_speed_tool_sets_velocity_at_fixed_angle():
    frame = frame_with(n=10)
    opts = ToolOptions(tool=Tool.SPEED, distance_factor=2.0, velocity=123.0, angle=np.pi / 2)
    n = apply_stroke(frame, center_stroke(frame, 0.08, 0.08), opts)
    assert n > 0
    vx = frame.particles["vx"]
    vy = frame.particles["vy"]
    touched = np.abs(np.hypot(vx, vy) - 123.0) < 1e-3
    assert touched.sum() == n
    # angle pi/2: direction (sin, cos) = (1, 0)
    assert np.allclose(vx[touched], 123.0, atol=1e-3)
    assert np.allclose(vy[touched], 0.0, atol=1e-3)


def test_clear_tool():
    frame = frame_with(n=5)
    n = apply_stroke(frame, center_stroke(frame), ToolOptions(tool=Tool.CLEAR))
    assert n == 25
    assert frame.particle_count == 0


def test_rasterize_respects_bounds():
    frame = frame_with()
    m = frame.metadata
    stroke = Stroke(points=[(0.0, 0.0)], width=m.box_width, height=m.box_height)
    grid = rasterize_stroke(frame, stroke, ToolOptions(distance_factor=2.0))
    assert grid.any()
    assert grid.shape[0] > 1 and grid.shape[1] > 1


# ---------------------------------------------------------------------------
# renderer (graphics.rs / shader.wgsl analog)
# ---------------------------------------------------------------------------

def test_velocity_color_endpoints():
    c = velocity_colors(np.array([0.0, 1e6], np.float32), np.zeros(2, np.float32), 1000.0)
    assert c[0, 2] > c[0, 0]  # slow = blue-ish
    assert c[1, 0] > c[1, 2]  # fast (clamped) = red-ish


def test_render_frame_draws_particles(tmp_path):
    frame = frame_with(n=6)
    img = render_frame(frame, 128, 128)
    background = img[0, 0]
    assert (img != background).any(), "no particles drawn"
    # velocity extrapolation moves the rendering
    img2 = render_frame(frame, 128, 128, sim_time=1e-10, frame_time=0.0)
    assert (img != img2).any()
    # png roundtrip sanity
    path = tmp_path / "f.png"
    write_png(str(path), img)
    data = path.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n" and b"IEND" in data


def test_render_empty_frame():
    img = render_frame(frame_with(), 64, 64)
    assert img.shape == (64, 64, 3)


# ---------------------------------------------------------------------------
# number formatter (the reference's only live unit test, ported)
# ---------------------------------------------------------------------------

def test_format_with_underscores():
    assert format_with_underscores("1234567") == "1_234_567"
    assert format_with_underscores("123") == "123"
    assert format_with_underscores("-1234.5678") == "-1_234.5678"
    assert format_with_underscores("12") == "12"
    assert format_with_underscores("1234") == "1_234"


def test_metric_format():
    f = NumFormatter(NumFormat.METRIC, significant=3)
    assert f.format(50e-9, "m") == "50nm"
    assert f.format(1.38e-23, "J") == "0.0000000138fJ" or "f" in f.format(1.38e-23, "J")
    assert f.format(2_500_000, "") == "2.5M"
    assert f.format(0.0, "s") == "0s"


def test_scientific_format():
    f = NumFormatter(NumFormat.SCIENTIFIC, significant=3)
    s = f.format(50e-15, "s")
    assert "10⁻¹⁴" in s or "10⁻¹³" in s
    assert f.format(0.0) == "0"


def test_dashed_format():
    f = NumFormatter(NumFormat.DASHED, significant=8)
    assert f.format(1234567.0) == "1_234_567"


# ---------------------------------------------------------------------------
# record/replay (the checkpoint story: the frame stream IS the checkpoint)
# ---------------------------------------------------------------------------

def test_record_replay_roundtrip(tmp_path):
    from particle_simulator_tpu.io.transport import Writer

    path = str(tmp_path / "record.bin")
    writer = Writer.open_file(path)
    frames = [frame_with(n=3), frame_with(n=4), frame_with(n=5)]
    for f in frames:
        assert writer.write(f)
    writer.close()

    from particle_simulator_tpu.editor import headless

    out = tmp_path / "png"
    rc = headless.main(["--replay", path, "--render", str(out), "--size", "64"])
    assert rc == 0
    assert len(list(out.glob("*.png"))) == 3


def test_numfmt_and_meter():
    from particle_simulator_tpu.utils.profiling import StepMeter

    m = StepMeter()
    m.tick(100, 1000)
    m.tick(100, 1000)
    r = m.report()
    assert r["total_steps"] == 200
    assert r["steps_per_sec"] > 0


def test_render_styles_differ():
    frame = frame_with(n=6)
    flat = render_frame(frame, 96, 96, style="flat")
    shaded = render_frame(frame, 96, 96, style="shaded")
    assert flat.shape == shaded.shape
    assert (flat != shaded).any()


def test_preset_delete_keeps_open_edit_index_coherent():
    """r3 review finding: deleting a preset while a preset edit is open must
    not let update_preset write the edit back through a stale index onto an
    unrelated preset."""
    editor = Editor(Backend(tcp=False))
    for name, n in (("A", 2), ("B", 3), ("C", 4)):
        f = frame_with(n=n)
        editor.timeline.push_frame(f)
        editor.save_preset(name)
    counts = [p.to_frame().particle_count for p in editor.presets]

    # edit B, delete A: the open edit must follow B down to slot 0
    editor.edit_preset(1)
    editor.delete_preset(0)
    editor.update_preset(name="B-edited")
    assert [p.name for p in editor.presets] == ["B-edited", "C"]
    assert editor.presets[0].to_frame().particle_count == counts[1]
    assert editor.presets[1].to_frame().particle_count == counts[2]

    # edit B-edited, delete it: the edit loses its slot, update no-ops
    editor.edit_preset(0)
    editor.delete_preset(0)
    editor.update_preset(name="ghost")
    assert [p.name for p in editor.presets] == ["C"]
    assert editor.presets[0].to_frame().particle_count == counts[2]
    assert editor.editing  # still a plain edit; cancel works
    editor.cancel_editing()
