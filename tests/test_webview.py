"""Web editor UI tests: HTTP endpoints drive the Editor core."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from particle_simulator_tpu.editor.webview import WebEditor, make_server


@pytest.fixture
def ui():
    web = WebEditor(backend_addr=("127.0.0.1", 0), size=64)
    server = make_server(("127.0.0.1", 0), web)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield web, base
    server.shutdown()
    server.server_close()
    web.close()


def get(base, path):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return r.read()


def post(base, path, body):
    req = urllib.request.Request(base + path, data=json.dumps(body).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.read()


def test_page_and_frame(ui):
    web, base = ui
    page = get(base, "/")
    assert b"canvas" in page
    png = get(base, "/frame.png")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_params_full_surface(ui):
    web, base = ui
    post(base, "/params", {
        "step_dt": 1e-15,
        "steps_per_frame": 42,
        "sigma0": 4e-10,
        "epsilon1": 2e-21,
        "n0": 12.5,
        "data_structure": 0,
        "device": 1,
    })
    sp = web.editor.sim_params
    assert float(sp["step_dt"]) == pytest.approx(1e-15)
    assert int(sp["steps_per_frame"]) == 42
    assert float(sp["particles"][0]["sigma"]) == pytest.approx(4e-10)
    assert float(sp["particles"][1]["epsilon"]) == pytest.approx(2e-21)
    assert float(sp["particles"][0]["n"]) == pytest.approx(12.5)
    assert int(sp["data_structure"]) == 0
    assert int(sp["device"]) == 1


def test_lattice_control_and_stats(ui):
    web, base = ui
    post(base, "/control", {"action": "lattice"})
    # no engine connected: the scene loops back into the timeline on a tick
    import time

    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        stats = json.loads(get(base, "/stats"))
        if stats["frame_count"] >= 1:
            break
        time.sleep(0.05)
    assert stats["frame_count"] >= 1
    assert stats["particle_count"] == 2500
    # the rendered frame differs from an empty canvas
    empty = WebEditor(backend_addr=("127.0.0.1", 0), size=64)
    try:
        assert get(base, "/frame.png") != empty.frame_png()
    finally:
        empty.close()


def test_cursor_endpoint(ui):
    web, base = ui
    post(base, "/cursor", {"x": 0.25, "y": 0.75, "down": True})
    assert web.editor.cursor_down
    np.testing.assert_allclose(
        web.editor.sim_params["cursor_pos"], [0.25, 0.75], rtol=1e-6
    )
    post(base, "/cursor", {"x": 0.25, "y": 0.75, "down": False})
    assert not web.editor.cursor_down


def test_frame_bin_payload(ui):
    """/frame.bin: 40-byte header + 8 bytes/particle, decodable positions."""
    import struct
    import time

    web, base = ui
    post(base, "/control", {"action": "lattice"})
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        raw = get(base, "/frame.bin")
        magic, count = struct.unpack_from("<II", raw, 0)
        assert magic == 0x4E494250
        if count == 2500:
            break
        time.sleep(0.05)
    assert count == 2500
    (frame_time, play_time, play_speed, box_w, box_h,
     vscale, sigma) = struct.unpack_from("<7f", raw, 8)
    (flags,) = struct.unpack_from("<I", raw, 36)
    assert len(raw) == 40 + 8 * count
    assert box_w > 0 and box_h > 0 and vscale >= 1.0 and sigma > 0
    body = np.frombuffer(raw, offset=40,
                         dtype=[("x", "<u2"), ("y", "<u2"), ("vx", "<i2"), ("vy", "<i2")])
    # quantized positions must match the frame's particles to 16-bit precision
    frame, _ = web.editor.display_frame()
    live = frame.particles[frame.particles["ty"] >= 0]
    np.testing.assert_array_equal(np.sort(body["x"]), np.sort(live["x"] >> 16))
    assert not flags & 1  # not editing


def test_brush_stroke_through_http_reaches_live_engine(ui):
    """VERDICT item 4's bar: a brush stroke drawn through the HTTP surface
    spawns particles that arrive at a live engine as a scene reset."""
    import threading as _threading
    import time

    from particle_simulator_tpu.engine.daemon import Frontend, main_loop
    from particle_simulator_tpu.engine.simulator import Simulator
    from particle_simulator_tpu.io.transport import new_tcp_client
    from particle_simulator_tpu.physics.bucket import GridConfig

    web, base = ui
    port = web.editor.backend._server.addr[1]

    def run_engine():
        reader, writer = new_tcp_client(("127.0.0.1", port))
        frontend = Frontend(reader, writer, verbose=False)
        sim = Simulator(GridConfig(4, 4, 8))
        deadline = time.monotonic() + 20
        while frontend.is_connected and time.monotonic() < deadline:
            f = frontend.read()
            if f is not None and f.particle_count > 0:
                sim.load_frame(f)
                break
            time.sleep(0.001)
        else:
            return
        main_loop(frontend, sim, max_frames=30)

    t = _threading.Thread(target=run_engine, daemon=True)
    t.start()

    # draw a horizontal brush stroke across the middle of the canvas
    out = json.loads(post(base, "/tool", {
        "tool": "brush",
        "points": [[0.3, 0.5], [0.7, 0.5]],
        "width_cells": 4,
        "height_cells": 4,
        "lattice": "hex",
        "velocity": 100.0,
        "angle": None,
        "ty": 0,
        "distance_factor": 4.0,  # sparse: nothing drops in a 16x16-cap-8 grid
    }))
    assert out["affected"] > 0
    assert web.editor.editing
    spawned = out["count"]

    post(base, "/control", {"action": "edit_resend"})
    assert not web.editor.editing

    # the engine loads the drawn scene and streams frames with those particles
    deadline = time.monotonic() + 30
    seen = 0
    while time.monotonic() < deadline:
        stats = json.loads(get(base, "/stats"))
        if stats["particle_count"] == spawned and stats["frame_count"] > 2:
            seen = stats["particle_count"]
            break
        time.sleep(0.05)
    assert seen == spawned, "brush-drawn particles never came back from the engine"


def test_eraser_and_speed_tools_through_http(ui):
    web, base = ui
    post(base, "/control", {"action": "lattice", "nx": 10, "ny": 10})
    import time
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        if json.loads(get(base, "/stats"))["frame_count"] >= 1:
            break
        time.sleep(0.05)

    # speed tool: set velocities in the center
    out = json.loads(post(base, "/tool", {
        "tool": "speed", "points": [[0.5, 0.5]],
        "width_cells": 30, "height_cells": 30,
        "velocity": 321.0, "angle": 0.0, "lattice": "hex",
    }))
    assert out["affected"] > 0
    frame, _ = web.editor.display_frame()
    live = frame.particles[frame.particles["ty"] >= 0]
    assert (np.hypot(live["vx"], live["vy"]) > 300).any()

    # eraser: remove them
    before = out["count"]
    out = json.loads(post(base, "/tool", {
        "tool": "eraser", "points": [[0.5, 0.5]],
        "width_cells": 200, "height_cells": 200, "lattice": "hex",
    }))
    assert out["count"] < before
    post(base, "/control", {"action": "edit_cancel"})
    assert not web.editor.editing


def test_presets_crud_through_http(ui):
    web, base = ui
    import time
    post(base, "/control", {"action": "lattice", "nx": 8, "ny": 8})
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        if json.loads(get(base, "/stats"))["frame_count"] >= 1:
            break
        time.sleep(0.05)

    post(base, "/control", {"action": "preset_save", "name": "my scene"})
    lst = json.loads(get(base, "/presets"))
    assert lst == [{"name": "my scene", "count": 64}]

    post(base, "/control", {"action": "preset_send", "index": 0})  # no crash
    post(base, "/control", {"action": "preset_delete", "index": 0})
    assert json.loads(get(base, "/presets")) == []


def test_tool_rejects_unknown_enums_cleanly(ui):
    """Garbage tool/lattice names come back as an error payload, not a 500,
    and don't flip the editor into editing mode."""
    web, base = ui
    out = json.loads(post(base, "/tool", {"tool": "nuke", "points": [[0.5, 0.5]]}))
    assert "error" in out
    out = json.loads(post(base, "/tool", {"tool": "brush", "lattice": "bogus",
                                          "points": [[0.5, 0.5]]}))
    assert "error" in out
    assert not web.editor.editing


def test_page_script_is_structurally_sane():
    """No browser exists in CI, so at minimum the page's JS must be
    structurally sound: balanced (){}[] outside strings/comments, terminated
    strings/template literals, and every element id referenced by
    getElementById present in the markup."""
    import re

    from particle_simulator_tpu.editor.webview import _PAGE

    m = re.search(r"<script>(.*)</script>", _PAGE, re.S)
    assert m, "page has no script"
    js = m.group(1)

    stack = []
    pairs = {")": "(", "]": "[", "}": "{"}
    i, n = 0, len(js)
    state = None  # None | "'"|'"'|'`' | "//" | "/*"
    while i < n:
        c = js[i]
        nxt = js[i + 1] if i + 1 < n else ""
        if state is None:
            if c in "'\"`":
                state = c
            elif c == "/" and nxt == "/":
                state = "//"
                i += 1
            elif c == "/" and nxt == "*":
                state = "/*"
                i += 1
            elif c in "([{":
                stack.append(c)
            elif c in ")]}":
                assert stack and stack[-1] == pairs[c], f"unbalanced {c!r} at {i}"
                stack.pop()
        elif state in ("'", '"', "`"):
            if c == "\\":
                i += 1
            elif c == state:
                state = None
            elif state in ("'", '"') and c == "\n":
                raise AssertionError(f"unterminated string at {i}")
        elif state == "//":
            if c == "\n":
                state = None
        elif state == "/*":
            if c == "*" and nxt == "/":
                state = None
                i += 1
        i += 1
    assert state is None, f"unterminated {state!r}"
    assert not stack, f"unclosed {stack!r}"

    for el_id in set(re.findall(r"getElementById\('([^']+)'\)", js)):
        assert f'id="{el_id}"' in _PAGE, f"script references missing element #{el_id}"


def test_loop_playback_through_http(ui):
    """VERDICT r2 item 7: the loop toggle drives Editor.loop; looping
    playback wraps to the timeline start and disengages interactive mode."""
    import time

    web, base = ui
    post(base, "/control", {"action": "lattice", "nx": 4, "ny": 4})
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        if json.loads(get(base, "/stats"))["frame_count"] >= 1:
            break
        time.sleep(0.05)

    assert not json.loads(get(base, "/stats"))["loop"]
    post(base, "/control", {"action": "toggle_loop"})
    stats = json.loads(get(base, "/stats"))
    assert stats["loop"]
    assert not stats["interactive"]  # is_interactive requires not loop

    # looping playback wraps: push the playhead past the end and tick
    with web.lock:
        web.editor.play_time = web.editor.timeline.sim_len() + 1.0
        web.editor.play_speed = 1.0
        web.editor.tick(0.01)
        assert web.editor.play_time == 0.0

    post(base, "/control", {"action": "toggle_loop"})
    assert not json.loads(get(base, "/stats"))["loop"]


def test_preset_edit_duplicate_update_through_http(ui):
    """VERDICT r2 item 7: preset duplicate and edit/save-back (the reference's
    edit-entry/edit-duplicate buttons, editor.rs:975-1001,1053-1081)."""
    import time

    web, base = ui
    post(base, "/control", {"action": "lattice", "nx": 6, "ny": 6})
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        if json.loads(get(base, "/stats"))["frame_count"] >= 1:
            break
        time.sleep(0.05)

    post(base, "/control", {"action": "preset_save", "name": "orig"})
    post(base, "/control", {"action": "preset_duplicate", "index": 0})
    lst = json.loads(get(base, "/presets"))
    assert [p["name"] for p in lst] == ["orig", "Copy of orig"]
    assert lst[0]["count"] == lst[1]["count"] == 36

    # edit the copy: erase everything, save back to the same slot
    post(base, "/control", {"action": "preset_edit", "index": 1})
    assert json.loads(get(base, "/stats"))["editing"]
    post(base, "/tool", {"tool": "clear", "points": [[0.5, 0.5]],
                         "width_cells": 60, "height_cells": 60})
    post(base, "/control", {"action": "preset_update", "name": "emptied"})
    assert not json.loads(get(base, "/stats"))["editing"]
    lst = json.loads(get(base, "/presets"))
    assert [p["name"] for p in lst] == ["orig", "emptied"]
    assert lst[0]["count"] == 36  # original untouched
    assert lst[1]["count"] == 0

    post(base, "/control", {"action": "preset_rename", "index": 0, "name": "renamed"})
    assert json.loads(get(base, "/presets"))[0]["name"] == "renamed"


def test_preset_persistence_across_restart(tmp_path):
    """VERDICT r2 item 7: presets persist via Presets.save_dir/load_dir when
    --presets-dir is set — a second WebEditor sees the first one's presets."""
    import time

    from particle_simulator_tpu.editor.webview import WebEditor

    d = str(tmp_path / "presets")
    web = WebEditor(backend_addr=("127.0.0.1", 0), size=64, presets_dir=d)
    try:
        with web.lock:
            web.editor.send_lattice(5, 5)
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:
            with web.lock:
                if web.editor.timeline.frame_count >= 1:
                    break
            time.sleep(0.05)
        web.control({"action": "preset_save", "name": "kept"})
        web.control({"action": "preset_save", "name": "dropped"})
        web.control({"action": "preset_delete", "index": 1})
    finally:
        web.close()

    web2 = WebEditor(backend_addr=("127.0.0.1", 0), size=64, presets_dir=d)
    try:
        assert [p.name for p in web2.editor.presets] == ["kept"]
        assert len(web2.editor.presets[0].particles) == 25
    finally:
        web2.close()


def test_clear_and_send_next_wipes_timeline(ui):
    """editor.rs:937-939: with "clear and send next" armed, the next scene
    send clears the timeline first, then the flag disarms."""
    import time

    web, base = ui
    post(base, "/control", {"action": "lattice", "nx": 4, "ny": 4})
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        if json.loads(get(base, "/stats"))["frame_count"] >= 1:
            break
        time.sleep(0.05)
    before = json.loads(get(base, "/stats"))["frame_count"]
    assert before >= 1

    post(base, "/control", {"action": "toggle_send_clear"})
    assert json.loads(get(base, "/stats"))["send_clear"]
    post(base, "/control", {"action": "lattice", "nx": 3, "ny": 3})
    stats = json.loads(get(base, "/stats"))
    assert not stats["send_clear"]  # one-shot
    assert stats["frame_count"] <= 1  # wiped (the new scene may have echoed)


def test_clear_timeline_through_http(ui):
    """The "Clear Timeline" button (editor.rs:1299-1301): frees the stored
    frame history — the RAM gauge drops to zero — without clearing the scene
    or breaking subsequent pushes."""
    import time

    web, base = ui
    post(base, "/control", {"action": "lattice", "nx": 4, "ny": 4})
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        with web.lock:
            web.editor.tick(0.01)  # pump the loopback (no engine attached)
        if json.loads(get(base, "/stats"))["timeline_ram"] > 0:
            break
        time.sleep(0.05)
    assert json.loads(get(base, "/stats"))["timeline_ram"] > 0

    post(base, "/control", {"action": "clear_timeline"})
    stats = json.loads(get(base, "/stats"))
    assert stats["timeline_ram"] == 0
    assert stats["frame_count"] == 0

    # history re-accumulates from subsequent frames (no engine attached
    # here, so push a new scene through the loopback to generate one)
    post(base, "/control", {"action": "lattice", "nx": 4, "ny": 4})
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        with web.lock:
            web.editor.tick(0.01)
        if json.loads(get(base, "/stats"))["timeline_ram"] > 0:
            break
        time.sleep(0.05)
    assert json.loads(get(base, "/stats"))["timeline_ram"] > 0


def test_connect_files_through_http(ui, tmp_path):
    """The reference's "Files / Pipes" backend button (editor.rs:839-841):
    switch the editor backend to file transport — replay an engine-recorded
    stream in, record outgoing scene sends out."""
    import time

    from particle_simulator_tpu.io.frame import Frame
    from particle_simulator_tpu.io.presets import ParticleLattice
    from particle_simulator_tpu.io.transport import Reader, Writer

    web, base = ui

    # an "engine output" recording: two frames with particles
    in_path = tmp_path / "backend_out.bin"
    out_path = tmp_path / "backend_in.bin"
    w = Writer.open_file(str(in_path))
    for i in range(2):
        f = Frame.new()
        lat = ParticleLattice((3 + i, 3), distance_factor=4.0)
        lat.hex_square(
            f, (f.metadata.box_width / 2, f.metadata.box_height / 2),
            rng=np.random.default_rng(i),
        )
        assert w.write(f)
    w.close()

    post(base, "/control", {"action": "connect_files",
                            "in": str(in_path), "out": str(out_path)})
    assert "files" in json.loads(get(base, "/stats"))["connection"]
    # generous: the file reader is a background thread, and this host has one
    # CPU core — a 10 s bound flaked when a chip queue ran concurrently
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        with web.lock:
            web.editor.tick(0.01)
        if json.loads(get(base, "/stats"))["frame_count"] >= 2:
            break
        time.sleep(0.05)
    stats = json.loads(get(base, "/stats"))
    assert stats["frame_count"] >= 2

    # outgoing scene sends land in the out file as valid frames
    post(base, "/control", {"action": "lattice", "nx": 4, "ny": 4})
    with web.lock:
        web.editor.backend._writer._stream.flush()
    r = Reader.open_file(str(out_path))
    deadline = time.monotonic() + 10
    sent = None
    while sent is None and time.monotonic() < deadline:
        sent = r.read()
        time.sleep(0.02)
    r.close()
    assert sent is not None and sent.particle_count == 16

    # a missing in-file is a status line, not a 500
    post(base, "/control", {"action": "connect_files", "in": str(tmp_path / "nope.bin"),
                            "out": str(out_path)})
    assert "files" in json.loads(get(base, "/stats"))["connection"]


def test_lattice_velocity_range_and_species_through_http(ui):
    """The lattice sub-panel knobs (editor.rs:878-925): size, distance
    factor, min/max velocity magnitude, and species reach the generated
    scene through the lattice control."""
    import time

    web, base = ui
    post(base, "/control", {"action": "lattice", "nx": 6, "ny": 5,
                            "distance_factor": 3.0, "vmin": 100.0,
                            "vmax": 200.0, "ty": 1, "hex": False})
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        with web.lock:
            web.editor.tick(0.01)
        if json.loads(get(base, "/stats"))["frame_count"] >= 1:
            break
        time.sleep(0.05)

    frame, _ = web.editor.display_frame()
    live = frame.particles[frame.particles["ty"] >= 0]
    assert len(live) == 30
    assert (live["ty"] == 1).all()
    speed = np.hypot(live["vx"], live["vy"])
    assert (speed >= 100.0 - 1e-3).all() and (speed <= 200.0 + 1e-3).all()


def test_box_size_and_gpu_threads_params_through_http(ui):
    """Box width/height and Gpu threads/block are Parameters-panel inputs in
    the reference (editor.rs:1131-1148,1181-1186); they must reach
    sim_params through /params like every other knob."""
    web, base = ui
    post(base, "/params", {"box_width": 8e-8, "box_height": 2.5e-8,
                           "gpu_threads_per_block_log2": 5})
    sp = web.editor.sim_params
    assert float(sp["box_width"]) == pytest.approx(8e-8)
    assert float(sp["box_height"]) == pytest.approx(2.5e-8)
    assert int(sp["gpu_threads_per_block_log2"]) == 5


def test_selftest_vectors_pin_the_python_spec():
    """The in-page JS self-test replays Python-generated golden vectors; this
    guards the Python half of the contract: the embedded fmtNum expectations
    ARE NumFormatter's output, the PBIN golden independently re-decodes to the
    embedded expectations (struct, not the encoder), and the extrapolation
    rows match extrap_dt_spec. Any real browser asserts the JS half on load
    and POSTs the verdict to /selftest."""
    import base64
    import struct

    from particle_simulator_tpu.editor.webview import (
        extrap_dt_spec,
        selftest_vectors,
    )
    from particle_simulator_tpu.utils.numfmt import NumFormat, NumFormatter

    v = selftest_vectors()

    assert len(v["fmt"]) >= 15
    styles = {c[2] for c in v["fmt"]}
    assert styles == {"metric", "scientific", "dashed"}
    for x, unit, fmt, want in v["fmt"]:
        got = NumFormatter(NumFormat(fmt), significant=4).format(x, unit)
        assert got == want, (x, fmt)

    # LITERAL spec anchors (not just NumFormatter-replays, which would drift
    # with a NumFormatter regression): these pin the vectors to the written
    # spec, including decade boundaries and the >= 1e21 dashed arm
    literal = {
        ("metric", 1500.0, ""): "1.5k",
        ("metric", 5e-14, "s"): "50fs",
        ("metric", 1048576.0, "B"): "1.049MB",
        ("scientific", 6.022e23, ""): "6.022·10²³",
        ("scientific", 1e-7, "s"): "1·10⁻⁷s",
        ("scientific", 1e21, ""): "1·10²¹",
        ("dashed", 1234567.89, ""): "1_235_000",
        ("dashed", 1e21, ""): "1_000_000_000_000_000_000_000",
        ("dashed", -1e21, ""): "-1_000_000_000_000_000_000_000",
    }
    vecmap = {(fmt, x, unit): want for x, unit, fmt, want in v["fmt"]}
    for key, want in literal.items():
        assert key in vecmap, f"literal anchor {key} missing from vectors"
        assert vecmap[key] == want, (key, vecmap[key])

    blob = base64.b64decode(v["pbin"]["b64"])
    exp = v["pbin"]["expected"]
    magic, count, ft, pt, speed, bw, bh, vscale, sigma, flags = struct.unpack_from(
        "<IIfffffffI", blob, 0
    )
    assert magic == 0x4E494250 and count == exp["count"] == 3
    assert flags == exp["flags"]
    for got, key in [(ft, "frameTime"), (pt, "playTime"), (speed, "playSpeed"),
                     (bw, "boxW"), (bh, "boxH"), (vscale, "vscale"),
                     (sigma, "sigma")]:
        assert got == pytest.approx(exp[key], rel=1e-7), key
    assert len(blob) == 40 + 8 * count
    for i in range(count):
        x, y, vx, vy = struct.unpack_from("<HHhh", blob, 40 + 8 * i)
        want = exp["particles"][i]
        assert x / 65535 == pytest.approx(want[0], abs=1e-12)
        assert y / 65535 == pytest.approx(want[1], abs=1e-12)
        # GL SHORT-normalized semantics: clamp(v/32767, -1, 1) * vscale
        assert max(vx / 32767, -1) * vscale == pytest.approx(want[2], rel=1e-9)
        assert max(vy / 32767, -1) * vscale == pytest.approx(want[3], rel=1e-9)
    # the clamp case is actually present (i16 -32768 -> exactly -vscale)
    assert any(p[2] == -vscale or p[3] == -vscale for p in exp["particles"])

    for ft, pt, speed, flags, fetched, now, want in v["extrap"]:
        assert extrap_dt_spec(ft, pt, speed, flags, fetched, now) == want
    # both the playing and the gated branch are covered
    gates = {(int(r[3]) & 2 != 0 and int(r[3]) & 1 == 0) for r in v["extrap"]}
    assert gates == {True, False}


def test_selftest_endpoint_roundtrips_into_stats(ui):
    """POST /selftest (what runSelfTest sends) surfaces in /stats so a headless
    driver can read the browser's verdict without scraping the page."""
    web, base = ui
    assert json.loads(get(base, "/stats"))["selftest"] is None
    post(base, "/selftest", {"total": 40, "failed": 1,
                             "failures": ["fmtNum(42,metric): x != y"]})
    st = json.loads(get(base, "/stats"))["selftest"]
    assert st == {"total": 40, "failed": 1,
                  "failures": ["fmtNum(42,metric): x != y"]}


def test_page_embeds_selftest_vectors(ui):
    """The served page carries the golden vectors and the runner; the
    placeholder must be gone (a page with the literal string would silently
    skip every check)."""
    web, base = ui
    page = get(base, "/").decode()
    assert "__SELFTEST_JSON__" not in page
    assert "runSelfTest" in page and "'/selftest'" in page
    # the embedded JSON parses back and matches the generator
    import re

    from particle_simulator_tpu.editor.webview import selftest_vectors

    m = re.search(r"const SELFTEST = (\{.*?\});\n", page, re.S)
    assert m, "SELFTEST literal missing"
    assert json.loads(m.group(1)) == json.loads(json.dumps(selftest_vectors()))


def test_gui_panel_parity_controls_present(ui):
    """The reference GUI panel's remaining knobs (editor.rs:1327-1410) have
    webview analogs: Significant Digits, Number Color, Cursor Stroke, and the
    Boom/Reconstruct floating-panel toggle; the cursor-force radius reaches
    the client as a box fraction for the stroke ring."""
    web, base = ui
    page = get(base, "/").decode()
    for el_id in ("gsig", "gnumcolor", "gcstroke", "b_boom"):
        assert f'id="{el_id}"' in page, el_id
    assert "toggleBoom" in page and "fmtSig" in page
    st = json.loads(get(base, "/stats"))
    assert st["cursor_frac"] == pytest.approx(0.05)  # particle.rs:138 default
    post(base, "/params", {"cursor_size": 0.12})
    assert json.loads(get(base, "/stats"))["cursor_frac"] == pytest.approx(0.12)


def test_panel_renders_both_species_sliders(ui):
    """The parameters panel shows Mie sliders for BOTH species like the
    reference editor (editor.rs:828-1411) — species 0 drives physics,
    species 1 rides the metadata (kernel_bucket.cuh:52)."""
    web, base = ui
    page = get(base, "/").decode()
    for name in ("sigma0", "epsilon0", "n0", "m0",
                 "sigma1", "epsilon1", "n1", "m1"):
        assert f"param('{name}'" in page, f"missing slider wiring for {name}"
