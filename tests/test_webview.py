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
