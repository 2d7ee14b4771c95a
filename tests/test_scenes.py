"""Scene library tests: phase regimes hold up over a short horizon (CPU)."""

import numpy as np
import pytest

from particle_simulator_tpu.io.frame import Device, U32_MAX
from particle_simulator_tpu.scenes.library import (
    gas_diffusion,
    liquid_droplet,
    phase_sweep_frames,
    run_scene,
    solid_crystal,
)


def small(builder, n, steps=10):
    frame = builder(n)
    frame.metadata.steps_per_frame = steps
    return frame


def positions_nm(frame):
    m = frame.metadata
    x = frame.particles["x"].astype(np.float64) / U32_MAX * m.box_width * 1e9
    y = frame.particles["y"].astype(np.float64) / U32_MAX * m.box_height * 1e9
    return np.sort(np.stack([x, y], -1), axis=0)  # sorted: order-insensitive


def test_scene_builders_have_expected_sizes():
    assert liquid_droplet().particle_count == 45 * 45
    assert gas_diffusion().particle_count == 128 * 128
    assert solid_crystal().particle_count == 256 * 256
    sweep = phase_sweep_frames(n_side=8)
    assert len(sweep) == 4
    assert all(f.particle_count == 64 for _, f in sweep)


def test_solid_holds_gas_diffuses():
    # ~6 ps horizon: gas particles (400 m/s) migrate nm-scale distances even
    # with collisions; crystal particles (5 m/s) vibrate in place (<0.1 nm).
    # Phase shows as per-particle displacement, robust against wall bounds.
    solid = small(solid_crystal, 16, steps=200)
    gas = small(gas_diffusion, 16, steps=200)
    s0, g0 = positions_nm(solid), positions_nm(gas)

    from particle_simulator_tpu.engine.simulator import Simulator
    from particle_simulator_tpu.physics.bucket import GridConfig

    def advance(frame, frames=3):
        frame.metadata.device = Device.CPU_THREAD_POOL
        sim = Simulator(GridConfig(4, 4, 8))  # small grid: fast CPU run
        sim.load_frame(frame)
        out = None
        for _ in range(frames):
            sim.frame_async()
            out = sim.read_frame()
        return out

    solid_after = advance(solid)
    gas_after = advance(gas)
    assert np.isfinite(solid_after.particles["vx"]).all()
    assert np.isfinite(gas_after.particles["vx"]).all()
    solid_disp = np.abs(positions_nm(solid_after) - s0).mean()
    gas_disp = np.abs(positions_nm(gas_after) - g0).mean()
    assert solid_disp < 0.2, f"crystal moved {solid_disp} nm"
    assert gas_disp > 5 * max(solid_disp, 0.01), f"gas only moved {gas_disp} nm"


def test_run_scene_stats_and_render(tmp_path):
    frame = small(liquid_droplet, 10)
    stats = run_scene(frame, frames=2, render_dir=str(tmp_path), size=64,
                      device=Device.CPU_THREAD_POOL)
    assert stats.particles == 100
    assert stats.frames == 2
    assert (tmp_path / "frame_00001.png").exists()


def test_gif_encoder_roundtrips_exactly(tmp_path):
    """Encoder vs an independent decoder (PIL), pixel-exact per frame —
    decoded RGB must equal palette[_gif_quantize(src)]. The noise frame
    drives the LZW table to 4096 codes (12-bit width + table clears)."""
    pytest.importorskip("PIL")
    from PIL import Image, ImageSequence

    from particle_simulator_tpu.editor.render import (
        _gif_palette,
        _gif_quantize,
        write_gif,
    )

    rng = np.random.default_rng(0)
    ramp = (np.arange(96 * 96 * 3, dtype=np.uint32) % 256).astype(np.uint8)
    imgs = [
        ramp.reshape(96, 96, 3),
        rng.integers(0, 256, (96, 96, 3), dtype=np.uint8),
        np.zeros((96, 96, 3), np.uint8),
    ]
    gif = tmp_path / "exact.gif"
    write_gif(str(gif), imgs)

    pal = np.frombuffer(_gif_palette(), np.uint8).reshape(256, 3)
    im = Image.open(gif)
    decoded = [np.array(f.convert("RGB")) for f in ImageSequence.Iterator(im)]
    assert len(decoded) == len(imgs)
    for got, src in zip(decoded, imgs):
        assert np.array_equal(got, pal[_gif_quantize(src)])


def test_scene_gif_output(tmp_path):
    """The animated-GIF demo output (the reference's doc/*.gif analog):
    a moving scene encodes to a decodable, looping, multi-frame GIF.
    (Pixel-exact encoder coverage lives in
    test_gif_encoder_roundtrips_exactly.)"""
    pytest.importorskip("PIL")
    import numpy as np
    from PIL import Image, ImageSequence

    from particle_simulator_tpu.scenes.library import SCENES, run_scene

    gif = tmp_path / "demo.gif"
    run_scene(SCENES["liquid_droplet"](), frames=3, size=96, device=1,
              gif=str(gif))
    im = Image.open(gif)
    decoded = [np.array(f.convert("RGB")) for f in ImageSequence.Iterator(im)]
    assert len(decoded) == 3
    assert decoded[0].shape == (96, 96, 3)
    assert im.info.get("loop") == 0  # loops forever
    # at least two frames differ (the scene is moving)
    assert any(not np.array_equal(a, b) for a, b in zip(decoded, decoded[1:]))


def test_order_parameters_classify_lattice_vs_gas():
    """scenes/order.py calibration: a perfect hex lattice scores as hexatic
    (psi6 ~ 1, ~6 first-shell neighbors, clustered) and a uniform random
    sparse gas as unbound (neighbors << 1, box-filling occupancy) — the same
    measures scripts/phase_sweep_chip.py asserts on chip (the reference's
    states-of-matter demo, doc/project.typ:169-191, made quantitative)."""
    from particle_simulator_tpu.io.frame import PARTICLE_DTYPE, default_metadata
    from particle_simulator_tpu.scenes.library import _scene
    from particle_simulator_tpu.scenes.order import order_parameters

    lattice = _scene(48, 48, distance_factor=1.05, speed=0.0, box_fill=0.5)
    op = order_parameters(lattice.particles, lattice.metadata.copy())
    assert op.n == 48 * 48
    assert op.psi6 > 0.95, op
    assert 5.0 <= op.mean_neighbors <= 7.0, op  # boundary rows pull < 6
    assert op.occupied_fraction < 0.4, op  # clustered in half the box

    rng = np.random.default_rng(7)
    gas = np.zeros(2048, dtype=PARTICLE_DTYPE)
    gas["x"] = rng.integers(0, 1 << 32, size=2048, dtype=np.uint64)
    gas["y"] = rng.integers(0, 1 << 32, size=2048, dtype=np.uint64)
    meta = default_metadata()
    gop = order_parameters(gas, meta)
    assert gop.mean_neighbors < 1.5, gop  # Poisson mean at this density ~0.8
    assert gop.occupied_fraction > 0.35, gop  # 2048 darts over 4096 cells
    assert gop.psi6 < 0.7, gop

    empty = order_parameters(np.zeros(0, dtype=PARTICLE_DTYPE), meta)
    assert empty.n == 0 and empty.psi6 == 0.0
