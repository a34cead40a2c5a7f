"""Tests for the statistical comparator and the animated frame loop."""

import numpy as np

from raytrace_tpu.config import RenderConfig
from raytrace_tpu.models.scene import three_sphere_scene
from raytrace_tpu.runtime.frames import FrameLoop
from raytrace_tpu.runtime.renderer import Renderer
from raytrace_tpu.utils.compare import compare_accums

W, H = 48, 32


def test_comparator_accepts_independent_renders():
    sc = three_sphere_scene()
    cfg = RenderConfig(width=W, height=H, max_depth=6, backend="matmul")
    r = Renderer(cfg, scene=sc)
    a = np.asarray(r.render_call(8, number=0))
    b = np.asarray(r.render_call(8, number=1))  # different RNG streams
    res = compare_accums(a, b, 8, 8)
    assert res.matches(z_thresh=6.0, mean_thresh=0.05), res


def test_comparator_rejects_different_images():
    sc = three_sphere_scene()
    cfg = RenderConfig(width=W, height=H, max_depth=6, backend="matmul")
    r = Renderer(cfg, scene=sc)
    a = np.asarray(r.render_call(8))
    res = compare_accums(a, a * 1.5, 8, 8)
    assert not res.matches()


def test_frame_loop_animates():
    cfg = RenderConfig(samples=1, width=32, height=18, max_depth=4, backend="matmul")
    fl = FrameLoop(cfg, time_fn=lambda: 1.0)
    f0 = np.asarray(fl.render_frame(0.0))
    f1 = np.asarray(fl.render_frame(1.3))
    assert f0.shape == (18, 32, 3)
    assert not np.array_equal(f0, f1)  # hero spheres moved


def test_frame_loop_run_prints_dpf(capsys, tmp_path):
    cfg = RenderConfig(samples=1, width=16, height=9, max_depth=4, backend="matmul")
    fl = FrameLoop(cfg)
    dpf, frames = fl.run(frames=2, store_pattern=str(tmp_path / "f{0}.png"), animate=False)
    assert dpf > 0 and frames == 2
    assert (tmp_path / "f0.png").exists() and (tmp_path / "f1.png").exists()
    assert "duration_per_frame" in capsys.readouterr().out
