"""Heterogeneous dispatch + tuner integration on the virtual CPU mesh."""

import numpy as np

from raytrace_tpu.config import RenderConfig
from raytrace_tpu.models.scene import three_sphere_scene
from raytrace_tpu.parallel.hetero import HeteroRenderer
from raytrace_tpu.runtime.renderer import Renderer

W, H, SPP = 32, 24, 2


def _cfg(**kw):
    kw.setdefault("samples", SPP)
    kw.setdefault("width", W)
    kw.setdefault("height", H)
    kw.setdefault("max_depth", 6)
    kw.setdefault("backend", "matmul")
    kw.setdefault("chips", 4)
    return RenderConfig(**kw)


def test_hetero_assembles_full_image():
    sc = three_sphere_scene()
    r = HeteroRenderer(_cfg(), scene=sc, reference_banding=False)
    accum, frame_s, per_dev = r.render_frame(SPP)
    assert accum.shape == (H, W, 3)
    assert frame_s > 0 and len(per_dev) == 4
    # global-seed banding == single-device render, bit-exact
    single, _ = Renderer(_cfg(chips=1), scene=sc).render(SPP)
    assert np.array_equal(accum, np.asarray(single))


def test_hetero_reference_banding_differs_but_statistically_matches():
    sc = three_sphere_scene()
    r = HeteroRenderer(_cfg(), scene=sc, reference_banding=True)
    accum, _, _ = r.render_frame(SPP)
    single, _ = Renderer(_cfg(chips=1), scene=sc).render(SPP)
    single = np.asarray(single)
    assert not np.array_equal(accum, single)
    assert abs(accum.mean() - single.mean()) / single.mean() < 0.15


def test_tune_round_updates_rows():
    sc = three_sphere_scene()
    r = HeteroRenderer(_cfg(), scene=sc)
    rows0 = list(r.rows)
    assert sum(rows0) == H
    for _ in range(4):
        accum, dpf, new = r.tune_round(SPP, frames=1)
        assert sum(r.rows) == H
        assert dpf > 0
    # distribution stays a valid partition whatever the tuner decided
    assert all(rr >= 0 for rr in r.rows)
