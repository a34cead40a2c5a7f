"""Fast-mode (Russian-roulette) tests — VERDICT r3 item 1.

mode="fast" relaxes only the match-the-GLSL-sample-stream contract (the
production north star asks for a statistical match, BASELINE.json); every
determinism invariant the exact mode pins holds WITHIN fast mode:

  - fast bruteforce == fast oracle near-bitwise (the RR op order is part of
    the oracle spec, cpu_reference._ray_color rr=...),
  - fast grid == fast mega bit-identical (interpret; hardware artifact in
    every bench run),
  - output invariant to pixels_per_lane / chunking / call-merge,
  - fast statistically matches exact (unbiased estimator).
"""

import numpy as np
import pytest

from raytrace_tpu.config import RenderCallInfo, RenderConfig
from raytrace_tpu.models.scene import generate_random_scene, three_sphere_scene
from raytrace_tpu.oracle.cpu_reference import render_oracle
from raytrace_tpu.ops.trace import prepare_scene, render_band, viewport_arrays
from raytrace_tpu.runtime.renderer import reference_camera

W, H, SPP, DEPTH = 32, 18, 4, 8
RR = (1, 4, 0.05)  # tight params so tiny tests actually exercise kill paths


@pytest.fixture(scope="module")
def scene():
    return three_sphere_scene()


@pytest.fixture(scope="module")
def book():
    return generate_random_scene(0.0)


def _render(scene, backend, spp=SPP, rr=RR, m=1, depth=DEPTH, w=W, h=H,
            accum=None, n_calls=None, spp_last=None, number=0):
    ds = prepare_scene(scene)
    vp = viewport_arrays(reference_camera(), w, h)
    out = render_band(
        ds, vp, band_h=h, width=w, y0=np.int32(0), seed_y0=np.int32(0),
        offset_x=np.int32(0), spp=np.int32(spp), number=np.uint32(number),
        accum_init=accum, max_depth=depth, backend=backend,
        pixels_per_lane=m, rr=rr,
        n_calls=None if n_calls is None else np.int32(n_calls),
        spp_last=None if spp_last is None else np.int32(spp_last))
    return np.asarray(out)


def test_fast_bruteforce_matches_fast_oracle(scene):
    """The RR draw order / f32 op order is pinned by the oracle."""
    info = RenderCallInfo(samples_per_render_call=SPP, image_size=(W, H))
    golden = render_oracle(scene, info, max_depth=DEPTH, rr=RR)
    out = _render(scene, "bruteforce")
    diff = np.abs(out - golden.astype(np.float32))
    assert diff.max() < 1e-4, f"max diff {diff.max()}"


def test_fast_changes_output_and_is_unbiased(scene):
    """RR actually fires on this config (killed paths change sample values)
    and the mean stays within MC sampling error of exact mode."""
    exact = _render(scene, "bruteforce", rr=None, spp=64) / 64
    fast = _render(scene, "bruteforce", rr=RR, spp=64) / 64
    assert not np.array_equal(exact, fast)  # RR must be live
    assert abs(fast.mean() - exact.mean()) / exact.mean() < 0.03


def test_fast_statistical_gate(book):
    """The production comparator passes fast vs exact on the book scene."""
    from raytrace_tpu.utils.compare import compare_accums

    exact = _render(book, "mega", rr=None, spp=16, m=2)
    fast = _render(book, "mega", rr=(2, 16, 0.05), spp=16, m=2)
    res = compare_accums(fast, exact, 16, 16, tile=2)
    assert res.matches(), (res.tile_p95_z, res.mean_rel_diff)


def test_fast_grid_equals_fast_mega_bitwise(book):
    a = _render(book, "grid", m=2)
    b = _render(book, "mega", m=2)
    assert np.array_equal(a, b)


def test_fast_m_invariance(book):
    a = _render(book, "grid", m=1)
    b = _render(book, "grid", m=4)
    assert np.array_equal(a, b)


def test_fast_progressive_and_call_merge(book):
    """Chained progressive calls and the in-kernel call merge match under
    fast mode (RR draws ride the per-sample stream).  On XLA:CPU the merged
    dispatch is a different graph, so fp-chaotic pixels may flip within the
    standard budget (exact mode behaves identically here —
    tests/test_grid.py::test_call_merge_matches_host_loop); on TPU hardware
    the bench's merge_check records bitwise identity."""
    one = _render(book, "grid", spp=2, number=0)
    two = _render(book, "grid", spp=2, number=1, accum=one)
    merged = _render(book, "grid", spp=2, number=0, n_calls=2, spp_last=2)
    diff = np.any(two != merged, axis=2)
    assert diff.mean() <= 0.01, f"{diff.sum()} pixels differ"


def test_fast_paged_backend():
    """RR composes with the paged two-level grid (config-5 regime)."""
    from raytrace_tpu.models.scene import random_sphere_field

    sc = random_sphere_field(2000, seed=1, extent=7.0)
    fast_paged = _render(sc, "paged", spp=2, depth=6, m=2)
    fast_mega = _render(sc, "mega", spp=2, depth=6, m=2)
    # interpret-mode fp chaos budget (same as tests/test_paged.py)
    bad = (np.abs(fast_paged - fast_mega).max(axis=2) > 0.2).mean()
    assert bad < 0.01, f"{bad:.3%} pixels differ"


def test_fast_mode_via_config(book):
    """RenderConfig.mode plumbs through the Renderer; exact is default."""
    from raytrace_tpu.runtime.renderer import Renderer

    cfg = RenderConfig(samples=2, width=24, height=12, max_depth=6,
                       backend="mega", pixels_per_lane=1)
    assert cfg.rr is None
    fast_cfg = RenderConfig(samples=2, width=24, height=12, max_depth=6,
                            backend="mega", mode="fast", pixels_per_lane=1,
                            rr_params=(1, 4, 0.05))
    assert fast_cfg.rr == (1, 4, 0.05)
    a, _ = Renderer(cfg, scene=book).render(2)
    b, _ = Renderer(fast_cfg, scene=book).render(2)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_fast_multichip_invariance(book):
    """N-device fast render == 1-device fast render (global-seed mode)."""
    from raytrace_tpu.parallel.sharding import MultiChipRenderer
    from raytrace_tpu.runtime.renderer import Renderer

    cfg = RenderConfig(samples=2, width=32, height=16, max_depth=5,
                       backend="mega", chips=4, mode="fast",
                       rr_params=(1, 4, 0.05), pixels_per_lane=2)
    sc = book
    multi, _ = MultiChipRenderer(cfg, scene=sc).render(2)
    single, _ = Renderer(cfg, scene=sc).render(2)
    assert np.array_equal(np.asarray(single), np.asarray(multi))
