"""Paged two-level grid: builder + traversal parity on dense scenes.

The paged backend (ops/pagedkernel.py + models/paged_grid.py) serves scenes
past the flat grid's addressing reach (BASELINE config 5's 100k-sphere
field).  Parity pins mirror tests/test_grid.py: agreement with the
brute-force megakernel up to the pre-existing fp-chaos budget.
"""

import numpy as np
import pytest

from raytrace_tpu.models.paged_grid import build_paged_grid
from raytrace_tpu.models.scene import generate_random_scene, random_sphere_field
from raytrace_tpu.ops.pallas_intersect import sphere_table
from raytrace_tpu.ops.trace import (prepare_scene, render_band_core,
                                    viewport_arrays)
from raytrace_tpu.runtime.renderer import reference_camera, resolve_backend

W, H = 48, 27


@pytest.fixture(scope="module")
def dense():
    # 2000 spheres over [-7,7]^2 ~ 10 spheres/unit^2 — the 100k scene's
    # density regime at a CPU-testable size
    return prepare_scene(random_sphere_field(2000, seed=1, extent=7.0))


def _render(ds, backend, *, depth=6, spp=2, m=2, ablate=()):
    vp = viewport_arrays(reference_camera(), W, H)
    return np.asarray(render_band_core(
        ds, vp, band_h=H, width=W, y0=np.int32(0), seed_y0=np.int32(0),
        offset_x=np.int32(0), spp=np.int32(spp), number=np.uint32(0),
        max_depth=depth, backend=backend, pixels_per_lane=m, skip_tmax=True,
        ablate=ablate))


def test_builder_dense(dense):
    g = dense.paged
    assert g is not None
    n_pages, r0, lanes = g.geom.shape
    assert lanes == 128 and r0 % 3 == 0
    # the lid table is split out of geom (march fetch reads 3 rows/slot),
    # and overflow slots may be split into govf (hot/overflow, r5):
    # hot + overflow rows must cover every lid slot exactly
    ovf_rows = 0 if g.govf is None else g.govf.shape[1]
    assert g.lids.shape == (n_pages, (r0 + ovf_rows) // 3, 128)
    if g.govf is not None:
        assert g.govf.shape[0] == n_pages and g.govf.shape[2] == 128
        assert g.govf.shape[1] % 3 == 0
    # geometry, lids and attrs ride the SAME 8x16-fine-cell macro pages
    assert g.attrs.shape[0] == n_pages
    assert g.attrs.shape[2] == 128
    # flat grid refused this scene (crowded cells), paged took it
    assert dense.grid is None


def test_builder_prefers_flat_grid_for_book_scene():
    ds = prepare_scene(generate_random_scene(0.0))
    assert ds.grid is not None and ds.paged is None


def test_100k_scene_builds():
    sc = random_sphere_field(100_000, seed=1, extent=50.0)
    g = build_paged_grid(sc, sphere_table(sc))
    assert g is not None
    budget = (g.geom.nbytes + g.lids.nbytes + g.attrs.nbytes
              + (0 if g.govf is None else g.govf.nbytes))
    assert budget < 80 * 2**20, f"{budget/2**20:.0f} MB"


def test_paged_matches_mega_within_chaos(dense):
    """Agreement with brute force up to the fp-chaos budget (the XLA
    brute-force backend itself disagrees with mega more)."""
    a = _render(dense, "mega")
    b = _render(dense, "paged")
    bf = _render(dense, "bruteforce")
    pm = int((np.abs(a - b).max(axis=2) > 0).sum())
    mb = int((np.abs(a - bf).max(axis=2) > 0).sum())
    assert pm <= max(3 * mb, 6), (pm, mb)
    assert abs(a.mean() - b.mean()) / a.mean() < 2e-3


def test_paged_shallow_bit_identical(dense):
    a = _render(dense, "mega", depth=2, spp=1, m=1)
    b = _render(dense, "paged", depth=2, spp=1, m=1)
    assert np.array_equal(a, b)


def test_paged_hot_split_bit_identical(dense):
    """Hot/overflow slot split (models/paged_grid.py govf): tables built
    WITH the split (hot_slots=-1, the HOT_QUANTILE auto rule — measured
    flat on hardware and therefore not the default) must render
    bit-identically to the default unsplit build — candidates are tested
    in the same slot order with the same values; only the fetch structure
    differs."""
    g = dense.paged
    assert g.govf is None  # default build: no split
    sc = random_sphere_field(2000, seed=1, extent=7.0)
    g_split = build_paged_grid(sc, sphere_table(sc), hot_slots=-1)
    assert g_split.govf is not None  # auto rule splits this field (~14/21)
    a = _render(dense, "paged", depth=4, spp=2)
    b = _render(dense._replace(paged=g_split), "paged", depth=4, spp=2)
    assert np.array_equal(a, b)


def test_paged_distinct_walk_bit_identical(dense):
    """The non-default distinct-page fetch walk (pagedkernel._page_fetch
    distinct=True, the 'distinctwalk' ablate switch — measured +4.6% on
    v5e-lite and rejected, docs/PERFORMANCE.md) must stay bit-identical to
    the production box walk: each lane is selected on exactly the one trip
    that carries its page either way."""
    a = _render(dense, "paged", depth=5, spp=2)
    b = _render(dense, "paged", depth=5, spp=2, ablate=("distinctwalk",))
    assert np.array_equal(a, b)


def test_auto_backend_picks_paged_for_dense():
    import jax

    ds = prepare_scene(random_sphere_field(2000, seed=1, extent=7.0))
    expected = "paged" if jax.default_backend() == "tpu" else "matmul"
    assert resolve_backend("auto", ds) == expected


@pytest.fixture(scope="module")
def dense_varied():
    """Dense field at varying heights: the paged backend's general 5-value
    geom layout + attrs center-y value set (models/paged_grid.py has_cy)."""
    return prepare_scene(
        random_sphere_field(2000, seed=1, extent=7.0, y_range=(0.2, 2.0)))


def test_builder_varied_height_layout(dense_varied, dense):
    p = dense_varied.paged
    assert p is not None and p.has_cy is not None
    n_slots = p.lids.shape[1]
    # (cx, cy, cz, kc) per slot; lid split out; overflow slots in govf
    ovf = 0 if p.govf is None else p.govf.shape[1]
    assert p.geom.shape[1] + ovf == 4 * n_slots
    assert p.attrs.shape[1] % 6 == 0
    # the uniform fixture must keep the 4-value fast path
    assert dense.paged.has_cy is None


def test_paged_varied_height_bit_identical_shallow(dense_varied):
    a = _render(dense_varied, "mega", depth=5, spp=2)
    b = _render(dense_varied, "paged", depth=5, spp=2)
    assert np.array_equal(a, b)


def test_paged_textured_field_spheres_bit_identical():
    """Checkered FIELD spheres in a dense scene (previously a brute-force
    fallback): attrs carry tex/c1 value sets (has_tex) — bit-identical,
    in both the uniform-height and varied-height layouts."""
    from raytrace_tpu.models.scene import CHECKERED

    for y_range in (None, (0.2, 2.0)):
        sc = random_sphere_field(2000, seed=1, extent=7.0, y_range=y_range)
        sc.texture[50:200] = CHECKERED
        sc.color1[50:200] = (0.9, 0.2, 0.1)
        ds = prepare_scene(sc)
        assert ds.paged is not None and ds.paged.has_tex is not None
        assert (ds.paged.has_cy is not None) == (y_range is not None)
        a = _render(ds, "mega", depth=5, spp=2)
        b = _render(ds, "paged", depth=5, spp=2)
        assert np.array_equal(a, b), f"y_range={y_range}"
