"""Grid-DDA acceleration structure: builder + traversal parity.

The grid backend (ops/gridkernel.py) must reproduce the brute-force
megakernel's output.  Bit-identity holds except on fp-chaotic pixels
(grazing hits where disc ~ 0: XLA's per-graph fma-contraction choices
amplify through sqrt — the same class of divergence the matmul backend and
the reference itself exhibit, see verify notes).  The pinned facts:

 - in the stable regime (shallow depth, the same wavefront schedule) the
   grid backend is BIT-IDENTICAL to the megakernel;
 - at full depth the disagreement fraction stays far below the pre-existing
   mega-vs-bruteforce chaos baseline, and images agree statistically.
"""

import numpy as np
import pytest

from raytrace_tpu.models.grid import build_grid
from raytrace_tpu.models.scene import (generate_random_scene,
                                       random_sphere_field,
                                       three_sphere_scene)
from raytrace_tpu.ops.trace import (prepare_scene, render_band_core,
                                    viewport_arrays)
from raytrace_tpu.runtime.renderer import reference_camera

W, H = 64, 36


@pytest.fixture(scope="module")
def book():
    return prepare_scene(generate_random_scene(0.0))


def _render(ds, backend, *, depth, spp, m=2):
    vp = viewport_arrays(reference_camera(), W, H)
    return np.asarray(render_band_core(
        ds, vp, band_h=H, width=W, y0=np.int32(0), seed_y0=np.int32(0),
        offset_x=np.int32(0), spp=np.int32(spp), number=np.uint32(0),
        max_depth=depth, backend=backend, pixels_per_lane=m, skip_tmax=True))


def test_builder_book_scene(book):
    g = book.grid
    assert g is not None
    # no guard ring + one boundary cell line spilled into the globals table:
    # 23x22 half-integer lattice = 506 cells -> 4 cell blocks (cb=4, was 5);
    # 4 values per slot (cx, cz, kc, global sphere id)
    assert g.ctab.shape == (64, 128)
    assert g.atab.shape == (32, 128)
    # globals: ground + 3 heroes + the spilled boundary line (~14 spheres)
    assert g.gtab.shape[0] <= 32
    assert list(g.gtab[:4, 4]) == [0.0, 1.0, 2.0, 3.0]
    n_globals = int((g.gtab[:, 4] >= 0).sum())
    assert 4 < n_globals <= g.gtab.shape[0]
    # every small sphere is either a spilled global or registered in every
    # cell its delta-enlarged AABB overlaps (1 cell when it fits inside
    # one, up to 4 at a cell corner) — and never both
    cb = g.ctab.shape[0] // 16
    # block-major rows: block*16 + slot*4 + 3 is the slot's id row
    id_rows = g.ctab[[b * 16 + s * 4 + 3 for s in range(4) for b in range(cb)]]
    ids = id_rows[id_rows > 0]
    counts = np.bincount(ids.astype(int), minlength=488)
    gids = set(g.gtab[g.gtab[:, 4] >= 0, 4].astype(int).tolist())
    for sid in range(4, 488):
        if sid in gids:
            assert counts[sid] == 0
        else:
            assert 1 <= counts[sid] <= 4


def test_builder_rejects_ungridable():
    assert prepare_scene(three_sphere_scene()).grid is None  # no small field
    big = random_sphere_field(100_000, seed=1)
    assert prepare_scene(big).grid is None  # cell count over budget


def test_builder_rejects_ids_reaching_bkey_tag():
    """Sphere ids >= 4096 would alias gridkernel._TAG's global-hit encoding
    (bkey = id for grid hits, _TAG + id for globals), silently resolving the
    wrong material — such scenes must fall back (ADVICE r2 #1)."""
    import raytrace_tpu.models.grid as gridmod
    from raytrace_tpu.models.scene import SceneArrays
    from raytrace_tpu.ops.pallas_intersect import sphere_table

    n = 4100
    s = -(-n // 128) * 128
    sc = SceneArrays(
        centers=np.zeros((s, 3), np.float32), radii=np.zeros((s,), np.float32),
        material=np.zeros((s,), np.int32), texture=np.zeros((s,), np.int32),
        color0=np.zeros((s, 3), np.float32), color1=np.zeros((s, 3), np.float32),
        attr=np.zeros((s,), np.float32), n_spheres=np.int32(n),
    )
    # a sparse small-sphere field that would otherwise fit the grid easily
    sc.radii[:n] = 0.2
    sc.centers[:n, 0] = (np.arange(n) % 16).astype(np.float32)
    sc.centers[:n, 1] = 0.2
    sc.centers[:n, 2] = (np.arange(n) // 16 % 16).astype(np.float32) * 4.0
    assert gridmod.build_grid(sc, sphere_table(sc)) is None


def test_grid_bit_identical_shallow(book):
    """Stable regime: no grazing-amplified divergence at depth 4."""
    a = _render(book, "mega", depth=4, spp=2)
    b = _render(book, "grid", depth=4, spp=2)
    assert np.array_equal(a, b)


def test_grid_matches_mega_full_depth(book):
    """Full depth 50: bit-equal except fp-chaotic pixels; statistics agree."""
    a = _render(book, "mega", depth=50, spp=4)
    b = _render(book, "grid", depth=50, spp=4)
    frac = float((np.abs(a - b).max(axis=2) > 0).mean())
    assert frac < 0.02, f"{frac:.3%} pixels differ"
    assert abs(a.mean() - b.mean()) / a.mean() < 1e-3


def test_grid_m_invariance_within_chaos_budget(book):
    """pixels_per_lane must not change results beyond fp chaos.  Changing
    m_slots changes the compiled graph, and XLA's per-graph fma-contraction
    choices flip grazing-hit pixels (disc ~ 0) — the brute-force megakernel
    shows the identical effect at the identical pixel count on this scene in
    interpret mode, so the pin is "no more M-sensitivity than mega"."""
    ga = _render(book, "grid", depth=8, spp=2, m=1)
    gb = _render(book, "grid", depth=8, spp=2, m=5)
    ma = _render(book, "mega", depth=8, spp=2, m=1)
    mb = _render(book, "mega", depth=8, spp=2, m=5)
    gd = int((np.abs(ga - gb).max(axis=2) > 0).sum())
    md = int((np.abs(ma - mb).max(axis=2) > 0).sum())
    assert gd <= max(md, 3), (gd, md)


@pytest.mark.parametrize("ablate", [
    "fetch2", "resolve2", "global2", "camera2", "isect2", "dda2", "shade2",
    "state2", "vmajor", "fuse2", "fuse4", "pad24",
])
def test_ablate_switches_trace_and_preserve_image(book, ablate):
    """Every documented perf-ablation switch (scripts/grid_ablate.py) must
    trace AND leave the image unchanged — its duplicated section hides behind
    a never-taken select.  Pins the r2 regression where 'shade2' referenced a
    deleted variable and crashed at trace time (VERDICT r2 weak #3)."""
    vp = viewport_arrays(reference_camera(), W, H)

    def call(abl):
        return np.asarray(render_band_core(
            book, vp, band_h=H, width=W, y0=np.int32(0), seed_y0=np.int32(0),
            offset_x=np.int32(0), spp=np.int32(1), number=np.uint32(0),
            max_depth=4, backend="grid", pixels_per_lane=2, skip_tmax=True,
            ablate=abl))

    base = call(())
    probed = call((ablate,))
    # The duplicated section changes the XLA:CPU graph, whose per-graph
    # fma-contraction choices flip isolated grazing-hit pixels in interpret
    # mode (docs/PERFORMANCE.md "Mosaic facts") — so the pin is the standard
    # chaos budget, not bitwise equality.  state2 rewrites the loop carry
    # structure itself (8 extra carried rows), the largest graph change, and
    # lands near the ~4-6% mega-vs-XLA chaos baseline of this scene.
    diff = np.any(probed != base, axis=2)
    budget = 0.08 if ablate == "state2" else 0.01
    assert diff.mean() <= budget, f"{diff.sum()} pixels differ"
    if ablate != "state2":
        np.testing.assert_allclose(probed, base, rtol=0, atol=0.2)
    assert abs(probed.mean() - base.mean()) / base.mean() < 0.02


@pytest.mark.parametrize("ablate", [
    "cut_fetch", "cut_resolve", "cut_quad", "cut_shade", "cut_tea",
    "cut_camera", "cut_globals", "cut_init",
])
def test_cut_switches_trace(book, ablate):
    """Removal ablations (scripts/grid_iterbench.py) produce INVALID images
    by design — pin only that every switch traces and runs."""
    vp = viewport_arrays(reference_camera(), W, H)
    out = np.asarray(render_band_core(
        book, vp, band_h=H, width=W, y0=np.int32(0), seed_y0=np.int32(0),
        offset_x=np.int32(0), spp=np.int32(1), number=np.uint32(0),
        max_depth=3, backend="grid", pixels_per_lane=2, skip_tmax=True,
        ablate=(ablate,)))
    assert out.shape == (H, W, 3)  # values are garbage by design (even NaN)


def test_grid_unroll_variant_traces(book):
    """The UNROLL scheduling experiment must stay runnable (grid_steps
    static arg -> statically unrolled K loop) and bit-match the fori path."""
    vp = viewport_arrays(reference_camera(), W, H)

    def call(steps):
        return np.asarray(render_band_core(
            book, vp, band_h=H, width=W, y0=np.int32(0), seed_y0=np.int32(0),
            offset_x=np.int32(0), spp=np.int32(1), number=np.uint32(0),
            max_depth=4, backend="grid", pixels_per_lane=2, skip_tmax=True,
            grid_steps=steps))

    assert np.array_equal(call((1, 10, True)), call((1, 10, False)))
    # partial unroll (bodies of N inside the fori) must also bit-match
    assert np.array_equal(call((2, 10, 2, 1)), call((2, 10, False, 1)))


def test_call_merge_matches_host_loop(book):
    """In-kernel progressive-call merge (n_calls > 1) == the same calls
    issued through the host loop.  Accumulation order is preserved exactly
    (cur flushes at every call boundary), so on TPU hardware this is
    bit-identical; on XLA:CPU the merged dispatch is a different graph and
    call>0 first-sample rays come from the in-kernel ray-gen instead of the
    driver's, so fp-chaotic pixels may flip within the standard budget
    (the same class the M-invariance test pins)."""
    vp = viewport_arrays(reference_camera(), W, H)

    def call(spp, number, accum=None, n_calls=None, spp_last=None, depth=6):
        return render_band_core(
            book, vp, band_h=H, width=W, y0=np.int32(0), seed_y0=np.int32(0),
            offset_x=np.int32(0), spp=np.int32(spp), number=np.uint32(number),
            accum_init=accum, max_depth=depth, backend="grid",
            pixels_per_lane=2, skip_tmax=True,
            n_calls=None if n_calls is None else np.int32(n_calls),
            spp_last=None if spp_last is None else np.int32(spp_last))

    # 3 calls of spp 2,2,1 — unequal last call exercises spp_last
    a = call(2, 0)
    a = call(2, 1, accum=a)
    a = np.asarray(call(1, 2, accum=a))
    b = np.asarray(call(2, 0, n_calls=3, spp_last=1))
    diff = np.any(a != b, axis=2)
    assert diff.mean() <= 0.01, f"{diff.sum()} pixels differ"
    assert abs(a.mean() - b.mean()) / a.mean() < 0.01
    # depth 1: no bounce-chain chaos amplification -> exactly equal
    a1 = np.asarray(call(1, 1, accum=np.asarray(call(1, 0, depth=1)), depth=1))
    b1 = np.asarray(call(1, 0, n_calls=2, spp_last=1, depth=1))
    assert np.array_equal(a1, b1)


def test_call_merge_renderer_grouping(book):
    """Renderer.render with calls_per_exec > 1 merges dispatches (grid
    backend) and matches the ungrouped render within the chaos budget."""
    from raytrace_tpu.config import RenderConfig
    from raytrace_tpu.runtime.renderer import Renderer
    from raytrace_tpu.models.scene import generate_random_scene

    sc = generate_random_scene(0.0)
    base = dict(samples=5, width=W, height=H, max_depth=5, backend="grid",
                samples_per_call=2, pixels_per_lane=2)
    r1 = Renderer(RenderConfig(**base), scene=sc)
    a, n1 = r1.render()
    r2 = Renderer(RenderConfig(**base, calls_per_exec=3), scene=sc)
    b, n2 = r2.render()
    assert n1 == n2 == 5
    a, b = np.asarray(a), np.asarray(b)
    diff = np.any(a != b, axis=2)
    assert diff.mean() <= 0.01, f"{diff.sum()} pixels differ"
    assert abs(a.mean() - b.mean()) / a.mean() < 0.01


def test_grid_progressive_accumulation(book):
    vp = viewport_arrays(reference_camera(), W, H)

    def call(spp, number, accum=None):
        return render_band_core(
            book, vp, band_h=H, width=W, y0=np.int32(0), seed_y0=np.int32(0),
            offset_x=np.int32(0), spp=np.int32(spp), number=np.uint32(number),
            accum_init=accum, max_depth=8, backend="grid", pixels_per_lane=2,
            skip_tmax=True)

    one = np.asarray(call(2, 0))
    two = np.asarray(call(2, 1, accum=one))
    assert (two >= one - 1e-6).all() and two.mean() > one.mean()

