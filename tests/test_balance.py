"""Balanced pixel->lane assignment (runtime/balance.py + gridkernel passign).

The wavefront runs until its slowest lane drains; lanes own static pixel
sets, so the straggler wall is max/mean lane cost (measured 1.25 in fast
mode at 1080p).  The balanced assignment deals pixels to lanes by MEASURED
cost (the kernel's iterstats probe) in serpentine order — each pixel still
renders whole, on one lane, samples in sequence, so the image carries the
same invariance contract as pixels_per_lane: bit-identical on hardware,
within the fp-chaos budget across differently-compiled graphs in interpret
mode (see test_grid.py::test_grid_m_invariance_within_chaos_budget).

Reference analogue: workload_tuner.hpp's row rebalancing across GPUs,
applied within one chip's lanes.
"""

import numpy as np
import pytest

from raytrace_tpu.models.scene import generate_random_scene
from raytrace_tpu.ops import gridkernel as gk
from raytrace_tpu.ops.trace import (prepare_scene, render_band,
                                    viewport_arrays)
from raytrace_tpu.runtime.balance import (balance_stats, build_passign,
                                          measure_cost_map)
from raytrace_tpu.runtime.renderer import reference_camera

W, H, SPP, M = 96, 54, 2, 2
P = W * H


@pytest.fixture(scope="module")
def book():
    return prepare_scene(generate_random_scene(0.0))


def _kw(book, m=M, rr=(1, 16, 0.05)):
    vp = viewport_arrays(reference_camera(), W, H)
    return dict(scene=book, vp=vp, band_h=H, width=W, y0=np.int32(0),
                seed_y0=np.int32(0), offset_x=np.int32(0),
                spp=np.int32(SPP), number=np.uint32(0), max_depth=8,
                backend="grid", pixels_per_lane=m, skip_tmax=True, rr=rr)


def _identity_table(m, tile=None):
    tile = tile or gk.TILE
    n = -(-P // m)
    n_pad = -(-n // tile) * tile
    tab = np.full((m, n_pad), P, np.int32)
    for mm in range(m):
        idx = np.arange(n) + mm * n
        ok = idx < P
        tab[mm, :n][ok] = idx[ok]
    return tab


def test_build_passign_is_permutation():
    rng = np.random.default_rng(0)
    cost = rng.random(P)
    tab = build_passign(cost, M, gk.TILE)
    flat = tab.ravel()
    vals = flat[flat < P]
    assert vals.size == P and np.unique(vals).size == P  # every pixel once
    n = -(-P // M)
    assert tab.shape == (M, -(-n // gk.TILE) * gk.TILE)
    # padding lanes carry only the sentinel
    assert (tab[:, n:] == P).all()
    # balance improves on a skewed cost map
    skew = np.ones(P)
    skew[:P // 10] = 20.0  # clustered hot region (strided spreads it badly
    # at this tiny n; serpentine must beat it)
    s_str = balance_stats(skew, None, M)["max_over_mean"]
    s_bal = balance_stats(skew, build_passign(skew, M, gk.TILE),
                          M)["max_over_mean"]
    assert s_bal <= s_str + 1e-9


def test_build_passign_methods():
    """Both deal policies yield valid tables; the pass-sorted LPT deal is
    at least as balanced in-sample as the serpentine on a skewed map."""
    rng = np.random.default_rng(3)
    cost = rng.lognormal(1.0, 0.8, P)  # heavy tail like path lengths
    stats = {}
    for method in ("serpentine", "lpt"):
        tab = build_passign(cost, M, gk.TILE, method=method)
        flat = tab.ravel()
        vals = flat[flat < P]
        assert vals.size == P and np.unique(vals).size == P
        stats[method] = balance_stats(cost, tab, M)["max_over_mean"]
    assert stats["lpt"] <= stats["serpentine"] + 1e-9
    with pytest.raises(ValueError):
        build_passign(cost, M, gk.TILE, method="nope")


def test_iterstats_probe_counts_and_preserves_gb(book):
    kw = _kw(book)
    cost = measure_cost_map(kw, SPP)
    assert cost.shape == (H, W)
    assert (cost > 0).all()  # every pixel issued at least 1 iteration
    assert cost.mean() / SPP > 1.0  # paths march
    # g/b channels still carry color: the probe only overrides the red
    # accumulation lane, so its g/b equal the normal render's bitwise
    normal = np.asarray(render_band(**kw))
    probe = np.asarray(render_band(**kw, ablate=("iterstats",)))
    assert (probe[:, :, 1:] == normal[:, :, 1:]).all()


def test_assignment_invariance_within_chaos_budget(book):
    """A permuted assignment must not change results beyond the fp-chaos
    budget the M-invariance test pins: changing the table (or providing
    one) changes which compiled path renders a pixel's FIRST sample
    (XLA init vs kernel regen), and XLA's per-graph fma contraction flips
    grazing-hit pixels in interpret mode — the same pixels that flip
    between pixels_per_lane settings.  On hardware the chain is
    bit-identical (hw_validate.py balanced probe)."""
    kw = _kw(book)
    base = np.asarray(render_band(**kw))
    # M-sensitivity of the default path = the accepted chaos budget
    alt = np.asarray(render_band(**{**kw, "pixels_per_lane": 1}))
    budget = int((np.abs(base - alt).max(axis=2) > 0).sum())

    rng = np.random.default_rng(3)
    tab = build_passign(rng.random(P), M, gk.TILE)
    bal = np.asarray(render_band(**kw, passign=tab))
    d = int((np.abs(base - bal).max(axis=2) > 0).sum())
    assert d <= max(budget, 3), (d, budget)
    # and the flipped pixels are ulp-class events, not wrong pixels: the
    # image statistics agree tightly
    assert abs(base.mean() - bal.mean()) / base.mean() < 1e-3


def test_assignment_invariance_exact_mode(book):
    """Same contract in exact (bit-parity) mode.  The budget is doubled:
    a permutation reshuffles EVERY pixel's slot while the M probe moves
    only half of them, so the permuted graph exposes ~2x the grazing-hit
    population to the same per-graph fma-contraction flip."""
    kw = _kw(book, rr=None)
    base = np.asarray(render_band(**kw))
    alt = np.asarray(render_band(**{**kw, "pixels_per_lane": 1}))
    budget = int((np.abs(base - alt).max(axis=2) > 0).sum())
    tab = build_passign(np.random.default_rng(5).random(P), M, gk.TILE)
    bal = np.asarray(render_band(**kw, passign=tab))
    d = int((np.abs(base - bal).max(axis=2) > 0).sum())
    assert d <= max(2 * budget, 6), (d, budget)
    assert abs(base.mean() - bal.mean()) / base.mean() < 1e-3


def test_identity_table_matches_default_bitwise(book):
    """The identity table exercises every passign code path while mapping
    each pixel to its default slot — the first samples take the same
    XLA-init/kernel-regen split as the default program, so even interpret
    mode has no chaos lever and the match must be bitwise."""
    kw = _kw(book)
    base = np.asarray(render_band(**kw))
    bal = np.asarray(render_band(**kw, passign=_identity_table(M)))
    assert (base == bal).all()


def test_balanced_accum_carry(book):
    """Progressive accumulation carries through the assigned slot layout:
    two balanced calls chained via accum_init equal the sum of the calls
    (same table, same program — bitwise)."""
    import jax.numpy as jnp

    kw = _kw(book)
    tab = build_passign(np.random.default_rng(7).random(P), M, gk.TILE)
    a0 = render_band(**{**kw, "number": np.uint32(0)}, passign=tab)
    a1 = render_band(**{**kw, "number": np.uint32(1)}, passign=tab)
    chained = np.asarray(render_band(
        **{**kw, "number": np.uint32(1)}, passign=tab,
        accum_init=jnp.asarray(a0)))
    assert (chained == np.asarray(a0) + np.asarray(a1)).all()


def test_balanced_call_merge(book):
    """In-kernel call merging (the flagship's calls_per_exec path) composes
    with a balanced table: one merged dispatch of two calls equals the two
    balanced calls summed.  Same caveat as test_grid.py::
    test_call_merge_matches_host_loop — the merged dispatch is a different
    XLA:CPU graph and call>0 first-sample rays come from the in-kernel
    ray-gen, so fp-chaotic pixels may flip within the standard budget in
    interpret mode (on TPU hardware the bench's merge_check artifact
    records bitwise identity).  At max_depth=1 there is no bounce-chain
    chaos amplification and the match must be bitwise even here."""
    kw = _kw(book)
    tab = build_passign(np.random.default_rng(9).random(P), M, gk.TILE)
    a0 = np.asarray(render_band(**{**kw, "number": np.uint32(0)}, passign=tab))
    a1 = np.asarray(render_band(**{**kw, "number": np.uint32(1)}, passign=tab))
    merged = np.asarray(render_band(
        **{**kw, "number": np.uint32(0)}, passign=tab,
        n_calls=np.int32(2), spp_last=np.int32(SPP)))
    diff = np.any(merged != a0 + a1, axis=2)
    assert diff.mean() <= 0.01, f"{diff.sum()} pixels differ"
    ref = (a0 + a1).mean()
    assert abs(merged.mean() - ref) / ref < 0.01
    # depth 1: bitwise even across the graph boundary
    kw1 = {**kw, "max_depth": 1}
    b0 = np.asarray(render_band(**{**kw1, "number": np.uint32(0)}, passign=tab))
    b1 = np.asarray(render_band(**{**kw1, "number": np.uint32(1)}, passign=tab))
    bm = np.asarray(render_band(
        **{**kw1, "number": np.uint32(0)}, passign=tab,
        n_calls=np.int32(2), spp_last=np.int32(SPP)))
    assert np.array_equal(bm, b0 + b1)


def test_renderer_balance_end_to_end():
    """RenderConfig(balance_spp=...) probes, builds tables, improves the
    measured wall, and renders an image matching the default within the
    chaos budget."""
    from raytrace_tpu.config import RenderConfig
    from raytrace_tpu.runtime.renderer import Renderer

    base = Renderer(RenderConfig(samples=SPP, width=W, height=H,
                                 backend="grid", mode="fast"))
    a = np.asarray(base.render_call(SPP))
    bal = Renderer(RenderConfig(samples=SPP, width=W, height=H,
                                backend="grid", mode="fast", balance_spp=2))
    b = np.asarray(bal.render_call(SPP))
    assert bal.balance_stats and 0 in bal.balance_stats
    frac = float((np.abs(a - b).max(axis=2) > 0).mean())
    assert frac < 0.01, f"{frac:.3%} pixels differ"
    assert abs(a.mean() - b.mean()) / a.mean() < 1e-3
    # the balance probe records mean issued iterations/sample — the
    # numerator of bench.py's scheduling-efficiency artifact
    ips = bal.balance_stats[0]["issued_per_sample"]
    assert 1.0 <= ips <= 30.0, ips


def test_render_call_return_iters():
    """render_call(return_iters=True) reports executed tile-iterations and
    lane-iteration slots consistent with the issued (busy) work — the
    utilization denominators recorded in every bench run (VERDICT r4
    item 5)."""
    from raytrace_tpu.config import RenderConfig
    from raytrace_tpu.runtime.renderer import Renderer

    r = Renderer(RenderConfig(samples=SPP, width=W, height=H,
                              backend="grid", mode="fast", balance_spp=2))
    acc, tile_iters, lane_slots = r.render_call(SPP, return_iters=True)
    acc2 = r.render_call(SPP)
    assert np.array_equal(np.asarray(acc), np.asarray(acc2))
    assert lane_slots == tile_iters * gk.TILE
    # busy work <= issued slots (lanes can't do more work than slots run)
    busy = r.balance_stats[0]["issued_per_sample"] * P * SPP
    assert busy <= lane_slots, (busy, lane_slots)
    assert tile_iters > 0


def test_passign_rejected_off_grid(book):
    with pytest.raises(ValueError, match="grid-backend"):
        render_band(**{**_kw(book), "backend": "mega"},
                    passign=_identity_table(M))
