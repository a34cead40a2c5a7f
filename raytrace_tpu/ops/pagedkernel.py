"""Paged-grid megakernel: the acceleration structure for dense/large scenes.

Same wavefront state machine as ops/gridkernel.py (segment start with
brute-forced globals -> fine-cell DDA march -> shade/accumulate/regen), but
candidates come from a PAGED two-level grid (models/paged_grid.py), which
scales past the flat grid's ~640-cell lane-gather addressing wall:

 - the DDA walks fine cells of size ``s``; a cell's page (8x16-fine-cell
   supercell — exactly the 128-column lane-gather width) is a
   *scalar-addressable* block of the geometry table (3-D VMEM ref,
   ``geom_ref[page]``), and the within-page fine index (<128) is a legal
   Mosaic lane-gather;
 - fetches run per 128-lane chunk: reduce the chunk's page ids to
   [qmin, qmax] scalars and loop that range, masking each lane to its page.
   Cost is proportional to the chunk's page SPREAD, so the driver re-buckets
   lanes (argsort by page) between kernel invocations; pixel identity rides
   in a ``lane0`` state row and the final accumulator is unpermuted by it.

Winner attributes are paged too (per-page local sphere lists), so nothing
ever indexes the global sphere table per lane — scene size is bounded by
VMEM, not by gather addressing.

State: f32 rows exactly as gridkernel; u32 rows: 0 seed | 1 m | 2 sidx |
3 depth | 4 alive | 5 marching | 6 cell (icx<<12 | icz) | 7 lane0.
bkey: ((sx<<5)|sz)<<9 | lid for grid hits (page coords + 9-bit page-local
sphere id — bit fields, so the resolve fetch can rebuild its 2-D page box
with static shifts; max (63,31,511) = 2^20-1, exact in f32);
2^23 + sphere_id for globals.  Winner attrs ride the SAME macro pages as
geometry (one page set, so the resolve loop's boxes match the march's).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config
from ..models.paged_grid import (P_CY, P_FMAXX, P_FMAXZ, P_FMINX,
                                 P_FMINZ, P_INVS, P_NSCZM, P_S,
                                 P_XHI, P_XLO, P_YHI, P_YLO, P_ZHI, P_ZLO)
from . import rng as rngops
from .gridkernel import (R_ACC, R_BKEY, R_CUR, R_D, R_FX, R_FY, R_O, R_TB,
                         R_TE, R_THR, R_TNX, R_TNZ, R_WCX, R_WCZ, TILE,
                         U_ALIVE, U_DEPTH, U_M, U_MARCH, U_SEED,
                         U_SIDX, _quadratic, _slab_inv, f_rows)
from .intersect import BIG
from .megakernel import (_SKY, S_NUMBER, S_OFFX, S_SEEDY0, S_SPP, S_Y0,
                         _camera_rays_rows, _norm3, _vec3)
from .shading_rows import shade_rows

U_CELL, U_LANE0 = 6, 7
U_ROWS = 8  # this kernel's own u32 row count — NOT gridkernel's (whose
# call-merge/fresh-seed rows 8-11 don't exist here; an aliased output must
# write every row it declares, so the row counts must match the writes)
# Carried winner attributes (CARRY mode, the production default): any lane
# whose winner improved during a march step got it from the page being
# walked RIGHT THEN, so its attr values are fetched in a small box loop
# immediately after the quadratics (mask = "winner updated this cell" —
# usually empty or a 1-trip box) and carried in state rows until shading.
# This deletes the seg_done-time winner-resolution page loop, which walked
# its own 2-D boxes per chunk and measured 41-45% serial share
# (scripts/paged_iterbench.py).  Attr VALUES pass through the same table
# either way, so images are bit-identical to the legacy resolve
# (tests/test_paged.py pins it).  CARRY=False keeps the legacy loop
# compiled for interleaved A/Bs (read at call time by the renderer and
# passed as static grid_steps[2] — module globals read at trace time would
# not key the jit cache; CLAUDE.md).
CARRY = True


def n_carry(five: bool, textured: bool) -> int:
    """Carried attr rows: (mat, c0.rgb, attr) + center-y (five layout)
    + (tex, c1.rgb) (textured fields)."""
    return (6 if five else 5) + (4 if textured else 0)


def pf_rows(m_slots: int, nc: int = 0) -> int:
    """f32 state rows incl. ``nc`` carried attr rows after the acc slots."""
    r = R_ACC + 3 * m_slots + nc
    return -(-r // 8) * 8
K_STEPS = 5  # rebucket interval at the 32k-lane reference point: K=5/10/15
# measured 237/242/253 ns/sample at 1080p on the 100k scene
# (scripts/paged_ksweep.py) — tighter sorts keep the per-chunk page boxes
# small now that trips are the cost
# The interval SCALES with lane count (K_AUTO): the argsort + two
# full-state takes between invocations cost ~per-lane (the acc rows are
# the image), while per-chunk page-box drift per step SHRINKS as ray
# density rises (more lanes share each page), so high-res renders want
# rarer sorts: at 2160p (130k lanes) K=5/10/15 measured 253/241/226
# ns/sample with a flat plateau K=15..40.  scaled_k's n/32768 factor
# reproduces both optima (K=5 at 1080p, K=20 at 2160p).  Output bits are
# invariant to K (invocation grouping only; ksweep checks bit-identity).
# Sweeps set K_AUTO=False to pin exact intervals.
K_AUTO = True
# Rebucket sort-key mode (read by the renderer at CALL time and passed as
# static grid_steps[3] — see CLAUDE.md on module-global sweep hazards):
# 1 = Morton (sx,sz)-interleave (chunks stay spatially square); 0 = linear
# page id (A/B reference).  Output bits are invariant to the choice (lane
# permutation only).
MORTON = 1
# Perf-ablation switches for the paged kernel (read by the renderer at call
# time, passed as a static arg — same sweep-safety rule as gridkernel.ABLATE).
ABLATE: frozenset = frozenset()
# 2^23: bkey values >= are direct sphere ids.  Must stay a power of two
# small enough that TAG + id is EXACT in f32 (ulp(2^23) = 1; 2^24 would
# round ids 0/1 together) while leaving room for page*(ab*128)+lid below it.
_TAG = np.float32(8388608.0)


def scaled_k(n_lanes: int) -> int:
    """Lane-count-scaled rebucket interval (see the K_STEPS/K_AUTO note)."""
    if not K_AUTO:
        return K_STEPS
    return K_STEPS * max(1, round(n_lanes / 32768))


def _page_fetch(tab_ref, sx, sz, nscz_i, fc, masked, *, n_rows, poison_rows,
                distinct=False):
    """Per-chunk paged fetch: tab_ref [n_pages, n_rows, 128]; sx/sz [1, T]
    i32 supercell coords (page id = sx*nscz+sz); fc [1, T] within-page fine
    index; masked [1, T] bool (lanes whose fetch matters).  Returns
    [n_rows, T] with ``poison_rows`` poisoned (and others zeroed) where not
    fetched.

    The loop per 128-lane chunk walks the 2-D BOUNDING BOX of the chunk's
    (sx, sz) coords, not the linear page-id range: x-neighbor pages differ
    by nscz (~27 on the 100k scene) in id, so one lane crossing an x page
    boundary used to inflate the linear range — and the loop trip count —
    by ~nscz wasted iterations (measured per-chunk spread ~29 with the two
    page loops at 52%/45% serial share, scripts/paged_iterbench.py).  The
    box of a chunk straddling one x and one z boundary is 2x2 = 4 trips.

    ``distinct=True`` walks only the chunk's DISTINCT pages instead: a
    while_loop extracts the smallest unprocessed page id per trip (masked
    min over an i32 carry with -1 = done; i1 vectors can't be loop carries
    on Mosaic), fetches it, and retires its lanes.  Trip count = exact
    number of distinct pages among masked lanes — strictly <= the box area
    (a Morton-sorted chunk at a quad corner pays a 2x2 box for 2 actual
    pages), at the price of one extra [1,128] reduce per trip for the
    while condition.  Each lane is still selected on exactly the one trip
    that carries its page, so the fetched values — and the image bits —
    are identical to the box walk."""
    t = sx.shape[1]
    nb = t // 128
    sxb_all = sx.reshape(nb, 128)
    szb_all = sz.reshape(nb, 128)
    fcb = fc.reshape(nb, 128)
    # i1 vector reshape is not supported by Mosaic (infer-vector-layout
    # "unsupported shape cast" on real TPU); route the mask through i32
    mk = masked.astype(jnp.int32).reshape(nb, 128)
    init = jnp.zeros((n_rows, 128), jnp.float32)
    if poison_rows is not None:
        rid = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 0)
        init = jnp.where((rid % poison_rows[1]) == poison_rows[0],
                         np.float32(3e30), init)
    chunks = []
    big = jnp.int32(1 << 20)
    for rb in range(nb):
        sxb = sxb_all[rb : rb + 1, :]
        szb = szb_all[rb : rb + 1, :]
        f = fcb[rb : rb + 1, :]
        m = mk[rb : rb + 1, :] != 0
        fb = jax.lax.broadcast_in_dim(f, (n_rows, 128), (0, 1))

        if distinct:
            rem0 = jnp.where(m, sxb * nscz_i + szb, -1)  # -1 = retired

            def cond(state):
                rem, _ = state
                return jnp.max(rem) >= 0

            def body(state, fb=fb):
                rem, acc = state
                pid = jnp.min(jnp.where(rem >= 0, rem, big))
                pgdata = tab_ref[pid]  # [n_rows, 128]
                g = jnp.take_along_axis(pgdata, fb, axis=1)
                sel = rem == pid
                return jnp.where(sel, -1, rem), jnp.where(sel, g, acc)

            _, acc = jax.lax.while_loop(cond, body, (rem0, init))
            chunks.append(acc)
            continue

        sx_min = jnp.min(jnp.where(m, sxb, big))
        sx_max = jnp.max(jnp.where(m, sxb, -big))
        sz_min = jnp.min(jnp.where(m, szb, big))
        sz_max = jnp.max(jnp.where(m, szb, -big))
        nx = jnp.maximum(sx_max - sx_min + 1, 0)
        nz = jnp.maximum(sz_max - sz_min + 1, 0)

        def body(d, acc, sxb=sxb, szb=szb, m=m, fb=fb,
                 sx_min=sx_min, sz_min=sz_min, nz=nz):
            px_ = sx_min + d // nz
            pz_ = sz_min + d % nz
            pid = px_ * nscz_i + pz_
            pgdata = tab_ref[pid]  # [n_rows, 128]
            g = jnp.take_along_axis(pgdata, fb, axis=1)
            sel = m & (sxb == px_) & (szb == pz_)
            return jnp.where(sel, g, acc)

        acc = jax.lax.fori_loop(0, nx * nz, body, init)
        chunks.append(acc)
    return jnp.concatenate(chunks, axis=1)  # [n_rows, T]


def _ab_select(at, lid, *, ab, five, textured):
    """Resolve the ``ab``-block attr layout to per-lane value rows.

    ``at`` [na*ab, T] as fetched (row v*ab + b = value v, block b); ``lid``
    [1, T] i32 page-local sphere id.  Returns the na rows in carried order:
    (mat, c0x, c0y, c0z, fuzz[, wcy][, tex, c1x, c1y, c1z])."""
    n_base = 6 if five else 5
    t0 = n_base * ab
    if ab > 1:
        hi = lid >> 7
        vals = [at[v * ab : v * ab + 1, :] for v in range(n_base)]
        ft = [at[t0 + v * ab : t0 + v * ab + 1, :]
              for v in range(4)] if textured else []
        for b in range(1, ab):
            sel = hi == b
            vals = [jnp.where(sel, at[v * ab + b : v * ab + b + 1, :], vals[v])
                    for v in range(n_base)]
            ft = [jnp.where(sel, at[t0 + v * ab + b : t0 + v * ab + b + 1, :],
                            ft[v]) for v in range(len(ft))]
        return vals + ft
    vals = [at[v : v + 1, :] for v in range(n_base)]
    ft = [at[t0 + v : t0 + v + 1, :] for v in range(4)] if textured else []
    return vals + ft


def _iterate(st, acc_ref, scal_ref, vpr_ref, gscal_ref, gtab_ref, geom_ref,
             govf_ref, lids_ref, attrs_ref, *, m_slots, n_lanes, p_total,
             width, max_depth, tmin, tmax, skip_tmax, n_slots, ab, ablate,
             five=False, textured=False, carry=True, rr=None):
    (ox, oy, oz, dx, dy, dz, fx, fy, tx_, ty_, tz_,
     t_b, t_end, t_nx, t_nz, bkey, wcx, wcz, cr_, cg_, cb2_,
     seed, mrow, sidx, depth, alive_i, march_i, cell, lane0) = st[:29]
    att = st[29:]
    alive = alive_i != 0
    marching = march_i != 0

    # removal ablations (scripts/paged_iterbench.py), mirroring
    # gridkernel's: each cut_* replaces one section with a same-shaped
    # passthrough of LIVE rows so its serial share can be measured by
    # removal.  Unlike the grid kernel, DEAD lanes won't do: the paged
    # fetch's page loop has a DYNAMIC trip count (the chunk's page spread)
    # that collapses to zero when the lane mask is empty — so the probe
    # instead runs LIVE lanes under the 'freeze' switch, which executes
    # every section at realistic page spreads but pins the march state
    # (cells never advance, nothing terminates), making the control flow
    # identical across all cut variants.  Images are INVALID under any of
    # these switches; production passes ablate=().
    def cut(name):
        return ("cut_" + name) in ablate

    freeze = "freeze" in ablate
    # opaque never-true mask: consumes discarded results under freeze so
    # the compiler cannot fold the sections being measured
    never = (seed == jnp.uint32(0xFFFFFFFF)) & (cell < -1)

    spp_i = scal_ref[0, S_SPP]
    number = scal_ref[0, S_NUMBER].astype(jnp.uint32)
    y0 = scal_ref[0, S_Y0]
    seed_y0 = scal_ref[0, S_SEEDY0]
    offx = scal_ref[0, S_OFFX]

    fminx = gscal_ref[0, P_FMINX]
    fminz = gscal_ref[0, P_FMINZ]
    fmaxx = gscal_ref[0, P_FMAXX]
    fmaxz = gscal_ref[0, P_FMAXZ]
    cy_u = gscal_ref[0, P_CY]
    inv_s = gscal_ref[0, P_INVS]
    cs = gscal_ref[0, P_S]

    a = dx * dx + dy * dy + dz * dz
    od = ox * dx + oy * dy + oz * dz
    oo = ox * ox + oy * oy + oz * oz
    inv_a = 1.0 / a

    # ---- segment start: globals + clip + fine-DDA init ---------------------
    need = alive & ~marching
    t_b = jnp.where(need, BIG, t_b)
    bkey = jnp.where(need, _TAG, bkey)
    if not cut("globals"):
        for k in range(gtab_ref.shape[0]):
            tc = _quadratic(ox, oy, oz, dx, dy, dz, a, od, oo, inv_a,
                            gtab_ref[k, 0], gtab_ref[k, 1], gtab_ref[k, 2],
                            gtab_ref[k, 3], tmin=tmin, tmax=tmax,
                            skip_tmax=skip_tmax)
            upd = need & (tc < t_b)
            t_b = jnp.where(upd, tc, t_b)
            bkey = jnp.where(upd, _TAG + gtab_ref[k, 4], bkey)

    # one reciprocal per axis, reused by slab clip / first crossings / cell
    # steps (the 7->3 divide reduction of gridkernel; ulp shifts in DDA
    # decisions are absorbed by the builder's delta-enlarged registration)
    inv_x = 1.0 / dx
    inv_y = 1.0 / dy
    inv_z = 1.0 / dz

    if cut("init"):
        march0 = need & (t_b < -1.0)  # never true; skip clip/DDA-init
    else:
        t0x, t1x = _slab_inv(ox, dx, inv_x, gscal_ref[0, P_XLO], gscal_ref[0, P_XHI])
        t0y, t1y = _slab_inv(oy, dy, inv_y, gscal_ref[0, P_YLO], gscal_ref[0, P_YHI])
        t0z, t1z = _slab_inv(oz, dz, inv_z, gscal_ref[0, P_ZLO], gscal_ref[0, P_ZHI])
        t_start = jnp.maximum(jnp.maximum(t0x, t0y), jnp.maximum(t0z, tmin))
        t_end_n = jnp.minimum(jnp.minimum(t1x, t1y), t1z)
        march0 = need & (t_start <= t_end_n) & (t_start < t_b)

        px0 = ox + t_start * dx
        pz0 = oz + t_start * dz
        icx_n = jnp.clip(jnp.floor((px0 - fminx) * inv_s), 0.0, fmaxx)
        icz_n = jnp.clip(jnp.floor((pz0 - fminz) * inv_s), 0.0, fmaxz)
        bx = fminx + (icx_n + jnp.where(dx >= 0, 1.0, 0.0)) * cs
        bz = fminz + (icz_n + jnp.where(dz >= 0, 1.0, 0.0)) * cs
        t_nx_n = jnp.where(dx == 0.0, BIG, (bx - ox) * inv_x)
        t_nz_n = jnp.where(dz == 0.0, BIG, (bz - oz) * inv_z)

        t_end = jnp.where(need, t_end_n, t_end)
        t_nx = jnp.where(march0, t_nx_n, t_nx)
        t_nz = jnp.where(march0, t_nz_n, t_nz)
        cell_n = (icx_n.astype(jnp.int32) << 12) | icz_n.astype(jnp.int32)
        cell = jnp.where(march0, cell_n, cell)
    marching = marching | march0

    # ---- fine-DDA march: one cell per iteration ----------------------------
    step_x = jnp.where(dx >= 0, 1, -1)
    step_z = jnp.where(dz >= 0, 1, -1)
    dt_x = jnp.where(dx == 0.0, BIG, jnp.abs(cs * inv_x))
    dt_z = jnp.where(dz == 0.0, BIG, jnp.abs(cs * inv_z))

    icx = cell >> 12
    icz = cell & 4095
    # pages are 8x16 fine cells — the 16-cell z extent fills the full
    # 128-column lane-gather width, halving page count and z-boundary
    # crossings vs 8x8 (models/paged_grid.py F_AXIS / F_AXIS_Z)
    nsczm_i = gscal_ref[0, P_NSCZM].astype(jnp.int32)
    sxm = icx >> 3
    szm = icz >> 4
    fc = ((icx & 7) << 4) | (icz & 15)
    # geom slot layout: 3 values (cx, cz, kc) with cy a gscal scalar for
    # uniform-height fields; 4 values (cx, cy, cz, kc) otherwise
    # (models/paged_grid.py has_cy).  The page-local sphere id rides its
    # own split-out table (lids_ref): the march loop's per-trip gather
    # shrinks by the lid row per slot — 25%/20% fewer rows on the hot
    # fetch (its serial share measured 36-50%, docs/PERFORMANCE.md) — and
    # the lid is fetched below in a mostly-zero-trip box loop masked by
    # "winner improved this cell" (~once per segment).
    wq = 4 if five else 3
    dwalk = "distinctwalk" in ablate
    # hot/overflow slot split (models/paged_grid.py govf): the hot fetch
    # reads only the first n_hot slots' rows; overflow slots (rare — the
    # builder puts ~HOT_QUANTILE of cells entirely in the hot region) are
    # fetched in a second box loop masked by "slot n_hot-1's kc is
    # non-poison" (count >= n_hot; conservative — a cell with overflow
    # candidates always has its last hot slot occupied).  Slot order and
    # every quadratic's inputs are unchanged -> bit-identical images.
    n_hot = n_slots if govf_ref is None else geom_ref.shape[1] // wq
    if cut("fetch"):
        vals = jax.lax.broadcast_in_dim(ox, (wq * n_hot, ox.shape[1]), (0, 1))
    else:
        vals = _page_fetch(geom_ref, sxm, szm, nsczm_i, fc, marching,
                           n_rows=wq * n_hot, poison_rows=(wq - 1, wq),
                           distinct=dwalk)
    vals_ovf = None
    if govf_ref is not None:
        # 'fusedovf' emulates the unsplit fetch COST (overflow rows
        # gathered on every march trip) for in-process interleaved A/Bs;
        # freeze probes also fetch unconditionally so cut_* attribution
        # sees the full fetch section.
        ovfm = marching & (vals[wq * n_hot - 1 : wq * n_hot, :]
                           < np.float32(1e30))
        if freeze or "fusedovf" in ablate:
            ovfm = marching
        n_ovf_rows = wq * (n_slots - n_hot)
        if cut("fetch"):
            vals_ovf = jax.lax.broadcast_in_dim(
                ox, (n_ovf_rows, ox.shape[1]), (0, 1))
        else:
            vals_ovf = _page_fetch(govf_ref, sxm, szm, nsczm_i, fc, ovfm,
                                   n_rows=n_ovf_rows,
                                   poison_rows=(wq - 1, wq), distinct=dwalk)
    # bkey packs the winner as ((sx<<5)|sz)<<9 | lid — page coords in
    # separate bit fields (not the linear page id) so winner resolution
    # can rebuild the 2-D box for its own page loop with static shifts.
    # Max value (63,31,511) = 2^20-1 < _TAG, exact in f32.
    pkey = (sxm * 32 + szm).astype(jnp.float32) * np.float32(512.0)
    upd_any = None
    wslot = jnp.zeros_like(cell)
    for s in range(n_slots):
        v, b0 = ((vals, wq * s) if s < n_hot
                 else (vals_ovf, wq * (s - n_hot)))
        s_cy = v[b0 + 1 : b0 + 2, :] if five else cy_u
        if cut("quad"):
            tc = v[b0 : b0 + 1, :] + oy
        else:
            tc = _quadratic(ox, oy, oz, dx, dy, dz, a, od, oo, inv_a,
                            v[b0 : b0 + 1, :], s_cy,
                            v[b0 + wq - 2 : b0 + wq - 1, :],
                            v[b0 + wq - 1 : b0 + wq, :],
                            tmin=tmin, tmax=tmax, skip_tmax=skip_tmax)
        upd = marching & (tc < t_b)
        t_b = jnp.where(upd, tc, t_b)
        wslot = jnp.where(upd, s, wslot)
        wcx = jnp.where(upd, v[b0 : b0 + 1, :], wcx)
        wcz = jnp.where(upd, v[b0 + wq - 2 : b0 + wq - 1, :], wcz)
        upd_any = upd if upd_any is None else (upd_any | upd)

    # deferred winner lid: fetch the page's lid rows only where a winner
    # improved (same box-loop machinery; empty chunks collapse to zero
    # trips), then select the winning slot's row.  bkey bits — and the
    # image — are identical to the old fused layout: the lid VALUE added
    # to pkey is the same float either way.
    # 'fusedlid' ablate emulates the pre-split fetch COST (lid rows
    # gathered on every march trip, mask=marching) for in-process
    # interleaved A/Bs — bit-identical output, old-layout row traffic.
    lmask = marching if (freeze or "fusedlid" in ablate) else upd_any
    if cut("fetch"):
        lvals = jax.lax.broadcast_in_dim(ox, (n_slots, ox.shape[1]), (0, 1))
    else:
        lvals = _page_fetch(lids_ref, sxm, szm, nsczm_i, fc, lmask,
                            n_rows=n_slots, poison_rows=None,
                            distinct=dwalk)
    lid_w = lvals[0:1, :]
    for s in range(1, n_slots):
        lid_w = jnp.where(wslot == s, lvals[s : s + 1, :], lid_w)
    bkey = jnp.where(upd_any, pkey + lid_w, bkey)

    na = n_carry(five, textured)
    if carry:
        # in-march winner-attr fetch (CARRY): a lane whose winner improved
        # in THIS cell got it from the page just walked — bkey's page ==
        # (sxm, szm) by construction — so fetch its na attr values now, in
        # a box loop masked by upd_any.  Winners improve ~once per segment
        # while cells march many times, so most chunks' boxes are EMPTY
        # (zero trips: the masked min/max collapse nx*nz to 0) and the rest
        # are nearly always a single page.  The fetched values replace the
        # carried rows; non-updated lanes keep theirs.
        lid_new = bkey.astype(jnp.int32) & 511
        amask = marching if freeze else upd_any
        # (freeze probes mask by `marching` — upd_any dies out once t_b
        # saturates under a frozen march, so this upper-bounds the loop's
        # real share at the march's own trip count)
        if cut("resolve"):
            at2 = jax.lax.broadcast_in_dim(bkey, (na * ab, bkey.shape[1]),
                                           (0, 1))
        else:
            at2 = _page_fetch(attrs_ref, sxm, szm, nsczm_i, lid_new & 127,
                              amask, n_rows=na * ab, poison_rows=None,
                              distinct=dwalk)
        vnew = _ab_select(at2, lid_new, ab=ab, five=five, textured=textured)
        att = tuple(jnp.where(upd_any, v, a) for v, a in zip(vnew, att))
    t_exit = jnp.minimum(t_nx, t_nz)
    cont = marching & (t_exit < t_b) & (t_exit < t_end)
    cross_x = t_nx <= t_nz
    adv_x = cont & cross_x
    adv_z = cont & ~cross_x
    icx_a = jnp.where(adv_x, jnp.clip(icx + step_x, 0, fmaxx.astype(jnp.int32)), icx)
    icz_a = jnp.where(adv_z, jnp.clip(icz + step_z, 0, fmaxz.astype(jnp.int32)), icz)
    t_nx_a = jnp.where(adv_x, t_nx + dt_x, t_nx)
    t_nz_a = jnp.where(adv_z, t_nz + dt_z, t_nz)
    if freeze:
        # consume the advance results but pin the march state: cells, page
        # spreads and lane roles stay constant, so every cut variant runs
        # an identical, realistic instruction stream forever
        icx = jnp.where(never, icx_a, icx)
        icz = jnp.where(never, icz_a, icz)
        t_nx = jnp.where(never, t_nx_a, t_nx)
        t_nz = jnp.where(never, t_nz_a, t_nz)
        cell = (icx << 12) | icz
        marching = marching | (never & cont)
    else:
        icx, icz, t_nx, t_nz = icx_a, icz_a, t_nx_a, t_nz_a
        cell = (icx << 12) | icz
        marching = cont

    seg_done = alive & ~marching
    hit = t_b < BIG

    # ---- winner resolution -------------------------------------------------
    is_direct = bkey >= _TAG
    if carry:
        # grid winners' attrs were fetched at update time and ride the
        # carried state rows — nothing to fetch here
        mat, c0x, c0y, c0z, fuzz = att[0], att[1], att[2], att[3], att[4]
        wcy = att[5] if five else None
        ft = list(att[na - 4 : na]) if textured else None
    else:
        # legacy resolve (CARRY=False A/B reference): walk the 2-D box of
        # the chunk's WINNER pages at seg_done time
        bkey_i = bkey.astype(jnp.int32)
        sx_w = bkey_i >> 14
        sz_w = (bkey_i >> 9) & 31
        lid = bkey_i & 511
        want = seg_done & hit & ~is_direct
        if freeze:
            # nothing ever terminates under freeze, so the real `want` mask
            # is empty and the attrs fetch loop would run ZERO trips; probe
            # it at the march's own (realistic, frozen) page assignment
            sx_w, sz_w, lid, want = sxm, szm, fc, marching
        if cut("resolve"):
            at = jax.lax.broadcast_in_dim(bkey, (na * ab, bkey.shape[1]),
                                          (0, 1))
        else:
            at = _page_fetch(attrs_ref, sx_w, sz_w, nsczm_i, lid & 127, want,
                             n_rows=na * ab, poison_rows=None,
                             distinct=dwalk)
        vres = _ab_select(at, lid, ab=ab, five=five, textured=textured)
        mat, c0x, c0y, c0z, fuzz = vres[0], vres[1], vres[2], vres[3], vres[4]
        wcy = vres[5] if five else None
        ft = vres[na - 4 : na] if textured else None

    # globals: center/tex/c1/mat/c0/attr from the tiny SMEM table
    bidx_f = jnp.where(is_direct, bkey - _TAG, np.float32(-1.0))
    gsel = [jnp.full_like(t_b, gtab_ref[0, c]) for c in
            (0, 1, 2, 5, 6, 7, 8, 9, 10, 11, 12, 13)]
    if not cut("gsel"):
        for k in range(1, gtab_ref.shape[0]):
            sel = bidx_f == gtab_ref[k, 4]
            for i, c in enumerate((0, 1, 2, 5, 6, 7, 8, 9, 10, 11, 12, 13)):
                gsel[i] = jnp.where(sel, gtab_ref[k, c], gsel[i])
    (gcx, gcy, gcz, gmat, gtex, gc0x, gc0y, gc0z,
     gc1x, gc1y, gc1z, gattr) = gsel
    cenx = jnp.where(is_direct, gcx, wcx)
    ceny = jnp.where(is_direct, gcy, wcy if five else cy_u)
    cenz = jnp.where(is_direct, gcz, wcz)
    tex = jnp.where(is_direct, gtex, ft[0] if textured else 0.0)
    c1x = jnp.where(is_direct, gc1x, ft[1] if textured else 0.0)
    c1y = jnp.where(is_direct, gc1y, ft[2] if textured else 0.0)
    c1z = jnp.where(is_direct, gc1z, ft[3] if textured else 0.0)
    mat = jnp.where(is_direct, gmat, mat)
    c0x = jnp.where(is_direct, gc0x, c0x)
    c0y = jnp.where(is_direct, gc0y, c0y)
    c0z = jnp.where(is_direct, gc0z, c0z)
    fuzz = jnp.where(is_direct, gattr, fuzz)

    # ---- shading (shared rows implementation) ------------------------------
    if cut("shade"):
        (px_, py_, pz_, ax, ay, az, sdx, sdy, sdz) = (
            ox, oy, oz, dx, dy, dz, dx, dy, dz)
        does_scatter = t_b < BIG
        seed_h = seed
    else:
        (px_, py_, pz_, ax, ay, az, sdx, sdy, sdz, does_scatter,
         seed_h) = shade_rows(ox, oy, oz, dx, dy, dz, t_b, seed,
                              cenx, ceny, cenz, mat, tex, c0x, c0y, c0z,
                              c1x, c1y, c1z, fuzz)

    # ---- termination & accumulation ----------------------------------------
    scatters = hit & does_scatter
    deep = (depth + 1) >= max_depth
    cont_b = seg_done & scatters & ~deep
    # Russian-roulette fast mode — the exact structure of
    # gridkernel._iterate (see its comment); rr=None keeps the bit chain
    ntx = tx_ * ax
    nty = ty_ * ay
    ntz = tz_ * az
    if rr is not None:
        d0, d1, pmin = rr
        dnext = depth + 1
        p = jnp.minimum(np.float32(1.0), jnp.maximum(
            np.float32(pmin), jnp.maximum(ntx, jnp.maximum(nty, ntz))))
        if d1:
            p = jnp.where(dnext >= d1, p * np.float32(0.5), p)
        considered = cont_b & (dnext >= d0)
        seed_pre = jnp.where(seg_done & hit, seed_h, seed)
        seed_rr, u_rr = rngops.random_float(seed_pre)
        killed = considered & (u_rr >= p)
        cont_b = cont_b & ~killed
        ntx = jnp.where(considered, ntx / p, ntx)
        nty = jnp.where(considered, nty / p, nty)
        ntz = jnp.where(considered, ntz / p, ntz)
    term = seg_done & ~cont_b
    lx = jnp.where(hit, jnp.where(does_scatter, 0.0, ax), _SKY[0])
    ly = jnp.where(hit, jnp.where(does_scatter, 0.0, ay), _SKY[1])
    lz = jnp.where(hit, jnp.where(does_scatter, 0.0, az), _SKY[2])
    cur_x = cr_ + jnp.where(term, tx_ * lx, 0.0)
    cur_y = cg_ + jnp.where(term, ty_ * ly, 0.0)
    cur_z = cb2_ + jnp.where(term, tz_ * lz, 0.0)

    seed_a = jnp.where(seg_done & hit, seed_h, seed)
    if rr is not None:
        seed_a = jnp.where(considered, seed_rr, seed_a)

    # ---- regen (pixel addressing via lane0 — lanes get re-bucketed) --------
    more = term & (sidx < spp_i)
    pix_done = term & ~more

    m2 = mrow + pix_done.astype(jnp.int32)
    pix2 = m2 * n_lanes + lane0
    valid2 = (m2 < m_slots) & (pix2 < p_total)
    adv = pix_done & valid2
    px2 = pix2 % width
    py2 = pix2 // width
    fx2 = (offx + px2).astype(jnp.float32)
    fy2 = (y0 + py2).astype(jnp.float32)

    @pl.when(jnp.any(pix_done))
    def _flush():
        for m in range(m_slots):
            sel = pix_done & (mrow == m)
            for c, cur in enumerate((cur_x, cur_y, cur_z)):
                row = acc_ref[3 * m + c : 3 * m + c + 1, :]
                acc_ref[3 * m + c : 3 * m + c + 1, :] = (
                    row + jnp.where(sel, cur, 0.0))

    cur_x = jnp.where(pix_done, 0.0, cur_x)
    cur_y = jnp.where(pix_done, 0.0, cur_y)
    cur_z = jnp.where(pix_done, 0.0, cur_z)
    # TEA reseed every iteration: gating it behind the flush's pl.when with a
    # scratch row was MEASURED 25% SLOWER at 1000 spp (8.27 -> 10.39
    # ns/sample) — the branch + VMEM scratch round-trip costs more than the
    # 2x16 hash rounds it saves.  Do not re-attempt.
    if cut("tea"):
        fresh = seed
    else:
        fresh = rngops.tea_hash(
            rngops.tea_hash(px2.astype(jnp.uint32),
                            (seed_y0 + py2).astype(jnp.uint32)),
            number,
        )
    regen = more | adv
    seed_c = jnp.where(adv, fresh, seed_a)
    fxn = jnp.where(adv, fx2, fx)
    fyn = jnp.where(adv, fy2, fy)
    if cut("camera"):
        seed_r, (cox, coy, coz), (cdx, cdy, cdz) = (
            seed_c, (ox, oy, oz), (dx, dy, dz))
    else:
        seed_r, (cox, coy, coz), (cdx, cdy, cdz) = _camera_rays_rows(
            seed_c, fxn, fyn, vpr_ref)

    bx_, by_, bz_ = _norm3(sdx, sdy, sdz)

    return (
        jnp.where(cont_b, px_, jnp.where(regen, cox, ox)),
        jnp.where(cont_b, py_, jnp.where(regen, coy, oy)),
        jnp.where(cont_b, pz_, jnp.where(regen, coz, oz)),
        jnp.where(cont_b, bx_, jnp.where(regen, cdx, dx)),
        jnp.where(cont_b, by_, jnp.where(regen, cdy, dy)),
        jnp.where(cont_b, bz_, jnp.where(regen, cdz, dz)),
        fxn,
        fyn,
        jnp.where(cont_b, ntx, jnp.where(regen, 1.0, tx_)),
        jnp.where(cont_b, nty, jnp.where(regen, 1.0, ty_)),
        jnp.where(cont_b, ntz, jnp.where(regen, 1.0, tz_)),
        t_b,
        t_end,
        t_nx,
        t_nz,
        bkey,
        wcx,
        wcz,
        cur_x,
        cur_y,
        cur_z,
        jnp.where(seg_done, jnp.where(regen, seed_r, seed_a), seed),
        m2,
        jnp.where(adv, 1, sidx + more.astype(jnp.int32)),
        jnp.where(cont_b, depth + 1, jnp.where(regen, 0, depth)),
        (marching | (seg_done & (cont_b | regen))).astype(jnp.int32),
        marching.astype(jnp.int32),
        cell,
        lane0,
        *att,
    )


def _kernel(scal_ref, vpr_ref, gscal_ref, gtab_ref, geom_ref, govf_ref,
            lids_ref, attrs_ref, fin_ref, uin_ref, fout_ref, uout_ref,
            acc_ref, *, m_slots, n_lanes, p_total, width, max_depth, tmin,
            tmax, k_steps, n_slots, ab, skip_tmax, ablate, five=False,
            textured=False, carry=True, rr=None):
    # ---- per-tile dead-skip (drain harvest, VERDICT r4 item 1) ----------
    # The driver's rebucket sorts dead lanes last (trace.py _pred_page key
    # 4097), so drain-phase dead lanes compact into whole dead tiles; a
    # dead tile passes its state through untouched (one any-reduce + block
    # DMA instead of k_steps full iterations).  Output-identical: the
    # driver reads only the acc rows (invariant for dead lanes — they
    # accumulate nothing) and U_LANE0 (never rewritten), and dead lanes
    # never resurrect (alive = marching | continuing, both false).
    if "noskipdead" not in ablate:
        tile_alive = jnp.any(uin_ref[U_ALIVE : U_ALIVE + 1, :] != 0)

        @pl.when(jnp.logical_not(tile_alive))
        def _passthrough():
            fout_ref[:, :] = fin_ref[:, :]
            uout_ref[:, :] = uin_ref[:, :]

        run_gate = pl.when(tile_alive)
    else:
        def run_gate(fn):
            return fn()

    @run_gate
    def _run_body():
        _kernel_body(
            scal_ref, vpr_ref, gscal_ref, gtab_ref, geom_ref, govf_ref,
            lids_ref, attrs_ref,
            fin_ref, uin_ref, fout_ref, uout_ref, acc_ref, m_slots=m_slots,
            n_lanes=n_lanes, p_total=p_total, width=width,
            max_depth=max_depth, tmin=tmin, tmax=tmax, k_steps=k_steps,
            n_slots=n_slots, ab=ab, skip_tmax=skip_tmax, ablate=ablate,
            five=five, textured=textured, carry=carry, rr=rr)


def _kernel_body(scal_ref, vpr_ref, gscal_ref, gtab_ref, geom_ref, govf_ref,
                 lids_ref, attrs_ref, fin_ref, uin_ref, fout_ref, uout_ref,
                 acc_ref, *, m_slots, n_lanes, p_total, width, max_depth,
                 tmin, tmax, k_steps, n_slots, ab, skip_tmax, ablate, five,
                 textured, carry, rr):
    a0 = R_ACC + 3 * m_slots  # carried attr rows live after the acc slots
    nc = n_carry(five, textured) if carry else 0
    st = (
        *_vec3(fin_ref, R_O),
        *_vec3(fin_ref, R_D),
        fin_ref[R_FX : R_FX + 1, :],
        fin_ref[R_FY : R_FY + 1, :],
        *_vec3(fin_ref, R_THR),
        fin_ref[R_TB : R_TB + 1, :],
        fin_ref[R_TE : R_TE + 1, :],
        fin_ref[R_TNX : R_TNX + 1, :],
        fin_ref[R_TNZ : R_TNZ + 1, :],
        fin_ref[R_BKEY : R_BKEY + 1, :],
        fin_ref[R_WCX : R_WCX + 1, :],
        fin_ref[R_WCZ : R_WCZ + 1, :],
        *_vec3(fin_ref, R_CUR),
        uin_ref[U_SEED : U_SEED + 1, :],
        uin_ref[U_M : U_M + 1, :].astype(jnp.int32),
        uin_ref[U_SIDX : U_SIDX + 1, :].astype(jnp.int32),
        uin_ref[U_DEPTH : U_DEPTH + 1, :].astype(jnp.int32),
        (uin_ref[U_ALIVE : U_ALIVE + 1, :] != 0).astype(jnp.int32),
        (uin_ref[U_MARCH : U_MARCH + 1, :] != 0).astype(jnp.int32),
        uin_ref[U_CELL : U_CELL + 1, :].astype(jnp.int32),
        uin_ref[U_LANE0 : U_LANE0 + 1, :].astype(jnp.int32),
        *(fin_ref[a0 + i : a0 + i + 1, :] for i in range(nc)),
    )
    acc_ref[:, :] = fin_ref[R_ACC : R_ACC + 3 * m_slots, :]

    step = functools.partial(
        _iterate, acc_ref=acc_ref, scal_ref=scal_ref, vpr_ref=vpr_ref,
        gscal_ref=gscal_ref, gtab_ref=gtab_ref, geom_ref=geom_ref,
        govf_ref=govf_ref,
        lids_ref=lids_ref, attrs_ref=attrs_ref, m_slots=m_slots, n_lanes=n_lanes,
        p_total=p_total, width=width, max_depth=max_depth, tmin=tmin,
        tmax=tmax, skip_tmax=skip_tmax, n_slots=n_slots, ab=ab,
        ablate=ablate, five=five, textured=textured, carry=carry, rr=rr,
    )

    def body(_, st):
        return step(st)

    st = jax.lax.fori_loop(0, k_steps, body, st)

    (ox, oy, oz, dx, dy, dz, fx, fy, tx_, ty_, tz_,
     t_b, t_end, t_nx, t_nz, bkey, wcx, wcz, cur_x, cur_y, cur_z,
     seed, mrow, sidx, depth, alive, march, cell, lane0) = st[:29]
    for i, v in enumerate((ox, oy, oz, dx, dy, dz, fx, fy, tx_, ty_, tz_,
                           t_b, t_end, t_nx, t_nz, bkey, wcx, wcz, cur_x,
                           cur_y, cur_z)):
        fout_ref[i : i + 1, :] = v
    fout_ref[R_ACC : R_ACC + 3 * m_slots, :] = acc_ref[:, :]
    for i in range(nc):
        fout_ref[a0 + i : a0 + i + 1, :] = st[29 + i]
    rf = pf_rows(m_slots, nc)
    tail0 = a0 + nc
    if tail0 < rf:
        fout_ref[tail0:rf, :] = fin_ref[tail0:rf, :]

    uout_ref[U_SEED : U_SEED + 1, :] = seed
    uout_ref[U_M : U_M + 1, :] = mrow.astype(jnp.uint32)
    uout_ref[U_SIDX : U_SIDX + 1, :] = sidx.astype(jnp.uint32)
    uout_ref[U_DEPTH : U_DEPTH + 1, :] = depth.astype(jnp.uint32)
    uout_ref[U_ALIVE : U_ALIVE + 1, :] = alive.astype(jnp.uint32)
    uout_ref[U_MARCH : U_MARCH + 1, :] = march.astype(jnp.uint32)
    uout_ref[U_CELL : U_CELL + 1, :] = cell.astype(jnp.uint32)
    uout_ref[U_LANE0 : U_LANE0 + 1, :] = lane0.astype(jnp.uint32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "m_slots", "n_lanes", "p_total", "width", "max_depth", "k_steps",
        "skip_tmax", "ablate", "interpret", "five", "textured", "carry",
        "rr",
    ),
)
def paged_megakernel_step(scal, vpr, gscal, gtab, geom, lids, attrs, fstate,
                          ustate, *, m_slots, n_lanes, p_total, width,
                          max_depth, k_steps=K_STEPS, skip_tmax=False,
                          ablate=(), interpret=False, five=False,
                          textured=False, carry=True, rr=None, govf=None):
    """``k_steps`` paged-grid wavefront iterations over all lanes.

    ``govf``: optional overflow slot table (models/paged_grid.py
    PagedGridTables.govf) — when present, ``geom`` holds only the hot
    slots and the kernel fetches the rest in a rare masked box loop.
    """
    n_pad = fstate.shape[1]
    rf = pf_rows(m_slots, n_carry(five, textured) if carry else 0)
    grid = n_pad // TILE
    n_slots = lids.shape[1]
    wq = 4 if five else 3
    assert (geom.shape[1] + (0 if govf is None else govf.shape[1])
            == wq * n_slots), (geom.shape, None if govf is None
                               else govf.shape, lids.shape, five)
    ab = attrs.shape[1] // ((6 if five else 5) + (4 if textured else 0))
    kw = dict(
        m_slots=m_slots, n_lanes=n_lanes, p_total=p_total,
        width=width, max_depth=max_depth, tmin=np.float32(config.T_MIN),
        tmax=np.float32(config.MAX_RAY_COLLISION_DISTANCE), k_steps=k_steps,
        n_slots=n_slots, ab=ab, skip_tmax=skip_tmax,
        ablate=frozenset(ablate), five=five, textured=textured, carry=carry,
        rr=rr,
    )
    if govf is None:
        def kernel(scal_ref, vpr_ref, gscal_ref, gtab_ref, geom_ref,
                   lids_ref, attrs_ref, fin_ref, uin_ref, fout_ref,
                   uout_ref, acc_ref):
            _kernel(scal_ref, vpr_ref, gscal_ref, gtab_ref, geom_ref, None,
                    lids_ref, attrs_ref, fin_ref, uin_ref, fout_ref,
                    uout_ref, acc_ref, **kw)
    else:
        def kernel(scal_ref, vpr_ref, gscal_ref, gtab_ref, geom_ref,
                   govf_ref, lids_ref, attrs_ref, fin_ref, uin_ref,
                   fout_ref, uout_ref, acc_ref):
            _kernel(scal_ref, vpr_ref, gscal_ref, gtab_ref, geom_ref,
                    govf_ref, lids_ref, attrs_ref, fin_ref, uin_ref,
                    fout_ref, uout_ref, acc_ref, **kw)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scal (1, 8) i32
        pl.BlockSpec(memory_space=pltpu.SMEM),  # vpr (1, 24) f32
        pl.BlockSpec(memory_space=pltpu.SMEM),  # gscal (1, 16) f32
        pl.BlockSpec(memory_space=pltpu.SMEM),  # gtab (Gp, 16) f32
        pl.BlockSpec(geom.shape, lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [scal, vpr, gscal, gtab, geom]
    if govf is not None:
        in_specs.append(pl.BlockSpec(govf.shape, lambda g: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(govf)
    in_specs += [
        pl.BlockSpec(lids.shape, lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(attrs.shape, lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rf, TILE), lambda g: (0, g), memory_space=pltpu.VMEM),
        pl.BlockSpec((U_ROWS, TILE), lambda g: (0, g), memory_space=pltpu.VMEM),
    ]
    inputs += [lids, attrs, fstate, ustate]
    nin = len(inputs)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((rf, TILE), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((U_ROWS, TILE), lambda g: (0, g), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rf, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((U_ROWS, n_pad), jnp.uint32),
        ],
        # buffer reuse; all rows written
        input_output_aliases={nin - 2: 0, nin - 1: 1},
        scratch_shapes=[pltpu.VMEM((3 * m_slots, TILE), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(*inputs)
