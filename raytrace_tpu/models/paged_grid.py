"""Paged two-level grid — the acceleration structure for dense/large scenes.

The flat grid (models/grid.py) tops out at ~640 cells because Mosaic's
per-lane lane-gather addresses at most 128 table columns x a handful of
select-chained blocks.  Dense scenes (BASELINE config 5: 100k spheres at 10
spheres/unit^2) need ~40k fine cells, far past that wall.  This structure
breaks the wall with PAGING + wavefront locality:

 - fine cells (size ``s``) are grouped into 8x8 supercell PAGES; each page's
   candidate slots live in a contiguous VMEM row block, so a *scalar* page
   id can slice it dynamically (``pl.ds``), and the within-page fine-cell
   index (<128) is a legal lane-gather;
 - the kernel fetches per 128-lane chunk: reduce the chunk's page ids to
   [qmin, qmax] scalars and loop the (tiny, when lanes are coherent) page
   range, masking each lane to its own page;
 - lane coherence is maintained by the driver: every kernel invocation,
   lanes are re-bucketed (argsort by current page) at the XLA level; pixel
   identity travels in a ``lane0`` state row.  Dense scenes keep paths local
   (mean free path ~0.3 units at 10/unit^2), so sorted lanes stay coherent
   across many bounces.

Per-page candidate slots store (cx, cz, kc) in ``geom`` plus a split-out
``lids`` table, where ``lid`` is the sphere's index in the page's LOCAL
sphere list — shading attributes are paged too (attrs addressed by
(page, lid)), so nothing ever indexes the global 100k-sphere table per
lane.  Global (large) spheres work exactly as in the flat grid.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from .grid import DELTA, MAX_GLOBALS, POISON

PAGE_LANES = 128
F_AXIS = 8  # fine cells per page along x
# Pages are 8x16 fine cells: the kernel's lane gather is 128 columns wide
# regardless, so an 8x8 page wastes half the width.  The 16-cell z extent
# fills all 128 columns, HALVES the page count (and VMEM), and halves
# z-page-boundary crossings — fewer trips for the kernel's 2-D box loops.
# Both geom AND attrs ride the same macro pages: bkey packs the winner as
# ((sx<<5)|sz)<<9 | lid with a 9-bit page-local sphere id (lid < ab*128,
# ab <= 4) — max value 2^20-1, exact in f32 below the 2^23 _TAG.
F_AXIS_Z = 16  # page fine cells along z
# Host-side tuning knob on the auto cell size (scripts/paged_cellsweep.py):
# smaller cells -> fewer slots (cheaper per-trip gathers) but more march
# steps.  Applied only when the caller doesn't pass cell_size explicitly.
CELL_SIZE_SCALE = 1.0
# Hot/overflow slot split (PagedGridTables.govf): hot_slots=-1 picks the
# HOT_QUANTILE quantile of per-(nonempty-)cell candidate counts, so ~that
# fraction of cells resolve from the hot fetch alone.  MEASURED FLAT on
# config 5 (scripts/hotsplit_ab.py, two interleaved hardware sessions:
# hot16 -7.2% then +4.2% vs unsplit — dispatch-scale noise +-10-20% that
# day swamped any effect; chunk-granular triggering plausibly returns the
# row saving as overflow box walks).  Default is therefore NO split
# (hot_slots=None); the mechanism, bit-identity pin and A/B script stay
# for re-measurement on other chips/scenes.
HOT_QUANTILE = 0.95
HOT_MIN_SAVE = 3  # don't split for fewer than this many overflow slots


class PagedGridTables(NamedTuple):
    """Device tables (pure array pytree; layout statics derive from shapes).

    geom:  [n_pages, 3*n_slots, 128] — pages are 8x16 fine cells; within a
           page, row (k*3 + v) is value v of slot k, v in (cx, cz, kc);
           columns are the page's 128 fine cells ((ix%8)*16 + iz%16).
           3-D so the kernel derives (n_pages, n_slots) from the shape
           (statics can't ride in a pytree) and slices pages with a scalar
           leading index.
    lids:  [n_pages, n_slots, 128] — slot k's page-local sphere id, SPLIT
           out of the geom rows (r5): the march loop's per-trip gather
           fetches only the quadratic inputs (25% fewer rows on the
           4-value layout, 20% on the 5-value one — the march fetch is
           the paged kernel's dominant serial cost), while the lid is
           fetched in its own mostly-zero-trip box loop masked by "winner
           improved this cell" (~once per segment).  Net VMEM: zero (rows
           moved, not added).
    attrs: [n_pages, 5*ab, 128] — same 8x16 pages; row (v*ab + b) is attr
           v (mat, c0.rgb, attr) of the page's local spheres b*128..;
           lid < ab*128 <= 512 (9-bit bkey field).
    gtab:  [Gp, 16] global spheres (grid.py layout).
    gscal: [1, 16] f32: xlo,xhi,ylo,yhi,zlo,zhi, fminx,fminz, nscz8, cy,
           fmaxx,fmaxz, inv_s, s, nscz (nscz8 = legacy 8x8 z page count,
           kept for the driver's linear-sort-key A/B)
    """

    geom: np.ndarray
    lids: np.ndarray
    attrs: np.ndarray
    gtab: np.ndarray
    gscal: np.ndarray
    has_cy: Optional[np.ndarray] = None  # non-None ((1, 1) f32 zero) marks
    #   the general varying-height layout: geom slots carry 5 values
    #   (cx, cy, cz, kc, lid) and attrs carry an extra value row set (the
    #   sphere's center y) so winner resolution can reconstruct the full
    #   center.  Pytree STRUCTURE is static under jit, so the kernel
    #   layout-switches on ``has_cy is not None`` without a traced read
    #   (geom.shape[1] alone is ambiguous between 4- and 5-value slots).
    has_tex: Optional[np.ndarray] = None  # non-None marks textured FIELD
    #   spheres: attrs carry 4 more value sets (tex, c1.rgb) appended after
    #   (mat, c0.rgb, attr[, cy]), and winner resolution reads tex/c1 from
    #   the page fetch instead of zeros.  Same optional-field static
    #   channel as has_cy.
    govf: Optional[np.ndarray] = None  # hot/overflow slot split (r5):
    #   n_slots is the MAX per-cell candidate count, but the mean is far
    #   lower (~8 vs 22 on the 100k field), so the march loop's per-trip
    #   gather — row-cost-proportional (the lid split measured -12.6% for
    #   -20% rows) — mostly fetches poisoned slots.  When set, ``geom``
    #   holds only the first ``hot`` slots (covering ~HOT_QUANTILE of
    #   nonempty cells) and ``govf`` [n_pages, w*(n_slots-hot), 128] the
    #   rest; the kernel fetches govf in a second box loop masked by
    #   "slot hot-1's kc is non-poison" (count >= hot — conservative:
    #   lanes in shallow cells never trigger it).  Slot ORDER is
    #   unchanged, so candidates are tested in the same sequence and the
    #   image is bit-identical to the unsplit layout.  The kernel derives
    #   the split point from geom.shape (statics can't ride a pytree).


# gscal slots (first 12 match models.grid G_* where meaningful)
P_XLO, P_XHI, P_YLO, P_YHI, P_ZLO, P_ZHI = 0, 1, 2, 3, 4, 5
P_FMINX, P_FMINZ, P_NSCZ, P_CY, P_FMAXX, P_FMAXZ = 6, 7, 8, 9, 10, 11
P_INVS, P_S = 12, 13
P_NSCZM = 14  # geom (8x16 macro) page count along z


def build_paged_grid(scene, table: np.ndarray, cell_size: Optional[float] = None,
                     max_slots: int = 32, max_ab: int = 4, pad_slots: int = 0,
                     hot_slots: Optional[int] = None):
    """Build paged tables or return None when the scene doesn't fit
    (crowded fine cells / oversized page sphere lists / non-uniform field).

    ``pad_slots``: raise n_slots to at least this (extra slots stay POISON —
    guaranteed misses, image bits unchanged).  Row-sensitivity probe for the
    march fetch: if padded tables time FLAT, per-trip gather cost is fixed-
    cost-bound and slot-count reduction work is pointless (and vice versa).

    ``hot_slots``: hot/overflow split point (see PagedGridTables.govf).
    None (default) = no split — measured flat on config 5, see the
    HOT_QUANTILE note; -1 = auto (HOT_QUANTILE of per-cell candidate
    counts); an explicit int pins the split there.  Image bits are
    invariant to the choice.
    """
    centers = np.asarray(scene.centers, np.float32)
    radii = np.asarray(scene.radii, np.float32)
    n = int(scene.n_spheres)
    if n == 0:
        return None
    kc = np.asarray(table[:, 3], np.float32)

    small = radii[:n] <= 0.5 - DELTA
    idx_all = np.arange(n)
    g_idx = idx_all[~small]
    s_idx = idx_all[small]
    if len(g_idx) > MAX_GLOBALS or len(s_idx) == 0:
        return None
    cy = centers[s_idx, 1]
    # uniform field height keeps the 4-value geom slots with cy a gscal
    # scalar; varying heights switch to the 5-value layout (has_cy)
    uniform_y = bool(np.all(cy == cy[0]))
    textured = bool(np.any(np.asarray(scene.texture)[s_idx] != 0))

    cx, cz = centers[s_idx, 0], centers[s_idx, 2]
    r = radii[s_idx]
    if cell_size is None:
        # target ~8 expected candidates per cell:
        # density * (s + 2r + 2 DELTA)^2 ~ 8
        area = float((cx.max() - cx.min() + 1) * (cz.max() - cz.min() + 1))
        density = len(s_idx) / max(area, 1.0)
        reach = 2.0 * float(r.max()) + 2.0 * DELTA
        cell_size = max(0.25, np.sqrt(8.0 / density) - reach) * CELL_SIZE_SCALE
    s = np.float32(cell_size)

    # fine lattice: cell i covers [fmin + i*s, fmin + (i+1)*s)
    fmin_x = np.float32(np.floor((cx - r - DELTA).min() / s) * s)
    fmin_z = np.float32(np.floor((cz - r - DELTA).min() / s) * s)
    nfx = int(np.ceil(((cx + r + DELTA).max() - fmin_x) / s)) + 1
    nfz = int(np.ceil(((cz + r + DELTA).max() - fmin_z) / s)) + 1
    nsc_x = -(-nfx // F_AXIS)
    nsc_z8 = -(-nfz // F_AXIS)  # legacy 8x8 z count (driver A/B key only)
    nsc_z = -(-nfz // F_AXIS_Z)
    n_pages = nsc_x * nsc_z
    if nsc_x > 64 or nsc_z > 32:
        return None  # kernel bkey packs page coords in 6+5 bit fields

    # register spheres into fine cells (delta-enlarged AABB) — vectorized:
    # emit one (cell, sphere) pair per overlapped cell via span offsets
    fcx = np.floor((cx - r - DELTA - fmin_x) / s).astype(np.int64)
    fcx1 = np.floor((cx + r + DELTA - fmin_x) / s).astype(np.int64)
    fcz = np.floor((cz - r - DELTA - fmin_z) / s).astype(np.int64)
    fcz1 = np.floor((cz + r + DELTA - fmin_z) / s).astype(np.int64)
    span_x = fcx1 - fcx
    span_z = fcz1 - fcz
    sis, ixs, izs = [], [], []
    all_si = np.arange(len(s_idx), dtype=np.int64)
    for ox in range(int(span_x.max()) + 1):
        for oz in range(int(span_z.max()) + 1):
            m = (ox <= span_x) & (oz <= span_z)
            ix = fcx[m] + ox
            iz = fcz[m] + oz
            ok = (ix >= 0) & (ix < nfx) & (iz >= 0) & (iz < nfz)
            sis.append(all_si[m][ok])
            ixs.append(ix[ok])
            izs.append(iz[ok])
    sis = np.concatenate(sis)
    ixs = np.concatenate(ixs)
    izs = np.concatenate(izs)
    cell = ixs * nfz + izs
    # sort by (cell, sphere) -> per-cell slots in ascending global-index order
    order = np.lexsort((sis, cell))
    cell, sis, ixs, izs = cell[order], sis[order], ixs[order], izs[order]
    cell_start = np.r_[True, cell[1:] != cell[:-1]]
    # rank within cell
    start_pos = np.flatnonzero(cell_start)
    rank = np.arange(len(cell)) - np.repeat(start_pos, np.diff(np.r_[start_pos, len(cell)]))
    n_slots = int(rank.max()) + 1 if len(rank) else 1
    n_slots = max(n_slots, pad_slots)
    if n_slots > max_slots:
        return None
    # hot/overflow split point (see PagedGridTables.govf): quantile of
    # per-nonempty-cell candidate counts
    if hot_slots is None:
        hot = n_slots  # default: no split (measured flat — HOT_QUANTILE note)
    elif hot_slots == -1:
        counts = np.diff(np.r_[start_pos, len(cell)])
        hot = (int(np.ceil(np.quantile(counts, HOT_QUANTILE)))
               if len(counts) else n_slots)
    else:
        hot = int(hot_slots)
    hot = min(max(hot, 1), n_slots)
    if n_slots - hot < HOT_MIN_SAVE:
        hot = n_slots
    page = (ixs // F_AXIS) * nsc_z + (izs // F_AXIS_Z)  # 8x16 page

    # page-local sphere ids: unique (page, sphere) ranked within page
    ps = np.unique(page * (len(s_idx) + 1) + sis)
    p_of = ps // (len(s_idx) + 1)
    s_of = ps % (len(s_idx) + 1)
    p_start = np.flatnonzero(np.r_[True, p_of[1:] != p_of[:-1]])
    lid_of = np.arange(len(ps)) - np.repeat(
        p_start, np.diff(np.r_[p_start, len(ps)]))
    max_local = int(lid_of.max()) + 1 if len(lid_of) else 1
    ab = -(-max_local // PAGE_LANES)
    if ab > max_ab:
        return None
    w = 3 if uniform_y else 4  # geom values per slot (cx[, cy], cz, kc);
    # the lid rides its own table (see PagedGridTables.lids)
    # attr value sets: (mat, c0.rgb, attr) + center y when heights vary
    # + (tex, c1.rgb) when field spheres are textured
    na = (5 if uniform_y else 6) + (4 if textured else 0)
    r0 = w * n_slots
    if n_pages * (r0 + n_slots + na * ab) * PAGE_LANES * 4 > 72 * 2**20:
        return None  # VMEM budget (geom + lids + attrs)

    # lid lookup for each (page, sphere) registration pair
    lid_map = dict(zip(ps.tolist(), lid_of.tolist()))
    lids = np.array([lid_map[p * (len(s_idx) + 1) + si]
                     for p, si in zip(page.tolist(), sis.tolist())], np.int64)

    geom = np.zeros((n_pages * r0, PAGE_LANES), np.float32)
    geom[(w - 1) :: w, :] = POISON  # kc rows default to miss
    lidt = np.zeros((n_pages * n_slots, PAGE_LANES), np.float32)
    a0 = na * ab
    attrs = np.zeros((n_pages * a0, PAGE_LANES), np.float32)

    fc = (ixs % F_AXIS) * F_AXIS_Z + (izs % F_AXIS_Z)
    base = page * r0 + rank * w
    if uniform_y:
        geom[base + 0, fc] = cx[sis]
        geom[base + 1, fc] = cz[sis]
        geom[base + 2, fc] = kc[s_idx[sis]]
    else:
        geom[base + 0, fc] = cx[sis]
        geom[base + 1, fc] = cy[sis]
        geom[base + 2, fc] = cz[sis]
        geom[base + 3, fc] = kc[s_idx[sis]]
    lidt[page * n_slots + rank, fc] = lids.astype(np.float32)

    sph = s_idx[s_of]
    b_, c_ = np.divmod(lid_of, PAGE_LANES)
    attrs[p_of * a0 + 0 * ab + b_, c_] = table[sph, 11]  # mat
    attrs[p_of * a0 + 1 * ab + b_, c_] = table[sph, 13]  # c0.r
    attrs[p_of * a0 + 2 * ab + b_, c_] = table[sph, 14]
    attrs[p_of * a0 + 3 * ab + b_, c_] = table[sph, 15]
    attrs[p_of * a0 + 4 * ab + b_, c_] = table[sph, 19]  # attr
    if not uniform_y:
        attrs[p_of * a0 + 5 * ab + b_, c_] = centers[sph, 1]  # center y
    if textured:
        t0 = (5 if uniform_y else 6) * ab
        attrs[p_of * a0 + t0 + 0 * ab + b_, c_] = table[sph, 12]  # tex
        attrs[p_of * a0 + t0 + 1 * ab + b_, c_] = table[sph, 16]  # c1.r
        attrs[p_of * a0 + t0 + 2 * ab + b_, c_] = table[sph, 17]
        attrs[p_of * a0 + t0 + 3 * ab + b_, c_] = table[sph, 18]

    g_pad = max(4, len(g_idx))
    gtab = np.zeros((g_pad, 16), np.float32)
    gtab[:, 3] = POISON
    gtab[:, 4] = -2.0
    for k, sphere in enumerate(g_idx):
        gtab[k, 0:3] = centers[sphere]
        gtab[k, 3] = kc[sphere]
        gtab[k, 4] = np.float32(sphere)
        gtab[k, 5] = np.float32(scene.material[sphere])
        gtab[k, 6] = np.float32(scene.texture[sphere])
        gtab[k, 7:10] = np.asarray(scene.color0[sphere], np.float32)
        gtab[k, 10:13] = np.asarray(scene.color1[sphere], np.float32)
        gtab[k, 13] = np.float32(scene.attr[sphere])

    y_lo = np.float32((cy - radii[s_idx]).min() - DELTA)
    y_hi = np.float32((cy + radii[s_idx]).max() + DELTA)
    gscal = np.zeros((1, 16), np.float32)
    gscal[0, P_XLO] = fmin_x
    gscal[0, P_XHI] = np.float32(fmin_x + nfx * s)
    gscal[0, P_YLO] = y_lo
    gscal[0, P_YHI] = y_hi
    gscal[0, P_ZLO] = fmin_z
    gscal[0, P_ZHI] = np.float32(fmin_z + nfz * s)
    gscal[0, P_FMINX] = fmin_x
    gscal[0, P_FMINZ] = fmin_z
    gscal[0, P_NSCZ] = np.float32(nsc_z8)
    gscal[0, P_CY] = np.float32(cy[0])
    gscal[0, P_FMAXX] = np.float32(nfx - 1)  # max fine index, x
    gscal[0, P_FMAXZ] = np.float32(nfz - 1)
    gscal[0, P_INVS] = np.float32(1.0) / s
    gscal[0, P_S] = s
    gscal[0, P_NSCZM] = np.float32(nsc_z)

    geom3 = geom.reshape(n_pages, r0, PAGE_LANES)
    govf = None
    if hot < n_slots:
        govf = np.ascontiguousarray(geom3[:, w * hot :, :])
        geom3 = np.ascontiguousarray(geom3[:, : w * hot, :])

    return PagedGridTables(
        geom=geom3,
        govf=govf,
        lids=lidt.reshape(n_pages, n_slots, PAGE_LANES),
        attrs=attrs.reshape(n_pages, a0, PAGE_LANES),
        gtab=gtab, gscal=gscal,
        has_cy=None if uniform_y else np.zeros((1, 1), np.float32),
        has_tex=np.zeros((1, 1), np.float32) if textured else None)
