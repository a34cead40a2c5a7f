"""Fixed-iteration cost attribution for the PAGED kernel (100k scene).

Counterpart of scripts/grid_iterbench.py, with one structural difference:
the paged fetch's page loop has a DYNAMIC trip count (the chunk's page
spread), which collapses to zero on dead lanes — so this probe runs LIVE
lanes under the kernel's 'freeze' ablation: a short REAL warmup (fresh
rays, one production invocation, a page rebucket, another invocation)
produces a realistic mid-flight wavefront state, then 'freeze' pins the
march (cells never advance, nothing terminates) so every cut_* variant
executes an identical instruction stream at realistic page spreads for a
fixed invocation count.  Images are invalid; this is a cost probe only.

Usage: [N_SPHERES=100000] [INVOKES=60] [ROUNDS=5] [VARIANTS=...]
       python scripts/paged_iterbench.py
"""

import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.models.scene import random_sphere_field
from raytrace_tpu.models.paged_grid import P_NSCZ, P_NSCZM
from raytrace_tpu.ops import pagedkernel as pk
from raytrace_tpu.ops import rng as rngops
from raytrace_tpu.ops.megakernel import S_NUMBER, S_SEEDY0, S_SPP
from raytrace_tpu.ops.trace import _camera_rays, prepare_scene, viewport_arrays
from raytrace_tpu.runtime.renderer import reference_camera

W, H = 1920, 1080
M = 64
N_SPHERES = int(os.environ.get("N_SPHERES", 100_000))
INVOKES = int(os.environ.get("INVOKES", 60))
ROUNDS = int(os.environ.get("ROUNDS", 5))
VARIANTS = os.environ.get(
    "VARIANTS",
    "base,cut_fetch,cut_resolve,cut_quad,cut_shade,cut_globals,cut_init,"
    "cut_tea,cut_camera,cut_gsel").split(",")

ds = prepare_scene(random_sphere_field(N_SPHERES))
g = ds.paged
assert g is not None, "scene must build a paged grid"
vp = viewport_arrays(reference_camera(), W, H)

CARRY = os.environ.get("CARRY", "1") != "0"  # carried winner attrs (default)
FIVE = g.has_cy is not None
TEXTURED = g.has_tex is not None
p_total = W * H
n = -(-p_total // M)
n_pad = -(-n // pk.TILE) * pk.TILE
rf = pk.pf_rows(M, pk.n_carry(FIVE, TEXTURED) if CARRY else 0)
n_slots = g.lids.shape[1]
ab = g.attrs.shape[1] // ((6 if FIVE else 5) + (4 if TEXTURED else 0))
n_pages = g.geom.shape[0]
print(f"pages={n_pages} n_slots={n_slots} ab={ab} lanes={n} pad={n_pad}",
      flush=True)

# ---- fresh state (mirrors trace._render_band_paged's init) ----------------
lane = jnp.arange(n_pad, dtype=jnp.int32)
px = lane % W
py = lane // W
seed0 = rngops.tea_hash(
    rngops.tea_hash(px.astype(jnp.uint32), py.astype(jnp.uint32)),
    jnp.uint32(0))
seed, o, d = _camera_rays(seed0, px.astype(jnp.float32),
                          py.astype(jnp.float32), vp)
fstate = jnp.zeros((rf, n_pad), jnp.float32)
fstate = fstate.at[pk.R_O : pk.R_O + 3].set(o.T)
fstate = fstate.at[pk.R_D : pk.R_D + 3].set(d.T)
fstate = fstate.at[pk.R_THR : pk.R_THR + 3].set(1.0)
ustate = jnp.zeros((pk.U_ROWS, n_pad), jnp.uint32)
ustate = ustate.at[pk.U_SEED].set(seed)
ustate = ustate.at[pk.U_SIDX].set(1)
ustate = ustate.at[pk.U_ALIVE].set((lane < n).astype(jnp.uint32))
ustate = ustate.at[pk.U_LANE0].set(lane.astype(jnp.uint32))

scal = jnp.zeros((1, 8), jnp.int32)
scal = scal.at[0, S_SPP].set(1_000_000)  # lanes never exhaust
gscal = jnp.asarray(g.gscal)
gtab = jnp.asarray(g.gtab)
geom = jnp.asarray(g.geom)
lids = jnp.asarray(g.lids)
attrs = jnp.asarray(g.attrs)
vpr = jnp.concatenate([
    vp.horizontal, vp.vertical, vp.upper_left, vp.cam_up, vp.cam_right,
    vp.look_from, vp.aperture[None] if vp.aperture.ndim == 0 else vp.aperture,
    vp.size, jnp.zeros((3,), jnp.float32)]).reshape(1, 24)

step = functools.partial(
    pk.paged_megakernel_step, m_slots=M, n_lanes=n, p_total=p_total,
    width=W, max_depth=50, skip_tmax=True, five=FIVE, textured=TEXTURED,
    carry=CARRY,
    govf=None if g.govf is None else jnp.asarray(g.govf))


@jax.jit
def _rebucket(f, u):
    """Probe-grade rebucket: sort by the marching lanes' current page
    (production uses a predicted page for fresh lanes too — close enough
    for a spread-realistic snapshot)."""
    nscz = gscal[0, P_NSCZ].astype(jnp.int32)
    cell = u[pk.U_CELL].astype(jnp.int32)
    page = ((cell >> 12) >> 3) * nscz + ((cell & 4095) >> 3)
    marching = u[pk.U_MARCH] != 0
    alive = u[pk.U_ALIVE] != 0
    key = jnp.where(marching, page, n_pages)
    key = jnp.where(alive, key, n_pages + 1)
    perm = jnp.argsort(key, stable=True)
    return jnp.take(f, perm, axis=1), jnp.take(u, perm, axis=1)


# ---- warmup to a realistic mid-flight state -------------------------------
f, u = step(scal, vpr, gscal, gtab, geom, lids, attrs, fstate, ustate)
f, u = _rebucket(f, u)
f, u = step(scal, vpr, gscal, gtab, geom, lids, attrs, f, u)
f0 = jnp.asarray(np.asarray(f))
u0 = jnp.asarray(np.asarray(u))
march = np.asarray(u0[pk.U_MARCH]) != 0
cellh = np.asarray(u0[pk.U_CELL]).astype(np.int64)
nscz_h = int(np.asarray(gscal)[0, P_NSCZM])
pageh = ((cellh >> 12) >> 3) * nscz_h + ((cellh & 4095) >> 4)
sxh = (cellh >> 12) >> 3
szh = (cellh & 4095) >> 4  # geom (8x16 macro) pages — what the march fetch walks
spreads, boxes = [], []
for c in range(n_pad // 128):
    sl = slice(c * 128, (c + 1) * 128)
    mm = march[sl]
    pm = pageh[sl][mm]
    spreads.append(int(pm.max() - pm.min() + 1) if pm.size else 0)
    if mm.any():
        bx = (sxh[sl][mm].max() - sxh[sl][mm].min() + 1)
        bz = (szh[sl][mm].max() - szh[sl][mm].min() + 1)
        boxes.append(int(bx * bz))
    else:
        boxes.append(0)
spreads, boxes = np.array(spreads), np.array(boxes)
print(f"marching {march.sum()}/{n_pad}; per-chunk LINEAR page spread: "
      f"mean {spreads.mean():.1f} p50 {np.percentile(spreads,50):.0f} "
      f"p90 {np.percentile(spreads,90):.0f} max {spreads.max()}", flush=True)
print(f"per-chunk 2-D BOX trips (the kernel's loop count): "
      f"mean {boxes.mean():.1f} p50 {np.percentile(boxes,50):.0f} "
      f"p90 {np.percentile(boxes,90):.0f} max {boxes.max()}", flush=True)


@functools.partial(jax.jit, static_argnames=("ablate", "invokes"))
def _run_device(f, u, *, ablate, invokes):
    def body(_, st):
        f, u = st
        return step(scal, vpr, gscal, gtab, geom, lids, attrs, f, u,
                    ablate=ablate)

    return jax.lax.fori_loop(0, invokes, body, (f, u))


def run(ablate, invokes):
    f, u = _run_device(f0, u0, ablate=ablate, invokes=invokes)
    return np.asarray(f[0])  # host fetch = real sync


abls = {v: ("freeze",) if v == "base"
        else ("freeze",) + tuple(v.split("+")) for v in VARIANTS}
for v, abl in abls.items():
    t0 = time.perf_counter()
    run(abl, 2)
    print(f"{v}: warm {time.perf_counter()-t0:.0f}s", flush=True)

iters = INVOKES * pk.K_STEPS
tiles = n_pad // pk.TILE
times = {v: [] for v in VARIANTS}
for rnd in range(ROUNDS):
    for v in VARIANTS:
        t0 = time.perf_counter()
        run(abls[v], INVOKES)
        times[v].append(time.perf_counter() - t0)
    print(f"round {rnd}: " + " ".join(f"{v}={times[v][-1]:.2f}"
                                      for v in VARIANTS), flush=True)

base = statistics.median(times["base"])
per_it = base / (iters * tiles) * 1e6
print(f"\nbase median: {base:.3f}s  ({per_it:.2f} us per tile-iteration, "
      f"{tiles} tiles x {iters} iterations)")
for v in VARIANTS:
    if v == "base":
        continue
    m = statistics.median(times[v])
    print(f"{v:<12} median {m:.3f}s  delta {m-base:+.3f}s "
          f"({100*(m-base)/base:+.1f}%)", flush=True)
