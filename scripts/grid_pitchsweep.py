"""Grid cell-pitch sweep on real TPU (interleaved rounds, medians).

Coarser cells trade march steps — each costing a fixed-cost per-chunk
gather — for more candidate quadratics (cheap: 6.9% serial share at unit
pitch).  At pitch 2 the book scene fits 8 four-value slots in ONE fetch
block (cb=1: no block selects, 64-row paired gather vs 128) and the oracle
model puts the useful-iteration floor at ~2.9/sample vs 3.35.  All pitches
render BIT-IDENTICAL images (asserted below; delta-enlarged registration
makes the winner set pitch-independent).

Usage: [PITCHES=1.0,2.0,3.0] [SWEEP_SPP=400] [SWEEP_J=2] [SWEEP_K=40]
       python scripts/grid_pitchsweep.py
   or: VARIANTS=1.0:2,2.0:1,2.0:2,2.0:3 python scripts/grid_pitchsweep.py
       (explicit pitch:j pairs — sweeps pitch and j jointly, since the
       useful cells/segment halves at pitch 2 and shifts the j optimum)
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from raytrace_tpu.models.grid import build_grid
from raytrace_tpu.models.scene import generate_random_scene
from raytrace_tpu.ops import gridkernel as gk
from raytrace_tpu.ops.pallas_intersect import sphere_table
from raytrace_tpu.ops.trace import prepare_scene, render_band, viewport_arrays
from raytrace_tpu.runtime.renderer import reference_camera

W = int(os.environ.get("SWEEP_W", 1920))
H = int(os.environ.get("SWEEP_H", 1080))
SPP = int(os.environ.get("SWEEP_SPP", 400))
ROUNDS = int(os.environ.get("SWEEP_ROUNDS", 5))
J = int(os.environ.get("SWEEP_J", 2))
K = int(os.environ.get("SWEEP_K", 40))
M = int(os.environ.get("SWEEP_M", 64))
if "VARIANTS" in os.environ:
    PAIRS = [(float(v.split(":")[0]), int(v.split(":")[1]))
             for v in os.environ["VARIANTS"].split(",")]
else:
    PAIRS = [(float(p), J) for p in
             os.environ.get("PITCHES", "1.0,1.5,2.0,3.0").split(",")]

sc = generate_random_scene(0.0)
vp = viewport_arrays(reference_camera(), W, H)
table = np.asarray(sphere_table(sc))

variants, grids = {}, {}
for p, j in PAIRS:
    if p not in grids:
        # pitch > ~2 needs more than 8 slots on the book scene; allow 16
        grids[p] = build_grid(sc, table, pitch=p, max_slots=16)
    g = grids[p]
    if g is None:
        print(f"pitch {p}: does not build (skipped)", flush=True)
        continue
    ds = prepare_scene(sc)._replace(grid=g)
    n_slots = (g.has_cy.shape[1] if g.has_cy is not None
               else g.slots4.shape[1] if g.slots4 is not None else 4)
    print(f"pitch {p} j {j}: ctab {g.ctab.shape} n_slots {n_slots} "
          f"gtab rows {int((g.gtab[:, 4] >= 0).sum())}", flush=True)
    variants[(p, j)] = ds


def run(ds, j):
    acc, iters = render_band(
        ds, vp, band_h=H, width=W, y0=np.int32(0), seed_y0=np.int32(0),
        offset_x=np.int32(0), spp=np.int32(SPP), number=np.uint32(0),
        max_depth=50, backend="grid", pixels_per_lane=M, skip_tmax=True,
        return_iters=True, grid_steps=(j, K, False, 1))
    return np.asarray(acc), int(iters)


imgs, meta = {}, {}
for p, ds in variants.items():
    t0 = time.perf_counter()
    imgs[p], iters = run(ds, p[1])
    n = -(-W * H // M)
    n_pad = -(-n // gk.TILE) * gk.TILE
    meta[p] = (iters, n_pad // gk.TILE, n_pad)
    print(f"pitch {p}: warm {time.perf_counter()-t0:.0f}s iters={iters}",
          flush=True)
base_p = min(variants)
for p in variants:
    same = np.array_equal(imgs[base_p], imgs[p])
    print(f"pitch {p} vs {base_p}: bit-identical={same}", flush=True)

times = {p: [] for p in variants}
for rnd in range(ROUNDS):
    for p, ds in variants.items():
        t0 = time.perf_counter()
        run(ds, p[1])
        times[p].append(time.perf_counter() - t0)
    print(f"round {rnd}: " + " ".join(
        f"p{p}={times[p][-1]:.2f}" for p in variants), flush=True)

samples = W * H * SPP
print()
for p in variants:
    t = statistics.median(times[p])
    iters, tiles, n_pad = meta[p]
    print(f"pitch {p}: {t:6.2f}s  {t/samples*1e9:5.2f} ns/sample  "
          f"{t/(iters*tiles)*1e6:5.2f} us/tile-iter  "
          f"issued/sample {iters*n_pad/samples:5.2f}", flush=True)
