"""Production-path (M = pixels_per_lane, j_steps) sweep with iteration counts.

Times full renders through render_band (return_iters) on the real chip for a
matrix of configurations, interleaved rounds, medians; reports ns/sample,
us/tile-iteration, and issued iterations/sample — separating scheduling
(straggler) effects (issued/sample falls as M grows, iid-bound ~1.385 at
M=64 -> 1.235 at M=128 per scripts/straggler_stats.py) from per-iteration
cost (falls with j if the march's fetch amortizes; cells/segment is ~2.4,
not the 0.39 the r2 camera-bugged probe reported).

Usage: [CONFIGS=64x1,128x1,...] [SWEEP_SPP=400] python scripts/grid_mjsweep.py
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from raytrace_tpu.models.scene import generate_random_scene
from raytrace_tpu.ops import gridkernel as gk
from raytrace_tpu.ops.trace import prepare_scene, render_band, viewport_arrays
from raytrace_tpu.runtime.renderer import reference_camera

W = int(os.environ.get("SWEEP_W", 1920))
H = int(os.environ.get("SWEEP_H", 1080))
SPP = int(os.environ.get("SWEEP_SPP", 400))
ROUNDS = int(os.environ.get("SWEEP_ROUNDS", 3))
CONFIGS = [
    tuple(int(x) for x in c.split("x"))
    for c in os.environ.get("CONFIGS", "64x1,128x1,256x1,64x2,128x2,64x3").split(",")
]
CONFIGS = [c if len(c) == 3 else (*c, gk.K_STEPS) for c in CONFIGS]
# SWEEP_MODE=fast re-measures the operating point under Russian roulette
# (r4 fast production mode): RR changes the iteration mix, and knobs are
# re-measured when the structure changes (CLAUDE.md).
RR = None
if os.environ.get("SWEEP_MODE", "exact") == "fast":
    from raytrace_tpu import config as _cfg

    RR = (_cfg.RR_START_DEPTH, _cfg.RR_CAP_DEPTH, _cfg.RR_PMIN)

ds = prepare_scene(generate_random_scene(0.0))
vp = viewport_arrays(reference_camera(), W, H)


def run(m, j, k):
    acc, iters = render_band(
        ds, vp, band_h=H, width=W, y0=np.int32(0), seed_y0=np.int32(0),
        offset_x=np.int32(0), spp=np.int32(SPP), number=np.uint32(0),
        max_depth=50, backend="grid", pixels_per_lane=m, skip_tmax=True,
        return_iters=True, grid_steps=(j, k, False, 1), rr=RR)
    return np.asarray(acc), int(iters)


meta = {}
for m, j, k in CONFIGS:
    t0 = time.perf_counter()
    _, iters = run(m, j, k)
    n = -(-W * H // m)
    n_pad = -(-n // gk.TILE) * gk.TILE
    meta[(m, j, k)] = (iters, n_pad // gk.TILE, n_pad)
    print(f"M={m} j={j} K={k}: warm {time.perf_counter()-t0:.0f}s iters={iters}",
          flush=True)

times = {c: [] for c in CONFIGS}
for rnd in range(ROUNDS):
    for c in CONFIGS:
        t0 = time.perf_counter()
        run(*c)
        times[c].append(time.perf_counter() - t0)
    print(f"round {rnd}: " + " ".join(
        f"{c[0]}x{c[1]}x{c[2]}={times[c][-1]:.2f}" for c in CONFIGS), flush=True)

samples = W * H * SPP
print()
for c in CONFIGS:
    t = statistics.median(times[c])
    iters, tiles, n_pad = meta[c]
    print(f"M={c[0]:<4} j={c[1]} K={c[2]:<3} {t:6.2f}s  "
          f"{t/samples*1e9:5.2f} ns/sample  "
          f"{t/(iters*tiles)*1e6:5.2f} us/tile-iter  "
          f"issued/sample {iters*n_pad/samples:5.2f}", flush=True)
