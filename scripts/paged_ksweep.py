"""Interleaved rebucket sweep for the paged backend (100k scene).

Two driver knobs, both riding STATIC grid_steps slots (renderer reads the
pagedkernel module values at call time), so in-process variants compile
separate programs — no jit-cache collisions (see CLAUDE.md):

- K_STEPS (grid_steps[1]): wavefront iterations per kernel invocation.
  Small K pays the argsort + two full-state takes more often; large K lets
  the per-chunk page BOX drift wider between sorts.
- MORTON (grid_steps[3]): rebucket sort key.  1 = Morton-interleaved
  (sx,sz) — a sorted 128-lane chunk stays spatially ~square, so the
  kernel's 2-D box fetch walks ~2x2 pages; 0 = linear page id — a chunk
  straddling an x-page boundary spans the full z range.

Output bits must be IDENTICAL across all variants (lane permutation and
invocation grouping never reorder a pixel's sample stream) — checked.

Usage: [SWEEP_SPP=8] [SWEEP_ROUNDS=7] [KS=5,10,20,40] [MORTONS=1,0]
       python scripts/paged_ksweep.py
"""
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import raytrace_tpu.ops.pagedkernel as pkm
from raytrace_tpu.config import RenderConfig
from raytrace_tpu.models.scene import random_sphere_field
from raytrace_tpu.runtime.renderer import Renderer

W = int(os.environ.get("AB_W", 1920))
H = int(os.environ.get("AB_H", 1080))
SPP = int(os.environ.get("SWEEP_SPP", 8))
ROUNDS = int(os.environ.get("SWEEP_ROUNDS", 7))
KS = [int(k) for k in os.environ.get("KS", "5,10,20,40").split(",")]
MORTONS = [int(m) for m in os.environ.get("MORTONS", "1,0").split(",")]
VARIANTS = [(k, m) for k in KS for m in MORTONS]

scene = random_sphere_field(100_000)
r = Renderer(RenderConfig(samples=SPP, width=W, height=H, backend="auto"),
             scene=scene)
assert r.backend == "paged", r.backend


pkm.K_AUTO = False  # sweep pins EXACT intervals; no lane-count scaling


def _set(k, m):
    pkm.K_STEPS, pkm.MORTON = k, m


imgs = {}
for v in VARIANTS:
    _set(*v)
    t0 = time.perf_counter()
    imgs[v] = np.asarray(r.render_call(SPP))
    print(f"K={v[0]} morton={v[1]}: warm {time.perf_counter()-t0:.0f}s",
          flush=True)

ref = imgs[VARIANTS[0]]
for v in VARIANTS[1:]:
    same = np.array_equal(ref, imgs[v])
    print(f"{v} image bit-identical to {VARIANTS[0]}: {same}", flush=True)

times = {v: [] for v in VARIANTS}
for rnd in range(ROUNDS):
    for v in VARIANTS:
        _set(*v)
        t0 = time.perf_counter()
        np.asarray(r.render_call(SPP))
        times[v].append(time.perf_counter() - t0)
    print(f"round {rnd}: "
          + " ".join(f"K{v[0]}m{v[1]}={times[v][-1]:.2f}" for v in VARIANTS),
          flush=True)

for v in VARIANTS:
    m = statistics.median(times[v])
    print(f"K={v[0]:<3} morton={v[1]} median {m:.3f}s "
          f"({m/(W*H*SPP)*1e9:.0f} ns/sample)", flush=True)
