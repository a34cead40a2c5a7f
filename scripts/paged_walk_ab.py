"""Interleaved A/B: paged fetch page-loop walk — 2-D box vs distinct pages.

The box walk (production r3) loops the chunk's (sx, sz) bounding box, paying
box-area trips; a Morton-sorted chunk at a quad corner pays a 2x2 box for
only 2 actual pages.  The distinct walk (ops/pagedkernel.py
_page_fetch(distinct=True)) extracts each distinct page id with a masked
min and pays EXACTLY the distinct-page count, plus one extra [1,128]
reduce per trip for its while condition.  Output bits must be identical
(each lane is selected on exactly its own page's trip) — checked.

Usage: [AB_W=1920 AB_H=1080 SWEEP_SPP=8 SWEEP_ROUNDS=7 N_SPHERES=100000]
       python scripts/paged_walk_ab.py
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
N = int(os.environ.get("N_SPHERES", 100_000))
VARIANTS = [("box", frozenset()), ("distinct", frozenset({"distinctwalk"}))]

scene = random_sphere_field(N)
renderers = {}
imgs = {}
for name, abl in VARIANTS:
    pkm.ABLATE = abl
    r = Renderer(RenderConfig(samples=SPP, width=W, height=H,
                              backend="paged"), scene=scene)
    t0 = time.perf_counter()
    imgs[name] = np.asarray(r.render_call(SPP))
    print(f"{name}: warm {time.perf_counter()-t0:.0f}s", flush=True)
    renderers[name] = (r, abl)

print("bit-identical:",
      np.array_equal(imgs["box"], imgs["distinct"]), flush=True)

times = {name: [] for name, _ in VARIANTS}
for rnd in range(ROUNDS):
    for name, _ in VARIANTS:
        r, abl = renderers[name]
        pkm.ABLATE = abl  # read at call time by the renderer
        t0 = time.perf_counter()
        np.asarray(r.render_call(SPP))
        times[name].append(time.perf_counter() - t0)
    print(f"round {rnd}: " + " ".join(
        f"{n}={times[n][-1]:.2f}" for n, _ in VARIANTS), flush=True)

base = statistics.median(times["box"])
print(f"\nbox median: {base:.3f}s ({base/(W*H*SPP)*1e9:.0f} ns/sample)")
m = statistics.median(times["distinct"])
print(f"distinct median {m:.3f}s ({m/(W*H*SPP)*1e9:.0f} ns/sample)  "
      f"delta {m-base:+.3f}s ({100*(m-base)/base:+.1f}%)", flush=True)
