"""Interleaved A/B: cb=4 (boundary-line spill) vs cb=5 (no spill).

Round-3 change: build_grid drops the guard ring and spills the cheapest
boundary cell line's spheres (~14) into the brute-forced globals table,
taking the book scene from 625 to 506 cells -> fetch block count cb 5 -> 4
-> the paired march fetch gathers 128 rows per chunk instead of 160.

The two variants differ only in the BUILDER's tables (MAX_GTAB=0 disables
the spill); cb is a shape-derived static, so each compiles its own program
and the jit cache cannot collide.  Same methodology as grid_jsweep.py:
compile both up front, time in interleaved rounds, report medians.
"""
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import raytrace_tpu.models.grid as gridmod
from raytrace_tpu.config import RenderConfig
from raytrace_tpu.runtime.renderer import Renderer

W, H, SPP = 1920, 1080, int(os.environ.get("SWEEP_SPP", 400))
ROUNDS = int(os.environ.get("SWEEP_ROUNDS", 7))

CASES = [("cb5_nospill", 0), ("cb4_spill", gridmod.MAX_GTAB)]

renderers = {}
for name, max_gtab in CASES:
    gridmod.MAX_GTAB = max_gtab
    r = Renderer(RenderConfig(samples=SPP, width=W, height=H, backend="grid"))
    g = r.device_scene.grid
    cb = g.ctab.shape[0] // 16
    t0 = time.perf_counter()
    img_warm = np.asarray(r.render_call(SPP))
    print(f"{name}: cb={cb} gtab={g.gtab.shape[0]} "
          f"warm {time.perf_counter()-t0:.0f}s", flush=True)
    renderers[name] = (r, img_warm)

a, b = renderers[CASES[0][0]][1], renderers[CASES[1][0]][1]
same = np.array_equal(a, b)
print(f"image bit-identical across variants: {same} "
      f"(diff px {int((a != b).any(axis=-1).sum()) if not same else 0})",
      flush=True)

times = {name: [] for name, _ in CASES}
for rnd in range(ROUNDS):
    for name, _ in CASES:
        r, _w = renderers[name]
        t0 = time.perf_counter()
        np.asarray(r.render_call(SPP))
        times[name].append(time.perf_counter() - t0)
    print(f"round {rnd}: " + " ".join(f"{n}={times[n][-1]:.2f}"
                                      for n, _ in CASES), flush=True)

base = statistics.median(times[CASES[0][0]])
print(f"\ncb5 median: {base:.3f}s ({base/(W*H*SPP)*1e9:.2f} ns/sample)")
m = statistics.median(times[CASES[1][0]])
print(f"cb4 median: {m:.3f}s ({m/(W*H*SPP)*1e9:.2f} ns/sample)  "
      f"({100*(m-base)/base:+.1f}%)", flush=True)
