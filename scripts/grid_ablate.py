"""Additive section-cost attribution for the grid kernel on real TPU.

Each 'X2' ablation duplicates one kernel section with a never-taken select
(paths/images unchanged); the timing delta vs baseline attributes that
section's cost.  All variants are compiled up front and then timed in
interleaved rounds so process-order / chip-state noise cancels; the median
per variant is reported.  Run: python scripts/grid_ablate.py
"""
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raytrace_tpu.config import RenderConfig
from raytrace_tpu.ops import gridkernel as gk
from raytrace_tpu.runtime.renderer import Renderer

W = int(os.environ.get("SWEEP_W", 1920))
H = int(os.environ.get("SWEEP_H", 1080))
SPP = int(os.environ.get("SWEEP_SPP", 200))
ROUNDS = int(os.environ.get("SWEEP_ROUNDS", 5))
VARIANTS = os.environ.get(
    "ABLATE_VARIANTS",
    "base,fetch2,resolve2,global2,camera2,isect2,dda2,shade2").split(",")

gk.J_STEPS = int(os.environ.get("SWEEP_J", gk.J_STEPS))
gk.K_STEPS = int(os.environ.get("SWEEP_K", gk.K_STEPS))
renderers = {}
for v in VARIANTS:
    gk.ABLATE = frozenset() if v == "base" else frozenset({v})
    r = Renderer(RenderConfig(samples=SPP, width=W, height=H, backend="grid"))
    t0 = time.perf_counter()
    np.asarray(r.render_call(SPP))  # compile + warm
    print(f"{v}: warm {time.perf_counter()-t0:.0f}s", flush=True)
    renderers[v] = (r, gk.ABLATE)

times = {v: [] for v in VARIANTS}
for rnd in range(ROUNDS):
    for v in VARIANTS:
        r, abl = renderers[v]
        gk.ABLATE = abl  # static arg already baked; kept for clarity
        t0 = time.perf_counter()
        np.asarray(r.render_call(SPP))
        times[v].append(time.perf_counter() - t0)
    print(f"round {rnd}: " + " ".join(f"{v}={times[v][-1]:.2f}" for v in VARIANTS),
          flush=True)

base = statistics.median(times["base"])
print(f"\nbase median: {base:.3f}s ({base/(W*H*SPP)*1e9:.2f} ns/sample)")
for v in VARIANTS[1:]:
    m = statistics.median(times[v])
    print(f"{v:<9} median {m:.3f}s  delta {m-base:+.3f}s ({100*(m-base)/base:+.1f}%)",
          flush=True)
