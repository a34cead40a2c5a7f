"""Bench-scale grid-vs-mega measurement + j_steps sweep on the real chip.

Config matches bench.py's shape (1920x1080, megakernel lane budget) but at
reduced spp so each point costs ~1 min instead of ~8.  Timings via host
fetch.  Usage: python scripts/grid_sweep.py [spp] [j1 j2 ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raytrace_tpu import ops
from raytrace_tpu.config import RenderConfig
from raytrace_tpu.ops import gridkernel as gk
from raytrace_tpu.runtime.renderer import Renderer

W, H = 1920, 1080
SPP = int(sys.argv[1]) if len(sys.argv) > 1 else 200
JS = [int(x) for x in sys.argv[2:]] or [3]


def run(backend, label):
    cfg = RenderConfig(samples=SPP, width=W, height=H, backend=backend)
    r = Renderer(cfg)
    t0 = time.perf_counter()
    np.asarray(r.render_call(SPP))
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(r.render_call(SPP))
    dt = time.perf_counter() - t0
    ns = dt / (W * H * SPP) * 1e9
    proj = ns * W * H * 10000 / 1e9
    print(f"{label}: {dt:.2f}s @{SPP}spp ({ns:.2f} ns/sample, 10k-spp proj "
          f"{proj:.0f}s; warm-incl-compile {warm:.0f}s)", flush=True)
    return dt


for j in JS:
    gk.J_STEPS = j
    run("grid", f"grid j={j}")
run("mega", "mega")
