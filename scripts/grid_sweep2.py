"""Sweep (j_steps, k_steps, pixels_per_lane) for the grid backend on TPU."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raytrace_tpu.config import RenderConfig
from raytrace_tpu.ops import gridkernel as gk
from raytrace_tpu.runtime.renderer import Renderer

W, H = 1920, 1080
SPP = int(os.environ.get("SWEEP_SPP", 200))

cases = []
for arg in sys.argv[1:]:
    j, k, m = (int(x) for x in arg.split(","))
    cases.append((j, k, m))
if not cases:
    cases = [(1, 10, 63)]

for j, k, m in cases:
    gk.J_STEPS = j
    gk.K_STEPS = k
    cfg = RenderConfig(samples=SPP, width=W, height=H, backend="grid",
                       pixels_per_lane=m)
    r = Renderer(cfg)
    t0 = time.perf_counter()
    np.asarray(r.render_call(SPP))
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(r.render_call(SPP))
    dt = time.perf_counter() - t0
    ns = dt / (W * H * SPP) * 1e9
    print(f"j={j} k={k} m={m}: {dt:.2f}s @{SPP}spp ({ns:.2f} ns/sample, "
          f"proj {ns*W*H*1e4/1e9:.0f}s; warm {warm:.0f}s)", flush=True)
