"""Config-5 repeats in ONE process: one scene build, one table upload, one
Renderer, N timed render_call repeats (in-process noise ~+-2% vs the ~+-8%
process-scale relay drift seen in cross-process A/Bs).  Prints one JSON
line with all repeat times.

Usage: python scripts/stretch_reps.py [reps] [WxHxSPP]   (STRETCH_MODE=fast)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from raytrace_tpu.config import RenderConfig
from raytrace_tpu.models.scene import random_sphere_field
from raytrace_tpu.runtime.renderer import Renderer

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
spec = sys.argv[2] if len(sys.argv) > 2 else "3840x2160x8"
mode = os.environ.get("STRETCH_MODE", "fast")
w, h, spp = (int(x) for x in spec.split("x"))

scene = random_sphere_field(100_000)
r = Renderer(RenderConfig(samples=spp, width=w, height=h, backend="auto",
                          mode=mode), scene=scene)
np.asarray(r.render_call(1))  # compile + upload + warm
times = []
mean = None
for i in range(reps):
    t0 = time.perf_counter()
    img = np.asarray(r.render_call(spp))
    times.append(round(time.perf_counter() - t0, 3))
    mean = round(float(img.mean()), 4)
    print(f"rep {i}: {times[-1]}s", file=sys.stderr, flush=True)
times_s = sorted(times)
print(json.dumps({
    "config": spec, "mode": mode, "backend": r.backend, "reps": times,
    "median": times_s[len(times_s) // 2], "mean_img": mean,
    "ns_per_sample": round(times_s[len(times_s) // 2] / (w * h * spp) * 1e9, 2),
}))
