"""Measure the 100k-sphere stretch scene (BASELINE.json config 5) on TPU.

Round-1 baseline: brute-force rolled blocks, 22.5 s at 320x180x8spp.
This probes the paged two-level grid backend at the same config plus a
larger one, printing one JSON line per config.

Usage: python scripts/stretch_bench.py [n_spheres] [configs...]
  each config is WxHxSPP, default: 320x180x8 1920x1080x8
Env: STRETCH_MODE=exact|fast (default exact) — fast adds Russian-roulette
path termination (the round-4 production mode; statistically identical
images, fewer wavefront iterations).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from raytrace_tpu.config import RenderConfig
from raytrace_tpu.models.scene import random_sphere_field
from raytrace_tpu.runtime.renderer import Renderer


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    configs = sys.argv[2:] or ["320x180x8", "1920x1080x8"]
    mode = os.environ.get("STRETCH_MODE", "exact")
    scene = random_sphere_field(n)
    for spec in configs:
        w, h, spp = (int(x) for x in spec.split("x"))
        cfg = RenderConfig(samples=spp, width=w, height=h, backend="auto",
                           mode=mode)
        r = Renderer(cfg, scene=scene)
        np.asarray(r.render_call(1))  # compile + warmup
        t0 = time.perf_counter()
        accum = r.render_call(spp)
        img = np.asarray(accum)  # host fetch = the only trustworthy sync
        dt = time.perf_counter() - t0
        print(json.dumps({
            "config": spec, "n_spheres": n, "backend": r.backend,
            "mode": mode,
            "seconds": round(dt, 3),
            "ns_per_sample": round(dt / (w * h * spp) * 1e9, 2),
            "mean": round(float(img.mean()), 4),
            "nonfinite": int((~np.isfinite(img)).sum()),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
