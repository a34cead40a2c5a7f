"""Measure the five BASELINE.json configs, one JSON line each.

1. 3-sphere scene, 480x270, 1 spp, depth 8  — CPU reference math (matmul
   backend on CPU; the oracle-parity tests pin it to the GLSL semantics)
2. Book scene, 1280x720, 10 spp, depth 50   — brute-force (no AS), TPU
3. Book scene, 1920x1080, 100 spp           — grid traversal (the AS), TPU
4. README benchmark 1920x1080 10k spp       — bench.py (not repeated here)
5. 100k spheres 3840x2160 across a mesh     — scripts/stretch_bench.py +
   tests/test_multichip.py::test_sharded_paged_backend (not repeated here)

Usage: python scripts/baseline_configs.py [1 2 3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(n):
    from raytrace_tpu.config import RenderConfig
    from raytrace_tpu.models.scene import generate_random_scene, three_sphere_scene
    from raytrace_tpu.runtime.renderer import Renderer

    if n == 1:
        import jax

        jax.config.update("jax_platforms", "cpu")
        cfg = RenderConfig(samples=1, width=480, height=270, max_depth=8,
                           backend="matmul")
        scene = three_sphere_scene()
    elif n == 2:
        cfg = RenderConfig(samples=10, width=1280, height=720, max_depth=50,
                           backend="mega")  # brute force: no acceleration structure
        scene = generate_random_scene(0.0)
    elif n == 3:
        cfg = RenderConfig(samples=100, width=1920, height=1080, max_depth=50,
                           backend="grid")  # the acceleration structure
        scene = generate_random_scene(0.0)
    else:
        raise SystemExit(f"config {n} is measured elsewhere (see docstring)")
    r = Renderer(cfg, scene=scene)
    np.asarray(r.render_call(1))  # compile
    t0 = time.perf_counter()
    img = np.asarray(r.render_call(cfg.samples))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "config": n, "backend": r.backend, "seconds": round(dt, 3),
        "width": cfg.width, "height": cfg.height, "spp": cfg.samples,
        "depth": cfg.max_depth, "mean": round(float(img.mean()), 4),
        "nonfinite": int((~np.isfinite(img)).sum()),
    }))


if __name__ == "__main__":
    for arg in (sys.argv[1:] or ["1", "2", "3"]):
        run(int(arg))
