"""Interleaved A/B: 8x16 vs 8x8 geom pages for the paged backend.

The geom-page z extent is a BUILDER choice (models/paged_grid.F_AXIS_ZG);
the kernel infers it statically from the table shapes, so two Renderers
built from differently-built tables compile distinct programs and can be
timed round-robin in one process (the repo's interleaved methodology —
cross-process drift is +-10-15%, in-process ~+-2%).

Output bits must be IDENTICAL (same candidate sets, same slot order, the
page layout only regroups the fetch) — checked.

Usage: [SWEEP_SPP=8] [SWEEP_ROUNDS=7] [AB_W=1920] [AB_H=1080]
       python scripts/paged_layout_ab.py
"""
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import raytrace_tpu.models.paged_grid as pg
from raytrace_tpu.config import RenderConfig
from raytrace_tpu.models.scene import random_sphere_field
from raytrace_tpu.runtime.renderer import Renderer

W = int(os.environ.get("AB_W", 1920))
H = int(os.environ.get("AB_H", 1080))
SPP = int(os.environ.get("SWEEP_SPP", 8))
ROUNDS = int(os.environ.get("SWEEP_ROUNDS", 7))

scene = random_sphere_field(100_000)
cfg = RenderConfig(samples=SPP, width=W, height=H, backend="auto")

renderers = {}
for zg in (16, 8):
    pg.F_AXIS_ZG = zg
    r = Renderer(cfg, scene=scene)
    assert r.backend == "paged", r.backend
    g = r.device_scene.paged
    print(f"zg={zg}: geom pages {g.geom.shape[0]} attrs pages "
          f"{g.attrs.shape[0]}", flush=True)
    renderers[zg] = r
pg.F_AXIS_ZG = 16

imgs = {}
for zg, r in renderers.items():
    t0 = time.perf_counter()
    imgs[zg] = np.asarray(r.render_call(SPP))
    print(f"zg={zg}: warm {time.perf_counter()-t0:.0f}s", flush=True)
print(f"bit-identical across layouts: "
      f"{np.array_equal(imgs[16], imgs[8])}", flush=True)

times = {zg: [] for zg in renderers}
for rnd in range(ROUNDS):
    for zg, r in renderers.items():
        t0 = time.perf_counter()
        np.asarray(r.render_call(SPP))
        times[zg].append(time.perf_counter() - t0)
    print(f"round {rnd}: "
          + " ".join(f"zg{zg}={times[zg][-1]:.2f}" for zg in renderers),
          flush=True)

for zg in renderers:
    m = statistics.median(times[zg])
    print(f"zg={zg:<2} median {m:.3f}s ({m/(W*H*SPP)*1e9:.0f} ns/sample)",
          flush=True)
