"""Interleaved cell-size sweep for the paged backend (100k scene).

Smaller fine cells shrink n_slots (the per-trip gather is 4*n_slots rows,
and the box-loop gather cost is ~60 ns fixed + 0.7 ns/row) but rays march
more cells per segment; larger cells do the opposite.  The builder's auto
size targets ~8 expected candidates/cell; this sweeps a scale factor on
it.  Different scales produce different table shapes -> distinct compiled
programs, so variants interleave safely in one process.

Images are NOT bit-identical across cell sizes (candidate ORDER within a
cell changes which of two exactly-equal-t winners is kept — in practice
they match; we report pixel agreement, not a gate).

Usage: [SWEEP_SPP=8] [SWEEP_ROUNDS=7] [SCALES=0.7,0.85,1.0,1.2]
       python scripts/paged_cellsweep.py
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
SCALES = [float(f) for f in
          os.environ.get("SCALES", "0.7,0.85,1.0,1.2").split(",")]

scene = random_sphere_field(100_000)
cfg = RenderConfig(samples=SPP, width=W, height=H, backend="auto")

renderers = {}
for f in SCALES:
    pg.CELL_SIZE_SCALE = f
    r = Renderer(cfg, scene=scene)
    if r.backend != "paged":
        print(f"scale={f}: builder refused (backend={r.backend}) — skipped",
              flush=True)
        continue
    g = r.device_scene.paged
    print(f"scale={f}: cell={float(g.gscal[0, 13]):.3f} "
          f"n_slots={g.lids.shape[1]} geom pages={g.geom.shape[0]} "
          f"({(g.geom.nbytes + g.lids.nbytes + g.attrs.nbytes)/2**20:.0f} MB)", flush=True)
    renderers[f] = r
pg.CELL_SIZE_SCALE = 1.0

imgs = {}
for f, r in renderers.items():
    t0 = time.perf_counter()
    imgs[f] = np.asarray(r.render_call(SPP))
    print(f"scale={f}: warm {time.perf_counter()-t0:.0f}s", flush=True)
fs = list(renderers)
for f in fs[1:]:
    agree = float((np.abs(imgs[fs[0]] - imgs[f]).max(axis=2) == 0).mean())
    print(f"scale {f} vs {fs[0]}: {agree*100:.2f}% pixels identical",
          flush=True)

times = {f: [] for f in renderers}
for rnd in range(ROUNDS):
    for f, r in renderers.items():
        t0 = time.perf_counter()
        np.asarray(r.render_call(SPP))
        times[f].append(time.perf_counter() - t0)
    print(f"round {rnd}: "
          + " ".join(f"s{f}={times[f][-1]:.2f}" for f in renderers),
          flush=True)

for f in renderers:
    m = statistics.median(times[f])
    print(f"scale={f:<5} median {m:.3f}s ({m/(W*H*SPP)*1e9:.0f} ns/sample)",
          flush=True)
