"""Interleaved A/B: carried winner attrs vs the legacy resolve page loop.

CARRY (pagedkernel.CARRY, static grid_steps[2]) moves the winner-attr
fetch from a seg_done-time page loop over WINNER pages (41-45% serial
share, scripts/paged_iterbench.py) to a small box loop right after the
march quadratics, masked by "winner improved in this cell" — usually zero
trips — with the values carried in state rows until shading.

Output bits must be IDENTICAL across the two variants (the same attr
values pass through the same table either way) — checked.

Usage: [AB_W=1920] [AB_H=1080] [SWEEP_SPP=8] [SWEEP_ROUNDS=7]
       python scripts/paged_carry_ab.py
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
N_SPHERES = int(os.environ.get("N_SPHERES", 100_000))
VARIANTS = [True, False]

scene = random_sphere_field(N_SPHERES)
r = Renderer(RenderConfig(samples=SPP, width=W, height=H, backend="auto"),
             scene=scene)
assert r.backend == "paged", r.backend


def _set(carry):
    pkm.CARRY = carry


imgs = {}
for v in VARIANTS:
    _set(v)
    t0 = time.perf_counter()
    imgs[v] = np.asarray(r.render_call(SPP))
    print(f"carry={v}: warm {time.perf_counter()-t0:.0f}s", flush=True)

same = np.array_equal(imgs[True], imgs[False])
print(f"carry image bit-identical to legacy: {same}", flush=True)

times = {v: [] for v in VARIANTS}
for rnd in range(ROUNDS):
    for v in VARIANTS:
        _set(v)
        t0 = time.perf_counter()
        np.asarray(r.render_call(SPP))
        times[v].append(time.perf_counter() - t0)
    print(f"round {rnd}: "
          + " ".join(f"carry{int(v)}={times[v][-1]:.2f}" for v in VARIANTS),
          flush=True)

ms = {v: statistics.median(times[v]) for v in VARIANTS}
for v in VARIANTS:
    print(f"carry={int(v)} median {ms[v]:.3f}s "
          f"({ms[v]/(W*H*SPP)*1e9:.0f} ns/sample)", flush=True)
print(f"delta: {100*(ms[True]-ms[False])/ms[False]:+.1f}% (carry vs legacy)",
      flush=True)
