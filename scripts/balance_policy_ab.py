"""Serpentine vs pass-sorted-LPT balanced tables: interleaved hardware A/B.

Both tables feed the SAME compiled program (passign is a tensor input),
so this A/B has no compile skew and no program-variant noise — it
measures the pure scheduling difference between the two deal policies
(runtime/balance.py build_passign method="serpentine" vs "lpt").

Env: SWEEP_W/H/SPP/ROUNDS/MODE/PROBE_SPP/SWEEP_M.  Run ALONE (idle host).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from raytrace_tpu.models.scene import generate_random_scene
from raytrace_tpu.ops import gridkernel as gk
from raytrace_tpu.ops.trace import prepare_scene, render_band, viewport_arrays
from raytrace_tpu.runtime.balance import (balance_stats, build_passign,
                                          measure_cost_map)
from raytrace_tpu.runtime.renderer import reference_camera

W = int(os.environ.get("SWEEP_W", 1920))
H = int(os.environ.get("SWEEP_H", 1080))
SPP = int(os.environ.get("SWEEP_SPP", 400))
ROUNDS = int(os.environ.get("SWEEP_ROUNDS", 7))
MODE = os.environ.get("SWEEP_MODE", "fast")
PROBE_SPP = int(os.environ.get("PROBE_SPP", 32))
M = int(os.environ.get("SWEEP_M", 64))
RR = None
if MODE == "fast":
    from raytrace_tpu import config as _cfg

    RR = (_cfg.RR_START_DEPTH, _cfg.RR_CAP_DEPTH, _cfg.RR_PMIN)

ds = jax.device_put(prepare_scene(generate_random_scene(0.0)))
vp = jax.device_put(viewport_arrays(reference_camera(), W, H))
kw = dict(scene=ds, vp=vp, band_h=H, width=W, y0=np.int32(0),
          seed_y0=np.int32(0), offset_x=np.int32(0), spp=np.int32(SPP),
          number=np.uint32(0), max_depth=50, backend="grid",
          pixels_per_lane=M, skip_tmax=True,
          grid_steps=(gk.J_STEPS, gk.K_STEPS, gk.UNROLL, gk.FUSE), rr=RR)

t0 = time.perf_counter()
cost = measure_cost_map(kw, PROBE_SPP)
print(f"probe {PROBE_SPP}spp: {time.perf_counter()-t0:.0f}s", flush=True)

tabs = {m: build_passign(cost, M, gk.TILE, method=m)
        for m in ("serpentine", "lpt")}
for name, tab in tabs.items():
    print(f"{name}: in-sample max/mean "
          f"{balance_stats(cost, tab, M)['max_over_mean']:.4f}", flush=True)
    tabs[name] = jax.device_put(tab)

imgs = {}
for name, t in tabs.items():
    t0 = time.perf_counter()
    imgs[name] = np.asarray(render_band(**kw, passign=t))
    print(f"{name}: warm {time.perf_counter()-t0:.0f}s", flush=True)

diff = np.abs(imgs["serpentine"] - imgs["lpt"])
print(f"bit check: {int((diff.max(axis=-1) > 0).sum())}/{W*H} px differ, "
      f"max {diff.max()}", flush=True)

times = {n: [] for n in tabs}
for rnd in range(ROUNDS):
    for name, t in tabs.items():
        t0 = time.perf_counter()
        np.asarray(render_band(**kw, passign=t))
        times[name].append(time.perf_counter() - t0)
    print(f"round {rnd}: " + " ".join(
        f"{n}={times[n][-1]:.2f}s" for n in tabs), flush=True)

samples = W * H * SPP
ms = {n: statistics.median(ts) for n, ts in times.items()}
for n, m in ms.items():
    print(f"{n}: median {m:.3f}s  {m/samples*1e9:.2f} ns/sample", flush=True)
print(f"lpt vs serpentine: "
      f"{100*(ms['lpt']-ms['serpentine'])/ms['serpentine']:+.1f}%", flush=True)
