"""M (pixels_per_lane) re-sweep UNDER the balanced assignment.

The r4 fast-mode M sweep (grid_mjsweep, strided assignment) picked M=64
because larger M buys straggler averaging (sigma/sqrt(M)).  The balanced
passign table (runtime/balance.py) equalizes per-lane totals directly,
which weakens that argument — smaller M means less per-invocation state
DMA, so the optimum may move down.  This harness times M candidates
round-robin, EACH with its own balanced table built from one shared
measured cost map (the map is per-pixel, M-independent).

Env: SWEEP_W/H/SPP/ROUNDS/MODE/PROBE_SPP, MS=32,48,64.  Run ALONE.
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
MS = [int(m) for m in os.environ.get("MS", "32,48,64").split(",")]
RR = None
if MODE == "fast":
    from raytrace_tpu import config as _cfg

    RR = (_cfg.RR_START_DEPTH, _cfg.RR_CAP_DEPTH, _cfg.RR_PMIN)

ds = jax.device_put(prepare_scene(generate_random_scene(0.0)))
vp = jax.device_put(viewport_arrays(reference_camera(), W, H))


def kw_for(m):
    return dict(scene=ds, vp=vp, band_h=H, width=W, y0=np.int32(0),
                seed_y0=np.int32(0), offset_x=np.int32(0), spp=np.int32(SPP),
                number=np.uint32(0), max_depth=50, backend="grid",
                pixels_per_lane=m, skip_tmax=True,
                grid_steps=(gk.J_STEPS, gk.K_STEPS, gk.UNROLL, gk.FUSE),
                rr=RR)


# one shared cost probe (per-pixel costs don't depend on M; probe at the
# first candidate's M for convenience)
t0 = time.perf_counter()
cost = measure_cost_map(kw_for(MS[0]), PROBE_SPP)
print(f"probe {PROBE_SPP}spp @M={MS[0]}: {time.perf_counter()-t0:.0f}s",
      flush=True)

tabs = {}
for m in MS:
    tabs[m] = build_passign(cost, m, gk.TILE)
    st = balance_stats(cost, tabs[m], m)
    print(f"M={m}: balanced max/mean {st['max_over_mean']:.3f} "
          f"(strided {balance_stats(cost, None, m)['max_over_mean']:.3f})",
          flush=True)
    tabs[m] = jax.device_put(tabs[m])

imgs = {}
for m in MS:
    t0 = time.perf_counter()
    imgs[m] = np.asarray(render_band(**kw_for(m), passign=tabs[m]))
    print(f"M={m}: warm {time.perf_counter()-t0:.0f}s", flush=True)

base = imgs[MS[0]]
for m in MS[1:]:
    diff = np.abs(base - imgs[m])
    print(f"bit check M={MS[0]} vs M={m}: "
          f"{int((diff.max(axis=-1) > 0).sum())}/{W*H} px differ, "
          f"max {diff.max()}", flush=True)

times = {m: [] for m in MS}
for rnd in range(ROUNDS):
    for m in MS:
        t0 = time.perf_counter()
        np.asarray(render_band(**kw_for(m), passign=tabs[m]))
        times[m].append(time.perf_counter() - t0)
    print(f"round {rnd}: " + " ".join(
        f"M{m}={times[m][-1]:.2f}s" for m in MS), flush=True)

samples = W * H * SPP
ms = {m: statistics.median(ts) for m, ts in times.items()}
for m, t in ms.items():
    print(f"M={m}: median {t:.3f}s  {t/samples*1e9:.2f} ns/sample", flush=True)
