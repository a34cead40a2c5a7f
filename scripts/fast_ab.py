"""Exact vs fast (Russian-roulette) interleaved A/B on real TPU.

Compiles both modes up front, times them round-robin (the CLAUDE.md
interleaved methodology — relay drift cancels), and reports medians plus
the statistical gate (compare_accums) between the two images.

Env: SWEEP_W/H/SPP/ROUNDS, FAST_RR="d0,d1,pmin" (default config values).
Run ALONE (idle host): python scripts/fast_ab.py
"""
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raytrace_tpu.config import RR_CAP_DEPTH, RR_PMIN, RR_START_DEPTH, RenderConfig
from raytrace_tpu.runtime.renderer import Renderer
from raytrace_tpu.utils.compare import compare_accums

W = int(os.environ.get("SWEEP_W", 1920))
H = int(os.environ.get("SWEEP_H", 1080))
SPP = int(os.environ.get("SWEEP_SPP", 400))
ROUNDS = int(os.environ.get("SWEEP_ROUNDS", 5))
rr_env = os.environ.get("FAST_RR")
variants = [("exact", "exact", None)]
if rr_env:
    for spec in rr_env.split(";"):
        d0, d1, pmin = spec.split(",")
        variants.append((f"fast({spec})", "fast",
                         (int(d0), int(d1), float(pmin))))
else:
    variants.append(("fast", "fast", (RR_START_DEPTH, RR_CAP_DEPTH, RR_PMIN)))

renderers = {}
for name, mode, rrp in variants:
    r = Renderer(RenderConfig(samples=SPP, width=W, height=H, backend="grid",
                              mode=mode, rr_params=rrp))
    t0 = time.perf_counter()
    np.asarray(r.render_call(SPP))
    print(f"{name}: warm {time.perf_counter()-t0:.0f}s", flush=True)
    renderers[name] = r

times = {name: [] for name, _, _ in variants}
imgs = {}
for rnd in range(ROUNDS):
    for name, _, _ in variants:
        t0 = time.perf_counter()
        imgs[name] = np.asarray(renderers[name].render_call(SPP))
        times[name].append(time.perf_counter() - t0)
    print(f"round {rnd}: " + " ".join(
        f"{n}={times[n][-1]:.2f}" for n, _, _ in variants), flush=True)

base = statistics.median(times["exact"])
print(f"\nexact median: {base:.3f}s ({base/(W*H*SPP)*1e9:.2f} ns/sample)")
for name, _, _ in variants[1:]:
    m = statistics.median(times[name])
    print(f"{name:<16} median {m:.3f}s ({m/(W*H*SPP)*1e9:.2f} ns/sample)  "
          f"{100*(m-base)/base:+.1f}%", flush=True)
    res = compare_accums(imgs[name], imgs["exact"], SPP, SPP, tile=8)
    print(f"  gate vs exact: p95_z {res.tile_p95_z:.2f}  mean_rel "
          f"{res.mean_rel_diff:.5f}  psnr {res.psnr_db:.1f} dB  "
          f"matches={res.matches()}", flush=True)
