"""Steady 1-spp frame-loop sweep over pixels_per_lane (VERDICT r4 item 6).

The reference's 1.25 ms/frame is a per-frame average over its presenting
loop (ray_trace.cpp:741-748); the comparable number here is the in-kernel
call-merge loop: R consecutive 1-spp frames in ONE dispatch, per-frame =
(t_R - t_1)/(R - 1) — the relay round trip differences out (bench.py
spp1_ms_frame_loop semantics, r4: 9.4 ms at the autotuned M).

At spp=1 a lane renders its M pixels' single samples SEQUENTIALLY inside
each merged call, so M sets the per-frame critical path directly (~M x
iters/sample x per-iteration time) while smaller M costs more lane-tiles
per iteration.  This sweeps M interleaved, medians.

Usage: [MS=8,16,32,64] [REPS=65] [SWEEP_ROUNDS=5] python scripts/spp1_loop_sweep.py
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from raytrace_tpu.config import RenderConfig
from raytrace_tpu.runtime.renderer import Renderer

W, H = 1920, 1080
MS = [int(x) for x in os.environ.get("MS", "8,16,32,64").split(",")]
REPS = int(os.environ.get("REPS", 65))
ROUNDS = int(os.environ.get("SWEEP_ROUNDS", 5))
MODE = os.environ.get("SWEEP_MODE", "fast")

renderers = {}
for m in MS:
    r = Renderer(RenderConfig(samples=REPS, width=W, height=H,
                              backend="grid", mode=MODE, balance_spp=32,
                              pixels_per_lane=m))
    t0 = time.perf_counter()
    np.asarray(r.render_call(1)[:1, :1, :])
    np.asarray(r.render_call(1, n_calls=REPS, spp_last=1)[:1, :1, :])
    print(f"M={m}: warm {time.perf_counter()-t0:.0f}s", flush=True)
    renderers[m] = r

times = {m: [] for m in MS}
for rnd in range(ROUNDS):
    for m, r in renderers.items():
        t0 = time.perf_counter()
        np.asarray(r.render_call(1)[:1, :1, :])
        t1 = time.perf_counter()
        np.asarray(r.render_call(1, n_calls=REPS, spp_last=1)[:1, :1, :])
        t2 = time.perf_counter()
        times[m].append(((t2 - t1) - (t1 - t0)) / (REPS - 1) * 1e3)
    print(f"round {rnd}: " + " ".join(
        f"M={m}:{times[m][-1]:.2f}ms" for m in MS), flush=True)

print()
for m in MS:
    med = statistics.median(times[m])
    print(f"M={m:<3} median {med:.2f} ms/frame "
          f"({med * 1e6 / (W * H):.2f} ns/sample)")
