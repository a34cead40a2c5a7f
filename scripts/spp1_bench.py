"""1-spp frame-latency sweep (the reference's other headline: 1.25 ms).

A 1-spp dispatch has only M samples per lane to average over, so the
wavefront tail (straggler lanes) and the K_STEPS invocation quantization
are proportionally much larger than in steady state (measured 56 ms exec
vs the 17 ms steady-state extrapolation, bench.py spp1_ms_exec).  This
sweeps (pixels_per_lane, k_steps) at spp=1, interleaved rounds, medians —
device execution synced by a tiny host fetch.

Usage: [CONFIGS=64x40,64x8,...] [SWEEP_ROUNDS=7] python scripts/spp1_bench.py
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from raytrace_tpu.models.scene import generate_random_scene
from raytrace_tpu.ops import gridkernel as gk
from raytrace_tpu.ops.trace import prepare_scene, render_band, viewport_arrays
from raytrace_tpu.runtime.renderer import reference_camera

W, H = 1920, 1080
ROUNDS = int(os.environ.get("SWEEP_ROUNDS", 7))
CONFIGS = [
    tuple(int(x) for x in c.split("x"))
    for c in os.environ.get(
        "CONFIGS", "64x40,64x16,64x8,128x8,256x8,256x16").split(",")
]

import jax

# device-resident tables: without this every timed call re-uploads all
# scene tables through the relay, swamping the kernel at spp=1
ds = jax.device_put(prepare_scene(generate_random_scene(0.0)))
vp = jax.device_put(viewport_arrays(reference_camera(), W, H))


def run(m, k, return_iters=False):
    out = render_band(
        ds, vp, band_h=H, width=W, y0=np.int32(0), seed_y0=np.int32(0),
        offset_x=np.int32(0), spp=np.int32(1), number=np.uint32(0),
        max_depth=50, backend="grid", pixels_per_lane=m, skip_tmax=True,
        return_iters=return_iters, grid_steps=(2, k, False, 1))
    if return_iters:
        acc, iters = out
        np.asarray(acc[:1, :1, :])
        return int(iters)
    np.asarray(out[:1, :1, :])  # sync via tiny fetch (axon relay rule)


iters = {}
for m, k in CONFIGS:
    t0 = time.perf_counter()
    iters[(m, k)] = run(m, k, return_iters=True)
    print(f"M={m} K={k}: warm {time.perf_counter()-t0:.0f}s "
          f"iters={iters[(m,k)]}", flush=True)

times = {c: [] for c in CONFIGS}
for rnd in range(ROUNDS):
    for c in CONFIGS:
        t0 = time.perf_counter()
        run(*c)
        times[c].append(time.perf_counter() - t0)
    print(f"round {rnd}: " + " ".join(
        f"{c[0]}x{c[1]}={times[c][-1]*1e3:.1f}ms" for c in CONFIGS),
        flush=True)

print()
for m, k in CONFIGS:
    t = statistics.median(times[(m, k)])
    n = -(-W * H // m)
    n_pad = -(-n // gk.TILE) * gk.TILE
    it = iters[(m, k)]
    print(f"M={m:<4} K={k:<3} {t*1e3:7.1f} ms  "
          f"invocations/tile {it//k:<4} issued its/sample "
          f"{it*n_pad/(W*H):5.2f}", flush=True)
