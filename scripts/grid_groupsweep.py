"""GROUPS interleave A/B: G independent column-group chains per iteration.

The iteration is one long dependency chain (serial shares sum to ~94%,
scripts/grid_iterbench.py); at 1024-lane op width the VPU has latency slack.
groups=G gives Mosaic G independent dataflow chains in the same basic block
— if the scheduler fills gather/dependency stalls with another group's ALU,
the per-iteration cost drops.  Bit-identical images by construction (checked
here per round).

Usage: [GROUPS=1,2,4] [SWEEP_SPP=1000] [SWEEP_ROUNDS=5] python scripts/grid_groupsweep.py
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
SPP = int(os.environ.get("SWEEP_SPP", 1000))
ROUNDS = int(os.environ.get("SWEEP_ROUNDS", 5))
GROUPS = [int(x) for x in os.environ.get("GROUPS", "1,2,4").split(",")]
M = int(os.environ.get("SWEEP_M", 64))
J = int(os.environ.get("SWEEP_J", 2))
K = int(os.environ.get("SWEEP_K", gk.K_STEPS))

ds = prepare_scene(generate_random_scene(0.0))
vp = viewport_arrays(reference_camera(), W, H)


def run(g):
    acc = render_band(
        ds, vp, band_h=H, width=W, y0=np.int32(0), seed_y0=np.int32(0),
        offset_x=np.int32(0), spp=np.int32(SPP), number=np.uint32(0),
        max_depth=50, backend="grid", pixels_per_lane=M, skip_tmax=True,
        grid_steps=(J, K, False, 1, g))
    return np.asarray(acc)

ref = None
for g in GROUPS:
    t0 = time.perf_counter()
    out = run(g)
    print(f"groups={g}: warm {time.perf_counter()-t0:.0f}s", flush=True)
    if ref is None:
        ref = out
    else:
        same = np.array_equal(ref, out)
        print(f"  bit-identical vs groups={GROUPS[0]}: {same}", flush=True)
        assert same, "groups must not change the image"

times = {g: [] for g in GROUPS}
for rnd in range(ROUNDS):
    for g in GROUPS:
        t0 = time.perf_counter()
        run(g)
        times[g].append(time.perf_counter() - t0)
    print(f"round {rnd}: " + " ".join(
        f"g{g}={times[g][-1]:.2f}s" for g in GROUPS), flush=True)

samples = W * H * SPP
print()
for g in GROUPS:
    t = statistics.median(times[g])
    print(f"groups={g}  {t:6.2f}s  {t/samples*1e9:5.2f} ns/sample", flush=True)
