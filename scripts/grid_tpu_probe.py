"""First TPU measurement of the grid backend vs the brute-force megakernel.

Renders the book scene at a moderate config on the real chip and reports
per-backend wall time (host-fetch timed — block_until_ready lies through the
axon relay).  Also cross-checks grid-vs-mega image agreement on hardware.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raytrace_tpu.config import RenderConfig
from raytrace_tpu.runtime.renderer import Renderer

W, H, SPP = 480, 270, 32


def run(backend, j=None):
    cfg = RenderConfig(samples=SPP, width=W, height=H, backend=backend)
    r = Renderer(cfg)
    print(f"{backend}: compiling...", flush=True)
    t0 = time.perf_counter()
    out = np.asarray(r.render_call(SPP))
    print(f"{backend}: first call (compile+run) {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = np.asarray(r.render_call(SPP))
    dt = time.perf_counter() - t0
    rays = W * H * SPP
    print(f"{backend}: {dt:.3f}s for {W}x{H}x{SPP}spp "
          f"({dt/rays*1e9:.2f} ns/sample)", flush=True)
    return out, dt


if __name__ == "__main__":
    which = sys.argv[1:] or ["grid", "mega"]
    outs = {}
    for b in which:
        outs[b], _ = run(b)
    if len(outs) == 2:
        a, b = outs.values()
        d = (np.abs(a.astype(np.float64) - b.astype(np.float64)).max(axis=2) > 0)
        print(f"image diff: {int(d.sum())}/{d.size} px "
              f"({100*d.mean():.3f}%)", flush=True)
