"""A/B: per-tile dead-skip gate (r5) vs unconditional kernel body.

The dead-skip (ops/gridkernel.py `_kernel`, 'noskipdead' ablate restores
the old body) turns a fully dead lane-tile into one any-reduce + block DMA
instead of k_steps full iterations — the drain-harvest lever licensed by
VERDICT r4 item 1.  Production operating point: flagship 1080p, fast (RR)
mode, balanced assignment on.  Both variants compile up front, then time in
interleaved rounds (axon noise ~+-7% between processes, ~+-2% interleaved);
medians reported.  Images are bit-identical by construction (the skipped
body is a fixed point for dead tiles) — asserted on round 0.

Run idle-host: python scripts/deadskip_ab.py
"""
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raytrace_tpu.config import RenderConfig
from raytrace_tpu.ops import gridkernel as gk
from raytrace_tpu.runtime.renderer import Renderer

W = int(os.environ.get("SWEEP_W", 1920))
H = int(os.environ.get("SWEEP_H", 1080))
SPP = int(os.environ.get("SWEEP_SPP", 400))
ROUNDS = int(os.environ.get("SWEEP_ROUNDS", 5))
MODE = os.environ.get("SWEEP_MODE", "fast")

renderers = {}
imgs = {}
for v in ("skipdead", "noskipdead"):
    gk.ABLATE = frozenset() if v == "skipdead" else frozenset({v})
    r = Renderer(RenderConfig(samples=SPP, width=W, height=H, backend="grid",
                              mode=MODE, balance_spp=32))
    t0 = time.perf_counter()
    imgs[v] = np.asarray(r.render_call(SPP))
    print(f"{v}: warm {time.perf_counter()-t0:.0f}s", flush=True)
    renderers[v] = (r, gk.ABLATE)

assert np.array_equal(imgs["skipdead"], imgs["noskipdead"]), \
    "dead-skip changed image bits!"
print("bit-identical: OK", flush=True)

times = {v: [] for v in renderers}
for rnd in range(ROUNDS):
    for v, (r, abl) in renderers.items():
        gk.ABLATE = abl
        t0 = time.perf_counter()
        np.asarray(r.render_call(SPP))
        times[v].append(time.perf_counter() - t0)
    print("round %d: " % rnd + " ".join(
        f"{v}={times[v][-1]:.2f}" for v in times), flush=True)

base = statistics.median(times["noskipdead"])
new = statistics.median(times["skipdead"])
print(f"\nnoskipdead median {base:.3f}s  skipdead median {new:.3f}s  "
      f"delta {new-base:+.3f}s ({100*(new-base)/base:+.1f}%)")
