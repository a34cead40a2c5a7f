"""Interleaved-round j_steps sweep (same methodology as grid_ablate.py:
all variants compiled up front, timed in interleaved rounds, medians
reported — beats the axon relay's ~+-7% process-order noise).

Iteration calibration (62860 while-rounds at 1080p/200spp/M63 => ~50
lane-iterations per sample) says iteration count dominates; j>1 trades
+fetch+isect per iteration for fewer iterations.
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

W, H, SPP = 1920, 1080, int(os.environ.get("SWEEP_SPP", 200))
ROUNDS = int(os.environ.get("SWEEP_ROUNDS", 5))
# SWEEP_MODE=fast re-measures the j/k operating point under Russian
# roulette (r4): RR changes the iteration mix, and the repo rule is to
# re-measure knobs when the structure changes (CLAUDE.md).
MODE = os.environ.get("SWEEP_MODE", "exact")
CASES = [(1, 10), (2, 10), (3, 10), (2, 5)]  # (j_steps, k_steps)
if os.environ.get("SWEEP_CASES"):  # e.g. "1,40;2,40;3,40"
    CASES = [tuple(int(x) for x in c.split(","))
             for c in os.environ["SWEEP_CASES"].split(";")]

renderers = {}
for j, k in CASES:
    gk.J_STEPS, gk.K_STEPS = j, k
    r = Renderer(RenderConfig(samples=SPP, width=W, height=H, backend="grid",
                              mode=MODE))
    t0 = time.perf_counter()
    np.asarray(r.render_call(SPP))
    print(f"j={j} k={k}: warm {time.perf_counter()-t0:.0f}s", flush=True)
    renderers[(j, k)] = (r, j, k)

times = {c: [] for c in CASES}
for rnd in range(ROUNDS):
    for c in CASES:
        r, j, k = renderers[c]
        gk.J_STEPS, gk.K_STEPS = j, k
        t0 = time.perf_counter()
        np.asarray(r.render_call(SPP))
        times[c].append(time.perf_counter() - t0)
    print(f"round {rnd}: " + " ".join(f"j{j}k{k}={times[(j,k)][-1]:.2f}"
                                      for j, k in CASES), flush=True)

base = statistics.median(times[CASES[0]])
print(f"\nj={CASES[0][0]} k={CASES[0][1]} median: {base:.3f}s "
      f"({base/(W*H*SPP)*1e9:.2f} ns/sample)")
for c in CASES[1:]:
    m = statistics.median(times[c])
    print(f"j={c[0]} k={c[1]} median {m:.3f}s  ({100*(m-base)/base:+.1f}%)",
          flush=True)
