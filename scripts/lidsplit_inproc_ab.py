"""In-process interleaved A/B: split-lid march fetch vs emulated fused cost.

The cross-process old-tree A/B (scripts/lidsplit_ab.py) drowned in relay
session drift (±20% over an hour on 2026-08-20).  This one interleaves
WITHIN one process, where drift cancels: the 'fusedlid' ablate makes the
new kernel gather the lid rows on every march trip (mask=marching — the
pre-split layout's row traffic, split across two box loops), while the
default fetches them only on winner updates.  Output bits identical either
way (asserted).  The emulation slightly OVERPAYS vs the true old layout
(two box walks' min/max reduces instead of one), so read the delta as an
upper bound ~one box-walk overhead above the true structural gain.

Run idle-host: python scripts/lidsplit_inproc_ab.py [rounds]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from raytrace_tpu.config import RenderConfig
from raytrace_tpu.models.scene import random_sphere_field
from raytrace_tpu.ops import pagedkernel as pk
from raytrace_tpu.runtime.renderer import Renderer

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
W, H, SPP = 3840, 2160, 8

scene = random_sphere_field(100_000)
renderers = {}
imgs = {}
for v in ("split", "fusedlid"):
    pk.ABLATE = frozenset() if v == "split" else frozenset({"fusedlid"})
    r = Renderer(RenderConfig(samples=SPP, width=W, height=H,
                              backend="auto", mode="fast"), scene=scene)
    assert r.backend == "paged", r.backend
    t0 = time.perf_counter()
    imgs[v] = np.asarray(r.render_call(SPP))
    print(f"{v}: warm {time.perf_counter()-t0:.0f}s", flush=True)
    renderers[v] = (r, pk.ABLATE)

assert np.array_equal(imgs["split"], imgs["fusedlid"]), "bits changed!"
print("bit-identical: OK", flush=True)

times = {v: [] for v in renderers}
for rnd in range(ROUNDS):
    for v, (r, abl) in renderers.items():
        pk.ABLATE = abl
        t0 = time.perf_counter()
        np.asarray(r.render_call(SPP))
        times[v].append(time.perf_counter() - t0)
    print("round %d: " % rnd + " ".join(
        f"{v}={times[v][-1]:.2f}" for v in times), flush=True)

old = statistics.median(times["fusedlid"])
new = statistics.median(times["split"])
print(f"\nfusedlid median {old:.3f}s  split median {new:.3f}s  "
      f"delta {new-old:+.3f}s ({100*(new-old)/old:+.1f}%)")
