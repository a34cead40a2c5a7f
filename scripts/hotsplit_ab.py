"""In-process interleaved A/B: hot/overflow slot split vs the unsplit build.

Unlike the lid split (whose old layout only existed in the pre-split tree,
forcing a cost EMULATION via the 'fusedlid' ablate), the unsplit program is
still constructible in-tree (build_paged_grid(hot_slots=n_slots)), so this
compares TRUE programs: same scene, tables built per variant, one Renderer
each, interleaved rounds in one process (drift cancels, ~+-2%).  Output
bits asserted identical across all variants (same candidates, same slot
order — models/paged_grid.py govf note).

Variants: unsplit (hot=n_slots), auto (builder HOT_QUANTILE), and any
explicit hot counts passed via HOTS (comma list).

Run idle-host: [HOTS=10] [ROUNDS=6] python scripts/hotsplit_ab.py
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from raytrace_tpu.config import RenderConfig
from raytrace_tpu.models.paged_grid import build_paged_grid
from raytrace_tpu.models.scene import random_sphere_field
from raytrace_tpu.ops.pallas_intersect import sphere_table
from raytrace_tpu.runtime.renderer import Renderer

ROUNDS = int(os.environ.get("ROUNDS", "6"))
HOTS = [int(x) for x in os.environ.get("HOTS", "").split(",") if x]
W, H, SPP = 3840, 2160, 8
MODE = os.environ.get("STRETCH_MODE", "fast")

scene = random_sphere_field(100_000)
tbl = sphere_table(scene)
g_auto = build_paged_grid(scene, tbl, hot_slots=-1)  # HOT_QUANTILE rule
n_slots = g_auto.lids.shape[1]
wq = 4 if g_auto.has_cy is not None else 3
auto_hot = g_auto.geom.shape[1] // wq
variants = {"unsplit": None, f"auto{auto_hot}": -1}
for hv in HOTS:
    if hv != auto_hot and hv < n_slots:
        variants[f"hot{hv}"] = hv

renderers = {}
imgs = {}
for name, hv in variants.items():
    g = g_auto if hv == -1 else build_paged_grid(scene, tbl, hot_slots=hv)
    r = Renderer(RenderConfig(samples=SPP, width=W, height=H,
                              backend="paged", mode=MODE), scene=scene)
    r.device_scene = r.device_scene._replace(paged=jax.device_put(g))
    t0 = time.perf_counter()
    imgs[name] = np.asarray(r.render_call(SPP))
    print(f"{name}: warm {time.perf_counter()-t0:.0f}s", flush=True)
    renderers[name] = r

ref = imgs["unsplit"]
for name, img in imgs.items():
    assert np.array_equal(ref, img), f"bits changed: {name}"
print("bit-identical across variants: OK", flush=True)

times = {v: [] for v in renderers}
for rnd in range(ROUNDS):
    for v, r in renderers.items():
        t0 = time.perf_counter()
        np.asarray(r.render_call(SPP))
        times[v].append(time.perf_counter() - t0)
    print("round %d: " % rnd + " ".join(
        f"{v}={times[v][-1]:.2f}" for v in times), flush=True)

base = statistics.median(times["unsplit"])
print()
for v in times:
    med = statistics.median(times[v])
    print(f"{v:<10} median {med:.3f}s  ({100*(med-base)/base:+.1f}% vs unsplit)")
