"""Paged march-fetch row-sensitivity probe (real TPU).

Builds the dense 100k-sphere field twice — natural n_slots (~22) and
pad_slots=28 (extra slots are POISON misses; image bits identical) — and
times both interleaved.  If padded times FLAT, the per-trip page gather is
fixed-cost-bound and slot-count-reduction redesigns (slot splitting, tighter
cells) cannot pay; if it scales with rows, they can.

Usage: python scripts/paged_rowprobe.py [n_spheres] [WxHxSPP] [pad] [extent]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from raytrace_tpu.models.paged_grid import build_paged_grid
from raytrace_tpu.models.scene import random_sphere_field
from raytrace_tpu.ops.pallas_intersect import sphere_table
from raytrace_tpu.ops.trace import (DeviceScene, prepare_scene, render_band,
                                    viewport_arrays)
from raytrace_tpu.runtime.renderer import reference_camera

ROUNDS = int(os.environ.get("SWEEP_ROUNDS", 5))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spec = sys.argv[2] if len(sys.argv) > 2 else "1920x1080x8"
    pad = int(sys.argv[3]) if len(sys.argv) > 3 else 28
    extent = float(sys.argv[4]) if len(sys.argv) > 4 else 50.0
    w, h, spp = (int(x) for x in spec.split("x"))
    scene = random_sphere_field(n, extent=extent)
    ds = prepare_scene(scene)
    assert ds.paged is not None
    table = np.asarray(sphere_table(scene))
    # both variants UNSPLIT (hot_slots past n_slots disables the r5
    # hot/overflow split): with the split active, poison pad slots would
    # land in the rarely-fetched govf table and the probe would measure
    # nothing.  Hot-region row sensitivity is now swept directly by
    # scripts/hotsplit_ab.py; this probe keeps its original semantics.
    base = build_paged_grid(scene, table, hot_slots=10_000)
    assert base is not None
    ds = ds._replace(paged=base)
    padded = build_paged_grid(scene, table, pad_slots=pad, hot_slots=10_000)
    assert padded is not None
    ds_pad = ds._replace(paged=padded)
    vp = viewport_arrays(reference_camera(), w, h)

    def run(d):
        return np.asarray(render_band(
            d, vp, band_h=h, width=w, y0=np.int32(0), seed_y0=np.int32(0),
            offset_x=np.int32(0), spp=np.int32(spp), number=np.uint32(0),
            max_depth=50, backend="paged", pixels_per_lane=16,
            skip_tmax=True))

    variants = {"base": ds, f"pad{pad}": ds_pad}
    imgs = {}
    for name, d in variants.items():
        t0 = time.perf_counter()
        imgs[name] = run(d)
        print(f"{name}: warm {time.perf_counter()-t0:.0f}s "
              f"(geom shape {tuple(d.paged.geom.shape)})", flush=True)
    same = np.array_equal(imgs["base"], imgs[f"pad{pad}"])
    print(f"images bit-identical: {same}", flush=True)

    times = {v: [] for v in variants}
    for rnd in range(ROUNDS):
        for name, d in variants.items():
            t0 = time.perf_counter()
            run(d)
            times[name].append(time.perf_counter() - t0)
        print(f"round {rnd}: " + " ".join(
            f"{v}={times[v][-1]:.2f}" for v in variants), flush=True)
    base = statistics.median(times["base"])
    for v, ts in times.items():
        m = statistics.median(ts)
        print(f"{v}: median {m:.2f}s ({(m/base-1)*100:+.1f}% vs base)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
