"""Hardware validation of the general 5-value layouts + book-scene regression probe.

The late-r3 generality work (varied-height 5-value slot layouts, adaptive
slot counts, ttab/has_tex textured-field paths, 16-global cap) is pinned
bit-identical to brute force in interpret mode (tests/test_grid_general.py,
tests/test_paged.py), but its Mosaic lowerings (stride-24 blocked fetch,
ttab gather, paged na=9/10 page fetch) only exercise on a real chip — run
this first thing whenever hardware is reachable after kernel-layout changes.

Expected: diff-frac at the CPU-interpret fp-chaos scale (~1e-3) or below;
on-hardware grid-vs-mega is usually bit-identical (same-graph ops).
Run from the repo root: python scripts/hw_validate.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from raytrace_tpu.models.scene import generate_random_scene, random_sphere_field
from raytrace_tpu.ops.trace import prepare_scene, render_band, viewport_arrays
from raytrace_tpu.runtime.renderer import reference_camera

def render(ds, backend, W, H, spp, m=16, depth=50):
    t0 = time.perf_counter()
    out = np.asarray(render_band(
        ds, vp_cache[(W, H)], band_h=H, width=W, y0=np.int32(0),
        seed_y0=np.int32(0), offset_x=np.int32(0), spp=np.int32(spp),
        number=np.uint32(0), max_depth=depth, backend=backend,
        pixels_per_lane=m, skip_tmax=True))
    return out, time.perf_counter() - t0

vp_cache = {}
cam = reference_camera()
for wh in ((640, 360), (1920, 1080)):
    vp_cache[wh] = viewport_arrays(cam, *wh)

# 1) book-scene regression probe (four-value fast path, post-refactor)
book = prepare_scene(generate_random_scene(0.0))
render(book, "grid", 1920, 1080, 4, m=64)  # warm
_, t = render(book, "grid", 1920, 1080, 400, m=64)
print(f"book grid 400spp: {t:.2f}s  {t/(1920*1080*400)*1e9:.2f} ns/sample", flush=True)

# 2) varied-height grid (five layout) vs mega on hardware
sc = random_sphere_field(250, seed=3, extent=11.0, y_range=(0.2, 2.5))
ds = prepare_scene(sc)
assert ds.grid is not None and ds.grid.has_cy is not None
print("varied grid n_slots:", ds.grid.has_cy.shape[1], flush=True)
for be in ("mega", "grid"):
    render(ds, be, 640, 360, 4)  # warm
a, ta = render(ds, "mega", 640, 360, 64)
b, tb = render(ds, "grid", 640, 360, 64)
ns = 640 * 360 * 64
diff = float((np.abs(a - b).max(axis=2) > 0).mean())
print(f"varied mega {ta:.2f}s ({ta/ns*1e9:.1f} ns/s)  grid {tb:.2f}s ({tb/ns*1e9:.1f} ns/s)  "
      f"diff-frac {diff:.5f}  mean-rel {abs(a.mean()-b.mean())/a.mean():.2e}", flush=True)

# 3) paged five layout vs mega on hardware (dense varied field)
sp = random_sphere_field(20000, seed=1, extent=25.0, y_range=(0.2, 2.0))
dp = prepare_scene(sp)
assert dp.paged is not None and dp.paged.has_cy is not None
for be in ("mega", "paged"):
    render(dp, be, 640, 360, 2)  # warm
a, ta = render(dp, "mega", 640, 360, 8)
b, tb = render(dp, "paged", 640, 360, 8)
ns = 640 * 360 * 8
diff = float((np.abs(a - b).max(axis=2) > 0).mean())
print(f"paged-varied mega {ta:.2f}s ({ta/ns*1e9:.0f} ns/s)  paged {tb:.2f}s ({tb/ns*1e9:.0f} ns/s)  "
      f"diff-frac {diff:.5f}  mean-rel {abs(a.mean()-b.mean())/a.mean():.2e}", flush=True)
print("HW VALIDATION DONE", flush=True)

# 4) textured field spheres (ttab gather) on hardware
from raytrace_tpu.models.scene import CHECKERED
sct = random_sphere_field(60, seed=3, extent=8.0)
sct.texture[10:20] = CHECKERED
sct.color1[10:20] = (0.9, 0.1, 0.1)
dt = prepare_scene(sct)
assert dt.grid is not None and dt.grid.ttab is not None
a, _ = render(dt, "mega", 640, 360, 8)
b, _ = render(dt, "grid", 640, 360, 8)
print("ttab grid-vs-mega diff-frac:",
      float((np.abs(a - b).max(axis=2) > 0).mean()), flush=True)

# 5) textured + varied paged on hardware
spt = random_sphere_field(20000, seed=1, extent=25.0, y_range=(0.2, 2.0))
spt.texture[50:500] = CHECKERED
spt.color1[50:500] = (0.9, 0.2, 0.1)
dpt = prepare_scene(spt)
assert dpt.paged is not None and dpt.paged.has_tex is not None
a, _ = render(dpt, "mega", 640, 360, 4)
b, _ = render(dpt, "paged", 640, 360, 4)
print("paged-tex diff-frac:",
      float((np.abs(a - b).max(axis=2) > 0).mean()), flush=True)
print("HW VALIDATION (EXTENDED) DONE", flush=True)

# 6) coarse-pitch grid on hardware: pitch-2 Mosaic lowering (cb=1, 8-slot
#    four-value layout) must be bit-identical to the unit-pitch program
from raytrace_tpu.models.grid import build_grid
from raytrace_tpu.ops.pallas_intersect import sphere_table

book_sc = generate_random_scene(0.0)
g2 = build_grid(book_sc, np.asarray(sphere_table(book_sc)), pitch=2.0)
ds_p2 = book._replace(grid=g2)
a, _ = render(book, "grid", 640, 360, 16)
b, _ = render(ds_p2, "grid", 640, 360, 16)
print("pitch2 grid-vs-pitch1 diff-frac:",
      float((np.abs(a - b).max(axis=2) > 0).mean()), flush=True)
print("HW VALIDATION (PITCH) DONE", flush=True)

# 7) balanced pixel assignment (runtime/balance.py): the permuted-table
#    program must match the default strided map BIT-IDENTICALLY on
#    hardware (assignment invariance — interpret-mode fp chaos across
#    graphs does not apply to same-hardware Mosaic programs)
from raytrace_tpu.ops import gridkernel as _gk
from raytrace_tpu.runtime.balance import build_passign, measure_cost_map

_kwb = dict(scene=book, vp=vp_cache[(640, 360)], band_h=360, width=640,
            y0=np.int32(0), seed_y0=np.int32(0), offset_x=np.int32(0),
            spp=np.int32(16), number=np.uint32(0), max_depth=50,
            backend="grid", pixels_per_lane=16, skip_tmax=True,
            rr=(1, 16, 0.05))
_cost = measure_cost_map(_kwb, 8)
_tab = build_passign(_cost, 16, _gk.TILE)
a = np.asarray(render_band(**_kwb))
b = np.asarray(render_band(**_kwb, passign=_tab))
print("balanced-vs-strided diff px:",
      int((np.abs(a - b).max(axis=2) > 0).sum()), "/", 640 * 360, flush=True)
print("HW VALIDATION (BALANCE) DONE", flush=True)
