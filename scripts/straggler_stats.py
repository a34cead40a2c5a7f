"""Per-pixel wavefront cost distribution + lane-assignment simulation.

Round-3 finding: production issues ~5.06 lane-iterations/sample at 200 spp
(return_iters probe) against an oracle useful floor near ~2 — the wall is
set by the MOST EXPENSIVE lane, and per-pixel costs are heavy-tailed (glass
interiors run toward the depth-50 cap while sky pixels cost ~1), so lane
sums over M=64 statically assigned pixels have a fat right tail.

This script measures the per-pixel iteration cost (oracle replay of the
kernel's iterations-per-segment rule: max(1, cells marched)) on a pixel
sample, then simulates lane-total distributions under assignment policies:

  strided   — the production map (pixel = m*n_lanes + lane)
  shuffled  — a random permutation (iid sampling into lanes)
  lpt       — greedy longest-processing-time binning by known cost
              (the upper bound a cost-feedback reassignment could reach)

and reports max/mean lane cost — the wavefront's utilization ceiling —
for each, at several M.

Usage: python scripts/straggler_stats.py [n_pixels] [spp]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from raytrace_tpu.models.grid import build_grid
from raytrace_tpu.models.scene import generate_random_scene
from raytrace_tpu.ops import rng as rngops
from raytrace_tpu.ops.pallas_intersect import sphere_table
from raytrace_tpu.ops.trace import viewport_arrays
from raytrace_tpu.oracle import cpu_reference as orc
from raytrace_tpu.runtime.renderer import reference_camera

W, H = 1920, 1080
BIG = 3e30


def main() -> int:
    n_px = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sc = generate_random_scene(0.0)
    g = build_grid(sc, sphere_table(sc))
    gs = np.asarray(g.gscal)[0]
    xlo, xhi, ylo, yhi, zlo, zhi = gs[0], gs[1], gs[2], gs[3], gs[4], gs[5]
    cminx, cminz, cmaxx, cmaxz = gs[6], gs[7], gs[10], gs[11]
    glob = [i for i in range(int(sc.n_spheres)) if sc.radii[i] > 0.49]

    def slab(oc, dc, lo, hi):
        if dc == 0.0:
            return (-BIG, BIG) if lo <= oc <= hi else (BIG, -BIG)
        ta, tb = (lo - oc) / dc, (hi - oc) / dc
        return min(ta, tb), max(ta, tb)

    def iters_for(o, d, t_glob):
        """Kernel iterations for one segment: max(1, cells marched)."""
        t0x, t1x = slab(o[0], d[0], xlo, xhi)
        t0y, t1y = slab(o[1], d[1], ylo, yhi)
        t0z, t1z = slab(o[2], d[2], zlo, zhi)
        ts = max(t0x, t0y, t0z, 1e-3)
        te = min(t1x, t1y, t1z)
        if ts > te or ts >= t_glob:
            return 1
        px, pz = o[0] + ts * d[0], o[2] + ts * d[2]
        icx = np.clip(np.floor(px + 0.5), cminx, cmaxx)
        icz = np.clip(np.floor(pz + 0.5), cminz, cmaxz)
        bx = icx + (0.5 if d[0] >= 0 else -0.5)
        bz = icz + (0.5 if d[2] >= 0 else -0.5)
        tnx = BIG if d[0] == 0 else (bx - o[0]) / d[0]
        tnz = BIG if d[2] == 0 else (bz - o[2]) / d[2]
        dtx = BIG if d[0] == 0 else abs(1.0 / d[0])
        dtz = BIG if d[2] == 0 else abs(1.0 / d[2])
        n = 1
        while True:
            t_exit = min(tnx, tnz)
            if t_exit >= t_glob or t_exit >= te or n > 60:
                return n
            if tnx <= tnz:
                icx += np.sign(d[0])
                tnx += dtx
            else:
                icz += np.sign(d[2])
                tnz += dtz
            n += 1

    counter = {"iters": 0}
    orig = orc._closest_hit

    def hooked(scene, o, d, tmin, tmax):
        tg = BIG
        for i in glob:
            oc = np.asarray(o, np.float64) - scene.centers[i]
            dd = np.asarray(d, np.float64)
            a = float(dd @ dd)
            b = float(oc @ dd)
            c = float(oc @ oc) - float(scene.radii[i]) ** 2
            disc = b * b - a * c
            if disc >= 0:
                for t in ((-b - np.sqrt(disc)) / a, (-b + np.sqrt(disc)) / a):
                    if 1e-3 <= t < tg:
                        tg = t
                        break
        counter["iters"] += iters_for(
            np.asarray(o, np.float64), np.asarray(d, np.float64), tg)
        return orig(scene, o, d, tmin, tmax)

    orc._closest_hit = hooked
    vp = viewport_arrays(reference_camera(), W, H)
    up = np.asarray(vp.upper_left)
    hor = np.asarray(vp.horizontal)
    ver = np.asarray(vp.vertical)
    frm = np.asarray(vp.look_from)
    rng = np.random.default_rng(0)
    pix = rng.choice(W * H, size=n_px, replace=False)
    cost = np.zeros(n_px)
    try:
        for j, p in enumerate(pix):
            px, py = int(p % W), int(p // W)
            seed = rngops.tea_hash(
                rngops.tea_hash(np.uint32(px), np.uint32(py)), np.uint32(0))
            counter["iters"] = 0
            for _s in range(spp):
                seed, r1 = rngops.random_float(seed)
                seed, r2 = rngops.random_float(seed)
                u = (px + r1) / W
                v = (py + r2) / H
                d = up + u * hor - v * ver - frm
                seed, _ = rngops.random_float(seed)
                seed, _ = rngops.random_float(seed)
                seed, _c = orc._ray_color(
                    sc, frm.astype(np.float32), d.astype(np.float32), seed, 50)
            cost[j] = counter["iters"] / spp
            if (j + 1) % 500 == 0:
                print(f"{j+1}/{n_px} pixels...", flush=True)
    finally:
        orc._closest_hit = orig

    q = np.percentile(cost, [50, 90, 99, 99.9])
    print(f"\nper-pixel iterations/sample: mean {cost.mean():.2f}  "
          f"p50 {q[0]:.1f}  p90 {q[1]:.1f}  p99 {q[2]:.1f}  p99.9 {q[3]:.1f}  "
          f"max {cost.max():.1f}")

    # lane-total simulation: draw lane pixel sets from the measured cost
    # distribution (iid — the strided map's spatial decorrelation makes this
    # a good model; 'strided' row uses actual image-position sampling)
    sim = np.random.default_rng(1)
    for m in (16, 32, 64, 128):
        n_lanes = 2048
        draws = sim.choice(cost, size=(n_lanes, m), replace=True).sum(axis=1)
        shuf = draws.max() / draws.mean()
        # LPT bound: perfect knowledge binning of the same pixel pool
        pool = np.sort(sim.choice(cost, size=n_lanes * m, replace=True))[::-1]
        bins = np.zeros(n_lanes)
        for c in pool:  # greedy into least-loaded bin (approx via argmin)
            bins[np.argmin(bins)] += c
        lpt = bins.max() / bins.mean()
        print(f"M={m:<4} shuffled max/mean {shuf:.3f}   LPT bound {lpt:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
