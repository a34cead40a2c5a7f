"""Measure the wavefront straggler wall from REAL per-pixel costs (r4).

The kernel's `iterstats` ablate flag makes acc.r count the issued
iterations each (pixel, call) chunk consumed — a measured per-pixel cost
map from the production kernel itself (not an oracle replay).  This script
renders the probe, then evaluates lane-total balance under assignment
policies:

  strided     the production map (pixel of lane k, slot m = m*n + k)
  serpentine  sort pixels by measured cost desc, deal boustrophedon
              across lanes (near-LPT, pure numpy)
  lpt-bound   cost-sum / n (perfect balance lower bound)

max/mean lane total IS the scheduling-efficiency ceiling: the dispatch
runs until the slowest lane drains.  Under fast mode (RR) the measured
strided factor motivates the balanced-assignment feature; this script is
its sizing evidence.

Env: SWEEP_W/H/SPP/MODE (default 1920x1080x32, fast), SWEEP_M (64).
Run ALONE (idle host): python scripts/lane_balance.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from raytrace_tpu.models.scene import generate_random_scene
from raytrace_tpu.ops.trace import prepare_scene, render_band, viewport_arrays
from raytrace_tpu.runtime.renderer import reference_camera

W = int(os.environ.get("SWEEP_W", 1920))
H = int(os.environ.get("SWEEP_H", 1080))
SPP = int(os.environ.get("SWEEP_SPP", 32))
M = int(os.environ.get("SWEEP_M", 64))
MODE = os.environ.get("SWEEP_MODE", "fast")
RR = None
if MODE == "fast":
    from raytrace_tpu import config as _cfg

    RR = (_cfg.RR_START_DEPTH, _cfg.RR_CAP_DEPTH, _cfg.RR_PMIN)


def lane_stats(cost_flat: np.ndarray, assign: np.ndarray, n: int) -> dict:
    """assign[p] = owning lane for pixel p; lane totals + balance stats."""
    totals = np.bincount(assign, weights=cost_flat, minlength=n)
    return {
        "max/mean": totals.max() / totals.mean(),
        "p99/mean": np.percentile(totals, 99) / totals.mean(),
        "mean": totals.mean(),
    }


def main() -> int:
    ds = prepare_scene(generate_random_scene(0.0))
    vp = viewport_arrays(reference_camera(), W, H)

    def probe(number):
        t0 = time.perf_counter()
        acc = np.asarray(render_band(
            ds, vp, band_h=H, width=W, y0=np.int32(0), seed_y0=np.int32(0),
            offset_x=np.int32(0), spp=np.int32(SPP),
            number=np.uint32(number), max_depth=50, backend="grid",
            pixels_per_lane=M, skip_tmax=True, ablate=("iterstats",), rr=RR))
        print(f"probe {W}x{H}x{SPP}spp mode={MODE} number={number}: "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
        return acc[:, :, 0].astype(np.float64).ravel()

    cost = probe(0)  # issued iters per pixel
    cost_b = probe(1)  # independent streams: held-out evaluation map
    p_total = W * H
    n = -(-p_total // M)  # lanes (production map)
    print(f"per-pixel issued iters/sample: mean {cost.mean()/SPP:.3f} "
          f"p50 {np.percentile(cost,50)/SPP:.2f} "
          f"p99 {np.percentile(cost,99)/SPP:.2f} "
          f"max {cost.max()/SPP:.2f}")

    pix = np.arange(p_total)
    strided = lane_stats(cost, pix % n, n)

    # serpentine deal over cost-sorted pixels (near-LPT): row r of the
    # sorted list goes to lane r%n on even passes, n-1-r%n on odd
    order = np.argsort(-cost, kind="stable")
    ranks = np.arange(p_total)
    pass_i, col = ranks // n, ranks % n
    lane_of_rank = np.where(pass_i % 2 == 0, col, n - 1 - col)
    # pixels beyond the last full pass land on the lowest-index lanes; fine
    serp_assign = np.empty(p_total, np.int64)
    serp_assign[order] = lane_of_rank
    serp = lane_stats(cost, serp_assign, n)

    # pass-sorted greedy LPT (runtime/balance.py method="lpt"): each pass
    # hands the next n sorted pixels heaviest-first to the lightest lanes
    lpt_assign = np.empty(p_total, np.int64)
    totals = np.zeros(n, np.float64)
    sorted_cost = cost[order]
    for p in range(-(-p_total // n)):
        chunk = order[p * n : (p + 1) * n]
        lanes = np.argsort(totals, kind="stable")[: chunk.size]
        lpt_assign[chunk] = lanes
        totals[lanes] += sorted_cost[p * n : p * n + chunk.size]
    lpt = lane_stats(cost, lpt_assign, n)

    # held-out evaluation: assignment built on probe 0's NOISY estimates,
    # lane totals evaluated with probe 1's independent streams — the
    # balance a production render would actually see
    serp_held = lane_stats(cost_b, serp_assign, n)
    lpt_held = lane_stats(cost_b, lpt_assign, n)
    strided_b = lane_stats(cost_b, pix % n, n)

    print(f"strided    max/mean {strided['max/mean']:.4f}  "
          f"p99/mean {strided['p99/mean']:.4f}")
    print(f"serpentine max/mean {serp['max/mean']:.4f}  "
          f"p99/mean {serp['p99/mean']:.4f}  (in-sample)")
    print(f"serpentine max/mean {serp_held['max/mean']:.4f}  "
          f"p99/mean {serp_held['p99/mean']:.4f}  (held-out probe)")
    print(f"lpt        max/mean {lpt['max/mean']:.4f}  "
          f"p99/mean {lpt['p99/mean']:.4f}  (in-sample)")
    print(f"lpt        max/mean {lpt_held['max/mean']:.4f}  "
          f"p99/mean {lpt_held['p99/mean']:.4f}  (held-out probe)")
    print(f"predicted issued-iteration saving vs strided (held-out): "
          f"serpentine {100*(1-serp_held['max/mean']/strided_b['max/mean']):.1f}%  "
          f"lpt {100*(1-lpt_held['max/mean']/strided_b['max/mean']):.1f}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
