"""On-device numeric validation against the CPU-oracle golden.

The pytest suite runs every kernel in interpret mode on CPU; this module
validates the *compiled* kernels' numerics on whatever backend is live
(Mosaic sin/sqrt/fma can differ from XLA-CPU by ulps, which flips a few
fp-chaotic pixels — the bulk must agree).  Used by scripts/tpu_smoke.py and
embedded into bench.py's JSON as the ``numeric_check`` field (VERDICT r1
item 7: the hardware numeric check is a recorded artifact of every bench
run, not a side script).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

W, H, SPP, DEPTH = 24, 14, 2, 12
_DATA = os.path.join(os.path.dirname(__file__), "..", "..", "tests", "data")
GOLDEN = os.path.join(_DATA, "golden_fullscene_24x14_2spp_d12.npy")
# multi-tile config: 9216 lanes at pixels_per_lane=1 spans several kernel
# grid steps — catches block-pipelining bugs (e.g. Mosaic aliased outputs
# not preserving unwritten rows) that a single-tile render can't see
GOLDEN_MT = os.path.join(_DATA, "golden_fullscene_128x72_2spp_d8.npy")


def golden_check(backend: str = "mega", golden_path: Optional[str] = None,
                 multi_tile: bool = False) -> dict:
    """Render the golden config with ``backend`` on the live platform and
    compare against the stored CPU-oracle artifact.

    Returns {"backend", "bad_px", "total_px", "max_diff", "mean_rel", "ok"}.
    Pass criteria: <=5% chaotic pixels (grazing/checker-seam fp flips) and
    <5% mean shift.
    """
    from ..models.scene import generate_random_scene
    from ..ops.trace import prepare_scene, render_band, viewport_arrays
    from .renderer import reference_camera

    if multi_tile:
        w, h, depth, m = 128, 72, 8, 1
        golden = np.load(golden_path or GOLDEN_MT)
    else:
        w, h, depth, m = W, H, DEPTH, 3
        golden = np.load(golden_path or GOLDEN)
    ds = prepare_scene(generate_random_scene(0.0))
    vp = viewport_arrays(reference_camera(), w, h)
    out = np.asarray(render_band(
        ds, vp, band_h=h, width=w, y0=np.int32(0), seed_y0=np.int32(0),
        offset_x=np.int32(0), spp=np.int32(SPP), number=np.uint32(0),
        max_depth=depth, backend=backend, pixels_per_lane=m, skip_tmax=True))
    diff = np.abs(out - golden)
    bad = int((diff.max(axis=2) > 1e-3).sum())
    mean_rel = float(abs(out.mean() - golden.mean()) / golden.mean())
    ok = bad <= max(8, (w * h) // 20) and mean_rel < 0.05
    return {
        "backend": backend,
        "bad_px": bad,
        "total_px": w * h,
        "max_diff": float(diff.max()),
        "mean_rel": round(mean_rel, 6),
        "ok": bool(ok),
    }
