"""On-TPU numeric smoke: compiled Mosaic megakernel vs the CPU oracle golden.

The pytest suite forces the CPU platform (conftest), where the megakernel
runs in interpret mode; this script validates the *compiled* kernel's
numerics on real hardware (Mosaic's sin/sqrt/fma can differ from XLA-CPU).

Run: python scripts/tpu_smoke.py   (expects the axon/TPU default platform)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raytrace_tpu.models.scene import generate_random_scene
from raytrace_tpu.ops.trace import prepare_scene, render_band, viewport_arrays
from raytrace_tpu.runtime.renderer import reference_camera

W, H, SPP, DEPTH = 24, 14, 2, 12
GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                      "golden_fullscene_24x14_2spp_d12.npy")


def main() -> int:
    import jax

    golden = np.load(GOLDEN)
    ds = prepare_scene(generate_random_scene(0.0))
    vp = viewport_arrays(reference_camera(), W, H)
    out = np.asarray(render_band(
        ds, vp, band_h=H, width=W, y0=np.int32(0), seed_y0=np.int32(0),
        offset_x=np.int32(0), spp=np.int32(SPP), number=np.uint32(0),
        max_depth=DEPTH, backend="mega", pixels_per_lane=3, skip_tmax=True))
    diff = np.abs(out - golden)
    bad = int((diff.max(axis=2) > 1e-3).sum())
    mean_rel = abs(out.mean() - golden.mean()) / golden.mean()
    print(f"device={jax.devices()[0]} bad_px={bad}/{W*H} "
          f"maxdiff={diff.max():.3g} mean_rel={mean_rel:.3g}")
    # compiled-Mosaic fp (fma contraction, transcendental impls) differs from
    # the numpy oracle by ulps; chaotic pixels flip, the bulk must agree
    ok = bad <= max(8, (W * H) // 20) and mean_rel < 0.05
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
