"""On-TPU numeric smoke: compiled kernels vs the CPU oracle golden.

The pytest suite forces the CPU platform (conftest), where the kernels run
in interpret mode; this script validates the *compiled* kernels' numerics on
real hardware (Mosaic's sin/sqrt/fma can differ from XLA-CPU).  The same
check runs inside bench.py and lands in the bench JSON as ``numeric_check``.

Run: python scripts/tpu_smoke.py [backends...]   (default: mega grid)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raytrace_tpu.runtime.validation import golden_check


def main() -> int:
    import jax

    backends = sys.argv[1:] or ["mega", "grid"]
    print(f"device={jax.devices()[0]}")
    rc = 0
    for b in backends:
        for mt in (False, True):
            res = golden_check(b, multi_tile=mt)
            tag = "multi-tile" if mt else "single-tile"
            print(f"{b} [{tag}]: bad_px={res['bad_px']}/{res['total_px']} "
                  f"maxdiff={res['max_diff']:.3g} mean_rel={res['mean_rel']:.3g} "
                  f"-> {'PASS' if res['ok'] else 'FAIL'}")
            rc |= 0 if res["ok"] else 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
