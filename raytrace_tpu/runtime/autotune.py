"""Startup micro-autotune for the wavefront kernel's soft knobs.

``runtime/chips.py`` carries per-chip RECOMMENDED operating points; this
module measures the real one on whatever chip is live — the reference's
workload-tuner idea (``/root/reference/src/workload_tuner.hpp``) applied to
kernel parameters instead of row splits.  It sweeps (pixels_per_lane M,
j_steps, K_STEPS) around the chip profile's seed with the repo's
interleaved-round methodology (compile every candidate up front, time them
round-robin, take medians — the only trustworthy A/B through the axon
relay, CLAUDE.md), picks the fastest, and persists it per device kind.

Output is provably unaffected: the image is BIT-IDENTICAL for every
(M, j, k) — pinned by tests/test_grid.py (M/chunking invariance) and the
jsweep/mjsweep bit-checks — so applying a tuned point is always safe.

Opt-in only: nothing reads the cache unless the caller asks
(``python -m raytrace_tpu --autotune`` or ``apply_tuned()``), so sweep
scripts that mutate the module globals keep full control.
"""

from __future__ import annotations

import json
import os
import statistics
import time
from pathlib import Path
from typing import Optional

import numpy as np

CACHE_PATH = Path(
    os.environ.get("RAYTRACE_AUTOTUNE_CACHE",
                   str(Path.home() / ".cache" / "raytrace_tpu_autotune.json")))


def _device_kind() -> str:
    import jax

    return jax.devices()[0].device_kind


def default_candidates(seed_m: int = 64, seed_j: int = 2,
                       seed_k: int = 40) -> list:
    """Cross pattern around the profile seed: one axis varied at a time.

    Kept small on purpose — each candidate costs one kernel compile
    (minutes on a fresh chip) plus ``rounds`` timed renders."""
    cands = [
        (seed_m, seed_j, seed_k),
        (max(1, seed_m // 2), seed_j, seed_k),
        (min(128, seed_m * 2), seed_j, seed_k),
        (seed_m, max(1, seed_j - 1), seed_k),
        (seed_m, seed_j + 1, seed_k),
        (seed_m, seed_j, max(5, seed_k // 4)),
    ]
    out = []
    for c in cands:  # dedup, preserve order (center first)
        if c not in out:
            out.append(c)
    return out


def autotune(width: int = 1920, height: int = 1080, spp: int = 200,
             rounds: int = 3, candidates: Optional[list] = None,
             scene_time: float = 0.0, save: bool = True,
             verbose: bool = True) -> dict:
    """Measure the candidates on the live chip; return and cache the winner.

    Returns {"m", "j", "k", "ns_per_sample", "device_kind", "candidates"}.
    """
    from ..models.scene import generate_random_scene
    from ..ops import gridkernel as gk
    from ..ops.trace import prepare_scene, render_band, viewport_arrays
    from .chips import profile_for
    from .renderer import reference_camera

    prof = profile_for()
    seed_m = int(np.clip((width * height) // prof.lanes_target, 1, prof.m_max))
    if candidates is None:
        candidates = default_candidates(max(seed_m, 1), prof.j_steps,
                                        prof.k_steps)

    ds = prepare_scene(generate_random_scene(scene_time))
    if ds.grid is None:
        raise RuntimeError("autotune sweeps the grid backend; the book "
                           "scene must build a flat grid")
    vp = viewport_arrays(reference_camera(), width, height)

    def run(m, j, k):
        return np.asarray(render_band(
            ds, vp, band_h=height, width=width, y0=np.int32(0),
            seed_y0=np.int32(0), offset_x=np.int32(0), spp=np.int32(spp),
            number=np.uint32(0), max_depth=50, backend="grid",
            pixels_per_lane=m, skip_tmax=True, grid_steps=(j, k, False, 1)))

    for c in candidates:  # compile everything before any timing
        t0 = time.perf_counter()
        run(*c)
        if verbose:
            print(f"autotune: warm M={c[0]} j={c[1]} K={c[2]} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)

    times = {c: [] for c in candidates}
    for rnd in range(rounds):
        for c in candidates:
            t0 = time.perf_counter()
            run(*c)
            times[c].append(time.perf_counter() - t0)

    medians = {c: statistics.median(ts) for c, ts in times.items()}
    best = min(candidates, key=lambda c: medians[c])
    samples = width * height * spp
    result = {
        "m": best[0], "j": best[1], "k": best[2],
        "ns_per_sample": round(medians[best] / samples * 1e9, 3),
        "device_kind": _device_kind(),
        "width": width, "height": height, "spp": spp,
        "candidates": {
            f"{c[0]}x{c[1]}x{c[2]}": round(medians[c] / samples * 1e9, 3)
            for c in candidates},
    }
    if verbose:
        for c in candidates:
            mark = " <- best" if c == best else ""
            print(f"autotune: M={c[0]} j={c[1]} K={c[2]} "
                  f"{medians[c]/samples*1e9:.2f} ns/sample{mark}", flush=True)
    if save:
        save_tuned(result)
    return result


def save_tuned(result: dict, path: Optional[Path] = None) -> None:
    p = Path(path) if path is not None else CACHE_PATH
    p.parent.mkdir(parents=True, exist_ok=True)
    data = {}
    if p.exists():
        try:
            data = json.loads(p.read_text())
        except (json.JSONDecodeError, OSError):
            data = {}
    data[result["device_kind"]] = result
    p.write_text(json.dumps(data, indent=1))


def load_tuned(device_kind: Optional[str] = None,
               path: Optional[Path] = None) -> Optional[dict]:
    p = Path(path) if path is not None else CACHE_PATH
    if not p.exists():
        return None
    try:
        data = json.loads(p.read_text())
    except (json.JSONDecodeError, OSError):
        return None
    if device_kind is None:
        try:
            device_kind = _device_kind()
        except Exception:
            return None
    return data.get(device_kind)


def apply_tuned(tuned: Optional[dict] = None) -> Optional[dict]:
    """Apply a tuned point: sets gridkernel.J_STEPS/K_STEPS (read by the
    renderer at call time) and returns the dict (caller passes ``m`` as
    ``RenderConfig(pixels_per_lane=...)``).  No-op returning None when no
    tune exists for the live chip."""
    if tuned is None:
        tuned = load_tuned()
    if tuned is None:
        return None
    from ..ops import gridkernel as gk

    gk.J_STEPS = int(tuned["j"])
    gk.K_STEPS = int(tuned["k"])
    return tuned
