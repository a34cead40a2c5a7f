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


def _rr_for(mode: str):
    """RR triple for ``mode`` ("exact" -> None, "fast" -> config defaults).

    The tuner sweeps under the mode the production render will use: RR
    changes the iteration mix, so knob optima are re-measured per mode
    (CLAUDE.md re-measure rule).  Measured on v5e-lite the winner is the
    same point (M=64 j=2 K=40) in both modes, but the cache keeps them
    separate (key suffix "|fast") so other chips can differ."""
    if mode == "fast":
        from .. import config as _cfg

        return (_cfg.RR_START_DEPTH, _cfg.RR_CAP_DEPTH, _cfg.RR_PMIN)
    return None


def _cache_key(device_kind: str, mode: str) -> str:
    return device_kind if mode == "exact" else f"{device_kind}|{mode}"


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
             verbose: bool = True, mode: str = "exact") -> dict:
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
    rr = _rr_for(mode)

    def run(m, j, k):
        return np.asarray(render_band(
            ds, vp, band_h=height, width=width, y0=np.int32(0),
            seed_y0=np.int32(0), offset_x=np.int32(0), spp=np.int32(spp),
            number=np.uint32(0), max_depth=50, backend="grid",
            pixels_per_lane=m, skip_tmax=True, grid_steps=(j, k, False, 1),
            rr=rr))

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
        "device_kind": _device_kind(), "mode": mode,
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


def _worker_main() -> int:
    """Persistent TILE-sweep worker (one per TILE candidate; spawned by
    ``sweep_tile``).  TILE is compile-time (env RAYTRACE_GRID_TILE read at
    gridkernel import), so each candidate needs its own process — but the
    interleaved-round methodology needs all candidates timeable round-robin,
    hence persistent children driven over stdin/stdout:

        warm W H SPP M J K [MODE]  -> compiles + warms, prints READY
                                      (MODE exact|fast, default exact)
        go                   -> one timed render, prints T <seconds>
        quit                 -> exits

    RAYTRACE_WORKER_PLATFORM overrides the JAX platform (tests force "cpu";
    the container's sitecustomize would otherwise pin the TPU relay).
    """
    import sys

    plat = os.environ.get("RAYTRACE_WORKER_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    from ..models.scene import generate_random_scene
    from ..ops.trace import prepare_scene, render_band, viewport_arrays
    from .renderer import reference_camera

    ds = prepare_scene(generate_random_scene(0.0))
    vp = None
    params = None
    rr = None

    def run():
        w, h, spp, m, j, k = params
        return np.asarray(render_band(
            ds, vp, band_h=h, width=w, y0=np.int32(0), seed_y0=np.int32(0),
            offset_x=np.int32(0), spp=np.int32(spp), number=np.uint32(0),
            max_depth=50, backend="grid", pixels_per_lane=m, skip_tmax=True,
            grid_steps=(j, k, False, 1), rr=rr))

    for line in sys.stdin:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "warm":
            params = tuple(int(x) for x in parts[1:7])
            rr = _rr_for(parts[7]) if len(parts) > 7 else None
            vp = viewport_arrays(reference_camera(), params[0], params[1])
            run()
            print("READY", flush=True)
        elif parts[0] == "go":
            t0 = time.perf_counter()
            run()
            print(f"T {time.perf_counter() - t0:.6f}", flush=True)
        elif parts[0] == "quit":
            break
    return 0


def sweep_tile(tiles=(2048, 4096, 8192), width: int = 1920,
               height: int = 1080, spp: int = 200, rounds: int = 5,
               m: Optional[int] = None, j: Optional[int] = None,
               k: Optional[int] = None, save: bool = True,
               verbose: bool = True, mode: str = "exact") -> dict:
    """Cross-process TILE sweep (VERDICT r3 item 7).

    TILE is the knob a different chip's VMEM moves most (v5e-lite pinned
    4096) and it cannot be swept in-process (compile-time module global,
    CLAUDE.md).  This spawns one persistent worker per candidate
    (env RAYTRACE_GRID_TILE), warms them all, then times them in
    interleaved rounds — the exact methodology of the in-process sweeps,
    across processes.  The winner is persisted in the autotune cache
    ("tile" key) and applied automatically at package import on this
    device kind.  Output bits are TILE-invariant (lane tiling only).
    """
    import subprocess
    import sys

    tuned = load_tuned(mode=mode) or {}
    m = m if m is not None else int(tuned.get("m", 64))
    j = j if j is not None else int(tuned.get("j", 2))
    k = k if k is not None else int(tuned.get("k", 40))

    workers = {}
    try:
        for t in tiles:
            env = dict(os.environ, RAYTRACE_GRID_TILE=str(t))
            workers[t] = subprocess.Popen(
                [sys.executable, "-m", "raytrace_tpu.runtime.autotune",
                 "--worker"],
                stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
                env=env)

        def cmd(t, line, expect):
            w = workers[t]
            w.stdin.write(line + "\n")
            w.stdin.flush()
            while True:
                out = w.stdout.readline()
                if not out:
                    raise RuntimeError(f"tile worker {t} died")
                if out.startswith(expect):
                    return out.strip()

        # serialize warms (one chip): each pays its own compile once
        for t in tiles:
            t0 = time.perf_counter()
            cmd(t, f"warm {width} {height} {spp} {m} {j} {k} {mode}",
                "READY")
            if verbose:
                print(f"sweep_tile: warm TILE={t} "
                      f"({time.perf_counter()-t0:.0f}s)", flush=True)

        times = {t: [] for t in tiles}
        for rnd in range(rounds):
            for t in tiles:
                out = cmd(t, "go", "T ")
                times[t].append(float(out.split()[1]))
            if verbose:
                print(f"sweep_tile round {rnd}: " + " ".join(
                    f"{t}={times[t][-1]:.2f}s" for t in tiles), flush=True)
    finally:
        for w in workers.values():
            try:
                w.stdin.write("quit\n")
                w.stdin.flush()
            except Exception:
                pass
            w.terminate()

    medians = {t: statistics.median(ts) for t, ts in times.items()}
    best = min(tiles, key=lambda t: medians[t])
    samples = width * height * spp
    result = dict(tuned) if tuned else {
        "m": m, "j": j, "k": k, "device_kind": _device_kind()}
    result["mode"] = mode
    result["tile"] = int(best)
    result["tile_candidates"] = {
        str(t): round(medians[t] / samples * 1e9, 3) for t in tiles}
    if verbose:
        for t in tiles:
            mark = " <- best" if t == best else ""
            print(f"sweep_tile: TILE={t} {medians[t]/samples*1e9:.2f} "
                  f"ns/sample{mark}", flush=True)
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
    data[_cache_key(result["device_kind"], result.get("mode", "exact"))] = (
        result)
    p.write_text(json.dumps(data, indent=1))


def load_tuned(device_kind: Optional[str] = None,
               path: Optional[Path] = None,
               mode: str = "exact") -> Optional[dict]:
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
    tuned = data.get(_cache_key(device_kind, mode))
    if tuned is None and mode != "exact":
        tuned = data.get(device_kind)  # exact-mode fallback (same winner
        # on v5e-lite; a fast-mode --autotune run replaces it)
    return tuned


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


if __name__ == "__main__":
    import sys

    if "--worker" in sys.argv:
        raise SystemExit(_worker_main())
    raise SystemExit("usage: python -m raytrace_tpu.runtime.autotune --worker")
