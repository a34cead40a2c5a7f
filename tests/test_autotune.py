"""Kernel-parameter micro-autotune (runtime/autotune.py).

The reference's workload tuner (src/workload_tuner.hpp) balances row splits
at runtime; this is the same idea applied to the wavefront kernel's soft
knobs (M, j_steps, K_STEPS) with the repo's interleaved measurement
methodology.  Output bits are invariant to all three knobs (pinned by the
grid invariance tests), so the tune can never change the image — these
tests pin the sweep/cache/apply plumbing.
"""

import json

import numpy as np

from raytrace_tpu.runtime import autotune as at


def test_autotune_sweep_and_cache(tmp_path):
    cache = tmp_path / "tune.json"
    res = at.autotune(width=48, height=27, spp=1, rounds=1,
                      candidates=[(2, 1, 4), (2, 2, 4)], save=False,
                      verbose=False)
    assert res["m"] == 2 and res["j"] in (1, 2) and res["k"] == 4
    assert set(res["candidates"]) == {"2x1x4", "2x2x4"}
    assert res["ns_per_sample"] > 0
    at.save_tuned(res, path=cache)
    data = json.loads(cache.read_text())
    assert res["device_kind"] in data

    # load round-trips by device kind; unknown kinds miss
    got = at.load_tuned(res["device_kind"], path=cache)
    assert got["m"] == res["m"]
    assert at.load_tuned("no-such-chip", path=cache) is None


def test_autotune_fast_mode_cache(tmp_path):
    """mode="fast" sweeps under RR and caches per (device kind, mode);
    load_tuned(mode="fast") prefers the fast row and falls back to the
    exact row when only that exists."""
    cache = tmp_path / "tune.json"
    res = at.autotune(width=48, height=27, spp=1, rounds=1,
                      candidates=[(2, 1, 4), (2, 2, 4)], save=False,
                      verbose=False, mode="fast")
    assert res["mode"] == "fast"
    at.save_tuned(res, path=cache)
    data = json.loads(cache.read_text())
    assert f"{res['device_kind']}|fast" in data
    assert res["device_kind"] not in data  # exact key untouched

    got = at.load_tuned(res["device_kind"], path=cache, mode="fast")
    assert got["mode"] == "fast" and got["m"] == res["m"]
    # exact lookup misses (no exact row saved)
    assert at.load_tuned(res["device_kind"], path=cache) is None

    # exact-row fallback: seed an exact-only cache, ask for fast
    exact = dict(res, mode="exact")
    cache2 = tmp_path / "tune2.json"
    at.save_tuned(exact, path=cache2)
    fb = at.load_tuned(res["device_kind"], path=cache2, mode="fast")
    assert fb is not None and fb["mode"] == "exact"


def test_apply_tuned_sets_kernel_globals():
    from raytrace_tpu.ops import gridkernel as gk

    j0, k0 = gk.J_STEPS, gk.K_STEPS
    try:
        out = at.apply_tuned({"m": 2, "j": 1, "k": 7})
        assert out["m"] == 2
        assert gk.J_STEPS == 1 and gk.K_STEPS == 7
    finally:
        gk.J_STEPS, gk.K_STEPS = j0, k0


def test_default_candidates_shape():
    cands = at.default_candidates(64, 2, 40)
    assert cands[0] == (64, 2, 40)
    assert (32, 2, 40) in cands and (128, 2, 40) in cands
    assert (64, 1, 40) in cands and (64, 3, 40) in cands
    assert len(cands) == len(set(cands))


def test_cli_autotune_flag(tmp_path, monkeypatch):
    """--autotune with a pre-seeded cache applies the tuned point and
    renders (no sweep needed)."""
    import raytrace_tpu.runtime.autotune as atm
    from raytrace_tpu.ops import gridkernel as gk
    from raytrace_tpu.utils import cli

    cache = tmp_path / "tune.json"
    kind = atm._device_kind()
    cache.write_text(json.dumps(
        {kind: {"m": 2, "j": 1, "k": 4, "device_kind": kind}}))
    monkeypatch.setattr(atm, "CACHE_PATH", cache)
    out = tmp_path / "r.png"
    j0, k0 = gk.J_STEPS, gk.K_STEPS
    try:
        rc = cli.main(["--autotune", "--samples", "1", "--width", "48",
                       "--height", "27", "--depth", "4", "--store",
                       "--out", str(out)])
        assert rc == 0
        assert gk.J_STEPS == 1 and gk.K_STEPS == 4
        assert out.exists()
    finally:
        gk.J_STEPS, gk.K_STEPS = j0, k0


def test_sweep_tile_cross_process(tmp_path, monkeypatch):
    """The cross-process TILE sweep (VERDICT r3 item 7): persistent workers
    per candidate, interleaved rounds, winner persisted under the "tile"
    key, and the package bootstrap applies it at next import."""
    import os
    import subprocess
    import sys

    cache = tmp_path / "tune.json"
    monkeypatch.setattr(at, "CACHE_PATH", cache)
    monkeypatch.setenv("RAYTRACE_AUTOTUNE_CACHE", str(cache))
    monkeypatch.setenv("RAYTRACE_WORKER_PLATFORM", "cpu")
    res = at.sweep_tile(tiles=(1024, 2048), width=48, height=16, spp=1,
                        rounds=1, m=2, j=1, k=4, verbose=False)
    assert res["tile"] in (1024, 2048)
    assert set(res["tile_candidates"]) == {"1024", "2048"}
    data = json.loads(cache.read_text())
    row = next(iter(data.values()))
    assert row["tile"] == res["tile"]

    # the import bootstrap picks the tuned TILE up (fresh interpreter)
    env = dict(os.environ, RAYTRACE_AUTOTUNE_CACHE=str(cache),
               JAX_PLATFORMS="cpu")
    env.pop("RAYTRACE_GRID_TILE", None)
    out = subprocess.run(
        [sys.executable, "-c",
         "import raytrace_tpu; from raytrace_tpu.ops.gridkernel import TILE;"
         "print('TILE', TILE)"],
        capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr[-500:]
    assert f"TILE {res['tile']}" in out.stdout
