"""Runtime-layer tests: checkpoint/resume, profiling stats, renderer knobs."""

import numpy as np
import pytest

from raytrace_tpu.config import RenderConfig
from raytrace_tpu.models.scene import three_sphere_scene
from raytrace_tpu.runtime.profiling import FrameStats
from raytrace_tpu.runtime.renderer import Renderer

W, H = 32, 18


def _renderer(**kw):
    cfg = RenderConfig(width=W, height=H, max_depth=6, backend="matmul", **kw)
    return Renderer(cfg, scene=three_sphere_scene())


def test_checkpoint_roundtrip(tmp_path):
    r = _renderer()
    accum = np.asarray(r.render_call(2))
    p = str(tmp_path / "ckpt.npz")
    r.save_state(p, accum, samples_done=2, number=1)
    a2, done, num = r.load_state(p)
    assert np.array_equal(a2, accum) and done == 2 and num == 1


def test_checkpoint_resolution_mismatch(tmp_path):
    r = _renderer()
    p = str(tmp_path / "ckpt.npz")
    r.save_state(p, np.zeros((H, W, 3), np.float32), 1, 1)
    other = Renderer(
        RenderConfig(width=16, height=9, max_depth=6, backend="matmul"),
        scene=three_sphere_scene())
    with pytest.raises(ValueError):
        other.load_state(p)


def test_resumable_render_matches_uninterrupted(tmp_path):
    p = str(tmp_path / "ck.npz")
    r = _renderer(samples_per_call=2)
    full, _ = r.render_resumable(6)
    # interrupted run: 2 calls, checkpoint, new renderer resumes
    r2 = _renderer(samples_per_call=2)
    acc = None
    acc = r2.render_call(2, number=0, accum=acc)
    acc = r2.render_call(2, number=1, accum=acc)
    r2.save_state(p, acc, 4, 2)
    r3 = _renderer(samples_per_call=2)
    resumed, done = r3.render_resumable(6, checkpoint_path=p)
    assert done == 6
    assert np.allclose(np.asarray(resumed), np.asarray(full), atol=1e-5)


def test_frame_stats_adaptive_window():
    fs = FrameStats()
    with fs.frame():
        pass
    fs.durations[:] = [0.1]
    assert fs.adaptive_frame_count(4.0) == int((4.0 + 5.0) / 0.1)
    rep = fs.report()
    assert rep["frames"] == 1
    assert "duration_per_frame" in fs.dump()


def test_chunked_render_bitwise_equal():
    """Internal row chunking must be invisible (global seeds)."""
    r1 = _renderer()
    r1.chunk_rows = H  # single chunk
    a = np.asarray(r1.render_call(2))
    r2 = _renderer()
    r2.chunk_rows = 5  # 4 chunks incl. remainder
    b = np.asarray(r2.render_call(2))
    assert np.array_equal(a, b)


def test_camera_override_changes_view():
    base = _renderer()
    cfg = RenderConfig(width=W, height=H, max_depth=6, backend="matmul",
                       camera_pos=(0.0, 2.0, -20.0), camera_dir=(0.0, -2.0, 20.0))
    from raytrace_tpu.models.scene import three_sphere_scene
    moved = Renderer(cfg, scene=three_sphere_scene())
    a = np.asarray(base.render_call(2))
    b = np.asarray(moved.render_call(2))
    assert not np.array_equal(a, b)


def test_config_camera_defaults_to_reference():
    from raytrace_tpu.runtime.renderer import config_camera, reference_camera
    assert config_camera(RenderConfig()) == reference_camera()


def test_resumable_retries_on_device_fault(monkeypatch):
    """A failing render_call is retried without losing accumulated work."""
    r = _renderer(samples_per_call=2)
    calls = {"n": 0}
    orig = Renderer.render_call

    def flaky(self, spp, number=0, accum=None):
        calls["n"] += 1
        if calls["n"] == 2:  # fail once mid-render
            raise RuntimeError("TPU worker process crashed")
        return orig(self, spp, number=number, accum=accum)

    monkeypatch.setattr(Renderer, "render_call", flaky)
    accum, done = r.render_resumable(4)
    assert done == 4 and calls["n"] == 3
    clean = _renderer(samples_per_call=2)
    ref, _ = clean.render_resumable(4)
    assert np.allclose(accum, ref, atol=1e-5)


def test_resumable_gives_up_after_max_retries(monkeypatch):
    r = _renderer(samples_per_call=2)

    def broken(self, spp, number=0, accum=None):
        raise RuntimeError("boom")

    monkeypatch.setattr(Renderer, "render_call", broken)
    with pytest.raises(RuntimeError):
        r.render_resumable(4, max_retries=1)


def test_device_trace_smoke(tmp_path):
    """jax.profiler trace context works around a render (SURVEY §5 gap)."""
    from raytrace_tpu.runtime.profiling import device_trace

    r = _renderer()
    with device_trace(str(tmp_path)):
        np.asarray(r.render_call(1))
    import os

    assert any(True for _ in os.scandir(tmp_path))  # trace files written


def test_accum_dtype_f64_matches_f32_statistically():
    """Q5 (shader.rgen:55 dvec3): float64 cross-call accumulation. At small
    sample counts f32 summation is near-exact, so the two modes must agree
    to f32 rounding; the dtype and per-call chunking must be honored."""
    r32 = _renderer(samples=8, samples_per_call=2)
    r64 = _renderer(samples=8, samples_per_call=2, accum_dtype="float64")
    a32, n32 = r32.render()
    a64, n64 = r64.render()
    assert n32 == n64 == 8
    assert isinstance(a64, np.ndarray) and a64.dtype == np.float64
    a32 = np.asarray(a32, np.float64)
    assert np.allclose(a32, a64, rtol=1e-5, atol=1e-6)
    # tonemap path accepts the f64 host accumulator
    from raytrace_tpu.ops.image import accum_to_u8

    u8 = accum_to_u8(a64, 8)
    assert u8.dtype == np.uint8 and u8.shape == (H, W, 3)


def test_accum_dtype_rejects_unknown():
    r = _renderer(accum_dtype="bfloat16")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        r.render(2)


def test_golden_check_runs_on_cpu():
    """validation.golden_check (the bench numeric_check artifact) passes in
    interpret mode for both kernel backends."""
    from raytrace_tpu.runtime.validation import golden_check

    for backend in ("mega", "grid"):
        res = golden_check(backend)
        assert res["ok"], res
    # multi-tile config (several kernel grid steps — catches block-pipeline
    # bugs like unwritten aliased-output rows)
    res = golden_check("grid", multi_tile=True)
    assert res["ok"], res


def test_pixels_per_lane_minimizes_tile_padding():
    """The auto pixels_per_lane pick minimizes lanes padded to the kernel
    TILE: at 1080p the naive target M=63 needs 9 tiles of 4096 (11% dead
    lanes per iteration) while M=64 needs 8 (1%)."""
    from raytrace_tpu.config import RenderConfig
    from raytrace_tpu.ops.gridkernel import TILE
    from raytrace_tpu.runtime.renderer import Renderer

    r = Renderer(RenderConfig(samples=1, width=1920, height=1080, backend="grid"))
    assert r.pixels_per_lane == 64
    n = -(-1920 * 1080 // r.pixels_per_lane)
    assert -(-n // TILE) == 8  # tiles
    # explicit config still wins
    r2 = Renderer(RenderConfig(samples=1, width=1920, height=1080,
                               backend="grid", pixels_per_lane=63))
    assert r2.pixels_per_lane == 63


def test_chip_profile_lookup():
    """Chip-constant table (runtime/chips.py): known kinds resolve, unknown
    kinds fall back to the measured v5e-lite row."""
    from raytrace_tpu.runtime.chips import DEFAULT, profile_for

    assert profile_for("TPU v5 lite0").kind_substr == "v5 lite"
    assert profile_for("TPU v5p").kind_substr == "v5p"
    assert profile_for("weird accelerator") is DEFAULT
    assert profile_for(None) is not None  # live lookup never raises
    p = profile_for("TPU v5 lite0")
    assert p.tile == 4096 and p.lanes_target == 1 << 15
