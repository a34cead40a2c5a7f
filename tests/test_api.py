"""Public API surface tests — the ray_trace C-ABI mirror (api.py)."""

import os

import numpy as np

import raytrace_tpu


def test_ray_trace_smoke(tmp_path, capsys):
    out = os.path.join(tmp_path, "r.png")
    img = raytrace_tpu.ray_trace(
        samples=2, store_render_result=True, width=48, height=27,
        gpu_count=1, out_path=out, backend="matmul", max_depth=6)
    assert img.shape == (27, 48, 3) and img.dtype == np.uint8
    assert img.max() > 0
    assert os.path.exists(out)
    assert "duration_per_frame" in capsys.readouterr().out


def test_defaults_mirror_reference_abi():
    import inspect

    sig = inspect.signature(raytrace_tpu.ray_trace)
    params = list(sig.parameters.values())
    # ray_trace.h:9-15 — same order, same defaults
    assert [p.name for p in params[:5]] == [
        "samples", "store_render_result", "width", "height", "gpu_count"]
    assert [p.default for p in params[:5]] == [10, False, 1920, 1080, 1]


def test_render_config_defaults():
    cfg = raytrace_tpu.RenderConfig()
    assert (cfg.width, cfg.height, cfg.samples) == (1920, 1080, 10)


def test_ray_trace_multichip(tmp_path):
    import os

    out = os.path.join(tmp_path, "mc.png")
    img = raytrace_tpu.ray_trace(
        samples=2, store_render_result=True, width=32, height=24,
        gpu_count=4, out_path=out, backend="matmul", max_depth=6)
    assert img.shape == (24, 32, 3)
    assert os.path.exists(out)


def test_cli_missing_flag_value(capsys):
    """`--samples` at argv end fails with one readable line, not a
    traceback (parity with main.cpp:49's graceful handling)."""
    from raytrace_tpu.utils import cli

    rc = cli.main(["--samples"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "missing value for --samples" in err
    assert "Traceback" not in err

    rc = cli.main(["--width", "abc"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "invalid value for --width" in err


def test_cli_unknown_backend(capsys):
    from raytrace_tpu.utils import cli

    rc = cli.main(["--backend", "vulkan"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "unknown backend: 'vulkan'" in err
    assert "Traceback" not in err


def test_preview_matches_progressive(tmp_path, monkeypatch):
    """--preview writes the running PNG after each call and produces the
    exact image of a plain progressive render (same per-call numbering)."""
    import numpy as np

    from raytrace_tpu.api import ray_trace

    monkeypatch.chdir(tmp_path)
    img = ray_trace(4, True, 24, 12, 1, backend="matmul", max_depth=5,
                    preview=True)
    assert (tmp_path / "render.png").exists()
    img2 = ray_trace(4, False, 24, 12, 1, backend="matmul", max_depth=5,
                     samples_per_call=1)
    assert np.array_equal(img, img2)
