"""C ABI smoke test — the analogue of the reference's scripts/test.py:1-7
(ctypes-load the shared library, call the exported ray_trace).

Here the library embeds CPython; loaded from a running interpreter it reuses
it, so the call lands on raytrace_tpu.api.ray_trace in-process.
"""

import ctypes
import os
import shutil
import subprocess

import pytest


def _lib_path():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "native", "build", "libraytrace.so")
    if not os.path.exists(path):
        if shutil.which("make") is None or shutil.which("g++") is None:
            pytest.skip("native toolchain unavailable")
        subprocess.run(["make", "-C", os.path.join(root, "native")], check=True,
                       capture_output=True)
    return path


def test_ctypes_ray_trace_smoke(tmp_path, monkeypatch, capfd):
    monkeypatch.chdir(tmp_path)  # ray_trace writes render.png to cwd if asked
    lib = ctypes.CDLL(_lib_path())
    lib.ray_trace.argtypes = [
        ctypes.c_uint32, ctypes.c_bool, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_uint32]
    # tiny render; mirrors scripts/test.py's ctypes invocation shape
    lib.ray_trace(2, True, 32, 18, 1)
    out = capfd.readouterr().out
    assert "duration_per_frame" in out
    assert os.path.exists(tmp_path / "render.png")


def test_native_demo_exe(tmp_path):
    """The thin native executable (native/main.c, the reference's
    RayTracingGPUVulkan analogue) links the shared library and renders:
    exe -> libraytrace.so -> embedded CPython -> JAX."""
    _lib_path()  # ensures the native build ran
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exe = os.path.join(root, "native", "build", "raytrace_demo")
    if not os.path.exists(exe):
        subprocess.run(["make", "-C", os.path.join(root, "native")],
                       check=True, capture_output=True)
    env = dict(os.environ, PYTHONPATH=root, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [exe, "--samples", "2", "--width", "32", "--height", "18",
         "--store", "--bogus"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr
    assert "duration_per_frame" in res.stdout
    assert "unknown argument: --bogus" in res.stderr  # main.cpp:49 behavior
    assert (tmp_path / "render.png").exists()
