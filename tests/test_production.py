"""Composed production loop (VERDICT r4 item 4): animated scene +
per-device bands + live tuner windows behind one HTTP server — the
reference's actual operating mode (/root/reference/src/ray_trace.cpp:579-776,
windows tiled per GPU at window.hpp:47-54), on the virtual CPU mesh."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from raytrace_tpu.config import RenderConfig
from raytrace_tpu.runtime.production import ProductionLoop

W, H, SPP = 32, 24, 2


def _cfg(**kw):
    kw.setdefault("samples", SPP)
    kw.setdefault("width", W)
    kw.setdefault("height", H)
    kw.setdefault("max_depth", 6)  # matches test_hetero's compiled shapes
    kw.setdefault("backend", "matmul")
    kw.setdefault("chips", 4)
    kw.setdefault("pixels_per_lane", 1)
    return RenderConfig(**kw)


def _get(v, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{v.port}{path}",
                                timeout=30) as r:
        return r.status, r.read()


class _FakeClock:
    """Deterministic frame clock: +2 s per frame so the animated hero
    sphere (scene.h:82-83 time input) visibly moves between frames."""

    def __init__(self):
        self.t = 0.0

    def __call__(self):
        self.t += 2.0
        return self.t


def test_production_loop_animates_on_virtual_mesh():
    """Animated multi-device serve: every frame re-generates the scene,
    renders one band per device, feeds the tuner, and publishes — all in
    one process (ray_trace.cpp:665 animation + :741-776 tuner windows)."""
    loop = ProductionLoop(_cfg(), port=0, time_fn=_FakeClock())
    loop.start_server()
    try:
        pngs = []
        orig_publish = loop._publish

        def capture(accum, done):
            pngs.append(np.array(accum, copy=True))
            orig_publish(accum, done)

        loop._publish = capture
        t = threading.Thread(target=loop.render_loop,
                             kwargs={"max_frames": 3}, daemon=True)
        t.start()
        t.join(timeout=600)
        assert not t.is_alive()
        # the animated scene changed between frames -> different images
        assert len(pngs) == 3
        assert not np.array_equal(pngs[0], pngs[1])
        assert not np.array_equal(pngs[1], pngs[2])
        # multi-device: the hetero renderer split H rows over 4 devices
        hr = loop.renderer
        assert len(hr.rows) == 4 and sum(hr.rows) == H
        # HTTP surface: PNG frame + production state fields
        code, body = _get(loop, "/frame.png")
        assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
        state = json.loads(_get(loop, "/state")[1])
        assert state["duration_per_frame"] > 0
        assert sum(state["rows"]) == H and len(state["rows"]) == 4
        assert state["frame"] == 2 and state["resplits"] >= 0
    finally:
        loop.stop()


def test_production_loop_camera_steers_static_scene():
    """animate=False: a static scene renders identical frames until the
    camera input (window.hpp:42-46 analogue) steers the view at a frame
    boundary."""
    loop = ProductionLoop(_cfg(), port=0, animate=False)
    loop.start_server()
    try:
        frames = []
        orig_publish = loop._publish

        def capture(accum, done):
            frames.append(np.array(accum, copy=True))
            orig_publish(accum, done)

        loop._publish = capture
        done2 = threading.Event()

        def run():
            # frame 0+1 static, steer, frame 2 steered
            loop.render_loop(max_frames=2)
            done2.set()
            loop.render_loop(max_frames=1)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        assert done2.wait(timeout=600)
        loop.orbit(0.8, 0.0)
        t.join(timeout=600)
        assert not t.is_alive()
        assert len(frames) == 3
        # static scene + static camera -> bit-identical frames
        assert np.array_equal(frames[0], frames[1])
        # steered camera -> different image
        assert not np.array_equal(frames[1], frames[2])
        state = json.loads(_get(loop, "/state")[1])
        assert state["camera_pos"] != [13.0, 11.0, -3.0]
    finally:
        loop.stop()
