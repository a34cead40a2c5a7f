"""Single-device render orchestrator — the TPU analogue of L4.

Replaces the per-GPU resource fan-out + frame loop of
``ray_trace_with_physical_devices`` (/root/reference/src/ray_trace.cpp:42-920).
On TPU there are no swapchains/fences/descriptor sets to manage; what remains
of L4 is (a) memory-driven row-band chunking of the pixel grid (one jit call
per band — the analogue of one ``traceRaysKHR`` dispatch), (b) the progressive
multi-call accumulation path the reference's design anticipates but neuters
(quirk Q3: binding 3 + ``RenderCallInfo.number``), and (c) the frame loop with
``duration_per_frame`` timing (ray_trace.cpp:576,741-748).

Internal chunking is seed-transparent: chunks seed from *global* pixel
coordinates, so any chunk_rows setting produces bit-identical output to an
unchunked render (unlike reference multi-GPU banding, which reseeds per band —
that behavior lives in ``parallel/sharding.py``).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from ..config import RenderConfig
from ..models.camera import Camera
from ..models.scene import SceneArrays, generate_random_scene
from ..ops import image as imageops
from ..ops.trace import (DeviceScene, prepare_scene, render_band,
                         tmax_never_binds, viewport_arrays)

# [N, S] intersection intermediates drive the lane count for the XLA backends;
# the Pallas backend never materializes them and can take far larger bands.
_TARGET_LANES = {
    "bruteforce": 1 << 14, "matmul": 1 << 18, "pallas": 1 << 19,
    "mega": 1 << 21, "grid": 1 << 21, "paged": 1 << 21,
}


def reference_camera() -> Camera:
    """Fixed camera of the reference frame loop (ray_trace.cpp:669-670, Q4):
    pos (13,11,-3) looking at the origin; fov/aperture/focus baked in rgen."""
    return Camera(look_from=(13.0, 11.0, -3.0), look_at=(0.0, 0.0, 0.0))


def config_camera(config: RenderConfig) -> Camera:
    """Camera from config overrides (RenderCallInfo.camera_pos/camera_dir
    semantics: lookAt = pos + dir, shader.rgen:48-49) or the reference's."""
    if config.camera_pos is None and config.camera_dir is None:
        return reference_camera()
    pos = config.camera_pos if config.camera_pos is not None else (13.0, 11.0, -3.0)
    d = config.camera_dir if config.camera_dir is not None else (-pos[0], -pos[1], -pos[2])
    return Camera(look_from=tuple(pos),
                  look_at=(pos[0] + d[0], pos[1] + d[1], pos[2] + d[2]))


def pick_backend(requested: str = "auto") -> str:
    """auto -> pallas on TPU, matmul elsewhere (CPU tests, debugging)."""
    if requested != "auto":
        return requested
    # Megakernel on TPU (whole wavefront iteration in one Pallas call);
    # plain XLA elsewhere (pallas interpret mode is slow).
    return "mega" if jax.default_backend() == "tpu" else "matmul"


def resolve_backend(requested: str, device_scene) -> str:
    """Scene-aware backend choice: the grid-DDA megakernel (the acceleration
    structure, ops/gridkernel.py) whenever auto resolves to the megakernel
    and the scene fits the uniform grid; brute force otherwise."""
    b = pick_backend(requested)
    if b == "mega" and requested == "auto":
        if device_scene.grid is not None:
            return "grid"
        if device_scene.paged is not None:
            return "paged"
    return b


class Renderer:
    """Renders full frames for one logical device (one band = one jit call)."""

    def __init__(self, config: RenderConfig, scene: Optional[SceneArrays] = None):
        self.config = config
        self.scene = scene if scene is not None else generate_random_scene(config.scene_time)
        # device residency: prepare_scene returns HOST numpy tables; passing
        # them to the jitted band render re-uploads every table on every
        # call (17 arrays, ~132 KB for the book scene) — invisible on a
        # PCIe-attached host, but through the axon relay each transfer pays
        # real dispatch latency, which dominated the measured 1-spp frame
        # (docs/PERFORMANCE.md).  One device_put here makes every later
        # render_call transfer only its 5 scalars.
        self.device_scene: DeviceScene = jax.device_put(prepare_scene(self.scene))
        self.backend = resolve_backend(config.backend, self.device_scene)
        w, h = config.width, config.height
        # wavefront M: average path-length variance across M strided pixels
        # per lane (see trace.py); 1 for small images so tests stay tiny
        if config.pixels_per_lane is not None:
            self.pixels_per_lane = config.pixels_per_lane
        else:
            # target the chip profile's lane count (~32K on v5e-lite, M up
            # to 64): measured best total time at 1080p.  Output is
            # bit-identical for every M (tests pin it), so among M near the
            # target pick the one minimizing lanes padded to the kernel's
            # TILE: at 1080p the naive M=63 gives 32,914 lanes -> 9 tiles
            # of 4096 (11% dead lanes every iteration) while M=64 gives
            # 32,400 -> 8 tiles (1% waste).
            from .chips import profile_for

            prof = profile_for()
            base = int(np.clip((w * h) // prof.lanes_target, 1, prof.m_max))
            tile = self._backend_tile()
            if tile is None:
                self.pixels_per_lane = base
            else:
                p = w * h

                def padded(m):
                    n = -(-p // m)
                    return -(-n // tile) * tile - n

                lo, hi = max(1, base - 4), min(64, base + 4)
                self.pixels_per_lane = min(
                    range(lo, hi + 1), key=lambda m: (padded(m), -m))
        target = _TARGET_LANES.get(self.backend, 1 << 18)
        self.chunk_rows = max(
            1, min(h, (target * self.pixels_per_lane) // max(w, 1))
        )
        self.vp = jax.device_put(viewport_arrays(config_camera(config), w, h))
        self.skip_tmax = tmax_never_binds(self.scene, config_camera(config))
        # balanced pixel->lane assignment tables per band (runtime/
        # balance.py), built on demand when config.balance_spp > 0
        self._passign = None
        self.balance_stats = None

    def _backend_tile(self):
        """Lane-tile width of the wavefront backends (None for XLA paths)."""
        if self.backend in ("grid", "paged"):
            from ..ops.gridkernel import TILE

            return TILE
        if self.backend == "mega":
            from ..ops.megakernel import TILE

            return TILE
        return None

    def set_scene(self, scene: SceneArrays) -> None:
        self.scene = scene
        self.device_scene = jax.device_put(prepare_scene(scene))
        self.backend = resolve_backend(self.config.backend, self.device_scene)

    def render_call(self, spp: int, number: int = 0, accum=None,
                    n_calls=None, spp_last=None, return_iters: bool = False):
        """One render call (= one traceRaysKHR dispatch): spp samples/pixel.

        Returns the accumulated color sum [H, W, 3] (device array, pre-gamma).
        ``accum`` carries the running sum for progressive rendering.
        ``n_calls``/``spp_last`` (grid backend): merge that many progressive
        calls into this one device dispatch (numbers number..number+n_calls-1,
        ``spp`` each, ``spp_last`` for the final one) — bit-identical to the
        same calls issued separately, minus the per-call wavefront drains.
        ``return_iters``: additionally return the summed wavefront iteration
        counts — (accum, tile_iters, lane_slots) where ``tile_iters`` is the
        total tile-iterations executed (while-loop iterations x lane-tiles,
        summed over bands) and ``lane_slots`` the total lane-iteration slots
        (iterations x padded lanes) — the denominator of the scheduling-
        efficiency artifact in bench.py (VERDICT r4 item 5).
        """
        cfg = self.config
        w, h = cfg.width, cfg.height
        if self.backend == "grid":  # debug perf probes (gridkernel.ABLATE)
            from ..ops import gridkernel as _gk

            ablate = tuple(sorted(_gk.ABLATE))
            # read at call time and passed as a STATIC arg: module globals
            # read at trace time would make in-process (j, k) sweeps reuse
            # the first compiled program (same jit cache key)
            grid_steps = (_gk.J_STEPS, _gk.K_STEPS, _gk.UNROLL, _gk.FUSE)
        elif self.backend == "paged":
            from ..ops import pagedkernel as _pk

            # slots [1] (rebucket interval) and [3] (Morton vs linear sort
            # key) are the paged driver's knobs; read at call time for the
            # same sweep-safety reason as the grid knobs above.  The
            # interval scales with the band's lane count (K_AUTO; sweep
            # data at pagedkernel.K_STEPS) — bands other than the last
            # have chunk_rows rows, and the last band's smaller lane
            # count only over-sizes K, which the plateau tolerates.
            ablate = tuple(sorted(_pk.ABLATE))
            band_lanes = -(-min(self.chunk_rows, h) * w // self.pixels_per_lane)
            # slot [2]: carried winner attrs (pagedkernel.CARRY) — in-march
            # attr fetch replacing the seg_done-time resolve page loop
            grid_steps = (1, _pk.scaled_k(band_lanes),
                          1 if _pk.CARRY else 0, _pk.MORTON)
        else:
            ablate = ()
            grid_steps = None
        if (cfg.balance_spp and self.backend == "grid"
                and self._passign is None):
            self.enable_balance()
        bands = []
        tile_iters = 0
        lane_slots = 0
        tile = self._backend_tile() or 1
        for band_y0 in range(0, h, self.chunk_rows):
            band_h = min(self.chunk_rows, h - band_y0)
            init = None if accum is None else accum[band_y0 : band_y0 + band_h]
            out = render_band(
                self.device_scene,
                self.vp,
                band_h=band_h,
                width=w,
                y0=np.int32(band_y0),
                seed_y0=np.int32(band_y0),  # global coords: chunk-invariant
                offset_x=np.int32(0),
                spp=np.int32(spp),
                number=np.uint32(number),
                accum_init=init,
                max_depth=cfg.max_depth,
                backend=self.backend,
                pixels_per_lane=self.pixels_per_lane,
                skip_tmax=self.skip_tmax,
                ablate=ablate,
                grid_steps=grid_steps,
                n_calls=None if n_calls is None else np.int32(n_calls),
                spp_last=None if spp_last is None else np.int32(spp_last),
                rr=cfg.rr,
                passign=(None if self._passign is None
                         else self._passign.get(band_y0)),
                return_iters=return_iters,
            )
            if return_iters:
                out, iters = out
                p_total = band_h * w
                m = max(1, min(self.pixels_per_lane, p_total))
                n_lanes = -(-p_total // m)  # ceil: trace.py's lane count
                n_pad = -(-n_lanes // tile) * tile  # padded to lane tiles
                iters = int(iters)
                tile_iters += iters * (n_pad // tile)
                lane_slots += iters * n_pad
            bands.append(out)
        import jax.numpy as jnp

        acc = jnp.concatenate(bands, axis=0)
        if return_iters:
            return acc, tile_iters, lane_slots
        return acc

    def enable_balance(self, probe_spp: Optional[int] = None) -> dict:
        """Measure per-pixel costs (the kernel's iterstats probe) and build
        a balanced pixel->lane assignment per band (runtime/balance.py).

        The image is BIT-IDENTICAL with or without balancing (assignment
        invariance — pinned by tests); only the wavefront's straggler wall
        moves (measured ~1.25 -> ~1.06 max/mean lane cost in fast mode).
        Returns per-band {max_over_mean, lanes} diagnostics."""
        from ..ops import gridkernel as _gk
        from . import balance as bal

        if self.backend != "grid":
            raise ValueError("balanced assignment is a grid-backend feature")
        cfg = self.config
        spp = probe_spp or cfg.balance_spp or 32
        w, h = cfg.width, cfg.height
        grid_steps = (_gk.J_STEPS, _gk.K_STEPS, _gk.UNROLL, _gk.FUSE)
        tables, stats = {}, {}
        for band_y0 in range(0, h, self.chunk_rows):
            band_h = min(self.chunk_rows, h - band_y0)
            cost = bal.measure_cost_map(dict(
                scene=self.device_scene, vp=self.vp, band_h=band_h,
                width=w, y0=np.int32(band_y0), seed_y0=np.int32(band_y0),
                offset_x=np.int32(0), number=np.uint32(0),
                max_depth=cfg.max_depth, backend="grid",
                pixels_per_lane=self.pixels_per_lane,
                skip_tmax=self.skip_tmax, grid_steps=grid_steps,
                rr=cfg.rr), spp)
            tab = bal.build_passign(cost, self.pixels_per_lane,
                                    self._backend_tile())
            tables[band_y0] = jax.device_put(tab)
            stats[band_y0] = bal.balance_stats(cost, tab,
                                               self.pixels_per_lane)
            # mean issued (busy) iterations per sample from the probe —
            # the numerator of bench.py's scheduling-efficiency artifact
            stats[band_y0]["issued_per_sample"] = float(
                np.asarray(cost, np.float64).mean() / spp)
        self._passign = tables
        self.balance_stats = stats
        return stats

    def render(self, samples: Optional[int] = None, on_chunk=None):
        """Full render: ``samples`` total spp, split into progressive calls of
        ``config.samples_per_call`` (reference runs everything in one call,
        quirk Q3).  Returns (accum_sum [H,W,3], total_spp).

        ``on_chunk(accum, samples_done)`` fires after each progressive call —
        the headless analogue of the reference's live window updating every
        frame (the CLI's --preview writes the running PNG from it).

        accum_dtype="float64" reproduces the reference's dvec3 accumulation
        semantics (shader.rgen:55, quirk Q5): each call's f32 chunk sum is
        added into a float64 host accumulator (TPU f64 is emulated/slow, so
        the f64 adds happen host-side across calls — in-chunk summation stays
        device f32).  The f32-vs-f64 image error at benchmark scale is
        recorded in docs/PERFORMANCE.md.
        """
        cfg = self.config
        total = cfg.samples if samples is None else samples
        per_call = cfg.samples_per_call or total
        number = 0
        done = 0
        if cfg.accum_dtype == "float64":
            accum64: Optional[np.ndarray] = None
            while done < total:
                spp = min(per_call, total - done)
                chunk = np.asarray(self.render_call(spp, number=number), np.float64)
                accum64 = chunk if accum64 is None else accum64 + chunk
                done += spp
                number += 1
                if on_chunk is not None:
                    on_chunk(accum64, done)
            return accum64, total
        if cfg.accum_dtype != "float32":
            raise ValueError(f"unsupported accum_dtype: {cfg.accum_dtype!r}")
        # grid backend: merge up to calls_per_exec progressive calls into one
        # device dispatch (in-kernel call merge) — output is bit-identical
        # for any grouping, the per-call wavefront drains are not paid, and
        # on_chunk then fires once per dispatch instead of once per call
        group_max = max(1, cfg.calls_per_exec) if self.backend == "grid" else 1
        accum = None
        while done < total:
            remaining = total - done
            nc = min(group_max, -(-remaining // per_call))
            if nc > 1:
                spp_last = min(per_call, remaining - (nc - 1) * per_call)
                accum = self.render_call(per_call, number=number, accum=accum,
                                         n_calls=nc, spp_last=spp_last)
                step = (nc - 1) * per_call + spp_last
            else:
                step = min(per_call, remaining)
                accum = self.render_call(step, number=number, accum=accum)
            done += step
            number += nc
            if on_chunk is not None:
                on_chunk(accum, done)
        return accum, total

    def render_u8(self, samples: Optional[int] = None) -> np.ndarray:
        """Render and tonemap to the display image (u8 RGB, host array)."""
        accum, total = self.render(samples)
        return np.asarray(imageops.accum_to_u8(accum, total))

    def save_state(self, path: str, accum, samples_done: int, number: int) -> None:
        """Checkpoint a progressive render (accumulator + progress).

        The reference has no checkpointing (its accumulator is cleared every
        frame, quirk Q3); this completes the progressive design it implies.
        """
        np.savez(
            path, accum=np.asarray(accum), samples_done=samples_done,
            number=number, width=self.config.width, height=self.config.height,
        )

    def load_state(self, path: str):
        """Returns (accum, samples_done, number) for resuming ``render``."""
        z = np.load(path)
        if (int(z["width"]), int(z["height"])) != (self.config.width, self.config.height):
            raise ValueError("checkpoint resolution mismatch")
        return z["accum"], int(z["samples_done"]), int(z["number"])

    def render_resumable(self, total: int, checkpoint_path: Optional[str] = None,
                         checkpoint_every: int = 0, max_retries: int = 2):
        """Progressive render with checkpoint/resume + device-fault retry.

        Failure recovery the reference lacks (SURVEY.md §5: its errors just
        throw to main): each call's accumulator is snapshotted to host, so a
        TPU runtime fault (observed in practice on very long executions)
        loses at most one call's work; the render resumes automatically.
        """
        cfg = self.config
        if checkpoint_every:
            per_call = cfg.samples_per_call or max(1, checkpoint_every)
        else:
            per_call = cfg.samples_per_call or total
        accum, done, number = None, 0, 0
        if checkpoint_path:
            import os

            if os.path.exists(checkpoint_path):
                accum, done, number = self.load_state(checkpoint_path)
        retries = 0
        while done < total:
            spp = min(per_call, total - done)
            try:
                out = self.render_call(spp, number=number, accum=accum)
                out = np.asarray(out)  # host snapshot; also a real sync point
            except Exception:
                if retries >= max_retries:
                    raise
                retries += 1
                continue  # accum (host array) is intact; retry the call
            accum, done, number = out, done + spp, number + 1
            if checkpoint_path and checkpoint_every and done < total:
                self.save_state(checkpoint_path, accum, done, number)
        return accum, done

    def benchmark(self, min_seconds: float = 4.0, warmup: int = 1):
        """Frame-loop benchmark with the reference's adaptive measurement
        window: duration_per_frame over >= (4 s + 50 dpf)/dpf frames
        (ray_trace.cpp:86,741-748).  Returns (dpf_seconds, frames)."""
        spp = self.config.samples
        # np.asarray (host fetch), NOT jax.block_until_ready: the axon TPU
        # relay returns from block_until_ready before execution finishes, so
        # only timings that fetch the result to host are trustworthy
        for _ in range(warmup):
            np.asarray(self.render_call(spp))
        # first probe frame
        t0 = time.perf_counter()
        np.asarray(self.render_call(spp))
        dpf = time.perf_counter() - t0
        frames = max(1, int((min_seconds + 50.0 * dpf) / dpf)) if dpf > 0 else 1
        frames = min(frames, 1000)
        t0 = time.perf_counter()
        for _ in range(frames):
            np.asarray(self.render_call(spp))
        dpf = (time.perf_counter() - t0) / frames
        print(f"duration_per_frame: {dpf * 1000.0:.3f} ms")
        return dpf, frames
