"""Multi-chip row-band sharding tests on the virtual 8-device CPU mesh.

Mirrors the reference's multi-GPU split (SURVEY.md §2 parallelism table):
band-split render must assemble to the single-chip image."""

import jax
import numpy as np
import pytest

from raytrace_tpu.config import RenderConfig
from raytrace_tpu.models.scene import three_sphere_scene
from raytrace_tpu.parallel.sharding import MultiChipRenderer, make_mesh
from raytrace_tpu.runtime.renderer import Renderer

W, H, SPP = 32, 24, 4


@pytest.fixture(scope="module")
def config():
    return RenderConfig(samples=SPP, width=W, height=H, max_depth=8, backend="matmul", chips=8)


@pytest.fixture(scope="module")
def scene():
    return three_sphere_scene()


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_equals_single_chip(config, scene):
    """Global-seed mode: N-device render is bit-identical to 1-device."""
    single, _ = Renderer(config, scene=scene).render(SPP)
    multi, _ = MultiChipRenderer(config, scene=scene).render(SPP)
    assert np.array_equal(np.asarray(single), np.asarray(multi))


def test_reference_banding_statistical(config, scene):
    """Reference-banding mode reseeds per band (different stream, same image
    statistics) — mirrors the reference's per-GPU launches."""
    single, _ = Renderer(config, scene=scene).render(SPP)
    multi, _ = MultiChipRenderer(config, scene=scene, reference_banding=True).render(SPP)
    single, multi = np.asarray(single), np.asarray(multi)
    assert not np.array_equal(single, multi)
    assert abs(single.mean() - multi.mean()) / single.mean() < 0.1


def test_unpadded_height():
    """Height not divisible by device count: padded internally, cropped out."""
    cfg = RenderConfig(samples=2, width=16, height=13, max_depth=6, backend="matmul", chips=8)
    sc = three_sphere_scene()
    multi, _ = MultiChipRenderer(cfg, scene=sc).render(2)
    single, _ = Renderer(cfg, scene=sc).render(2)
    assert multi.shape == (13, 16, 3)
    assert np.array_equal(np.asarray(single), np.asarray(multi))


def test_make_mesh():
    mesh = make_mesh(4)
    assert mesh.devices.size == 4
    with pytest.raises(ValueError):
        make_mesh(99)


def test_pick_devices():
    from raytrace_tpu.parallel.devices import pick_devices

    devs = pick_devices()
    assert len(devs) == 8  # virtual CPU mesh
    assert pick_devices(3) == devs[:3]
    assert pick_devices(99) == devs  # truncation never over-allocates
    assert pick_devices(platform="cpu") == devs


def test_sharded_mega_backend():
    """The production megakernel composes with shard_map (interpret mode on
    the CPU mesh; the real pod path uses the same program)."""
    cfg = RenderConfig(samples=2, width=32, height=16, max_depth=6,
                       backend="mega", chips=4, pixels_per_lane=2)
    sc = three_sphere_scene()
    multi, _ = MultiChipRenderer(cfg, scene=sc).render(2)
    single, _ = Renderer(cfg, scene=sc).render(2)
    assert np.array_equal(np.asarray(single), np.asarray(multi))
