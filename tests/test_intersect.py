"""Ray-sphere intersection tests (ops/intersect.py vs shader.rint semantics)."""

import jax.numpy as jnp
import numpy as np

from raytrace_tpu.models.scene import three_sphere_scene, generate_random_scene
from raytrace_tpu.ops.intersect import (
    BIG,
    intersect_bruteforce,
    intersect_matmul,
    sphere_constants,
)

TMIN, TMAX = 0.001, 10000.0


def _single_sphere(center, radius):
    centers = np.zeros((8, 3), np.float32)
    radii = np.zeros((8,), np.float32)
    centers[0] = center
    radii[0] = radius
    valid = np.arange(8) < 1
    return centers, radii, valid


def _run_both(o, d, centers, radii, valid):
    kc = sphere_constants(centers, radii)
    r1 = intersect_bruteforce(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(centers), jnp.asarray(radii),
        jnp.asarray(valid), TMIN, TMAX)
    r2 = intersect_matmul(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(centers.T.copy()), jnp.asarray(kc),
        jnp.asarray(valid), TMIN, TMAX)
    return [tuple(np.asarray(x) for x in r) for r in (r1, r2)]


def test_head_on_hit():
    centers, radii, valid = _single_sphere((0, 0, 5), 1.0)
    o = np.array([[0, 0, 0]], np.float32)
    d = np.array([[0, 0, 1]], np.float32)
    for t, idx, hit in _run_both(o, d, centers, radii, valid):
        assert hit[0] and idx[0] == 0
        assert abs(t[0] - 4.0) < 1e-5  # near root t1


def test_inside_sphere_takes_far_root():
    # origin inside: t1 < 0 rejected, t2 reported (shader.rint:32-39)
    centers, radii, valid = _single_sphere((0, 0, 0), 2.0)
    o = np.array([[0, 0, 0]], np.float32)
    d = np.array([[0, 0, 1]], np.float32)
    for t, idx, hit in _run_both(o, d, centers, radii, valid):
        assert hit[0]
        assert abs(t[0] - 2.0) < 1e-5


def test_miss():
    centers, radii, valid = _single_sphere((0, 0, 5), 1.0)
    o = np.array([[0, 0, 0]], np.float32)
    d = np.array([[0, 1, 0]], np.float32)
    for t, idx, hit in _run_both(o, d, centers, radii, valid):
        assert not hit[0]
        assert t[0] >= float(BIG) * 0.99


def test_behind_origin_missed():
    centers, radii, valid = _single_sphere((0, 0, -5), 1.0)
    o = np.array([[0, 0, 0]], np.float32)
    d = np.array([[0, 0, 1]], np.float32)
    for t, idx, hit in _run_both(o, d, centers, radii, valid):
        assert not hit[0]


def test_tmin_rejects_near_root_keeps_far():
    # origin epsilon-outside surface pointing inward: t1 ~ 0 < tmin -> t2
    centers, radii, valid = _single_sphere((0, 0, 1.0), 1.0)
    o = np.array([[0, 0, 0.0000005]], np.float32)
    d = np.array([[0, 0, 1]], np.float32)
    for t, idx, hit in _run_both(o, d, centers, radii, valid):
        assert hit[0]
        assert abs(t[0] - 2.0) < 1e-4


def test_padding_never_hit():
    # padded (radius 0) spheres at origin must be masked out
    sc = three_sphere_scene()
    kc = sphere_constants(sc.centers, sc.radii)
    o = np.array([[0, 0.5, -3]], np.float32)  # inside scene, ray through origin
    d = np.array([[0, -0.1664, 0.986]], np.float32)
    valid = np.arange(512) < int(sc.n_spheres)
    t, idx, hit = intersect_matmul(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(sc.centers.T.copy()),
        jnp.asarray(kc), jnp.asarray(valid), TMIN, TMAX)
    assert int(idx[0]) < 4


def test_closest_selection_full_scene():
    # both forms agree on hit/index for random rays over the 488-sphere scene
    sc = generate_random_scene(0.0)
    valid = np.arange(512) < int(sc.n_spheres)
    rng = np.random.default_rng(3)
    o = np.float32(rng.normal(0, 4, (512, 3)) + [0, 3, 0])
    d = np.float32(rng.normal(0, 1, (512, 3)))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    (t1, i1, h1), (t2, i2, h2) = _run_both(o, d, sc.centers, sc.radii, valid)
    assert (h1 == h2).mean() > 0.99  # grazing-ray fp chaos allowed
    both = h1 & h2
    assert (i1[both] == i2[both]).mean() > 0.98
    m = both & (i1 == i2)
    # t agreement on matching hits (grazing tail can differ)
    assert np.percentile(np.abs(t1[m] - t2[m]), 95) < 1e-2
