"""Scene generator parity tests (models/scene.py vs scene.h:79-157 semantics)."""

import numpy as np

from raytrace_tpu.models.scene import (
    CHECKERED,
    DIFFUSE,
    MAX_SPHERE_AMOUNT,
    METAL,
    REFRACTIVE,
    generate_random_scene,
    three_sphere_scene,
)


def test_counts_and_padding():
    sc = generate_random_scene(0.0)
    assert int(sc.n_spheres) == 488  # 4 + 22*22
    assert sc.centers.shape == (MAX_SPHERE_AMOUNT, 3)
    assert np.all(sc.radii[488:] == 0)


def test_fixed_spheres():
    sc = generate_random_scene(0.0)
    # ground — scene.h:85-91
    assert np.allclose(sc.centers[0], [0, -1000, 1])
    assert sc.radii[0] == 1000
    assert sc.material[0] == DIFFUSE and sc.texture[0] == CHECKERED
    assert np.allclose(sc.color0[0], 0.05) and np.allclose(sc.color1[0], 0.95)
    # heroes at t=0: cos(k*0)=1 — scene.h:93-116
    assert np.allclose(sc.centers[1], [-4, 1, 1])
    assert np.allclose(sc.centers[2], [4, 1, 1])
    assert np.allclose(sc.centers[3], [0, 1, 1])
    assert sc.material[1] == DIFFUSE
    assert sc.material[2] == METAL
    assert sc.material[3] == REFRACTIVE
    assert sc.attr[3] == np.float32(1.5)


def test_hero_animation():
    t = 0.7
    sc = generate_random_scene(t)
    assert sc.centers[1, 2] == np.float32(np.cos(np.float32(2.0) * np.float32(t)))
    assert sc.centers[2, 2] == np.float32(np.cos(np.float32(3.0) * np.float32(t)))
    assert sc.centers[3, 2] == np.float32(np.cos(np.float32(t)))
    # small spheres are time-independent (default-seeded engine, quirk Q8)
    sc0 = generate_random_scene(0.0)
    assert np.array_equal(sc.centers[4:], sc0.centers[4:])


def test_small_sphere_layout():
    sc = generate_random_scene(0.0)
    centers = sc.centers[4:488]
    assert np.all(sc.radii[4:488] == np.float32(0.2))
    assert np.all(centers[:, 1] == np.float32(0.2))
    # grid cell (a, b): center in [a, a+0.9] x [b, b+0.9] — scene.h:127
    a = np.repeat(np.arange(-11, 11), 22)
    b = np.tile(np.arange(-11, 11), 22)
    assert np.all(centers[:, 0] >= a) and np.all(centers[:, 0] <= a + 0.9)
    assert np.all(centers[:, 2] >= b) and np.all(centers[:, 2] <= b + 0.9)


def test_material_distribution():
    sc = generate_random_scene(0.0)
    mats = sc.material[4:488]
    nd = int((mats == DIFFUSE).sum())
    nm = int((mats == METAL).sum())
    nr = int((mats == REFRACTIVE).sum())
    assert nd + nm + nr == 484
    # 70/15/15 split with mt19937 default stream — loose bounds
    assert 0.60 < nd / 484 < 0.80
    assert 0.08 < nm / 484 < 0.22
    assert 0.08 < nr / 484 < 0.22
    # metal colors in [0.5, 1]; refractive attr = 1.5, white
    metal = mats == METAL
    assert np.all(sc.color0[4:488][metal] >= 0.5)
    refr = mats == REFRACTIVE
    assert np.all(sc.attr[4:488][refr] == np.float32(1.5))
    assert np.all(sc.color0[4:488][refr] == 1.0)


def test_diffuse_colors_hsv_sv():
    # getRandomColor: s=0.75 v=0.45 => max channel = 0.45, min = 0.1125
    sc = generate_random_scene(0.0)
    diff = (sc.material[4:488] == DIFFUSE)
    cols = sc.color0[4:488][diff]
    assert np.allclose(cols.max(axis=1), 0.45, atol=1e-6)
    assert np.allclose(cols.min(axis=1), 0.45 - 0.75 * 0.45, atol=1e-6)


def test_determinism():
    a = generate_random_scene(1.23)
    b = generate_random_scene(1.23)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_three_sphere_scene():
    sc = three_sphere_scene()
    assert int(sc.n_spheres) == 4
    assert sc.material[2] == METAL and sc.material[3] == REFRACTIVE


def test_random_sphere_field():
    from raytrace_tpu.models.scene import random_sphere_field

    sc = random_sphere_field(1000, seed=7)
    assert int(sc.n_spheres) == 1004
    assert sc.centers.shape[0] % 128 == 0
    assert np.allclose(sc.centers[0], [0, -1000, 1])  # ground kept
    assert np.all(sc.radii[4:1004] == np.float32(0.2))
    # deterministic
    sc2 = random_sphere_field(1000, seed=7)
    assert np.array_equal(sc.centers, sc2.centers)
