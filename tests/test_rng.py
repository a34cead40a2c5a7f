"""Unit tests for the device RNG (ops/rng.py) — TEA + LCG parity.

Reference semantics: /root/reference/shaders/random.glsl (getRandomSeed TEA-16,
randomInt LCG, randomFloat 24-bit mantissa, randomUnitVector cube-normalize).
The TEA/LCG constants are the public TEA round constants / numerical-recipes
LCG; parity is checked against an independent big-int straight-line model.
"""

import numpy as np
import pytest

from raytrace_tpu.ops import rng as rngops

M32 = 0xFFFFFFFF


def tea_ref(v0: int, v1: int) -> int:
    """Independent big-int TEA-16 model of getRandomSeed (random.glsl:1-13)."""
    s0 = 0
    for _ in range(16):
        s0 = (s0 + 0x9E3779B9) & M32
        v0 = (v0 + ((((v1 << 4) & M32) + 0xA341316C) ^ ((v1 + s0) & M32) ^ ((v1 >> 5) + 0xC8013EA4))) & M32
        v1 = (v1 + ((((v0 << 4) & M32) + 0xAD90777D) ^ ((v0 + s0) & M32) ^ ((v0 >> 5) + 0x7E95761E))) & M32
    return v0


@pytest.mark.parametrize("v0,v1", [(0, 0), (1, 2), (123456789, 987654321), (M32, M32)])
def test_tea_hash_matches_bigint_model(v0, v1):
    got = int(rngops.tea_hash(np.uint32(v0), np.uint32(v1)))
    assert got == tea_ref(v0, v1)


def test_tea_hash_vectorized_matches_scalar():
    xs = np.arange(64, dtype=np.uint32)
    ys = (xs * 7 + 3).astype(np.uint32)
    vec = rngops.tea_hash(xs, ys)
    for i in range(64):
        assert int(vec[i]) == int(rngops.tea_hash(xs[i], ys[i]))


def test_lcg_stream():
    seed = np.uint32(1)
    expected = 1
    for _ in range(100):
        expected = (1664525 * expected + 1013904223) & M32
        seed = rngops.lcg_next(seed)
        assert int(seed) == expected


def test_random_float_range_and_mantissa():
    seed = np.uint32(42)
    vals = []
    for _ in range(10000):
        seed, f = rngops.random_float(seed)
        vals.append(float(f))
    vals = np.array(vals)
    assert vals.min() >= 0.0 and vals.max() < 1.0
    # LCG through a 24-bit mantissa is uniform enough for a coarse mean check
    assert abs(vals.mean() - 0.5) < 0.02
    # every value is k / 2^24
    assert np.all(vals * (1 << 24) == np.round(vals * (1 << 24)))


def test_random_in_interval():
    seed = np.uint32(7)
    s2, v = rngops.random_in_interval(seed, -1.0, 1.0)
    s1, f = rngops.random_float(seed)
    assert int(s1) == int(s2)
    assert v == np.float32(f * np.float32(2.0) + np.float32(-1.0))


def test_random_unit_vector_is_unit_and_consumes_3_draws():
    seed = np.uint32(99)
    s_after, x, y, z = rngops.random_unit_vector(seed)
    # 3 sequential LCG steps
    expect = seed
    for _ in range(3):
        expect = rngops.lcg_next(expect)
    assert int(s_after) == int(expect)
    assert abs(float(x * x + y * y + z * z) - 1.0) < 1e-5


def test_jax_and_numpy_streams_bitwise_equal():
    import jax.numpy as jnp

    xs = np.arange(128, dtype=np.uint32)
    np_seed = rngops.tea_hash(xs, xs + 1)
    jx_seed = rngops.tea_hash(jnp.asarray(xs), jnp.asarray(xs + 1))
    assert np.array_equal(np_seed, np.asarray(jx_seed))
    np_s, np_f = rngops.random_float(np_seed)
    jx_s, jx_f = rngops.random_float(jnp.asarray(np_seed))
    assert np.array_equal(np_s, np.asarray(jx_s))
    assert np.array_equal(np_f, np.asarray(jx_f))
