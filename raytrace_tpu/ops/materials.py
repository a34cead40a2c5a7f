"""Branchless material scatter — vectorized closest-hit shading.

Replaces the reference closest-hit shader (/root/reference/shaders/shader.rchit)
with mask-selected math over slot arrays: all three material models are
evaluated (cheap, elementwise) and the per-slot result is chosen by material
code — the TPU-idiomatic answer to GPU warp divergence.

RNG parity: the reference consumes a data-dependent number of LCG draws per
hit (diffuse 3, metal 3, refractive 1-if-canRefract, miss 0 — see
shader.rchit:68-100 and note GLSL && short-circuits).  We draw speculatively
from the carried seed and commit the per-slot seed advance that matches the
material actually hit, preserving the exact reference stream.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import rng as rngops
from ..models.scene import DIFFUSE, METAL, REFRACTIVE, CHECKERED

F32 = jnp.float32
SKY = (0.7, 0.8, 1.0)  # shader.rmiss:15


def _dot(a, b):
    # explicit x+y+z order (bit-parity with the oracle/GLSL evaluation)
    return (a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1] + a[..., 2] * b[..., 2])[..., None]


def _normalize(v):
    return v / jnp.sqrt(_dot(v, v))


def texture_color(point, tex, c0, c1):
    """getTextureColor, shader.rchit:53-64 (3D sine checker, size 6)."""
    sines = (jnp.sin(6.0 * point[:, 0]) * jnp.sin(6.0 * point[:, 1])
             * jnp.sin(6.0 * point[:, 2]))[:, None]
    checker = jnp.where(sines > 0.0, c0, c1)
    return jnp.where((tex == CHECKERED)[:, None], checker, c0)


def scatter(seed, d, normal, front_face, mat, attr):
    """Vectorized getScatterDirection (shader.rchit:102-116).

    Args are per-slot arrays: seed [N] u32, d/normal [N,3] f32 (d normalized),
    front_face [N] bool, mat [N] i32, attr [N] f32.

    Returns (new_seed, scatter_dir [N,3], does_scatter [N]).  Slots that
    missed must mask the result and seed advance externally.
    """
    # Speculative draws from the common seed:
    seed3, ux, uy, uz = rngops.random_unit_vector(seed)  # diffuse & metal use 3
    seed1, refr_rand = rngops.random_float(seed)  # refractive uses 0 or 1
    unit = jnp.stack([ux, uy, uz], axis=-1)

    # DIFFUSE — shader.rchit:68-76
    sd_diffuse = normal + unit
    near_zero = jnp.all(jnp.abs(sd_diffuse) < 1e-8, axis=-1, keepdims=True)
    sd_diffuse = jnp.where(near_zero, normal, sd_diffuse)

    # METAL — shader.rchit:78-89; reflect(I,N) = I - 2 dot(N,I) N
    refl = d - 2.0 * _dot(normal, d) * normal
    sd_metal = _normalize(refl + attr[:, None] * unit)
    metal_scatters = (_dot(sd_metal, normal) > 0.0)[:, 0]

    # REFRACTIVE — shader.rchit:91-100.  canRefract computes
    # sqrt(1 - cosTheta^2) WITHOUT clamping (shader.rchit:126-129): if
    # cosTheta^2 > 1 the sqrt is NaN and the <= comparison is false, exactly
    # like GLSL/IEEE — do not clamp, or the draw-count stream diverges.
    eta = jnp.where(front_face, 1.0 / attr, attr)[:, None]
    cos_theta = _dot(-d, normal)
    can_refract = (eta * jnp.sqrt(1.0 - cos_theta * cos_theta)) <= 1.0
    r0 = ((1.0 - eta) / (1.0 + eta)) ** 2
    one_minus = 1.0 - cos_theta  # >= 0 whenever can_refract holds
    pow5 = one_minus * one_minus
    pow5 = pow5 * pow5 * one_minus
    reflectance = r0 + (1.0 - r0) * pow5
    does_refract = can_refract & (reflectance < refr_rand[:, None])
    ndi = _dot(normal, d)
    k = 1.0 - eta * eta * (1.0 - ndi * ndi)
    refracted = eta * d - (eta * ndi + jnp.sqrt(jnp.maximum(k, 0.0))) * normal
    sd_refr = jnp.where(does_refract, refracted, refl)

    is_diffuse = mat == DIFFUSE
    is_metal = mat == METAL
    is_refr = mat == REFRACTIVE

    sd = jnp.where(is_diffuse[:, None], sd_diffuse,
                   jnp.where(is_metal[:, None], sd_metal, sd_refr))
    does_scatter = jnp.where(is_metal, metal_scatters, True)

    # Seed advance: diffuse/metal -> 3 draws; refractive -> 1 if canRefract
    # else 0; (miss handled by caller).
    new_seed = jnp.where(is_refr, jnp.where(can_refract[:, 0], seed1, seed), seed3)
    return new_seed, sd, does_scatter
