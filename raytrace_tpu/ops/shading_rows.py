"""Row-layout shading: shader.rchit semantics on [1, T] state rows.

Shared by the acceleration-structure megakernels (ops/gridkernel.py and
ops/pagedkernel.py): given the segment's ray, hit t and the winner's
attributes, compute the hit point, texture albedo, branchless 3-material
scatter with exact RNG draw-count parity, and the post-scatter seed.
Identical op order to ops/megakernel.py's inline copy (bit-parity contract).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import rng as rngops
from .megakernel import _norm3


def shade_rows(ox, oy, oz, dx, dy, dz, t, seed,
               cenx, ceny, cenz, mat, tex, c0x, c0y, c0z, c1x, c1y, c1z,
               fuzz, cut_sin=False, redot=False):
    """Returns (px_, py_, pz_, ax, ay, az, sdx, sdy, sdz, does_scatter,
    seed_h): hit point, albedo, un-normalized scatter direction, scatter
    flag, and the seed after the material's RNG draws (shader.rchit).

    ``cut_sin``: cost-probe only (scripts/grid_iterbench.py) — replaces the
    3 checker transcendentals with a same-dependency product; image invalid.
    ``redot``: A/B switch — recompute the ndd / cos_t dots instead of the
    sign-flip reuse (same bits either way; cost is the only observable).
    """
    px_ = ox + t * dx
    py_ = oy + t * dy
    pz_ = oz + t * dz
    nx, ny, nz = _norm3(px_ - cenx, py_ - ceny, pz_ - cenz)
    ddn = nx * dx + ny * dy + nz * dz
    front = ddn < 0.0
    sgn = jnp.where(front, 1.0, -1.0)
    nx, ny, nz = nx * sgn, ny * sgn, nz * sgn

    # texture (shader.rchit:53-64): 3-D sine checker, size 6
    if cut_sin:
        sines = (6.0 * px_) * (6.0 * py_) * (6.0 * pz_)
    else:
        sines = jnp.sin(6.0 * px_) * jnp.sin(6.0 * py_) * jnp.sin(6.0 * pz_)
    use_c1 = (tex > 0.5) & ~(sines > 0.0)
    ax = jnp.where(use_c1, c1x, c0x)
    ay = jnp.where(use_c1, c1y, c0y)
    az = jnp.where(use_c1, c1z, c0z)

    # scatter (shader.rchit:66-116): speculative draws keep LCG parity
    seed3, ux, uy, uz = rngops.random_unit_vector(seed)
    seed1, refr_rand = rngops.random_float(seed)

    sdx_d = nx + ux
    sdy_d = ny + uy
    sdz_d = nz + uz
    near0 = (jnp.abs(sdx_d) < 1e-8) & (jnp.abs(sdy_d) < 1e-8) & (jnp.abs(sdz_d) < 1e-8)
    # ndd re-dots the FLIPPED normal with d, but negation distributes exactly
    # over fp mul/add/fma (fma(-a,b,-c) == -fma(a,b,c); rounding is sign-
    # symmetric), so ndd == sgn*ddn BITWISE — one select replaces a 5-op dot.
    # Pinned bit-identical to the re-dot by tests/test_trace_golden.py +
    # the grid==mega interpret parity suite.
    if redot:
        ndd = nx * dx + ny * dy + nz * dz
    else:
        ndd = jnp.where(front, ddn, -ddn)
    sdx_d = jnp.where(near0, nx, sdx_d)
    sdy_d = jnp.where(near0, ny, sdy_d)
    sdz_d = jnp.where(near0, nz, sdz_d)

    rx_ = dx - 2.0 * ndd * nx
    ry_ = dy - 2.0 * ndd * ny
    rz_ = dz - 2.0 * ndd * nz
    mx = rx_ + fuzz * ux
    my = ry_ + fuzz * uy
    mz = rz_ + fuzz * uz
    mx, my, mz = _norm3(mx, my, mz)
    metal_scatters = (mx * nx + my * ny + mz * nz) > 0.0

    # refractive — NaN-faithful canRefract (shader.rchit:126-129)
    eta = jnp.where(front, 1.0 / fuzz, fuzz)
    if redot:
        cos_t = -(dx * nx + dy * ny + dz * nz)
    else:
        cos_t = -ndd  # == -(d . n_flipped) bitwise (commuted muls, same grouping)
    # 1 - cos_t^2 == 1 - ndd^2 BITWISE (f32 mul is sign-symmetric:
    # (-x)*(-x) == x*x exactly), so canRefract's sin^2 term and the
    # refraction k share one value — one mul+sub instead of two
    omc2 = 1.0 - ndd * ndd
    can_refract = (eta * jnp.sqrt(omc2)) <= 1.0
    r0 = ((1.0 - eta) / (1.0 + eta)) ** 2
    om = 1.0 - cos_t
    om2 = om * om
    reflectance = r0 + (1.0 - r0) * om2 * om2 * om
    does_refract = can_refract & (reflectance < refr_rand)
    k = 1.0 - eta * eta * omc2
    sqk = jnp.sqrt(jnp.maximum(k, 0.0))
    fx_r = eta * dx - (eta * ndd + sqk) * nx
    fy_r = eta * dy - (eta * ndd + sqk) * ny
    fz_r = eta * dz - (eta * ndd + sqk) * nz
    gx = jnp.where(does_refract, fx_r, rx_)
    gy = jnp.where(does_refract, fy_r, ry_)
    gz = jnp.where(does_refract, fz_r, rz_)

    is_metal = (mat > 0.5) & (mat < 1.5)
    is_refr = mat > 1.5
    sdx = jnp.where(is_metal, mx, jnp.where(is_refr, gx, sdx_d))
    sdy = jnp.where(is_metal, my, jnp.where(is_refr, gy, sdy_d))
    sdz = jnp.where(is_metal, mz, jnp.where(is_refr, gz, sdz_d))
    does_scatter = metal_scatters | ~is_metal
    seed_h = jnp.where(is_refr, jnp.where(can_refract, seed1, seed), seed3)
    return (px_, py_, pz_, ax, ay, az, sdx, sdy, sdz, does_scatter, seed_h)
