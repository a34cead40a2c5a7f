"""Pallas TPU kernel: closest-hit ray-vs-all-spheres intersection + shading fetch.

TPU-native replacement for the reference's hardware acceleration-structure
traversal (BLAS/TLAS + traceRaysKHR, /root/reference/src/vulkan.h:395-554,994),
intersection shader (shaders/shader.rint:44-60), and the per-primitive uniform
reads of the hit shaders (shader.rchit:39, binding 2).

Why a kernel: the XLA backends materialize [N, S] f32 intermediates in HBM,
making the hot loop HBM-bandwidth-bound, and fetch the hit sphere's attributes
with 6 dynamic gathers that cost as much as the intersection itself.  Here:

- the whole 512-sphere table lives in VMEM (48 KB) for the kernel's lifetime;
- per-pair math happens tile-by-tile in VMEM — only [N]-sized results reach HBM;
- the hit sphere's attributes (center/material/texture/colors/fuzz) are
  extracted with a one-hot [S,T] x [S,16] MXU contraction instead of gathers,
  so the wavefront loop does zero gather/scatter anywhere.

Layout: spheres on the sublane axis ([S, 1] columns), rays on the lane axis
([1, T] rows) — every per-pair term is a natural sublane x lane broadcast and
closest-hit is a sublane-axis min.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config
from .intersect import BIG

TILE_N = 1024  # rays per grid step (1-D outputs require 1024-lane f32 blocks)
_S = 512  # MAX_SPHERE_AMOUNT (scene.h:24); static for the kernel

# sphere-table columns (input, [S, 24])
_C_CX, _C_CY, _C_CZ, _C_KC, _C_VALID = 0, 1, 2, 3, 4
_C_ATTR0 = 8  # cols 8..23: mat tex c0.rgb c1.rgb fuzz (padded to 16)

# attrs-output columns ([N, 16])
A_CX, A_CY, A_CZ = 0, 1, 2
A_MAT, A_TEX = 3, 4
A_C0, A_C1 = 5, 8  # rgb triples
A_ATTR = 11


def _kernel(rays_ref, table_ref, t_ref, attr_ref, *, tmin, tmax):
    # rays: [8, T] = ox oy oz dx dy dz (2 pad rows)
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]

    a = dx * dx + dy * dy + dz * dz  # [1,T]
    od = ox * dx + oy * dy + oz * dz
    oo = ox * ox + oy * oy + oz * oz
    inv_a = 1.0 / a

    cx = table_ref[:, _C_CX : _C_CX + 1]  # [S,1]
    cy = table_ref[:, _C_CY : _C_CY + 1]
    cz = table_ref[:, _C_CZ : _C_CZ + 1]
    kc = table_ref[:, _C_KC : _C_KC + 1]
    vld = table_ref[:, _C_VALID : _C_VALID + 1]

    cd = cx * dx + cy * dy + cz * dz  # [S,T]
    co = cx * ox + cy * oy + cz * oz
    b = od - cd
    c = oo - 2.0 * co + kc
    disc = b * b - a * c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    t1 = (-b - sq) * inv_a
    t2 = (-b + sq) * inv_a
    # root selection per shader.rint:32-39
    t1_ok = ok & (t1 >= tmin) & (t1 <= tmax)
    t2_ok = ok & (t2 >= tmin) & (t2 <= tmax)
    t = jnp.where(t1_ok, t1, jnp.where(t2_ok, t2, BIG))
    t = jnp.where(vld > 0.0, t, BIG)

    t_min = jnp.min(t, axis=0, keepdims=True)  # [1,T]
    ids = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    # lowest index among minima == argmin (hardware closest-hit is arbitrary
    # on exact ties; matching argmin keeps parity with the XLA backends)
    idx = jnp.min(jnp.where(t == t_min, ids, t.shape[0]), axis=0, keepdims=True)
    onehot = ((ids == idx) & (t == t_min)).astype(jnp.float32)  # [S,T]
    # attribute fetch as an MXU contraction; HIGHEST keeps f32 colors exact
    attrs = jax.lax.dot_general(
        onehot,
        table_ref[:, _C_ATTR0:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [T, 16]
    t_ref[:] = t_min.reshape(t_ref.shape)
    attr_ref[:] = attrs


@functools.partial(jax.jit, static_argnames=("interpret",))
def _intersect_pallas_padded(rays8, table, *, interpret=False):
    """rays8: [8, N_pad] f32 (N_pad % TILE_N == 0); table: [S, 24] f32."""
    n_pad = rays8.shape[1]
    grid = n_pad // TILE_N
    s = table.shape[0]
    kernel = functools.partial(
        _kernel,
        tmin=np.float32(config.T_MIN),
        tmax=np.float32(config.MAX_RAY_COLLISION_DISTANCE),
    )
    t, attrs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, TILE_N), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, 24), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N,), lambda g: (g,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 16), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 16), jnp.float32),
        ],
        interpret=interpret,
    )(rays8, table)
    return t, attrs


def sphere_table(scene_arrays) -> np.ndarray:
    """Host-side [S, 24] packed table from a SceneArrays/DeviceScene-like
    object with centers/radii/material/texture/color0/color1/attr fields."""
    centers = np.asarray(scene_arrays.centers, np.float32)
    radii = np.asarray(scene_arrays.radii, np.float32)
    s = centers.shape[0]
    if hasattr(scene_arrays, "n_spheres"):
        n = int(scene_arrays.n_spheres)
        valid = (np.arange(s) < n).astype(np.float32)
    else:
        valid = np.asarray(scene_arrays.valid, np.float32)
    c64 = centers.astype(np.float64)
    kc = (np.sum(c64 * c64, axis=1) - radii.astype(np.float64) ** 2).astype(np.float32)
    # padding rows get kc = +3e30: c becomes huge, disc goes hugely negative,
    # sqrt(disc) is NaN and every root comparison fails -> automatic miss.
    # This lets the megakernel skip a dedicated validity select per pair.
    kc = np.where(valid > 0, kc, np.float32(3e30))
    # big tables are walked in fixed 512-row blocks by the megakernel's
    # rolled loop — pad the row count to a multiple of 512
    if s > 512 and s % 512:
        pad = 512 - s % 512
        centers = np.concatenate([centers, np.zeros((pad, 3), np.float32)])
        kc = np.concatenate([kc, np.full((pad,), 3e30, np.float32)])
        valid = np.concatenate([valid, np.zeros((pad,), np.float32)])
        s += pad

        def _padded(a, fill=0.0):
            out = np.full((s,) + np.asarray(a).shape[1:], fill, np.float32)
            out[: s - pad] = np.asarray(a, np.float32)
            return out
    else:
        def _padded(a, fill=0.0):
            return np.asarray(a, np.float32)
    tab = np.zeros((s, 24), np.float32)
    tab[:, _C_CX:_C_CZ + 1] = centers
    tab[:, _C_KC] = kc
    tab[:, _C_VALID] = valid
    tab[:, _C_ATTR0 + A_CX : _C_ATTR0 + A_CZ + 1] = centers
    tab[:, _C_ATTR0 + A_MAT] = _padded(scene_arrays.material)
    tab[:, _C_ATTR0 + A_TEX] = _padded(scene_arrays.texture)
    tab[:, _C_ATTR0 + A_C0 : _C_ATTR0 + A_C0 + 3] = _padded(scene_arrays.color0)
    tab[:, _C_ATTR0 + A_C1 : _C_ATTR0 + A_C1 + 3] = _padded(scene_arrays.color1)
    tab[:, _C_ATTR0 + A_ATTR] = _padded(scene_arrays.attr)
    return tab


def intersect_shade_pallas(o, d, table):
    """Fused intersect + attribute fetch.

    o, d: [N, 3] f32; table: [S, 24] (see sphere_table).
    Returns (t [N], hit [N] bool, attrs [N, 16]) — attrs columns per A_*.
    """
    n = o.shape[0]
    n_pad = -(-n // TILE_N) * TILE_N
    rays8 = jnp.zeros((8, n_pad), jnp.float32)
    rays8 = rays8.at[0:3, :n].set(o.T)
    rays8 = rays8.at[3:6, :n].set(d.T)
    interpret = jax.default_backend() != "tpu"
    t, attrs = _intersect_pallas_padded(rays8, table, interpret=interpret)
    t = t[:n]
    return t, t < BIG, attrs[:n]


def intersect_pallas(o, d, centers_t, kc, valid, tmin, tmax):
    """Drop-in replacement for intersect_matmul (same (t, idx, hit) contract).

    Kept for the backend-agnostic interface/tests; the wavefront loop uses
    ``intersect_shade_pallas`` which also returns the hit attributes.
    """
    del tmin, tmax  # static in the kernel (T_MIN / MAX_RAY_COLLISION_DISTANCE)
    s = centers_t.shape[1]
    tab = np.zeros((s, 24), np.float32)
    tab[:, _C_CX:_C_CZ + 1] = np.asarray(centers_t).T
    tab[:, _C_KC] = np.asarray(kc)
    tab[:, _C_VALID] = np.asarray(valid, np.float32)
    # attrs: store the sphere index in col 0 so idx can be recovered exactly
    tab[:, _C_ATTR0] = np.arange(s, dtype=np.float32)
    t, hit, attrs = intersect_shade_pallas(o, d, jnp.asarray(tab))
    idx = attrs[:, 0].astype(jnp.int32)
    return t, idx, hit
