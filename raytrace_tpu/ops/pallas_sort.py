"""In-kernel bitonic sort over the lane axis — round-2 culling groundwork.

Ray binning (sort lanes by spatial/direction bin, then prune sphere groups
per sorted sub-tile) is the measured path to cutting the brute-force pair
count (docs/PERFORMANCE.md).  XLA-level `argsort` + state permutation costs
~6 s per wavefront iteration at our sizes — catastrophically unusable — so
the reorder must happen inside the kernel.  This module provides that
primitive: a bitonic sort network over a [1, T] lane vector using
`pltpu.roll` for the partner exchanges (XOR-partnering at distance j is a
circular shift for each half of the butterfly).

Cost: T=1024 -> 55 compare-exchange substages x ~10 VPU ops on [1, T]
vectors ≈ 550 ops/lane — ~5% of one 512-sphere intersect iteration.

``sort_lanes_by_key`` is exposed standalone (tested against np.sort); the
wavefront integration (permute o/d rows via the returned order, trace,
un-permute results) is round-2 work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bitonic(keys, payload, t):
    """Bitonic sort along the lane axis of [r,t] i32 rows (row-parallel)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)

    def cswap(keys, payload, j, k):
        # partner(lane) = lane ^ j — for (lane & j) == 0 the partner sits j
        # lanes right, else j lanes left: two circular shifts + select
        # (pltpu.roll wants non-negative shifts: left-by-j == right-by-(t-j))
        right_k = pltpu.roll(keys, t - j, 1)
        left_k = pltpu.roll(keys, j, 1)
        right_p = pltpu.roll(payload, t - j, 1)
        left_p = pltpu.roll(payload, j, 1)
        lower = (lane & j) == 0  # this lane holds the "left" element
        pk = jnp.where(lower, right_k, left_k)
        pp = jnp.where(lower, right_p, left_p)
        up = (lane & k) == 0  # ascending run of the bitonic stage
        # keep min at the left slot of an ascending pair (and symmetric
        # cases); logical ops, not bool-where (Mosaic can't select i1)
        keep_small = ~(up ^ lower)
        take_partner = (keep_small & (pk < keys)) | (~keep_small & (pk > keys))
        # ties: keep own element (take_partner false) — no payload swap
        nk = jnp.where(take_partner, pk, keys)
        npay = jnp.where(take_partner, pp, payload)
        return nk, npay

    k = 2
    while k <= t:
        j = k // 2
        while j >= 1:
            keys, payload = cswap(keys, payload, j, k)
            j //= 2
        k *= 2
    return keys, payload


def _sort_kernel(keys_ref, out_keys_ref, out_order_ref, *, t):
    lane = jax.lax.broadcasted_iota(jnp.int32, keys_ref.shape, 1)
    keys, order = _bitonic(keys_ref[:, :], lane, t)
    out_keys_ref[:] = keys
    out_order_ref[:] = order


@functools.partial(jax.jit, static_argnames=("interpret",))
def sort_lanes_by_key(keys, *, interpret=None):
    """Sort each [1, T] row of ``keys`` (i32, [G, T], T a power of two and a
    multiple of 128) ascending along the lane axis.

    Returns (sorted_keys [G, T], order [G, T]) where
    ``sorted_keys[g, i] == keys[g, order[g, i]]``.  Not stable (bitonic) —
    equal keys keep an arbitrary relative order, which is fine for binning.
    """
    g, t = keys.shape
    if t & (t - 1):
        raise ValueError(f"lane count {t} must be a power of two")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows = 8  # rows per program (sublane tile); the network is row-parallel
    g_pad = -(-g // rows) * rows
    kin = keys.astype(jnp.int32)
    if g_pad != g:
        kin = jnp.concatenate(
            [kin, jnp.zeros((g_pad - g, t), jnp.int32)], axis=0)
    kernel = functools.partial(_sort_kernel, t=t)
    sk, order = pl.pallas_call(
        kernel,
        grid=(g_pad // rows,),
        in_specs=[pl.BlockSpec((rows, t), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((rows, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g_pad, t), jnp.int32),
            jax.ShapeDtypeStruct((g_pad, t), jnp.int32),
        ],
        interpret=interpret,
    )(kin)
    return sk[:g], order[:g]
