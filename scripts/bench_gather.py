"""Microbenchmark: tpu.dynamic_gather (take_along_axis) inside a Pallas kernel.

The round-2 grid-DDA design hinges on per-lane gathers: out[r, t] =
table[r, idx[t]] for a [R, 1024] table with per-lane i32 indices.  jax 0.9
lowers 2-D jnp.take_along_axis to tpu.dynamic_gather (axis 0 or 1) — this
script checks (a) it compiles through the axon relay, (b) correctness vs
numpy, (c) throughput: N gathers of [R, 1024] chained in a fori_loop,
timed with a host fetch (block_until_ready lies through axon).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 1024
R = 16
ITERS = 2048


def _kernel(tab_ref, idx_ref, out_ref, *, iters, axis):
    tab = tab_ref[:, :]

    def body(i, acc):
        # vary idx each iter so the loop can't be hoisted
        idx = (idx_ref[:, :] + i) % T
        g = jnp.take_along_axis(tab, idx, axis=axis)
        return acc + g

    acc = jnp.zeros((R, T), jnp.float32)
    out_ref[:, :] = jax.lax.fori_loop(0, iters, body, acc)


@functools.partial(jax.jit, static_argnames=("iters", "axis"))
def run(tab, idx, *, iters, axis):
    return pl.pallas_call(
        functools.partial(_kernel, iters=iters, axis=axis),
        out_shape=jax.ShapeDtypeStruct((R, T), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


def _kernel_base(tab_ref, idx_ref, out_ref, *, iters):
    """Baseline: same loop shape, no gather — isolates loop overhead."""
    tab = tab_ref[:, :]

    def body(i, acc):
        return acc + tab * jnp.float32(1.0000001)

    out_ref[:, :] = jax.lax.fori_loop(0, iters, body, jnp.zeros((R, T), jnp.float32))


@functools.partial(jax.jit, static_argnames=("iters",))
def run_base(tab, idx, *, iters):
    return pl.pallas_call(
        functools.partial(_kernel_base, iters=iters),
        out_shape=jax.ShapeDtypeStruct((R, T), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    tab = rng.standard_normal((R, T)).astype(np.float32)
    idx0 = rng.integers(0, T, size=(R, T)).astype(np.int32)
    # broadcast-style idx (same index for every row of a lane) — the real
    # use case gathers one cell id per lane across all R rows
    idx_lane = np.broadcast_to(
        rng.integers(0, T, size=(1, T)).astype(np.int32), (R, T)
    ).copy()

    for axis in (1, 0):
        for name, idx in (("rand", idx0), ("lane", idx_lane)):
            try:
                out = np.asarray(run(tab, idx, iters=1, axis=axis))
            except Exception as e:  # noqa: BLE001
                print(f"axis={axis} idx={name}: FAILED COMPILE: {type(e).__name__}: {e}"[:500], flush=True)
                continue
            ref = np.take_along_axis(tab, (idx + 0) % T, axis=axis)
            ok = np.array_equal(out, ref)
            # timed run
            t0 = time.perf_counter()
            out = np.asarray(run(tab, idx, iters=ITERS, axis=axis))
            dt = time.perf_counter() - t0
            ns = dt / ITERS * 1e9
            print(
                f"axis={axis} idx={name}: correct={ok} {ns:8.1f} ns per [{R},{T}] gather "
                f"({ns / R:6.2f} ns/row, {ns / (R * T) * 1024:6.3f} ns/lane/16rows)",
                flush=True,
            )

    t0 = time.perf_counter()
    np.asarray(run_base(tab, idx0, iters=ITERS))
    dt = time.perf_counter() - t0
    print(f"baseline add loop: {dt / ITERS * 1e9:8.1f} ns per iter", flush=True)


if __name__ == "__main__":
    main()
