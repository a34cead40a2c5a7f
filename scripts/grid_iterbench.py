"""Fixed-iteration per-iteration cost attribution for the grid kernel.

Times ``grid_megakernel_step`` directly on DEAD lanes (spp=0, alive=0) for a
fixed invocation count, so every variant executes exactly the same number of
iterations — no termination feedback, perfectly comparable.  SIMD masking
means dead iterations run the same ops as live ones (minus the rare
``pl.when`` acc flush), so deltas between ``cut_*`` removal variants measure
each section's TRUE serial share of the per-iteration critical path — which
the additive 'X2' duplication probes (scripts/grid_ablate.py) structurally
cannot see: a duplicated section overlaps its twin and reports ~0 for
latency-slack code, while removing it shortens the chain.

Variants are compiled up front and timed in interleaved rounds (median
reported) per the repo's measurement methodology.  Images are invalid under
cut_* — this is a cost probe only.

Usage: [VARIANTS=base,cut_fetch,...] [INVOKES=300] [SWEEP_MODE=fast]
       python scripts/grid_iterbench.py

SWEEP_MODE=fast attributes the PRODUCTION-mode program (Russian-roulette
rows compiled in; the RR block is static on the ``rr`` arg) — dead lanes
still execute the masked RR ops, so section deltas measure the fast
kernel's true per-iteration critical path.
"""

import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.models.scene import generate_random_scene
from raytrace_tpu.ops import gridkernel as gk
from raytrace_tpu.ops.trace import prepare_scene, viewport_arrays
from raytrace_tpu.runtime.renderer import reference_camera

W, H = 1920, 1080
M = 64
INVOKES = int(os.environ.get("INVOKES", 300))
ROUNDS = int(os.environ.get("ROUNDS", 5))
VARIANTS = os.environ.get(
    "VARIANTS",
    "base,cut_fetch,cut_resolve,cut_quad,cut_shade,cut_tea,cut_camera,"
    "cut_globals,cut_init").split(",")
MODE = os.environ.get("SWEEP_MODE", "exact")
RR = None
if MODE == "fast":
    from raytrace_tpu import config as _cfg

    RR = (_cfg.RR_START_DEPTH, _cfg.RR_CAP_DEPTH, _cfg.RR_PMIN)

# PITCH env: attribute the iteration at a coarse-pitch operating point too
ds = prepare_scene(generate_random_scene(0.0),
                   grid_pitch=os.environ.get("PITCH", "1.0"))
g = ds.grid
vp = viewport_arrays(reference_camera(), W, H)

p_total = W * H
n = -(-p_total // M)
n_pad = -(-n // gk.TILE) * gk.TILE
rf = gk.f_rows(M)

fstate0 = jnp.asarray(np.random.default_rng(0).random((rf, n_pad), np.float32))
ustate0 = jnp.zeros((gk.U_ROWS, n_pad), jnp.uint32)  # alive=0: dead lanes

scal = jnp.zeros((1, 8), jnp.int32)  # spp=0
vpr = jnp.concatenate([
    vp.horizontal, vp.vertical, vp.upper_left, vp.cam_up, vp.cam_right,
    vp.look_from, vp.aperture[None] if vp.aperture.ndim == 0 else vp.aperture,
    vp.size, jnp.zeros((3,), jnp.float32)]).reshape(1, 24)

gscal = jnp.asarray(g.gscal)
gtab = jnp.asarray(g.gtab)
gttab = jnp.asarray(g.gttab)
ctab = jnp.asarray(g.ctab)
atab = jnp.asarray(g.atab)


@functools.partial(jax.jit, static_argnames=("ablate", "invokes"))
def _run_device(f, u, *, ablate, invokes):
    # the invocation loop lives ON DEVICE: one relay dispatch per round —
    # host-loop versions measured 2x round-to-round jitter from per-call
    # dispatch latency through the axon relay
    five = g.has_cy is not None
    n_slots = (g.has_cy.shape[1] if five
               else g.slots4.shape[1] if g.slots4 is not None else gk.N_SLOTS)

    def body(_, st):
        f, u = st
        return gk.grid_megakernel_step(
            scal, vpr, gscal, gtab, gttab, ctab, atab, f, u,
            m_slots=M, n_lanes=n, p_total=p_total, width=W,
            max_depth=50, skip_tmax=True, ablate=ablate,
            five=five, n_slots=n_slots, rr=RR)

    return jax.lax.fori_loop(0, invokes, body, (f, u))


def run(ablate, invokes):
    f, u = _run_device(fstate0, ustate0, ablate=ablate, invokes=invokes)
    return np.asarray(f[0])  # host fetch = real sync


abls = {v: () if v == "base" else tuple(v.split("+")) for v in VARIANTS}
for v, abl in abls.items():
    t0 = time.perf_counter()
    run(abl, 2)
    print(f"{v}: warm {time.perf_counter()-t0:.0f}s", flush=True)

iters = INVOKES * gk.K_STEPS
tiles = n_pad // gk.TILE
times = {v: [] for v in VARIANTS}
for rnd in range(ROUNDS):
    for v in VARIANTS:
        t0 = time.perf_counter()
        run(abls[v], INVOKES)
        times[v].append(time.perf_counter() - t0)
    print(f"round {rnd}: " + " ".join(f"{v}={times[v][-1]:.2f}" for v in VARIANTS),
          flush=True)

base = statistics.median(times["base"])
per_it = base / (iters * tiles) * 1e6
print(f"\nbase median: {base:.3f}s  ({per_it:.2f} us per tile-iteration, "
      f"{tiles} tiles x {iters} iterations)")
for v in VARIANTS:
    if v == "base":
        continue
    m = statistics.median(times[v])
    print(f"{v:<12} median {m:.3f}s  delta {m-base:+.3f}s ({100*(m-base)/base:+.1f}%)",
          flush=True)
