"""Pallas megakernel: K wavefront iterations (intersect+shade+regen) per call.

Profiling the composed XLA loop showed the Pallas intersect kernel at 3.8 ms
and the XLA shading/regen glue at 1.6 ms — but 18.9 ms when composed: XLA
spends the difference relaying out [N,3] arrays around the kernel's outputs.
This kernel eliminates the boundary entirely: ALL wavefront state lives in
row-major arrays ([row, lane] — components on the sublane axis, lanes on the
lane axis), and one kernel invocation performs ``k_steps`` full loop
iterations with the tile's state held in VMEM/registers:

  intersect (sphere table resident in VMEM, shader.rint semantics)
  -> hit attrs via one-hot MXU contraction (output already row-major)
  -> normal/texture/scatter (shader.rchit semantics, branchless row math)
  -> termination + accumulation into the lane's current pixel slot
  -> sample regeneration / pixel advance with TEA reseed + camera rays
     (shader.rgen semantics)

``k_steps`` amortizes the per-invocation fixed cost (measured ~0.32 ms:
launch + state DMA + the host loop's alive-reduction), which at K=1
accounted for ~30% of a full 10k-spp render.  The host-side
``lax.while_loop`` body reduces to: call kernel, check the alive row.  RNG
parity is preserved exactly (same ops/rng.py primitives run in-kernel on
[1, T] rows); results are bit-identical for any K because lanes that die
mid-call simply hold state.

State layout (f32 rows; M = pixels_per_lane, static):
  0-2 o | 3-5 d | 6 fx | 7 fy | 8-10 thr | 11 pad | 12+3m+c acc[m].rgb
u32 rows: 0 seed | 1 m | 2 sidx | 3 depth | 4 alive | 5-7 pad
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config
from . import rng as rngops
from .intersect import BIG

TILE = 1024  # lanes per grid step
K_STEPS = 10  # wavefront iterations per kernel invocation (default)
S_BLOCK = 512  # sphere rows per intersect block (bounds [S_b, T] VMEM temps)

# f32 state rows
R_O, R_D, R_FX, R_FY, R_THR, R_ACC = 0, 3, 6, 7, 8, 12
# u32 state rows
U_SEED, U_M, U_SIDX, U_DEPTH, U_ALIVE = 0, 1, 2, 3, 4
U_ROWS = 8

# dynamic scalar slots (i32 SMEM).  NCALLS/SPPLAST drive the grid kernel's
# in-kernel progressive-call merge (gridkernel._iterate); this kernel always
# runs with n_calls=1 and ignores them.
S_SPP, S_NUMBER, S_Y0, S_SEEDY0, S_OFFX, S_NCALLS, S_SPPLAST = range(7)

# viewport scalar slots (f32 SMEM)
V_H, V_V, V_UL, V_UP, V_RIGHT, V_FROM, V_AP, V_W, V_HGT = 0, 3, 6, 9, 12, 15, 18, 19, 20

_SKY = (np.float32(0.7), np.float32(0.8), np.float32(1.0))  # shader.rmiss:15


def f_rows(m_slots: int) -> int:
    r = R_ACC + 3 * m_slots
    return -(-r // 8) * 8  # round up to sublane tile


def _vec3(ref, row):
    return ref[row : row + 1, :], ref[row + 1 : row + 2, :], ref[row + 2 : row + 3, :]


def _norm3(x, y, z):
    inv = 1.0 / jnp.sqrt(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def _camera_rays_rows(seed, fx, fy, vpr):
    """getCameraRay + uv jitter (shader.rgen:57,107-115) on [1,T] rows."""
    seed, jx = rngops.random_float(seed)
    seed, jy = rngops.random_float(seed)
    u = (fx + jx) / vpr[0, V_W]
    v = (fy + jy) / vpr[0, V_HGT]
    seed, r1 = rngops.random_in_interval(seed, -1.0, 1.0)
    seed, r2 = rngops.random_in_interval(seed, -1.0, 1.0)
    inv_l = 1.0 / jnp.sqrt(r1 * r1 + r2 * r2)
    ap = vpr[0, V_AP] * 0.5
    rx = ap * (r1 * inv_l)
    ry = ap * (r2 * inv_l)
    ox = vpr[0, V_FROM + 0] + vpr[0, V_RIGHT + 0] * rx + vpr[0, V_UP + 0] * ry
    oy = vpr[0, V_FROM + 1] + vpr[0, V_RIGHT + 1] * rx + vpr[0, V_UP + 1] * ry
    oz = vpr[0, V_FROM + 2] + vpr[0, V_RIGHT + 2] * rx + vpr[0, V_UP + 2] * ry
    tx = vpr[0, V_UL + 0] + vpr[0, V_H + 0] * u - vpr[0, V_V + 0] * v
    ty = vpr[0, V_UL + 1] + vpr[0, V_H + 1] * u - vpr[0, V_V + 1] * v
    tz = vpr[0, V_UL + 2] + vpr[0, V_H + 2] * u - vpr[0, V_V + 2] * v
    dx, dy, dz = _norm3(tx - ox, ty - oy, tz - oz)
    return seed, (ox, oy, oz), (dx, dy, dz)


def _iterate(st, acc, lane, scal_ref, vpr_ref, table_ref, atab_ref, *,
             m_slots, n_lanes, p_total, width, max_depth, tmin, tmax,
             skip_tmax, rr=None):
    """One wavefront iteration on in-register row state.

    st: tuple of [1,T] rows; acc: list of 3*M accumulator rows.
    Returns (st', acc')."""
    (ox, oy, oz, dx, dy, dz, fx, fy, tx_, ty_, tz_,
     seed, mrow, sidx, depth, alive_i) = st
    alive = alive_i != 0  # carried as i32: Mosaic can't carry i1 vectors

    spp_i = scal_ref[0, S_SPP]
    number = scal_ref[0, S_NUMBER].astype(jnp.uint32)
    y0 = scal_ref[0, S_Y0]
    seed_y0 = scal_ref[0, S_SEEDY0]
    offx = scal_ref[0, S_OFFX]

    # ---- intersect: shader.rint:44-60 over all spheres -------------------
    a = dx * dx + dy * dy + dz * dz
    od = ox * dx + oy * dy + oz * dz
    oo = ox * ox + oy * oy + oz * oz
    inv_a = 1.0 / a

    # sphere axis processed in blocks of <= S_BLOCK so [S_b, T] temporaries
    # stay VMEM-bounded for arbitrarily large stretch scenes; the running
    # (t, attrs) winner carries across blocks.
    s_total = table_ref.shape[0]
    n_blocks = -(-s_total // S_BLOCK)

    def block_hit(table_blk, atab_blk, sb):
        # padding rows carry kc = +3e30 (sphere_table): disc goes hugely
        # negative and the NaN sqrt rejects them — no validity select needed
        kc = table_blk[:, 3:4]
        # broadcast contractions beat MXU dots here: HIGHEST-precision K=3
        # matmuls (needed for f32 exactness — see intersect.py) cost more
        # than the 10 VPU madds they replace (measured 1.45 -> 2.37 ms/iter)
        cx = table_blk[:, 0:1]
        cy = table_blk[:, 1:2]
        cz = table_blk[:, 2:3]
        cd = cx * dx + cy * dy + cz * dz  # [S_b,T]
        co = cx * ox + cy * oy + cz * oz
        b = od - cd
        c = oo - 2.0 * co + kc
        disc = b * b - a * c
        # sqrt(negative) = NaN; every downstream comparison with NaN is
        # false, so misses fall to BIG exactly like the GLSL's D >= 0 branch
        sq = jnp.sqrt(disc)
        t1 = (-b - sq) * inv_a
        t2 = (-b + sq) * inv_a
        if skip_tmax:
            # statically proven: no intersection in this scene can reach
            # tmax (2 * max(|center|+r, |camera|) < tmax), so the upper
            # range checks never fire — drop 4 VPU ops/pair
            t1_ok = t1 >= tmin
            t2_ok = t2 >= tmin
        else:
            t1_ok = (t1 >= tmin) & (t1 <= tmax)
            t2_ok = (t2 >= tmin) & (t2 <= tmax)
        tall = jnp.where(t1_ok, t1, jnp.where(t2_ok, t2, BIG))
        t_b = jnp.min(tall, axis=0, keepdims=True)  # [1,T]
        ids = jax.lax.broadcasted_iota(jnp.int32, tall.shape, 0)
        idx = jnp.min(jnp.where(tall == t_b, ids, sb), axis=0, keepdims=True)
        # ids == idx is exactly one-hot by construction (idx is one index;
        # for all-miss lanes it picks row 0, masked out by hit downstream)
        onehot = (ids == idx).astype(jnp.float32)  # [S_b,T]
        # attrs rows [16,T]: 0-2 center, 3 mat, 4 tex, 5-7 c0, 8-10 c1, 11 fuzz
        at_b = jax.lax.dot_general(
            atab_blk, onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return t_b, at_b

    if n_blocks <= 4:
        # unrolled fast path (book scene: exactly one block)
        t = None
        at = None
        for blk in range(n_blocks):
            lo = blk * S_BLOCK
            sb = min(S_BLOCK, s_total - lo)
            t_b, at_b = block_hit(
                table_ref[lo : lo + sb, :], atab_ref[:, lo : lo + sb], sb)
            if t is None:
                t, at = t_b, at_b
            else:
                better = t_b < t  # first block wins ties = lowest-idx argmin
                t = jnp.where(better, t_b, t)
                at = jnp.where(better, at_b, at)
    else:
        # rolled loop with dynamic table slices (stretch scenes: unrolling
        # 100+ blocks inside the K-step loop explodes compile time).
        # sphere_table pads big tables to a multiple of S_BLOCK.
        def blk_body(blk, carry):
            t, at = carry
            lo = blk * S_BLOCK
            t_b, at_b = block_hit(
                table_ref[pl.ds(lo, S_BLOCK), :],
                atab_ref[:, pl.ds(lo, S_BLOCK)],
                S_BLOCK,
            )
            better = t_b < t
            return (jnp.where(better, t_b, t), jnp.where(better, at_b, at))

        t0_, at0_ = block_hit(table_ref[0:S_BLOCK, :], atab_ref[:, 0:S_BLOCK], S_BLOCK)
        t, at = jax.lax.fori_loop(1, n_blocks, blk_body, (t0_, at0_))
    hit = t < BIG

    cenx, ceny, cenz = at[0:1, :], at[1:2, :], at[2:3, :]
    mat = at[3:4, :]
    tex = at[4:5, :]
    c0x, c0y, c0z = at[5:6, :], at[6:7, :], at[7:8, :]
    c1x, c1y, c1z = at[8:9, :], at[9:10, :], at[10:11, :]
    fuzz = at[11:12, :]

    # ---- shading: shader.rchit ------------------------------------------
    px_ = ox + t * dx
    py_ = oy + t * dy
    pz_ = oz + t * dz
    nx, ny, nz = _norm3(px_ - cenx, py_ - ceny, pz_ - cenz)
    ddn = nx * dx + ny * dy + nz * dz
    front = ddn < 0.0
    sgn = jnp.where(front, 1.0, -1.0)
    nx, ny, nz = nx * sgn, ny * sgn, nz * sgn

    # texture (shader.rchit:53-64): sine checker size 6
    sines = jnp.sin(6.0 * px_) * jnp.sin(6.0 * py_) * jnp.sin(6.0 * pz_)
    use_c1 = (tex > 0.5) & ~(sines > 0.0)
    ax = jnp.where(use_c1, c1x, c0x)
    ay = jnp.where(use_c1, c1y, c0y)
    az = jnp.where(use_c1, c1z, c0z)

    # scatter (shader.rchit:66-116): speculative draws keep LCG parity
    seed3, ux, uy, uz = rngops.random_unit_vector(seed)
    seed1, refr_rand = rngops.random_float(seed)

    # diffuse
    sdx_d = nx + ux
    sdy_d = ny + uy
    sdz_d = nz + uz
    near0 = (jnp.abs(sdx_d) < 1e-8) & (jnp.abs(sdy_d) < 1e-8) & (jnp.abs(sdz_d) < 1e-8)
    # == the re-dot of the flipped normal BITWISE: negation distributes
    # exactly over fp mul/add/fma (see ops/shading_rows.py)
    ndd = jnp.where(front, ddn, -ddn)
    sdx_d = jnp.where(near0, nx, sdx_d)
    sdy_d = jnp.where(near0, ny, sdy_d)
    sdz_d = jnp.where(near0, nz, sdz_d)

    # metal: reflect(d, n) = d - 2 dot(n,d) n
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
    cos_t = -ndd  # == -(d . n_flipped) bitwise (commuted muls, same grouping)
    can_refract = (eta * jnp.sqrt(1.0 - cos_t * cos_t)) <= 1.0
    r0 = ((1.0 - eta) / (1.0 + eta)) ** 2
    om = 1.0 - cos_t
    om2 = om * om
    reflectance = r0 + (1.0 - r0) * om2 * om2 * om
    does_refract = can_refract & (reflectance < refr_rand)
    k = 1.0 - eta * eta * (1.0 - ndd * ndd)
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
    does_scatter = metal_scatters | ~is_metal  # non-metal always scatters
    seed_h = jnp.where(is_refr, jnp.where(can_refract, seed1, seed), seed3)

    # ---- termination & accumulation (shader.rgen:70-89) ------------------
    scatters = hit & does_scatter
    deep = (depth + 1) >= max_depth
    cont = alive & scatters & ~deep
    # Russian-roulette fast mode — the exact structure of gridkernel._iterate
    # (see its comment); rr=None keeps the bit-parity chain
    ntx = tx_ * ax
    nty = ty_ * ay
    ntz = tz_ * az
    if rr is not None:
        d0, d1, pmin = rr
        dnext = depth + 1
        p = jnp.minimum(np.float32(1.0), jnp.maximum(
            np.float32(pmin), jnp.maximum(ntx, jnp.maximum(nty, ntz))))
        if d1:
            p = jnp.where(dnext >= d1, p * np.float32(0.5), p)
        considered = cont & (dnext >= d0)
        seed_pre = jnp.where(hit, seed_h, seed)
        seed_rr, u_rr = rngops.random_float(seed_pre)
        killed = considered & (u_rr >= p)
        cont = cont & ~killed
        ntx = jnp.where(considered, ntx / p, ntx)
        nty = jnp.where(considered, nty / p, nty)
        ntz = jnp.where(considered, ntz / p, ntz)
    term = alive & ~cont
    lx = jnp.where(hit, jnp.where(does_scatter, 0.0, ax), _SKY[0])
    ly = jnp.where(hit, jnp.where(does_scatter, 0.0, ay), _SKY[1])
    lz = jnp.where(hit, jnp.where(does_scatter, 0.0, az), _SKY[2])
    cbx = jnp.where(term, tx_ * lx, 0.0)
    cby = jnp.where(term, ty_ * ly, 0.0)
    cbz = jnp.where(term, tz_ * lz, 0.0)

    acc2 = list(acc)
    for m in range(m_slots):
        sel = term & (mrow == m)
        acc2[3 * m + 0] = acc[3 * m + 0] + jnp.where(sel, cbx, 0.0)
        acc2[3 * m + 1] = acc[3 * m + 1] + jnp.where(sel, cby, 0.0)
        acc2[3 * m + 2] = acc[3 * m + 2] + jnp.where(sel, cbz, 0.0)

    seed_a = jnp.where(hit, seed_h, seed)
    if rr is not None:
        seed_a = jnp.where(considered, seed_rr, seed_a)

    # ---- regen: next sample or next pixel --------------------------------
    more = term & (sidx < spp_i)
    pix_done = term & ~more
    m2 = mrow + pix_done.astype(jnp.int32)
    pix2 = m2 * n_lanes + lane
    valid2 = (m2 < m_slots) & (pix2 < p_total)
    adv = pix_done & valid2
    px2 = pix2 % width
    py2 = pix2 // width
    fx2 = (offx + px2).astype(jnp.float32)
    fy2 = (y0 + py2).astype(jnp.float32)
    fresh = rngops.tea_hash(
        rngops.tea_hash(px2.astype(jnp.uint32), (seed_y0 + py2).astype(jnp.uint32)),
        number,
    )
    regen = more | adv
    seed_c = jnp.where(adv, fresh, seed_a)
    fxn = jnp.where(adv, fx2, fx)
    fyn = jnp.where(adv, fy2, fy)
    seed_r, (cox, coy, coz), (cdx, cdy, cdz) = _camera_rays_rows(seed_c, fxn, fyn, vpr_ref)

    # normalized bounce direction (shader.rgen:78)
    bx, by, bz = _norm3(sdx, sdy, sdz)

    st2 = (
        jnp.where(cont, px_, jnp.where(regen, cox, ox)),
        jnp.where(cont, py_, jnp.where(regen, coy, oy)),
        jnp.where(cont, pz_, jnp.where(regen, coz, oz)),
        jnp.where(cont, bx, jnp.where(regen, cdx, dx)),
        jnp.where(cont, by, jnp.where(regen, cdy, dy)),
        jnp.where(cont, bz, jnp.where(regen, cdz, dz)),
        fxn,
        fyn,
        jnp.where(cont, ntx, jnp.where(regen, 1.0, tx_)),
        jnp.where(cont, nty, jnp.where(regen, 1.0, ty_)),
        jnp.where(cont, ntz, jnp.where(regen, 1.0, tz_)),
        jnp.where(alive, jnp.where(regen, seed_r, seed_a), seed),
        m2,
        jnp.where(adv, 1, sidx + more.astype(jnp.int32)),
        jnp.where(cont, depth + 1, jnp.where(regen, 0, depth)),
        (alive & (cont | regen)).astype(jnp.int32),
    )
    return st2, acc2


def _kernel(scal_ref, vpr_ref, table_ref, atab_ref, fin_ref, uin_ref,
            fout_ref, uout_ref, *, m_slots, n_lanes, p_total, width, max_depth,
            tmin, tmax, k_steps, skip_tmax, rr=None):
    # per-tile dead-skip (see gridkernel._kernel): a fully dead tile is a
    # fixed point, so pass state through and skip the k_steps body.
    # Output-identical — dead lanes accumulate nothing and never
    # resurrect.  program_id is read outside the gate (interpret-mode
    # lowering can't substitute it inside the cond's sub-jaxpr).
    lane = (
        jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
        + pl.program_id(0) * TILE
    )
    tile_alive = jnp.any(uin_ref[U_ALIVE : U_ALIVE + 1, :] != 0)

    @pl.when(jnp.logical_not(tile_alive))
    def _passthrough():
        fout_ref[:, :] = fin_ref[:, :]
        uout_ref[:, :] = uin_ref[:, :]

    @pl.when(tile_alive)
    def _run_body():
        _kernel_body(
            scal_ref, vpr_ref, table_ref, atab_ref, fin_ref, uin_ref,
            fout_ref, uout_ref, lane=lane, m_slots=m_slots,
            n_lanes=n_lanes, p_total=p_total, width=width,
            max_depth=max_depth, tmin=tmin, tmax=tmax, k_steps=k_steps,
            skip_tmax=skip_tmax, rr=rr)


def _kernel_body(scal_ref, vpr_ref, table_ref, atab_ref, fin_ref, uin_ref,
                 fout_ref, uout_ref, *, lane, m_slots, n_lanes, p_total,
                 width, max_depth, tmin, tmax, k_steps, skip_tmax, rr):

    ox, oy, oz = _vec3(fin_ref, R_O)
    dx, dy, dz = _vec3(fin_ref, R_D)
    st = (
        ox, oy, oz, dx, dy, dz,
        fin_ref[R_FX : R_FX + 1, :],
        fin_ref[R_FY : R_FY + 1, :],
        *_vec3(fin_ref, R_THR),
        uin_ref[U_SEED : U_SEED + 1, :],
        uin_ref[U_M : U_M + 1, :].astype(jnp.int32),
        uin_ref[U_SIDX : U_SIDX + 1, :].astype(jnp.int32),
        uin_ref[U_DEPTH : U_DEPTH + 1, :].astype(jnp.int32),
        (uin_ref[U_ALIVE : U_ALIVE + 1, :] != 0).astype(jnp.int32),
    )
    acc = [
        fin_ref[R_ACC + i : R_ACC + i + 1, :] for i in range(3 * m_slots)
    ]

    step = functools.partial(
        _iterate, lane=lane, scal_ref=scal_ref, vpr_ref=vpr_ref,
        table_ref=table_ref, atab_ref=atab_ref, m_slots=m_slots,
        n_lanes=n_lanes, p_total=p_total, width=width, max_depth=max_depth,
        tmin=tmin, tmax=tmax, skip_tmax=skip_tmax, rr=rr,
    )

    def body(_, carry):
        st, acc = carry
        return step(st, acc)

    st, acc = jax.lax.fori_loop(0, k_steps, body, (st, acc))

    (ox, oy, oz, dx, dy, dz, fx, fy, tx_, ty_, tz_,
     seed, mrow, sidx, depth, alive) = st
    fout_ref[R_O + 0 : R_O + 1, :] = ox
    fout_ref[R_O + 1 : R_O + 2, :] = oy
    fout_ref[R_O + 2 : R_O + 3, :] = oz
    fout_ref[R_D + 0 : R_D + 1, :] = dx
    fout_ref[R_D + 1 : R_D + 2, :] = dy
    fout_ref[R_D + 2 : R_D + 3, :] = dz
    fout_ref[R_FX : R_FX + 1, :] = fx
    fout_ref[R_FY : R_FY + 1, :] = fy
    fout_ref[R_THR + 0 : R_THR + 1, :] = tx_
    fout_ref[R_THR + 1 : R_THR + 2, :] = ty_
    fout_ref[R_THR + 2 : R_THR + 3, :] = tz_
    fout_ref[R_THR + 3 : R_ACC, :] = fin_ref[R_THR + 3 : R_ACC, :]  # pad row
    for i in range(3 * m_slots):
        fout_ref[R_ACC + i : R_ACC + i + 1, :] = acc[i]
    rf = f_rows(m_slots)
    tail0 = R_ACC + 3 * m_slots
    if tail0 < rf:  # pad rows
        fout_ref[tail0:rf, :] = fin_ref[tail0:rf, :]

    uout_ref[U_SEED : U_SEED + 1, :] = seed
    uout_ref[U_M : U_M + 1, :] = mrow.astype(jnp.uint32)
    uout_ref[U_SIDX : U_SIDX + 1, :] = sidx.astype(jnp.uint32)
    uout_ref[U_DEPTH : U_DEPTH + 1, :] = depth.astype(jnp.uint32)
    uout_ref[U_ALIVE : U_ALIVE + 1, :] = alive.astype(jnp.uint32)
    uout_ref[U_ALIVE + 1 : U_ROWS, :] = uin_ref[U_ALIVE + 1 : U_ROWS, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "m_slots", "n_lanes", "p_total", "width", "max_depth", "k_steps",
        "skip_tmax", "interpret", "rr",
    ),
)
def megakernel_step(scal, vpr, table, atab, fstate, ustate, *, m_slots, n_lanes,
                    p_total, width, max_depth, k_steps=K_STEPS, skip_tmax=False,
                    interpret=False, rr=None):
    """``k_steps`` wavefront iterations over all lanes. State shapes: fstate
    [f_rows(M), n_pad], ustate [U_ROWS, n_pad]; n_pad % TILE == 0."""
    n_pad = fstate.shape[1]
    rf = f_rows(m_slots)
    grid = n_pad // TILE
    s = table.shape[0]  # sphere-table rows (512 for the book scene; any
    # multiple of 8 works — the stretch procedural scenes use larger tables)
    kernel = functools.partial(
        _kernel, m_slots=m_slots, n_lanes=n_lanes, p_total=p_total, width=width,
        max_depth=max_depth, tmin=np.float32(config.T_MIN),
        tmax=np.float32(config.MAX_RAY_COLLISION_DISTANCE),
        k_steps=k_steps, skip_tmax=skip_tmax, rr=rr,
    )
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal (1, 8) i32
            pl.BlockSpec(memory_space=pltpu.SMEM),  # vpr (1, 24) f32
            pl.BlockSpec((s, 24), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, s), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rf, TILE), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((U_ROWS, TILE), lambda g: (0, g), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rf, TILE), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((U_ROWS, TILE), lambda g: (0, g), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rf, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((U_ROWS, n_pad), jnp.uint32),
        ],
        # large stretch scenes keep the whole sphere table VMEM-resident;
        # the default 16 MB scoped limit OOMs past ~2K spheres
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(scal, vpr, table, atab, fstate, ustate)


def attr_table_t(table24: np.ndarray) -> np.ndarray:
    """[16, S] transposed attribute table (cols 8..23 of the packed table)."""
    return np.ascontiguousarray(np.asarray(table24)[:, 8:24].T)


def viewport_scalars(vp) -> np.ndarray:
    """Pack ViewportArrays into the (1, 24) f32 SMEM layout."""
    out = np.zeros((1, 24), np.float32)
    out[0, V_H : V_H + 3] = np.asarray(vp.horizontal)
    out[0, V_V : V_V + 3] = np.asarray(vp.vertical)
    out[0, V_UL : V_UL + 3] = np.asarray(vp.upper_left)
    out[0, V_UP : V_UP + 3] = np.asarray(vp.cam_up)
    out[0, V_RIGHT : V_RIGHT + 3] = np.asarray(vp.cam_right)
    out[0, V_FROM : V_FROM + 3] = np.asarray(vp.look_from)
    out[0, V_AP] = np.asarray(vp.aperture)
    out[0, V_W] = np.asarray(vp.size)[0]
    out[0, V_HGT] = np.asarray(vp.size)[1]
    return out
