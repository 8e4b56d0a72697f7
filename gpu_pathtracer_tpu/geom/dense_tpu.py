"""Pallas TPU kernel for dense (gather-free) intersection.

The jnp dense path (geom/dense.py) materializes [N_rays, P] intermediates
in HBM — profiled at >25% of a PT iteration, HBM-bound at ~0.85
utilization. This kernel keeps a tile of rays in VMEM, streams the packed
primitive table from SMEM as scalars, and loops primitives in-register, so
the only HBM traffic is the ray tile in (8 floats/ray) and (t, prim) out.

Replaces the device traversal inner loop of the reference
(pathtracer.cu:214-296) for small scenes; the semantics (Möller–Trumbore,
sphere quadratic, ray/segment closest approach) match geom/dense.py and
mesh.h:45-98 / sphere.h:26-94 / line.h:33-87.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
TILE = 8192  # rays per grid step; 6 input + 2 output [TILE] f32 in VMEM


def _kernel(prims_ref, ox, oy, oz, dx, dy, dz, tmn, tmx, t_out, p_out, *,
            n_prims, has_tri, has_sph, has_lin, closest):
    """One ray tile vs all primitives. Block shapes [TILE//128, 128]."""
    rox, roy, roz = ox[...], oy[...], oz[...]
    rdx, rdy, rdz = dx[...], dy[...], dz[...]
    tmin = tmn[...]
    best_t = tmx[...]
    best_p = jnp.full(rox.shape, -1.0, jnp.float32)

    def body(p, carry):
        best_t, best_p = carry
        v0x = prims_ref[p, 0]
        v0y = prims_ref[p, 1]
        v0z = prims_ref[p, 2]
        ax = prims_ref[p, 3]
        ay = prims_ref[p, 4]
        az = prims_ref[p, 5]
        ptype = prims_ref[p, 9]

        ok = None
        t = None
        if has_tri:
            bx = prims_ref[p, 6]
            by = prims_ref[p, 7]
            bz = prims_ref[p, 8]
            # Möller–Trumbore, scalar prim vs vector rays (mesh.h:45-67)
            s1x = rdy * bz - rdz * by
            s1y = rdz * bx - rdx * bz
            s1z = rdx * by - rdy * bx
            div = s1x * ax + s1y * ay + s1z * az
            okt = jnp.abs(div) >= 1e-8
            inv = 1.0 / jnp.where(okt, div, 1.0)
            sx = rox - v0x
            sy = roy - v0y
            sz = roz - v0z
            b1 = (sx * s1x + sy * s1y + sz * s1z) * inv
            s2x = sy * az - sz * ay
            s2y = sz * ax - sx * az
            s2z = sx * ay - sy * ax
            b2 = (rdx * s2x + rdy * s2y + rdz * s2z) * inv
            tt = (bx * s2x + by * s2y + bz * s2z) * inv
            okt &= (b1 >= 0.0) & (b1 <= 1.0) & (b2 >= 0.0) \
                & (b1 + b2 <= 1.0) & (tt >= tmin) & (tt <= best_t)
            okt &= ptype == 0.0
            ok, t = okt, tt
        if has_sph:
            r0 = prims_ref[p, 10]
            # sphere quadratic (sphere.h:26-94)
            opx = rox - v0x
            opy = roy - v0y
            opz = roz - v0z
            bq = opx * rdx + opy * rdy + opz * rdz
            cq = opx * opx + opy * opy + opz * opz - r0 * r0
            delta = bq * bq - cq
            oks = delta >= 0.0
            sq = jnp.sqrt(jnp.maximum(delta, 0.0))
            t1 = -bq - sq
            t2 = -bq + sq
            use1 = t1 > tmin
            ts = jnp.where(use1, t1, t2)
            oks &= (ts > 0.0) & (ts <= best_t)
            oks &= use1 | (t1 > 0.0) | (t2 > tmin)
            oks &= ptype == 2.0
            ok = oks if ok is None else ok | oks
            t = ts if t is None else jnp.where(oks, ts, t)
        if has_lin:
            r0 = prims_ref[p, 10]
            r1 = prims_ref[p, 11]
            # ray/segment closest approach vs lerped width (line.h:33-87)
            vx = ax - v0x
            vy = ay - v0y
            vz = az - v0z
            wx = rox - v0x
            wy = roy - v0y
            wz = roz - v0z
            aa = rdx * rdx + rdy * rdy + rdz * rdz
            bb = rdx * vx + rdy * vy + rdz * vz
            cc = vx * vx + vy * vy + vz * vz
            dd = rdx * wx + rdy * wy + rdz * wz
            ee = vx * wx + vy * wy + vz * wz
            det = aa * cc - bb * bb
            okl = det != 0.0
            det_s = jnp.where(okl, det, 1.0)
            tl = (bb * ee - cc * dd) / det_s
            sl = jnp.clip((aa * ee - bb * dd) / det_s, 0.0, 1.0)
            okl &= (tl >= tmin) & (tl <= best_t)
            prx = wx + rdx * tl - vx * sl
            pry = wy + rdy * tl - vy * sl
            prz = wz + rdz * tl - vz * sl
            d2 = prx * prx + pry * pry + prz * prz
            rr = r0 * (1.0 - sl) + r1 * sl
            okl &= d2 <= rr * rr
            okl &= ptype == 1.0
            ok = okl if ok is None else ok | okl
            t = tl if t is None else jnp.where(okl, tl, t)

        best_p = jnp.where(ok, prims_ref[p, 12], best_p)
        best_t = jnp.where(ok, t, best_t)
        return best_t, best_p

    # full unroll overlaps the scalar prim loads with vector math — the
    # plain fori serializes on the scalar-load chain (Pallas TPU supports
    # only unroll=1 or full). Cap: DENSE_MAX prims keeps code size sane.
    if n_prims <= 64:
        best_t, best_p = jax.lax.fori_loop(
            0, n_prims, body, (best_t, best_p), unroll=n_prims)
    else:
        best_t, best_p = jax.lax.fori_loop(
            0, n_prims, body, (best_t, best_p))
    t_out[...] = best_t
    p_out[...] = best_p


@functools.partial(
    jax.jit, static_argnames=("n_prims", "has_tri", "has_sph", "has_lin"))
def dense_intersect_tpu(dense_prims, ro, rd, tmin, tmax, *, n_prims,
                        has_tri, has_sph, has_lin):
    """Closest-hit over all prims. Returns (best_t [N], best_prim [N] i32,
    found [N] bool). N must be padded to a multiple of TILE by the caller
    wrapper (it pads internally)."""
    n = ro.shape[0]
    n_pad = (n + TILE - 1) // TILE * TILE

    def prep(a):
        a = jnp.pad(a, ((0, n_pad - n),) + ((0, 0),) * (a.ndim - 1))
        return a

    rox = prep(ro[:, 0]).reshape(-1, LANES)
    roy = prep(ro[:, 1]).reshape(-1, LANES)
    roz = prep(ro[:, 2]).reshape(-1, LANES)
    rdx = prep(rd[:, 0]).reshape(-1, LANES)
    rdy = prep(rd[:, 1]).reshape(-1, LANES)
    rdz = prep(rd[:, 2]).reshape(-1, LANES)
    tmn = prep(jnp.broadcast_to(tmin, (n,))).reshape(-1, LANES)
    tmx = prep(jnp.broadcast_to(tmax, (n,))).reshape(-1, LANES)
    # padded lanes: tmax 0 -> no work, no hit
    rows = TILE // LANES
    n_tiles = n_pad // TILE

    ray_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    prim_spec = pl.BlockSpec(dense_prims.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel, n_prims=n_prims, has_tri=has_tri, has_sph=has_sph,
        has_lin=has_lin, closest=True)
    t, p = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[prim_spec] + [ray_spec] * 8,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
        ],
    )(dense_prims, rox, roy, roz, rdx, rdy, rdz, tmn, tmx)
    t = t.reshape(-1)[:n]
    p = p.reshape(-1)[:n].astype(jnp.int32)
    return t, p, p >= 0


def dense_closest(scene, static, ro, rd, tmin, tmax):
    """Drop-in for dense.dense_closest on the TPU backend."""
    n = ro.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax = jnp.asarray(tmax, jnp.float32) * jnp.ones(n, jnp.float32)
    return dense_intersect_tpu(
        scene.dense_prims, ro, rd, tmin, tmax,
        n_prims=int(scene.dense_prims.shape[0]),
        has_tri=static.has_triangles, has_sph=static.has_spheres,
        has_lin=static.has_lines)


def dense_any(scene, static, ro, rd, tmin, tmax):
    """Any-hit via the closest kernel (the lockstep loop has no early-out
    to exploit)."""
    _, _, found = dense_closest(scene, static, ro, rd, tmin, tmax)
    return found


# ---------------------------------------------------------------------------
# Block-culled traversal for mid-size scenes (DENSE_MAX < P <= BLOCKED_MAX)
# ---------------------------------------------------------------------------
#
# The BVH walk's per-lane pointer chasing has no efficient TPU mapping
# (no per-lane gather), so mid-size scenes use a flattened two-level
# scheme instead: prims stay in BVH-leaf order (spatially local), every
# 64-prim run gets a precomputed bbox, and the kernel slab-tests each
# block against the whole ray tile — one uniform scalar branch
# (`lax.cond`) skips the 64 primitive tests when no ray in the tile
# touches the block. Divergence cost becomes masked dense VPU math, the
# trade a vector machine wants; the tree's log-factor is traded for a
# small linear factor over ~P/64 cheap box tests.

BLOCK = 64
BLOCKED_MAX = 65536  # prim table must fit VMEM (P*16*4B <= ~4 MB)


def _prim_test(prims_ref, p, rox, roy, roz, rdx, rdy, rdz, tmin, best_t,
               has_tri, has_sph, has_lin):
    """One primitive (scalar row p) vs the ray tile. Returns (ok, t)."""
    v0x = prims_ref[p, 0]
    v0y = prims_ref[p, 1]
    v0z = prims_ref[p, 2]
    ax = prims_ref[p, 3]
    ay = prims_ref[p, 4]
    az = prims_ref[p, 5]
    ptype = prims_ref[p, 9]
    ok = None
    t = None
    if has_tri:
        bx = prims_ref[p, 6]
        by = prims_ref[p, 7]
        bz = prims_ref[p, 8]
        s1x = rdy * bz - rdz * by
        s1y = rdz * bx - rdx * bz
        s1z = rdx * by - rdy * bx
        div = s1x * ax + s1y * ay + s1z * az
        okt = jnp.abs(div) >= 1e-8
        inv = 1.0 / jnp.where(okt, div, 1.0)
        sx = rox - v0x
        sy = roy - v0y
        sz = roz - v0z
        b1 = (sx * s1x + sy * s1y + sz * s1z) * inv
        s2x = sy * az - sz * ay
        s2y = sz * ax - sx * az
        s2z = sx * ay - sy * ax
        b2 = (rdx * s2x + rdy * s2y + rdz * s2z) * inv
        tt = (bx * s2x + by * s2y + bz * s2z) * inv
        okt &= (b1 >= 0.0) & (b1 <= 1.0) & (b2 >= 0.0) \
            & (b1 + b2 <= 1.0) & (tt >= tmin) & (tt <= best_t)
        okt &= ptype == 0.0
        ok, t = okt, tt
    if has_sph:
        r0 = prims_ref[p, 10]
        opx = rox - v0x
        opy = roy - v0y
        opz = roz - v0z
        bq = opx * rdx + opy * rdy + opz * rdz
        cq = opx * opx + opy * opy + opz * opz - r0 * r0
        delta = bq * bq - cq
        oks = delta >= 0.0
        sq = jnp.sqrt(jnp.maximum(delta, 0.0))
        t1 = -bq - sq
        t2 = -bq + sq
        use1 = t1 > tmin
        ts = jnp.where(use1, t1, t2)
        oks &= (ts > 0.0) & (ts <= best_t)
        oks &= use1 | (t1 > 0.0) | (t2 > tmin)
        oks &= ptype == 2.0
        ok = oks if ok is None else ok | oks
        t = ts if t is None else jnp.where(oks, ts, t)
    if has_lin:
        r0 = prims_ref[p, 10]
        r1 = prims_ref[p, 11]
        vx = ax - v0x
        vy = ay - v0y
        vz = az - v0z
        wx = rox - v0x
        wy = roy - v0y
        wz = roz - v0z
        aa = rdx * rdx + rdy * rdy + rdz * rdz
        bb = rdx * vx + rdy * vy + rdz * vz
        cc = vx * vx + vy * vy + vz * vz
        dd = rdx * wx + rdy * wy + rdz * wz
        ee = vx * wx + vy * wy + vz * wz
        det = aa * cc - bb * bb
        okl = det != 0.0
        det_s = jnp.where(okl, det, 1.0)
        tl = (bb * ee - cc * dd) / det_s
        sl = jnp.clip((aa * ee - bb * dd) / det_s, 0.0, 1.0)
        okl &= (tl >= tmin) & (tl <= best_t)
        prx = wx + rdx * tl - vx * sl
        pry = wy + rdy * tl - vy * sl
        prz = wz + rdz * tl - vz * sl
        d2 = prx * prx + pry * pry + prz * prz
        rr = r0 * (1.0 - sl) + r1 * sl
        okl &= d2 <= rr * rr
        okl &= ptype == 1.0
        ok = okl if ok is None else ok | okl
        t = tl if t is None else jnp.where(okl, tl, t)
    return ok, t


def _blocked_kernel(prims_ref, blocks_ref, ox, oy, oz, dx, dy, dz, tmn,
                    tmx, t_out, p_out, *, n_blocks, has_tri, has_sph,
                    has_lin):
    rox, roy, roz = ox[...], oy[...], oz[...]
    rdx, rdy, rdz = dx[...], dy[...], dz[...]
    tmin = tmn[...]
    best_t0 = tmx[...]
    best_p0 = jnp.full(rox.shape, -1.0, jnp.float32)
    eps = 1e-20
    ix = 1.0 / jnp.where(jnp.abs(rdx) > eps,
                         rdx, jnp.where(rdx >= 0, eps, -eps))
    iy = 1.0 / jnp.where(jnp.abs(rdy) > eps,
                         rdy, jnp.where(rdy >= 0, eps, -eps))
    iz = 1.0 / jnp.where(jnp.abs(rdz) > eps,
                         rdz, jnp.where(rdz >= 0, eps, -eps))

    def blk(b, carry):
        best_t, best_p = carry
        bx0 = blocks_ref[b, 0]
        by0 = blocks_ref[b, 1]
        bz0 = blocks_ref[b, 2]
        bx1 = blocks_ref[b, 3]
        by1 = blocks_ref[b, 4]
        bz1 = blocks_ref[b, 5]
        t1 = (bx0 - rox) * ix
        t2 = (bx1 - rox) * ix
        tn = jnp.minimum(t1, t2)
        tf = jnp.maximum(t1, t2)
        t1 = (by0 - roy) * iy
        t2 = (by1 - roy) * iy
        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        t1 = (bz0 - roz) * iz
        t2 = (bz1 - roz) * iz
        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        hit = (tf > 1e-5) & (tn <= tf) & (tn <= best_t)

        def enter(c):
            bt, bp = c

            def prim(j, cc):
                ct, cp = cc
                p = b * BLOCK + j
                ok, t = _prim_test(
                    prims_ref, p, rox, roy, roz, rdx, rdy, rdz, tmin, ct,
                    has_tri, has_sph, has_lin)
                cp = jnp.where(ok, prims_ref[p, 12], cp)
                ct = jnp.where(ok, t, ct)
                return ct, cp

            return jax.lax.fori_loop(0, BLOCK, prim, (bt, bp))

        return jax.lax.cond(jnp.any(hit), enter, lambda c: c,
                            (best_t, best_p))

    best_t, best_p = jax.lax.fori_loop(0, n_blocks, blk,
                                       (best_t0, best_p0))
    t_out[...] = best_t
    p_out[...] = best_p


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "has_tri", "has_sph", "has_lin"))
def blocked_intersect_tpu(dense_prims, block_bbox, ro, rd, tmin, tmax, *,
                          n_blocks, has_tri, has_sph, has_lin):
    n = ro.shape[0]
    n_pad = (n + TILE - 1) // TILE * TILE

    def prep(a):
        return jnp.pad(a, ((0, n_pad - n),) + ((0, 0),) * (a.ndim - 1))

    comps = [prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
             prep(rd[:, 0]), prep(rd[:, 1]), prep(rd[:, 2]),
             prep(jnp.broadcast_to(tmin, (n,))),
             prep(jnp.broadcast_to(tmax, (n,)))]
    comps = [c.reshape(-1, LANES) for c in comps]
    rows = TILE // LANES
    n_tiles = n_pad // TILE

    ray_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    prim_spec = pl.BlockSpec(dense_prims.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    blk_spec = pl.BlockSpec(block_bbox.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _blocked_kernel, n_blocks=n_blocks, has_tri=has_tri,
        has_sph=has_sph, has_lin=has_lin)
    t, p = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[prim_spec, blk_spec] + [ray_spec] * 8,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
        ],
    )(dense_prims, block_bbox, *comps)
    t = t.reshape(-1)[:n]
    p = p.reshape(-1)[:n].astype(jnp.int32)
    return t, p, p >= 0


def blocked_closest(scene, static, ro, rd, tmin, tmax):
    n = ro.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax = jnp.asarray(tmax, jnp.float32) * jnp.ones(n, jnp.float32)
    return blocked_intersect_tpu(
        scene.dense_prims, scene.block_bbox, ro, rd, tmin, tmax,
        n_blocks=int(scene.block_bbox.shape[0]),
        has_tri=static.has_triangles, has_sph=static.has_spheres,
        has_lin=static.has_lines)


def blocked_any(scene, static, ro, rd, tmin, tmax):
    _, _, found = blocked_closest(scene, static, ro, rd, tmin, tmax)
    return found
