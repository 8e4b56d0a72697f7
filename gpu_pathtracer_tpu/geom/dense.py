"""Dense (gather-free) intersection for small scenes.

On TPU, per-lane random access (XLA gather) runs ~2 GB/s effective while
dense VPU math streams at full rate; measured on v5e, brute-forcing 24
triangles against 1M rays takes 7.5 ms while the same query through the
SIMT-style BVH walk takes 1900 ms. So for scenes up to DENSE_MAX primitives
we skip the BVH entirely: primitive data become compile-time constants,
the intersection is a Python-unrolled loop over static chunks of prims, and
XLA fuses everything into streaming elementwise work.

This replaces BVH traversal (pathtracer.cu:214-296) for cornell-class
scenes; larger scenes use geom.packet (packet-synchronous BVH traversal).
"""

from __future__ import annotations

import jax.numpy as jnp

from gpu_pathtracer_tpu.core.vecmath import cross, dot
from gpu_pathtracer_tpu.scene.model import GeometryType

DENSE_MAX = 512   # brute-force work = N_rays * P; keep P modest
CHUNK = 32        # prims per unrolled block ([N, CHUNK] intermediates)


def _tri_chunk(ro, rd, v0c, e1c, e2c, tmin, best_t):
    """Möller–Trumbore for a [C]-chunk of triangles vs [N] rays.
    Returns (ok[N,C], t[N,C])."""
    rd_ = rd[:, None, :]
    ro_ = ro[:, None, :]
    s1 = jnp.cross(rd_, e2c[None])
    div = jnp.sum(s1 * e1c[None], -1)
    ok = jnp.abs(div) >= 1e-8
    inv = 1.0 / jnp.where(ok, div, 1.0)
    s = ro_ - v0c[None]
    b1 = jnp.sum(s * s1, -1) * inv
    ok &= (b1 >= 0.0) & (b1 <= 1.0)
    s2 = jnp.cross(s, e1c[None])
    b2 = jnp.sum(rd_ * s2, -1) * inv
    ok &= (b2 >= 0.0) & (b1 + b2 <= 1.0)
    t = jnp.sum(e2c[None] * s2, -1) * inv
    ok &= (t >= tmin[:, None]) & (t <= best_t[:, None])
    return ok, t


def _sphere_chunk(ro, rd, center, radius, tmin, best_t):
    op = ro[:, None, :] - center[None]
    b = jnp.sum(op * rd[:, None, :], -1)
    c = jnp.sum(op * op, -1) - radius[None] ** 2
    delta = b * b - c
    ok = delta >= 0.0
    sq = jnp.sqrt(jnp.maximum(delta, 0.0))
    t1 = -b - sq
    t2 = -b + sq
    use_t1 = t1 > tmin[:, None]
    t = jnp.where(use_t1, t1, t2)
    ok &= (t > 0.0) & (t <= best_t[:, None])
    ok &= use_t1 | (t1 > 0.0) | (t2 > tmin[:, None])
    return ok, t


def _line_chunk(ro, rd, p0, p1, w0, w1, tmin, best_t):
    u = rd[:, None, :]
    v = (p1 - p0)[None]
    w = ro[:, None, :] - p0[None]
    a = jnp.sum(u * u, -1)
    b = jnp.sum(u * v, -1)
    c = jnp.sum(v * v, -1)
    d = jnp.sum(u * w, -1)
    e = jnp.sum(v * w, -1)
    det = a * c - b * b
    ok = det != 0.0
    det_s = jnp.where(ok, det, 1.0)
    t = (b * e - c * d) / det_s
    s = jnp.clip((a * e - b * d) / det_s, 0.0, 1.0)
    ok &= (t >= tmin[:, None]) & (t <= best_t[:, None])
    pr = ro[:, None, :] + rd[:, None, :] * t[..., None]
    pl = p0[None] + v * s[..., None]
    prl = pr - pl
    d2 = jnp.sum(prl * prl, -1)
    r = w0[None] * (1.0 - s) + w1[None] * s
    ok &= d2 <= r * r
    return ok, t


def dense_closest(scene, static, ro, rd, tmin, tmax):
    """Brute-force closest hit. Returns (best_t[N], best_prim[N], found[N])."""
    n = ro.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    best_t = jnp.asarray(tmax, jnp.float32) * jnp.ones(n, jnp.float32)
    best_prim = jnp.full(n, -1, jnp.int32)
    P = static.n_primitives

    for c0 in range(0, P, CHUNK):
        c1 = min(c0 + CHUNK, P)
        ptype = scene.prim_type[c0:c1]
        v0c = scene.v0[c0:c1]
        v1c = scene.v1[c0:c1]
        v2c = scene.v2[c0:c1]
        ok = None
        t = None
        if static.has_triangles:
            ok, t = _tri_chunk(ro, rd, v0c, v1c - v0c, v2c - v0c,
                               tmin, best_t)
            ok &= (ptype == int(GeometryType.TRIANGLE))[None, :]
        if static.has_spheres:
            ok_s, t_s = _sphere_chunk(ro, rd, v0c, scene.radius0[c0:c1],
                                      tmin, best_t)
            ok_s &= (ptype == int(GeometryType.SPHERE))[None, :]
            ok = ok_s if ok is None else ok | ok_s
            t = t_s if t is None else jnp.where(ok_s, t_s, t)
        if static.has_lines:
            ok_l, t_l, = _line_chunk(
                ro, rd, v0c, v1c, scene.radius0[c0:c1],
                scene.radius1[c0:c1], tmin, best_t)[:2]
            ok_l &= (ptype == int(GeometryType.LINE))[None, :]
            ok = ok_l if ok is None else ok | ok_l
            t = t_l if t is None else jnp.where(ok_l, t_l, t)

        t_masked = jnp.where(ok, t, jnp.inf)
        # min + argmin (pure reductions) — no take_along_axis gather
        t_best_chunk = jnp.min(t_masked, axis=1)
        j = jnp.argmin(t_masked, axis=1)
        better = t_best_chunk < best_t
        best_t = jnp.where(better, t_best_chunk, best_t)
        best_prim = jnp.where(better, (c0 + j).astype(jnp.int32), best_prim)

    return best_t, best_prim, best_prim >= 0


def dense_any(scene, static, ro, rd, tmin, tmax):
    """Brute-force any-hit: pure OR-reduction over prim chunks (no argmin
    machinery). Returns bool mask [N]."""
    n = ro.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax_b = jnp.asarray(tmax, jnp.float32) * jnp.ones(n, jnp.float32)
    found = jnp.zeros(n, bool)
    P = static.n_primitives

    for c0 in range(0, P, CHUNK):
        c1 = min(c0 + CHUNK, P)
        ptype = scene.prim_type[c0:c1]
        v0c = scene.v0[c0:c1]
        v1c = scene.v1[c0:c1]
        v2c = scene.v2[c0:c1]
        if static.has_triangles:
            ok, _ = _tri_chunk(ro, rd, v0c, v1c - v0c, v2c - v0c,
                               tmin, tmax_b)
            ok &= (ptype == int(GeometryType.TRIANGLE))[None, :]
            found |= jnp.any(ok, axis=1)
        if static.has_spheres:
            ok, _ = _sphere_chunk(ro, rd, v0c, scene.radius0[c0:c1],
                                  tmin, tmax_b)
            ok &= (ptype == int(GeometryType.SPHERE))[None, :]
            found |= jnp.any(ok, axis=1)
        if static.has_lines:
            ok, _ = _line_chunk(ro, rd, v0c, v1c, scene.radius0[c0:c1],
                                scene.radius1[c0:c1], tmin, tmax_b)
            ok &= (ptype == int(GeometryType.LINE))[None, :]
            found |= jnp.any(ok, axis=1)

    return found
