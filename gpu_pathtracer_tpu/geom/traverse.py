"""Wavefront BVH traversal + primitive intersection in pure jnp.

The TPU re-expression of the reference's device traversal
(pathtracer.cu:214-296): every lane (ray) runs the same iterative stack walk
in lockstep inside one `lax.while_loop`; node/primitive reads are batched
gathers from the flat SoA arrays. Leaves hold at most LEAF_SIZE primitives
(builder guarantee), so the leaf loop is a static unroll — no dynamic shapes
anywhere.

Design notes (TPU-first, not a CUDA translation):
- The hot state carried through the loop is minimal: (cur, sp, stack,
  best_t, best_prim). Full hit attributes (normal, uv, shading frame...)
  are reconstructed once per batch in `_hit_attributes` after traversal,
  which keeps the while_loop body lean.
- Lanes that finish idle until the slowest lane in the batch is done —
  the integrators compact rays between bounces to keep batches dense.
- Geometry-type branches (sphere/line) are compiled only when the scene
  contains those types (static flags), so triangle-only scenes pay nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gpu_pathtracer_tpu.core.vecmath import (
    cross, dot, dot3, make_coordinate, normalize, PI, TWO_PI, INV_PI,
    INV_TWO_PI,
)
from gpu_pathtracer_tpu.geom.bvh import LEAF_SIZE
from gpu_pathtracer_tpu.scene.model import GeometryType

STACK_DEPTH = 64  # matches the reference's int stack[64] (pathtracer.cu:215)


@struct.dataclass
class Hit:
    """Batched intersection record (intersection.h:6-19)."""
    valid: jnp.ndarray          # [N] bool
    t: jnp.ndarray              # [N]
    pos: jnp.ndarray            # [N, 3]
    nor: jnp.ndarray            # [N, 3] shading normal
    uv: jnp.ndarray             # [N, 2]
    dpdu: jnp.ndarray           # [N, 3] shading tangent
    mat_idx: jnp.ndarray        # [N] i32 (-1 = medium interface)
    light_idx: jnp.ndarray      # [N] i32
    bssrdf_idx: jnp.ndarray     # [N] i32
    medium_inside: jnp.ndarray  # [N] i32
    medium_outside: jnp.ndarray  # [N] i32
    prim_idx: jnp.ndarray       # [N] i32


def _slab_test(bb_min, bb_max, ro, inv_d, t_max):
    """bbox.h:77-96 slab test against the current closest t."""
    t1 = (bb_min - ro) * inv_d
    t2 = (bb_max - ro) * inv_d
    tnear = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tfar = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return (tfar > 1e-5) & (tnear <= tfar) & (tnear <= t_max)


def _tri_intersect(ro, rd, va, e1, e2, tmin, tmax):
    """Möller–Trumbore (mesh.h:45-67). Returns (hit, t)."""
    s1 = cross(rd, e2)
    divisor = dot(s1, e1)
    ok = jnp.abs(divisor) >= 1e-8
    inv_div = 1.0 / jnp.where(ok, divisor, 1.0)
    s = ro - va
    b1 = dot(s, s1) * inv_div
    ok &= (b1 >= 0.0) & (b1 <= 1.0)
    s2 = cross(s, e1)
    b2 = dot(rd, s2) * inv_div
    ok &= (b2 >= 0.0) & (b1 + b2 <= 1.0)
    t = dot(e2, s2) * inv_div
    ok &= (t >= tmin) & (t <= tmax)
    return ok, t


def _sphere_intersect(ro, rd, center, radius, tmin, tmax):
    """sphere.h:26-69 quadratic, near-then-far root. Returns (hit, t)."""
    op = ro - center
    b = dot(op, rd)
    c = dot(op, op) - radius * radius
    delta = b * b - c
    ok = delta >= 0.0
    sq = jnp.sqrt(jnp.maximum(delta, 0.0))
    t1 = -b - sq
    t2 = -b + sq
    # near root if beyond tmin, else far root. The reference (sphere.h:42-69)
    # only tmin-checks the far root when the near root is behind the ray.
    use_t1 = t1 > tmin
    t = jnp.where(use_t1, t1, t2)
    ok &= (t > 0.0) & (t <= tmax)
    ok &= use_t1 | (t1 > 0.0) | (t2 > tmin)
    return ok, t


def _line_intersect(ro, rd, p0, p1, w0, w1, tmin, tmax):
    """Ray vs width-lerped segment (line.h:33-73). Returns (hit, t, s)."""
    u = rd
    v = p1 - p0
    w = ro - p0
    a = dot(u, u)
    b = dot(u, v)
    c = dot(v, v)
    d = dot(u, w)
    e = dot(v, w)
    det = a * c - b * b
    ok = det != 0.0
    det_s = jnp.where(ok, det, 1.0)
    t = (b * e - c * d) / det_s
    s = jnp.clip((a * e - b * d) / det_s, 0.0, 1.0)
    ok &= (t >= tmin) & (t <= tmax)
    pr = ro + rd * t[..., None]
    pl = p0 + v * s[..., None]
    prl = pr - pl
    d2 = dot(prl, prl)
    r = w0 * (1.0 - s) + w1 * s
    ok &= d2 <= r * r
    return ok, t, s


def _leaf_prims(scene, static, ro, rd, tmin, cur_best_t, cur_best_prim,
                start, end, active):
    """Static-unrolled leaf loop: test up to LEAF_SIZE prims per lane."""
    best_t = cur_best_t
    best_prim = cur_best_prim
    for i in range(LEAF_SIZE):
        pidx = start + i
        valid = active & (pidx <= end)
        pidx_c = jnp.where(valid, pidx, 0)
        ptype = jnp.take(scene.prim_type, pidx_c, axis=0)
        v0 = jnp.take(scene.v0, pidx_c, axis=0)
        v1 = jnp.take(scene.v1, pidx_c, axis=0)
        v2 = jnp.take(scene.v2, pidx_c, axis=0)

        if static.has_triangles:
            h, t = _tri_intersect(ro, rd, v0, v1 - v0, v2 - v0, tmin, best_t)
            h &= valid & (ptype == int(GeometryType.TRIANGLE))
            best_prim = jnp.where(h, pidx_c, best_prim)
            best_t = jnp.where(h, t, best_t)
        if static.has_spheres:
            r0 = jnp.take(scene.radius0, pidx_c, axis=0)
            h, t = _sphere_intersect(ro, rd, v0, r0, tmin, best_t)
            h &= valid & (ptype == int(GeometryType.SPHERE))
            best_prim = jnp.where(h, pidx_c, best_prim)
            best_t = jnp.where(h, t, best_t)
        if static.has_lines:
            r0 = jnp.take(scene.radius0, pidx_c, axis=0)
            r1 = jnp.take(scene.radius1, pidx_c, axis=0)
            h, t, _ = _line_intersect(ro, rd, v0, v1, r0, r1, tmin, best_t)
            h &= valid & (ptype == int(GeometryType.LINE))
            best_prim = jnp.where(h, pidx_c, best_prim)
            best_t = jnp.where(h, t, best_t)
    return best_t, best_prim


def _traverse(scene, static, ro, rd, tmin, tmax, any_hit: bool):
    """Shared stack walk. Returns (best_t, best_prim[N] i32, found[N])."""
    n = ro.shape[0]
    inv_d = 1.0 / rd

    cur = jnp.zeros(n, jnp.int32)            # start at root
    sp = jnp.zeros(n, jnp.int32)
    stack = jnp.zeros((n, STACK_DEPTH), jnp.int32)
    best_t = jnp.asarray(tmax, jnp.float32) * jnp.ones(n, jnp.float32)
    best_prim = jnp.full(n, -1, jnp.int32)

    def cond(state):
        cur, sp, stack, best_t, best_prim = state
        return jnp.any(cur >= 0)

    def body(state):
        cur, sp, stack, best_t, best_prim = state
        active = cur >= 0
        node = jnp.where(active, cur, 0)
        bb_min = jnp.take(scene.node_bbox_min, node, axis=0)
        bb_max = jnp.take(scene.node_bbox_max, node, axis=0)
        sco = jnp.take(scene.node_second_child, node, axis=0)
        box_hit = active & _slab_test(bb_min, bb_max, ro, inv_d, best_t)
        is_leaf = sco < 0

        # inner node hit: push right child, descend into left
        push = box_hit & ~is_leaf
        stack = jnp.where(
            push[:, None]
            & (jnp.arange(STACK_DEPTH)[None, :] == sp[:, None]),
            sco[:, None], stack)
        sp_after_push = jnp.where(push, sp + 1, sp)

        # leaf hit: test primitives
        leaf_active = box_hit & is_leaf
        start = jnp.take(scene.node_start, node, axis=0)
        end = jnp.take(scene.node_end, node, axis=0)
        best_t, best_prim = _leaf_prims(
            scene, static, ro, rd, tmin, best_t, best_prim,
            start, end, leaf_active)

        # next node: descend on push, else pop, else done
        need_pop = active & ~push
        done_lane = active & ~push & (sp_after_push == 0)
        if any_hit:
            done_lane |= best_prim >= 0  # first hit suffices
            need_pop &= ~(best_prim >= 0)
        sp_next = jnp.where(need_pop & (sp_after_push > 0),
                            sp_after_push - 1, sp_after_push)
        popped = jnp.take_along_axis(
            stack, jnp.maximum(sp_next, 0)[:, None], axis=1)[:, 0]
        cur_next = jnp.where(push, cur + 1,
                             jnp.where(need_pop & (sp_after_push > 0),
                                       popped, -1))
        cur_next = jnp.where(done_lane, -1, cur_next)
        cur_next = jnp.where(active, cur_next, -1)
        return cur_next, sp_next, stack, best_t, best_prim

    state = (cur, sp, stack, best_t, best_prim)
    _, _, _, best_t, best_prim = jax.lax.while_loop(cond, body, state)
    return best_t, best_prim, best_prim >= 0


# Below this many lanes the pure-XLA dense intersector beats the Pallas
# dense kernel on TPU: the Pallas call carries a ~1.3-2 ms fixed cost
# (dispatch + per-call VMEM table load) regardless of lane count, while
# the XLA brute-force path fuses into the surrounding program. BDPT's
# compacted Tr chunks (<= 4096 lanes x 8 walk segments x 323 calls/iter)
# paid ~6.5 s/iter of that fixed cost alone (r4 anatomy).
XLA_DENSE_MAX_LANES = 8192


def intersect_any(scene, static, ro, rd, tmin, tmax):
    """Any-hit (shadow) query — reference IntersectP (pathtracer.cu:257-296).
    Returns a bool mask [N]."""
    from gpu_pathtracer_tpu.geom import dense, packet
    on_tpu = jax.default_backend() == "tpu"
    if (on_tpu and ro.shape[0] <= XLA_DENSE_MAX_LANES
            and static.n_primitives <= dense.DENSE_MAX
            and not static.bvh8_n_inst):
        on_tpu = False  # small batch: the fused XLA path wins
    if static.bvh8_n_inst:
        # instanced (TLAS/BLAS) scenes: only the Pallas kernel reads the
        # instanced table (interpret-mode off-TPU, for tests)
        from gpu_pathtracer_tpu.geom import packet_tpu
        _, _, found = packet_tpu.packet_traverse(
            scene, static, ro, rd, tmin, tmax, any_hit=True,
            interpret=not on_tpu)
        return found
    if static.n_primitives <= dense.DENSE_MAX:
        if on_tpu:
            from gpu_pathtracer_tpu.geom import dense_tpu
            return dense_tpu.dense_any(scene, static, ro, rd, tmin, tmax)
        return dense.dense_any(scene, static, ro, rd, tmin, tmax)
    if on_tpu and static.n_primitives <= 65536:
        from gpu_pathtracer_tpu.geom import dense_tpu
        return dense_tpu.blocked_any(scene, static, ro, rd, tmin, tmax)
    if on_tpu:
        from gpu_pathtracer_tpu.geom import packet_tpu
        if packet_tpu.supports(scene, static):
            _, _, found = packet_tpu.packet_traverse(
                scene, static, ro, rd, tmin, tmax, any_hit=True)
            return found
    _, _, found = packet.packet_traverse(
        scene, static, ro, rd, tmin, tmax, any_hit=True)
    return found


def intersect_closest(scene, static, ro, rd, tmin, tmax) -> Hit:
    """Closest-hit query — reference Intersect (pathtracer.cu:214-255).

    Small scenes take the gather-free dense path (geom/dense.py); larger
    scenes run the BVH walk.
    """
    from gpu_pathtracer_tpu.geom import dense, packet
    on_tpu = jax.default_backend() == "tpu"
    interpret_kernel = not on_tpu
    if (on_tpu and ro.shape[0] <= XLA_DENSE_MAX_LANES
            and static.n_primitives <= dense.DENSE_MAX
            and not static.bvh8_n_inst):
        on_tpu = False  # small batch: the fused XLA path wins
    if static.bvh8_n_inst:
        from gpu_pathtracer_tpu.geom import packet_tpu
        best_t, best_prim, found = packet_tpu.packet_traverse(
            scene, static, ro, rd, tmin, tmax, any_hit=False,
            interpret=interpret_kernel)
    elif static.n_primitives <= dense.DENSE_MAX:
        if on_tpu:
            from gpu_pathtracer_tpu.geom import dense_tpu
            best_t, best_prim, found = dense_tpu.dense_closest(
                scene, static, ro, rd, tmin, tmax)
        else:
            best_t, best_prim, found = dense.dense_closest(
                scene, static, ro, rd, tmin, tmax)
    elif on_tpu and static.n_primitives <= 65536:
        from gpu_pathtracer_tpu.geom import dense_tpu
        best_t, best_prim, found = dense_tpu.blocked_closest(
            scene, static, ro, rd, tmin, tmax)
    else:
        use_kernel = False
        if on_tpu:
            from gpu_pathtracer_tpu.geom import packet_tpu
            use_kernel = packet_tpu.supports(scene, static)
        if use_kernel:
            best_t, best_prim, found = packet_tpu.packet_traverse(
                scene, static, ro, rd, tmin, tmax, any_hit=False)
        else:
            best_t, best_prim, found = packet.packet_traverse(
                scene, static, ro, rd, tmin, tmax, any_hit=False)
    return _hit_attributes(scene, static, ro, rd, best_t, best_prim, found)


def _hit_attributes(scene, static, ro, rd, t, prim, found) -> Hit:
    """Reconstruct the full intersection record from (t, prim).

    ONE packed-table fetch (MXU one-hot for small scenes) after traversal
    instead of carrying attributes through the loop or issuing 16 separate
    gathers — XLA gathers run ~2 GB/s on TPU, the packed fetch doesn't.
    """
    from gpu_pathtracer_tpu.ops.gather import f2i, take_rows

    p = jnp.where(found, prim, 0)
    attrs = take_rows(scene.prim_attrs, p)
    ptype = f2i(attrs[:, 29])
    v0 = attrs[:, 0:3]
    v1 = attrs[:, 3:6]
    v2 = attrs[:, 6:9]
    pos = ro + rd * t[:, None]

    nor = jnp.zeros_like(pos)
    uv = jnp.zeros(pos.shape[:-1] + (2,), jnp.float32)
    dpdu = jnp.zeros_like(pos)

    if static.has_triangles:
        # recompute barycentrics at the stored t (mesh.h:45-95)
        e1 = v1 - v0
        e2 = v2 - v0
        s1 = cross(rd, e2)
        divisor = dot(s1, e1)
        inv_div = 1.0 / jnp.where(jnp.abs(divisor) > 1e-30, divisor, 1.0)
        s = ro - v0
        b1 = dot(s, s1) * inv_div
        s2 = cross(s, e1)
        b2 = dot(rd, s2) * inv_div
        n0 = attrs[:, 9:12]
        n1 = attrs[:, 12:15]
        n2 = attrs[:, 15:18]
        uv0 = attrs[:, 18:20]
        uv1 = attrs[:, 20:22]
        uv2 = attrs[:, 22:24]
        w0 = (1.0 - b1 - b2)[:, None]
        tri_nor = normalize(n0 * w0 + n1 * b1[:, None] + n2 * b2[:, None])
        tri_uv = uv0 * w0 + uv1 * b1[:, None] + uv2 * b2[:, None]
        dpdv = attrs[:, 24:27]
        tri_dpdu = normalize(cross(tri_nor, dpdv))
        is_tri = (ptype == int(GeometryType.TRIANGLE))[:, None]
        nor = jnp.where(is_tri, tri_nor, nor)
        uv = jnp.where(is_tri, tri_uv, uv)
        dpdu = jnp.where(is_tri, tri_dpdu, dpdu)

    if static.has_spheres:
        # sphere.h:72-91
        s_nor = normalize(pos - v0)
        costheta = s_nor[:, 1]
        vv = jnp.arccos(jnp.clip(costheta, -1.0, 1.0)) * INV_PI
        flat = jnp.stack(
            [s_nor[:, 0], jnp.zeros_like(costheta), s_nor[:, 2]], axis=-1)
        cosphi = flat[:, 0]
        phi = jnp.arccos(jnp.clip(cosphi, -1.0, 1.0))
        phi = jnp.where(s_nor[:, 2] > 0.0, TWO_PI - phi, phi)
        uu = phi * INV_TWO_PI
        s_uv = jnp.stack([uu, vv], axis=-1)
        s_dpdu = normalize(jnp.stack(
            [-TWO_PI * pos[:, 1], TWO_PI * pos[:, 0],
             jnp.zeros_like(uu)], axis=-1))
        is_sph = (ptype == int(GeometryType.SPHERE))[:, None]
        nor = jnp.where(is_sph, s_nor, nor)
        uv = jnp.where(is_sph, s_uv, uv)
        dpdu = jnp.where(is_sph, s_dpdu, dpdu)

    if static.has_lines:
        # line.h:74-84: camera-facing normal, uv = (s, dist/r)
        r0 = attrs[:, 27]
        r1 = attrs[:, 28]
        _, _, s_param = _line_intersect(
            ro, rd, v0, v1, r0, r1, jnp.float32(0.0),
            jnp.full_like(t, jnp.inf))
        l_nor = -rd
        pl = v0 + (v1 - v0) * s_param[:, None]
        prl = pos - pl
        d2 = dot(prl, prl)
        r = r0 * (1.0 - s_param) + r1 * s_param
        l_uv = jnp.stack(
            [s_param, jnp.sqrt(jnp.maximum(d2, 0.0))
             / jnp.maximum(r, 1e-30)], axis=-1)
        l_dpdu, _ = make_coordinate(l_nor)
        is_line = (ptype == int(GeometryType.LINE))[:, None]
        nor = jnp.where(is_line, l_nor, nor)
        uv = jnp.where(is_line, l_uv, uv)
        dpdu = jnp.where(is_line, l_dpdu, dpdu)

    neg1 = jnp.full(p.shape, -1, jnp.int32)
    return Hit(
        valid=found,
        t=t,
        pos=pos,
        nor=nor,
        uv=uv,
        dpdu=dpdu,
        mat_idx=jnp.where(found, f2i(attrs[:, 30]), neg1),
        light_idx=jnp.where(found, f2i(attrs[:, 31]), neg1),
        bssrdf_idx=jnp.where(found, f2i(attrs[:, 32]), neg1),
        medium_inside=jnp.where(found, f2i(attrs[:, 33]), neg1),
        medium_outside=jnp.where(found, f2i(attrs[:, 34]), neg1),
        prim_idx=jnp.where(found, p, neg1),
    )


def brute_force_closest(scene, static, ro, rd, tmin, tmax) -> Hit:
    """O(N*P) oracle for tests: intersect every primitive."""
    n = ro.shape[0]
    best_t = jnp.asarray(tmax, jnp.float32) * jnp.ones(n, jnp.float32)
    best_prim = jnp.full(n, -1, jnp.int32)
    P = scene.prim_type.shape[0]
    for pidx in range(P):
        ptype = int(scene.prim_type[pidx])
        v0 = jnp.broadcast_to(scene.v0[pidx], ro.shape)
        v1 = jnp.broadcast_to(scene.v1[pidx], ro.shape)
        v2 = jnp.broadcast_to(scene.v2[pidx], ro.shape)
        if ptype == int(GeometryType.TRIANGLE):
            h, t = _tri_intersect(ro, rd, v0, v1 - v0, v2 - v0, tmin, best_t)
        elif ptype == int(GeometryType.SPHERE):
            h, t = _sphere_intersect(
                ro, rd, v0, scene.radius0[pidx], tmin, best_t)
        else:
            h, t, _ = _line_intersect(
                ro, rd, v0, v1, scene.radius0[pidx], scene.radius1[pidx],
                tmin, best_t)
        best_prim = jnp.where(h, pidx, best_prim)
        best_t = jnp.where(h, t, best_t)
    return _hit_attributes(
        scene, static, ro, rd, best_t, best_prim, best_prim >= 0)
