"""Packet-synchronous BVH8 traversal for large scenes.

TPU has no efficient per-lane random access (XLA gathers run
element-at-a-time), so the CUDA per-thread stack walk
(pathtracer.cu:214-296) cannot be translated. Instead, rays are grouped
into PACKETS of W lanes that traverse an 8-wide tree TOGETHER with one
shared stack per packet:

- ONE 128-float row gather per packet per step (geom/bvh8.py unified
  table) delivers either 8 child boxes or 8 primitive records — row
  gathers cost ~1.5-2 us at any width on v5e, so per-step cost is
  dominated by op-dispatch latency and the fat row is effectively free;
- box and primitive tests are dense [G, W, 8] VPU math;
- a packet descends into a child when ANY of its rays hits its box, so
  divergent packets do some wasted dense math — cheap on the VPU, and
  primary/shadow batches are coherent in pixel order.

This is the classic wide-BVH packet formulation (Wald et al.; CPU BVH8
tracers) mapped onto a vector machine: the divergence cost moves from
memory (gathers) to compute (masked dense tests), which is exactly the
trade TPU wants, and the 8-wide fanout cuts the serial step count ~4x
vs a binary walk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PACKET = 128        # rays per packet (== TPU lane width)
STACK_DEPTH = 96    # >= bvh8 depth * 7 + 8
DONE = jnp.iinfo(jnp.int32).min


def _pad_packets(x, n_pad):
    if n_pad:
        pad_width = ((0, n_pad),) + ((0, 0),) * (x.ndim - 1)
        return jnp.pad(x, pad_width)
    return x


def _slab8(cmin, cmax, ro, inv_d, t_max):
    """Slab test: 8 child boxes [G, 8, 3] vs rays [G, W, 3].
    Returns hit [G, W, 8]. Axis-decomposed: every temp is [G, W, 8]
    (a 4-D [G, W, 8, 3] formulation triples the HBM traffic of the
    unfused intermediates and dominates the step cost)."""
    tnear = None
    tfar = None
    for a in range(3):
        t1 = (cmin[:, None, :, a] - ro[:, :, None, a]) \
            * inv_d[:, :, None, a]
        t2 = (cmax[:, None, :, a] - ro[:, :, None, a]) \
            * inv_d[:, :, None, a]
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        tnear = lo if tnear is None else jnp.maximum(tnear, lo)
        tfar = hi if tfar is None else jnp.minimum(tfar, hi)
    return (tfar > 1e-5) & (tnear <= tfar) & (tnear <= t_max[:, :, None])


def _leaf_test(leaf, ro, rd, tmin, best_t, best_prim, static, live,
               n_slots=8):
    """Dense test of W rays against the row's n_slots prim records.

    leaf: [G, n_slots*16] packed records; ro/rd [G, W, 3].
    """
    from gpu_pathtracer_tpu.scene.model import GeometryType

    rec = leaf.reshape(leaf.shape[0], n_slots, 16)
    v0 = rec[:, :, 0:3][:, None]      # [G, 1, L, 3]
    a = rec[:, :, 3:6][:, None]
    b = rec[:, :, 6:9][:, None]
    ptype = rec[:, :, 9][:, None]     # [G, 1, L]
    r0 = rec[:, :, 10][:, None]
    r1 = rec[:, :, 11][:, None]
    pidx = rec[:, :, 12][:, None]
    valid = (rec[:, :, 13] > 0.0)[:, None] & live[:, :, None]

    ro_ = ro[:, :, None, :]           # [G, W, 1, 3]
    rd_ = rd[:, :, None, :]
    tmin_ = tmin[:, :, None]
    best = best_t[:, :, None]

    ok_all = jnp.zeros(valid.shape, bool) & valid
    t_all = jnp.full(valid.shape, jnp.inf)

    if static.has_triangles:
        s1 = jnp.cross(rd_, b)
        div = jnp.sum(s1 * a, -1)
        ok = jnp.abs(div) >= 1e-8
        inv = 1.0 / jnp.where(ok, div, 1.0)
        s = ro_ - v0
        b1 = jnp.sum(s * s1, -1) * inv
        ok &= (b1 >= 0.0) & (b1 <= 1.0)
        s2 = jnp.cross(s, a)
        b2 = jnp.sum(rd_ * s2, -1) * inv
        ok &= (b2 >= 0.0) & (b1 + b2 <= 1.0)
        t = jnp.sum(b * s2, -1) * inv
        ok &= (t >= tmin_) & (t <= best) & valid
        ok &= ptype == int(GeometryType.TRIANGLE)
        t_all = jnp.where(ok, t, t_all)
        ok_all |= ok

    if static.has_spheres:
        op = ro_ - v0
        bq = jnp.sum(op * rd_, -1)
        cq = jnp.sum(op * op, -1) - r0 * r0
        delta = bq * bq - cq
        ok = delta >= 0.0
        sq = jnp.sqrt(jnp.maximum(delta, 0.0))
        t1 = -bq - sq
        t2 = -bq + sq
        use1 = t1 > tmin_
        t = jnp.where(use1, t1, t2)
        ok &= (t > 0.0) & (t <= best) & valid
        ok &= use1 | (t1 > 0.0) | (t2 > tmin_)
        ok &= ptype == int(GeometryType.SPHERE)
        t_all = jnp.where(ok, t, t_all)
        ok_all |= ok

    if static.has_lines:
        u = rd_
        v = a - v0           # p1 - p0 (slot stores p1 in `a` for lines)
        w = ro_ - v0
        aa = jnp.sum(u * u, -1)
        bb = jnp.sum(u * v, -1)
        cc = jnp.sum(v * v, -1)
        dd = jnp.sum(u * w, -1)
        ee = jnp.sum(v * w, -1)
        det = aa * cc - bb * bb
        ok = det != 0.0
        det_s = jnp.where(ok, det, 1.0)
        t = (bb * ee - cc * dd) / det_s
        sprm = jnp.clip((aa * ee - bb * dd) / det_s, 0.0, 1.0)
        ok &= (t >= tmin_) & (t <= best) & valid
        pr = ro_ + rd_ * t[..., None]
        pl = v0 + v * sprm[..., None]
        prl = pr - pl
        d2 = jnp.sum(prl * prl, -1)
        rr = r0 * (1.0 - sprm) + r1 * sprm
        ok &= d2 <= rr * rr
        ok &= ptype == int(GeometryType.LINE)
        t_all = jnp.where(ok, t, t_all)
        ok_all |= ok

    t_masked = jnp.where(ok_all, t_all, jnp.inf)
    t_new = jnp.min(t_masked, axis=-1)
    j = jnp.argmin(t_masked, axis=-1)
    # one-hot select over the static slot axis (no gather)
    sel = j[:, :, None] == jnp.arange(n_slots)[None, None, :]
    prim_new = jnp.sum(jnp.where(sel, pidx, 0.0), axis=-1).astype(jnp.int32)
    better = t_new < best_t
    best_t = jnp.where(better, t_new, best_t)
    best_prim = jnp.where(better, prim_new, best_prim)
    return best_t, best_prim


def packet_traverse(scene, static, ro, rd, tmin, tmax, any_hit: bool):
    """Shared packet walk over the BVH8 table. ro/rd [N, 3]; returns
    (best_t, best_prim, found) each [N]."""
    n = ro.shape[0]
    g = (n + PACKET - 1) // PACKET
    n_pad = g * PACKET - n
    table = scene.bvh8_table

    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax_b = jnp.asarray(tmax, jnp.float32) * jnp.ones(n, jnp.float32)
    ro_p = _pad_packets(ro, n_pad).reshape(g, PACKET, 3)
    rd_p = _pad_packets(rd, n_pad).reshape(g, PACKET, 3)
    # padded lanes get tmax <= 0 -> never hit anything
    tmin_p = _pad_packets(tmin_b, n_pad).reshape(g, PACKET)
    tmax_p = jnp.where(
        _pad_packets(jnp.ones(n, bool), n_pad),
        _pad_packets(tmax_b, n_pad), -1.0).reshape(g, PACKET)
    inv_d = 1.0 / rd_p

    cur = jnp.zeros(g, jnp.int32)  # root = node row 0
    sp = jnp.zeros(g, jnp.int32)
    stack = jnp.zeros((g, STACK_DEPTH), jnp.int32)
    best_t = tmax_p
    best_prim = jnp.full((g, PACKET), -1, jnp.int32)
    live0 = tmax_p > 0.0

    def cond(state):
        return jnp.any(state[0] != DONE)

    def body(state):
        cur, sp, stack, best_t, best_prim = state
        active = cur != DONE
        row = jnp.where(active, jnp.abs(cur), 0)
        is_leaf = active & (cur < 0)
        is_node = active & (cur >= 0)
        rec = jnp.take(table, row, axis=0)               # [G, 128]

        # ---- inner step: 8 child slab tests + pushes --------------------
        recn = rec[:, :64].reshape(g, 8, 8)
        cmin = recn[:, :, 0:3]
        cmax = recn[:, :, 3:6]
        meta = recn[:, :, 6].astype(jnp.int32)
        ray_hits = _slab8(cmin, cmax, ro_p, inv_d, best_t) \
            & live0[:, :, None]                          # [G, W, 8]
        # meta == 0 marks an empty child slot (the root is never a child);
        # its inverted bbox alone does NOT fail the slab test (-inf<=+inf)
        child_hit = is_node[:, None] & (meta != 0) \
            & jnp.any(ray_hits, axis=1)                  # [G, 8]
        off = jnp.cumsum(child_hit, axis=1) - child_hit  # exclusive
        slots = jnp.arange(STACK_DEPTH)[None, :]
        for c in range(8):
            pos = sp + off[:, c]
            stack = jnp.where(
                child_hit[:, c, None] & (slots == pos[:, None]),
                meta[:, c, None], stack)
        sp_after = sp + jnp.sum(child_hit, axis=1)

        # ---- leaf step: 8 primitive tests -------------------------------
        bt, bp = _leaf_test(rec, ro_p, rd_p, tmin_p, best_t, best_prim,
                            static, is_leaf[:, None] & live0)
        best_t = jnp.where(is_leaf[:, None], bt, best_t)
        best_prim = jnp.where(is_leaf[:, None], bp, best_prim)

        # ---- pop --------------------------------------------------------
        if any_hit:
            # a packet may stop once every live lane has a hit
            all_found = jnp.all((best_prim >= 0) | ~live0, axis=-1)
            active &= ~all_found
        can_pop = active & (sp_after > 0)
        sp_next = jnp.where(can_pop, sp_after - 1, sp_after)
        popped = jnp.take_along_axis(
            stack, jnp.maximum(sp_next, 0)[:, None], axis=1)[:, 0]
        cur_next = jnp.where(can_pop, popped, DONE)
        return cur_next, sp_next, stack, best_t, best_prim

    state = (cur, sp, stack, best_t, best_prim)
    _, _, _, best_t, best_prim = jax.lax.while_loop(cond, body, state)

    best_t = best_t.reshape(-1)[:n]
    best_prim = best_prim.reshape(-1)[:n]
    return best_t, best_prim, best_prim >= 0
