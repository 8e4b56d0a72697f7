"""Pallas TPU kernel: in-kernel packet walk of the BVH8 table.

The XLA-level packet walk (geom/packet.py) pays ~300-550 us per tree
step: every step is a chain of HBM-materialized [G, W, 8] temps plus a
full-array stack update, and ALL packets advance in lockstep so the
step count is the MAX over packets. This kernel moves the whole walk
inside one Pallas program:

- the unified BVH8 table (geom/bvh8.py) is DMA'd from HBM into a VMEM
  scratch ONCE (first grid step) and stays resident — node fetches
  become scalar VMEM loads, free of XLA gather costs;
- each grid step walks ONE packet of W rays: per-packet node and leaf
  stacks live in SMEM (scalar memory), the traversal state (best_t,
  best_prim) in registers, so a packet only pays for the nodes IT
  visits (average, not max, step count);
- every while iteration UNCONDITIONALLY processes `nn` node rows + `nl`
  leaf rows (dummy rows when a stack runs short): a node-vs-leaf
  `lax.cond` measured ~1 us/iteration of pipeline breakage on v5e, far
  more than the dummy work costs;
- per node row: 8 child slab tests as dense [W/128, 128] VPU math
  against scalar-broadcast child boxes; all hit flags of an iteration
  are packed vector-side into ONE bitmask so a single vector->scalar
  sync (~0.2 us) drives the scalar push logic;
- per leaf row: 8 primitive records tested as independent chains vs
  the entry best_t (scalar-broadcast like geom/dense_tpu.py), then
  min-merged — serial best_t updates would chain the slot latencies.

Replaces the CUDA per-thread stack walk (pathtracer.cu:214-296) for
large scenes; intersection semantics match geom/traverse.py
(Moller-Trumbore mesh.h:45-67, sphere.h:26-94, line.h:33-87).

Packet width: Mosaic requires ray blocks of >=8 sublane rows, but the
iteration count per packet grows with the UNION of the packet's rays'
subtrees — incoherent bounce rays want narrower packets than the 1024
minimum a block implies. packet_w < 1024 therefore runs SUB-PACKETS:
one grid step loads an 8-row block and walks its 1024//W independent
W-ray packets sequentially (separate stack resets, shared scratch).
Exact-policy simulation on the dragon BVH8 (tools/sim_walk_stats.py)
picks the shipped default (PACKET_W, NN, NL).

Capacity — two regimes, chosen by table size vs VMEM (~16 MB/core):
- RESIDENT (rows <= RESIDENT_MAX_ROWS): the whole unified table is
  DMA'd to VMEM once and every fetch is a VMEM load.
- STREAMED (packed node rows <= NODE4_MAX_ROWS): the nodes are VMEM-
  resident in a bf16-packed 4-nodes/row table (bvh8.pack_nodes4 —
  directed-rounded bf16 boxes stay conservative, so at worst an extra
  node is visited, never a miss); popped leaf rows are DMA'd from HBM
  into a 2-row buffer with a one-iteration software pipeline —
  iteration i tests the rows whose copies were started at i-1, so the
  ~1 us HBM latency hides behind the node slab tests. This is the
  sponza-class regime: a 1M-prim unified table is ~120 MB, but its
  packed node rows are ~7 MB (scales to ~7M prims).
Beyond NODE4_MAX_ROWS the XLA walk (geom/packet.py) remains the
fallback.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# Shipped walk config (overridable by env for A/B harnesses). TPU sweep
# history (tools/bench_walkcost.py, dragon, 262k rays, same-process
# interleaved min-of-reps):
# - W256 4+4 is the shipped default: 67 ms on sorted incoherent bounce
#   rays, 1.35-1.59x over W1024 1+2 across sessions; primaries pay ~16%
#   (W1024 1+2 is their best: 33-40 ms) but depth-5 frames are
#   bounce-dominated.
# - WIDER pops (6+6, 8+8) and narrower packets (W128) LOSE: the
#   iteration is instruction-THROUGHPUT-bound at 4+4, not latency-bound.
#   Audit: ~600 vreg-ops + ~84 lane-gathers (take_along_axis decode of
#   node/leaf fields) per iteration ~= 1.2-1.4 us at 940 MHz, matching
#   the measured 67 ms / (1024 packets x 44.3 sim iters) = 1.48 us/iter.
# - FUSE (below) measured NEUTRAL (F2/F4 within noise of F1 on every ray
#   set, 2026-08-19): the VLIW scheduler gains nothing from extra
#   independent chains because the issue slots are already full. Kept as
#   an A/B knob; default 1.
PACKET_W = int(os.environ.get("PTPU_PACKET_W", "256"))
                        # rays per packet; < 1024 runs sub-packets of an
                        # 8-row block (Mosaic block-shape rule)
PACKET_W_INST = int(os.environ.get("PTPU_PACKET_W_INST", "512"))
                        # instanced (TLAS) walks want WIDER packets: the
                        # r4 sim said W128 cuts union cost/ray 1.9x, but
                        # the TPU A/B (2026-08-20, forest, two runs,
                        # interleaved min-of-reps) says the per-packet
                        # fixed cost (instance slab tests + SMEM sort +
                        # setup) dominates: W512 beats W256 by ~5-6% and
                        # W128 LOSES 1.25x; W1024 over-inflates unions.
NN = int(os.environ.get("PTPU_NN", "4"))   # node rows popped / iteration
NL = int(os.environ.get("PTPU_NL", "4"))   # leaf rows popped / iteration
FUSE = int(os.environ.get("PTPU_FUSE", "1"))  # sub-packets walked per
                        # while_loop (independent stacks/states whose
                        # scalar/vector chains interleave in the VLIW
                        # slots; measured neutral — see above)
INST_MAJOR = int(os.environ.get("PTPU_INST_MAJOR", "1"))
                        # instanced policy: 1 = instance-major (sort
                        # instances near-first, walk each to completion
                        # with the FLAT body — rays transformed into
                        # registers per instance, plain row entries);
                        # 0 = interleaved (one stack over all instances,
                        # per-pop dynamic xray scratch loads). Measured
                        # 2026-08: interleaved costs 5.4 us/iter vs the
                        # flat body's 1.48 (tools/bench_tlas_walk.py) for
                        # only ~10% fewer iterations (tools/sim_tlas.py)
NSTACK = 512            # node stack: bounded by bvh8 depth * 14 + 16
LSTACK = 4096           # leaf backlog: pushes <= 16/iter, drains 2/iter
RESIDENT_MAX_ROWS = 24576   # 12 MB of VMEM for the resident table
NODE4_MAX_ROWS = 24576      # 12 MB cap on the bf16-packed node rows
                            # (4 nodes/row -> ~98k nodes/MB: ~7M prims)
BLOCK_ROWS = 8          # Mosaic minimum sublane rows per ray block


def _safe_inv(d):
    eps = 1e-20
    return 1.0 / jnp.where(jnp.abs(d) > eps, d,
                           jnp.where(d >= 0, eps, -eps))


def _walk_kernel(*refs, has_tri, has_sph, has_lin, any_hit, n8,
                 slot_order=False, rows=8, subpk=1, nn=1, nl=2, n_inst=0,
                 tlas_rows=0, fuse=1, inst_major=False):
    """Dual-stack, branch-free packet walk.

    Every while iteration UNCONDITIONALLY processes `nn` node rows and
    `nl` leaf rows (popped from separate SMEM stacks; the all-zero DUMMY
    row substitutes when a stack runs short). Measured on v5e: a
    `lax.cond` choosing node-vs-leaf work costs ~1 us PER ITERATION in
    pipeline breakage — far more than the dummy work it saves — and a
    single packed-bitmask vector->scalar sync per iteration (~0.2 us)
    replaces what would be `16` separate `jnp.any` syncs.

    `rows` is the PACKET's ray rows (packet_w/128); `subpk` packets are
    walked sequentially per grid step so the ray block keeps Mosaic's
    8-sublane minimum. Narrow packets trade per-iteration row cost
    against union-growth of the per-packet subtree (the sim sweep in
    tools/sim_walk_stats.py decides the shipped default).

    n8 is None => RESIDENT mode (tab holds the whole unified table);
    else STREAMED mode: tab holds the bf16-packed 4-nodes/row table
    (bvh8.pack_nodes4, trailing zero dummy row included) and popped
    leaf rows are DMA'd from the unified table in HBM into the 2-row
    lbuf with a one-iteration pipeline (test the rows whose copies
    started last iteration).
    """
    streamed = n8 is not None
    instanced = n_inst > 0
    if streamed:
        (nodes4_hbm, tab_hbm, ox, oy, oz, dx, dy, dz, tmn, tmx,
         t_out, p_out, tab, nstack, lstack, sps, sem, mscr,
         lbuf, *lsems) = refs
    elif instanced and inst_major:
        # instance-major mode (geom/tlas.py): aux input [n_inst, 128]
        # rows of [3x4 world->blas xform (12), blas root row, slot base,
        # world bbox min (14:17) / max (17:20)]; ient/iid are SMEM
        # staging for the per-packet near-first instance order.
        (tab_hbm, aux, ox, oy, oz, dx, dy, dz, tmn, tmx,
         t_out, p_out, tab, nstack, lstack, sps, sem, mscr,
         ient, iid) = refs
    elif instanced:
        # instanced mode (geom/tlas.py): aux input [n_inst, 128] rows of
        # [3x4 world->blas xform (12), blas root row, slot base, pad];
        # xray scratch holds the packet's rays pre-transformed into every
        # instance frame: comp c of instance i at rows
        # [i*12*rows + c*rows, +rows), comps ordered
        # rox roy roz rdx rdy rdz ix iy iz oix oiy oiz.
        (tab_hbm, aux, ox, oy, oz, dx, dy, dz, tmn, tmx,
         t_out, p_out, tab, nstack, lstack, sps, sem, mscr, xray) = refs
    else:
        (tab_hbm, ox, oy, oz, dx, dy, dz, tmn, tmx,
         t_out, p_out, tab, nstack, lstack, sps, sem, mscr) = refs
    ncand = 8 * nn
    S = 2048   # stack entries encode row * S + instance (tlas.INST_STRIDE)

    # resident part: one DMA on the first grid step; the scratch
    # persists across grid steps so later packets reuse it
    @pl.when(pl.program_id(0) == 0)
    def _():
        src = nodes4_hbm if streamed else tab_hbm
        cp = pltpu.make_async_copy(src, tab, sem)
        cp.start()
        cp.wait()

    if streamed:
        # node ids decode as (row id>>2, quarter id&3); the packed
        # table's trailing zero row makes id 4*(rows-1) an all-zero
        # quarter (meta 0 => no pushes)
        dummy = (tab.shape[0] - 1) * 4
        ldummy = tab_hbm.shape[0] - 1    # zero leaf row in HBM
    else:
        dummy = tab.shape[0] - 1
        ldummy = dummy

    BIG = jnp.float32(3.0e38)   # "no push" distance: sorts last

    # field extraction: Mosaic cannot shape-cast [1,64]->[8,8] (lanes to
    # sublanes), but it DOES have a lane-axis dynamic gather. Broadcast
    # the row vector to 8 sublanes and gather field f of child/slot c at
    # lane index c*stride+f -> an [8,128] where sublane c carries that
    # child's field broadcast across all lanes, ready for [8,128] x
    # [1,128] ray-row math (same trick as ops/small_gather.py).
    child8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0) * 8
    child4 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0) * 4
    slot16 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0) * 16
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    laneC = jax.lax.broadcasted_iota(jnp.int32, (ncand, LANES), 1)
    subC = jax.lax.broadcasted_iota(jnp.int32, (ncand, LANES), 0)
    HIMASK = jnp.int32(np.int32(np.uint32(0xFFFF0000)))

    bx, by, bz = ox[...], oy[...], oz[...]
    bdx, bdy, bdz = dx[...], dy[...], dz[...]
    btmin, btmax = tmn[...], tmx[...]

    def make_ctx(sp, j):
        """Per-sub-packet traversal context: ray components of block rows
        [sp*rows, +rows), with o*inv hoisted (slab planes become FMAs).
        `j` is the position within the fused group (selects the stack
        segment and the xray slice)."""
        sl_ = slice(sp * rows, (sp + 1) * rows)
        rox, roy, roz = bx[sl_], by[sl_], bz[sl_]
        rdx, rdy, rdz = bdx[sl_], bdy[sl_], bdz[sl_]
        ix = _safe_inv(rdx)
        iy = _safe_inv(rdy)
        iz = _safe_inv(rdz)
        tmax = btmax[sl_]
        ctx = dict(
            sl=sl_, j=j,
            direct=(rox, roy, roz, rdx, rdy, rdz, ix, iy, iz,
                    rox * ix, roy * iy, roz * iz),
            tmin=btmin[sl_], tmax=tmax,
            live=tmax > 0.0,    # padded lanes carry tmax <= 0
        )

        if instanced and not inst_major:
            # pre-transform the sub-packet into every instance frame ONCE
            # (the map is affine, so the hit parameter t is world-invariant
            # and d' stays unnormalized — Moller-Trumbore is exact either
            # way). ~35 vector ops + 12 scalar broadcasts per instance,
            # amortized over the whole walk.
            for i in range(n_inst):
                m = [aux[i, k] for k in range(12)]
                tox = m[0] * rox + m[1] * roy + m[2] * roz + m[3]
                toy = m[4] * rox + m[5] * roy + m[6] * roz + m[7]
                toz = m[8] * rox + m[9] * roy + m[10] * roz + m[11]
                tdx = m[0] * rdx + m[1] * rdy + m[2] * rdz
                tdy = m[4] * rdx + m[5] * rdy + m[6] * rdz
                tdz = m[8] * rdx + m[9] * rdy + m[10] * rdz
                tix = _safe_inv(tdx)
                tiy = _safe_inv(tdy)
                tiz = _safe_inv(tdz)
                comps = (tox, toy, toz, tdx, tdy, tdz, tix, tiy, tiz,
                         tox * tix, toy * tiy, toz * tiz)
                base = j * n_inst * 12 * rows
                for c, v in enumerate(comps):
                    xray[pl.ds(base + i * 12 * rows + c * rows, rows),
                         :] = v
        return ctx

    def ray_comps(ctx, inst, c0, k=3):
        """k consecutive ray components [rows, 128] of instance
        `inst` (traced scalar), starting at comp id c0. inst=None reads
        the ctx's direct comps — the flat walk, and the instance-major
        walk whose ctx carries the CURRENT instance's comps in
        registers."""
        if not instanced or inst is None:
            return ctx["direct"][c0:c0 + k]
        off = ctx["j"] * n_inst * 12 * rows + inst * (12 * rows)
        return tuple(xray[pl.ds(off + (c0 + jj) * rows, rows), :]
                     for jj in range(k))

    def node_tests(ctx, row, base, best_t, inst=None):
        """8 child slab tests of one node row: every term is an
        [8 children, 128] x [1, 128] broadcast against a ray ROW — a
        scalar-load + scalar->vector broadcast per field measured
        ~10-15 cycles EACH on v5e (56/node dominated the old step).

        Returns ([1,128] meta_lane, [1,128] dist_lane): child c's
        effective meta (0 when unhit/empty) and packet-min entry
        distance staged at LANE base+c, ready for the vector-side
        near-first ranking in `body` (sublane->lane move via the
        iota-select + sum-over-sublanes trick).

        STREAMED mode decodes the bf16-packed quarter-row node
        record: each box axis is two directed-rounded bf16s in one
        f32 bit carrier (min high half, max low half —
        bvh8.pack_nodes4)."""
        if streamed:
            row8 = jnp.broadcast_to(tab[pl.ds(row >> 2, 1), :],
                                    (8, LANES))
            idxc = child4 + (row & 3) * 32

            def unpack(off):
                v = jax.lax.bitcast_convert_type(
                    jnp.take_along_axis(row8, idxc + off, axis=1),
                    jnp.int32)
                mn = jax.lax.bitcast_convert_type(v & HIMASK,
                                                  jnp.float32)
                mx = jax.lax.bitcast_convert_type(
                    jnp.left_shift(v, 16), jnp.float32)
                return mn, mx

            bx0, bx1 = unpack(0)
            by0, by1 = unpack(1)
            bz0, bz1 = unpack(2)
            metac = jnp.take_along_axis(row8, idxc + 3, axis=1)
        else:
            row8 = jnp.broadcast_to(tab[pl.ds(row, 1), :], (8, LANES))

            def fld(f):
                return jnp.take_along_axis(row8, child8 + f, axis=1)

            bx0, by0, bz0 = fld(0), fld(1), fld(2)
            bx1, by1, bz1 = fld(3), fld(4), fld(5)
            metac = fld(6)
        nix, niy, niz = ray_comps(ctx, inst, 6)
        noix, noiy, noiz = ray_comps(ctx, inst, 9)
        h_any = None
        dmin = None
        for rr in range(rows):
            # slab planes as FMAs: box*inv - o*inv, with o*inv
            # hoisted out of the while loop (oix/oiy/oiz) — one VPU
            # op per plane instead of sub+mul
            t1 = bx0 * nix[rr:rr + 1, :] - noix[rr:rr + 1, :]
            t2 = bx1 * nix[rr:rr + 1, :] - noix[rr:rr + 1, :]
            tn = jnp.minimum(t1, t2)
            tf = jnp.maximum(t1, t2)
            t1 = by0 * niy[rr:rr + 1, :] - noiy[rr:rr + 1, :]
            t2 = by1 * niy[rr:rr + 1, :] - noiy[rr:rr + 1, :]
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
            t1 = bz0 * niz[rr:rr + 1, :] - noiz[rr:rr + 1, :]
            t2 = bz1 * niz[rr:rr + 1, :] - noiz[rr:rr + 1, :]
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
            hit = (tf > 1e-5) & (tn <= tf) \
                & (tn <= best_t[rr:rr + 1, :]) \
                & ctx["live"][rr:rr + 1, :]
            h = jnp.where(hit, 1, 0)
            h_any = h if h_any is None else jnp.maximum(h_any, h)
            d = jnp.where(hit, tn, BIG)
            dmin = d if dmin is None else jnp.minimum(dmin, d)
        # packet aggregates per child: any-lane hit, min-over-lanes tn
        h_red = jnp.max(h_any, axis=1, keepdims=True)      # [8, 1]
        d_red = jnp.min(dmin, axis=1, keepdims=True)       # [8, 1]
        # meta == 0 marks an empty child slot (whose inverted bbox
        # alone does NOT fail the slab test: -inf <= +inf)
        meta_col = metac[:, 0:1]                           # lane-uniform
        meta_eff = jnp.where((h_red > 0) & (meta_col != 0.0),
                             meta_col, 0.0)
        d_red = jnp.where(meta_eff != 0.0, d_red, BIG)
        # sublane->lane: child c's [8,1] packet-aggregate lands at
        # lane base+c of a [1,128] row (select-by-iota, sum over
        # sublanes — Mosaic has no shape-cast for this move)
        sel = lane8 == (sub8 + base)
        meta_lane = jnp.sum(jnp.where(sel, meta_eff, 0.0),
                            axis=0, keepdims=True)
        dist_lane = jnp.sum(jnp.where(sel, d_red, 0.0),
                            axis=0, keepdims=True)
        return meta_lane, dist_lane

    def leaf_tests(ctx, rows_nl, best_t, insts=None, base0=None):
        """All 8 slots of each popped leaf row ([1, 128] arrays) vs
        every ray row, in the transposed [8 slots, 128] x [1, 128
        rays] broadcast form, reduced over slots per ray row and
        reassembled to [rows, 128]. In instanced mode each leaf row
        carries its own instance (insts, traced scalars): rays come
        from that instance's pre-transformed slice and the
        BLAS-local pid gets the instance's global slot base added."""
        # the field decode is ~14 lane-gathers per leaf row — a big
        # slice of the iteration's instruction budget (header audit).
        # Single-primitive-type scenes skip the type discriminator
        # and the fields their test never reads (tri: -3 gathers).
        multi = (int(has_tri) + int(has_sph) + int(has_lin)) > 1
        need_ab = has_tri or has_lin
        need_r = has_sph or has_lin
        cols = []
        for li, row in enumerate(rows_nl):
            row8 = jnp.broadcast_to(row, (8, LANES))

            def g(f, row8=row8):
                return jnp.take_along_axis(row8, slot16 + f, axis=1)

            inst = insts[li] if (instanced and insts is not None) \
                else None
            crox, croy, croz, crdx, crdy, crdz = ray_comps(ctx, inst,
                                                           0, 6)
            cols.append(dict(
                v0x=g(0), v0y=g(1), v0z=g(2),
                ax=g(3) if need_ab else None,
                ay=g(4) if need_ab else None,
                az=g(5) if need_ab else None,
                bx=g(6) if has_tri else None,
                by=g(7) if has_tri else None,
                bz=g(8) if has_tri else None,
                ptype=g(9) if multi else None,
                r0=g(10) if need_r else None,
                r1=g(11) if has_lin else None,
                pid=g(12), valid=g(13),
                rox=crox, roy=croy, roz=croz,
                rdx=crdx, rdy=crdy, rdz=crdz,
                base=(base0 if base0 is not None
                      else (aux[inst, 13] if inst is not None
                            else 0.0))))
        t_rows = []
        p_rows = []
        for rr in range(rows):
            tmin_r = ctx["tmin"][rr:rr + 1, :]
            bt_r = best_t[rr:rr + 1, :]
            live_r = ctx["live"][rr:rr + 1, :]
            tm_best = None
            pm_best = None
            for cc in cols:
                ro_x = cc["rox"][rr:rr + 1, :]
                ro_y = cc["roy"][rr:rr + 1, :]
                ro_z = cc["roz"][rr:rr + 1, :]
                rd_x = cc["rdx"][rr:rr + 1, :]
                rd_y = cc["rdy"][rr:rr + 1, :]
                rd_z = cc["rdz"][rr:rr + 1, :]
                ok = None
                t = None
                if has_tri:
                    # Moller-Trumbore (mesh.h:45-67); every product is
                    # a [8,1] x [1,128] rank-1 broadcast
                    s1x = cc["bz"] * rd_y - cc["by"] * rd_z
                    s1y = cc["bx"] * rd_z - cc["bz"] * rd_x
                    s1z = cc["by"] * rd_x - cc["bx"] * rd_y
                    div = s1x * cc["ax"] + s1y * cc["ay"] \
                        + s1z * cc["az"]
                    okt = jnp.abs(div) >= 1e-8
                    inv = 1.0 / jnp.where(okt, div, 1.0)
                    sx = ro_x - cc["v0x"]
                    sy = ro_y - cc["v0y"]
                    sz = ro_z - cc["v0z"]
                    b1 = (sx * s1x + sy * s1y + sz * s1z) * inv
                    s2x = sy * cc["az"] - sz * cc["ay"]
                    s2y = sz * cc["ax"] - sx * cc["az"]
                    s2z = sx * cc["ay"] - sy * cc["ax"]
                    b2 = (rd_x * s2x + rd_y * s2y + rd_z * s2z) * inv
                    tt = (cc["bx"] * s2x + cc["by"] * s2y
                          + cc["bz"] * s2z) * inv
                    okt &= (b1 >= 0.0) & (b1 <= 1.0) & (b2 >= 0.0) \
                        & (b1 + b2 <= 1.0) & (tt >= tmin_r) \
                        & (tt <= bt_r)
                    if multi:
                        okt &= cc["ptype"] == 0.0
                    ok, t = okt, tt
                if has_sph:
                    # sphere quadratic (sphere.h:26-94)
                    opx = ro_x - cc["v0x"]
                    opy = ro_y - cc["v0y"]
                    opz = ro_z - cc["v0z"]
                    bq = opx * rd_x + opy * rd_y + opz * rd_z
                    cq = opx * opx + opy * opy + opz * opz \
                        - cc["r0"] * cc["r0"]
                    delta = bq * bq - cq
                    oks = delta >= 0.0
                    sq = jnp.sqrt(jnp.maximum(delta, 0.0))
                    tq1 = -bq - sq
                    tq2 = -bq + sq
                    use1 = tq1 > tmin_r
                    ts = jnp.where(use1, tq1, tq2)
                    oks &= (ts > 0.0) & (ts <= bt_r)
                    oks &= use1 | (tq1 > 0.0) | (tq2 > tmin_r)
                    if multi:
                        oks &= cc["ptype"] == 2.0
                    ok = oks if ok is None else ok | oks
                    t = ts if t is None else jnp.where(oks, ts, t)
                if has_lin:
                    # ray/segment closest approach (line.h:33-87)
                    vx = cc["ax"] - cc["v0x"]
                    vy = cc["ay"] - cc["v0y"]
                    vz = cc["az"] - cc["v0z"]
                    wx = ro_x - cc["v0x"]
                    wy = ro_y - cc["v0y"]
                    wz = ro_z - cc["v0z"]
                    aa = rd_x * rd_x + rd_y * rd_y + rd_z * rd_z
                    bb = rd_x * vx + rd_y * vy + rd_z * vz
                    ccd = vx * vx + vy * vy + vz * vz
                    dd = rd_x * wx + rd_y * wy + rd_z * wz
                    ee = vx * wx + vy * wy + vz * wz
                    det = aa * ccd - bb * bb
                    okl = det != 0.0
                    det_s = jnp.where(okl, det, 1.0)
                    tl = (bb * ee - ccd * dd) / det_s
                    sl2 = jnp.clip((aa * ee - bb * dd) / det_s,
                                   0.0, 1.0)
                    okl &= (tl >= tmin_r) & (tl <= bt_r)
                    prx = wx + rd_x * tl - vx * sl2
                    pry = wy + rd_y * tl - vy * sl2
                    prz = wz + rd_z * tl - vz * sl2
                    d2 = prx * prx + pry * pry + prz * prz
                    rrad = cc["r0"] * (1.0 - sl2) + cc["r1"] * sl2
                    okl &= d2 <= rrad * rrad
                    if multi:
                        okl &= cc["ptype"] == 1.0
                    ok = okl if ok is None else ok | okl
                    t = tl if t is None else jnp.where(okl, tl, t)
                ok &= (cc["valid"] != 0.0) & live_r
                tm = jnp.where(ok, t, jnp.inf)            # [8, 128]
                t_min = jnp.min(tm, axis=0, keepdims=True)
                pm = jnp.max(jnp.where(tm == t_min, cc["pid"], -1.0),
                             axis=0, keepdims=True)
                # instanced: BLAS-local pid + instance slot base
                # = GLOBAL
                pm = jnp.where(t_min < jnp.inf, pm + cc["base"], -1.0)
                if tm_best is None:
                    tm_best, pm_best = t_min, pm
                else:
                    take = t_min < tm_best
                    tm_best = jnp.where(take, t_min, tm_best)
                    pm_best = jnp.where(take, pm, pm_best)
            t_rows.append(tm_best)
            p_rows.append(pm_best)
        return (jnp.concatenate(t_rows, axis=0),
                jnp.concatenate(p_rows, axis=0))

    def start_leaf_copies(ls):
        for i, li in enumerate(ls):
            pltpu.make_async_copy(tab_hbm.at[pl.ds(li, 1)],
                                  lbuf.at[pl.ds(i, 1)],
                                  lsems[i]).start()

    def wait_leaf_copies():
        for i in range(nl):
            pltpu.make_async_copy(tab_hbm.at[pl.ds(0, 1)],
                                  lbuf.at[pl.ds(i, 1)],
                                  lsems[i]).wait()


    def walk_group(g):
        """Walk `fuse` sub-packets (block rows [g*fuse*rows, +fuse*rows))
        in ONE while loop. Each sub-packet keeps its own stacks, best_t
        and pop/push phases; the phases of different sub-packets have no
        data dependencies, so the VLIW scheduler can pack one packet's
        scalar push/pop chain with another's vector row tests — the
        round-trip (pop -> row test -> rank -> push) latency that bounds
        the single-packet walk amortizes across the group."""
        ctxs = [make_ctx(g * fuse + jj, jj) for jj in range(fuse)]

        def cond(state):
            return state[0]

        def body(state):
            bts = list(state[1:1 + fuse])
            bps = list(state[1 + fuse:])
            # Instanced entries decode as (row, inst) = (e // S, e % S);
            # the dummy entry rides instance 0 (identity).
            dummy_e = dummy * S if instanced else dummy
            ldummy_e = ldummy * S if instanced else ldummy

            # PHASE 1 per sub-packet: pop up to nn nodes and nl leaves
            # (DUMMY when short) from its stack segment, fetch leaf rows
            # (VMEM reads in RESIDENT mode; in STREAMED mode test the rows
            # whose DMAs started last iteration — a one-iteration software
            # pipeline hides the HBM latency; the first wait consumes the
            # dummy-row priming copies).
            popped = []
            for j in range(fuse):
                rows_nl = None
                if streamed:
                    wait_leaf_copies()
                    rows_nl = tuple(lbuf[i:i + 1, :] for i in range(nl))
                sn = sps[2 * j]
                nes = [jnp.where(sn > i,
                                 nstack[j * NSTACK
                                        + jnp.maximum(sn - 1 - i, 0)],
                                 dummy_e) for i in range(nn)]
                sps[2 * j] = jnp.maximum(sn - nn, 0)
                sl = sps[2 * j + 1]
                les = [jnp.where(sl > i,
                                 lstack[j * LSTACK
                                        + jnp.maximum(sl - 1 - i, 0)],
                                 ldummy_e) for i in range(nl)]
                sps[2 * j + 1] = jnp.maximum(sl - nl, 0)
                if instanced:
                    # S = 2048: decode via shift/mask (scalar int div/mod
                    # lowers poorly in Mosaic)
                    nps = [jax.lax.shift_right_logical(e, 11) for e in nes]
                    nis = [jax.lax.bitwise_and(e, S - 1) for e in nes]
                    lps = [jax.lax.shift_right_logical(e, 11) for e in les]
                    lis = [jax.lax.bitwise_and(e, S - 1) for e in les]
                else:
                    nps, nis = nes, [None] * nn
                    lps, lis = les, None
                if streamed:
                    start_leaf_copies(lps)
                else:
                    rows_nl = tuple(tab[pl.ds(li, 1), :] for li in lps)
                popped.append((nps, nis, lps, lis, rows_nl))

            # PHASE 2 per sub-packet: vector row tests, best_t/p update,
            # NEAR-FIRST ordering of this iteration's <=ncand pushes
            # (measured on the dragon BVH8: 857 -> 186 iters/packet on
            # incoherent rays, tools/sim_walk.py): rank the candidates by
            # packet-min entry distance, then push far-to-near so the
            # nearest node pops first and tightens best_t before the rest
            # are popped. All vector-side: rank_c = #{j : (dist_j, j) <
            # (dist_c, c)} is an [ncand,128] compare + sublane sum; the
            # permuted metas are a one-hot lane sum scattered to sublane
            # rank_c, staged in mscr segment j for phase 3's scalar loads.
            for j in range(fuse):
                nps, nis, lps, lis, rows_nl = popped[j]
                node_md = [node_tests(ctxs[j], nps[i], 8 * i, bts[j],
                                      nis[i]) for i in range(nn)]
                t_cand, p_cand = leaf_tests(ctxs[j], rows_nl, bts[j], lis)
                upd = t_cand < jnp.inf   # ok already implies t <= best_t
                bts[j] = jnp.where(upd, t_cand, bts[j])
                bps[j] = jnp.where(upd, p_cand, bps[j])

                meta_lane = node_md[0][0]        # disjoint lanes per node
                dist_lane = node_md[0][1]
                for md, dd in node_md[1:]:
                    meta_lane = meta_lane + md
                    dist_lane = dist_lane + dd
                if slot_order:
                    # A/B reference policy: child-slot order (the
                    # pre-ordering kernel's behavior — last child pops
                    # first)
                    rank = (ncand - 1) - laneC[0:1, :]
                else:
                    dC = jnp.take_along_axis(
                        jnp.broadcast_to(dist_lane, (ncand, LANES)), subC,
                        axis=1)
                    lt = (dC < dist_lane) \
                        | ((dC == dist_lane) & (subC < laneC))
                    rank = jnp.sum(jnp.where(lt, 1, 0), axis=0,
                                   keepdims=True)
                oh = (jnp.broadcast_to(rank, (ncand, LANES)) == subC) \
                    & (laneC < ncand)
                perm = jnp.sum(
                    jnp.where(oh,
                              jnp.broadcast_to(meta_lane, (ncand, LANES)),
                              0.0),
                    axis=1, keepdims=True)       # sublane r = rank-r meta
                msk = 2 * ncand if instanced else ncand
                mscr[pl.ds(j * msk, ncand), :] = jnp.broadcast_to(
                    perm, (ncand, LANES))
                if instanced:
                    # the ranking divorces a candidate from the pop it
                    # came from, but the push decode needs the SOURCE
                    # pop's instance and TLAS-ness — permute the source
                    # index (candidate lane // 8) alongside the metas
                    src_row = (laneC[0:1, :] // 8).astype(jnp.float32)
                    perm_src = jnp.sum(
                        jnp.where(oh, jnp.broadcast_to(src_row,
                                                       (ncand, LANES)),
                                  0.0),
                        axis=1, keepdims=True)
                    mscr[pl.ds(j * msk + ncand, ncand), :] = \
                        jnp.broadcast_to(perm_src, (ncand, LANES))

            # PHASE 3 per sub-packet: branch-free scalar pushes — ALWAYS
            # store at the stack top, advance the pointer only when the
            # candidate is real (meta != 0 folds the hit flag in); a
            # `pl.when` per child measured ~100 ns of branch overhead
            # each; stale writes above sp are never read. The farthest
            # rank (or dummy) pushes first, rank 0 lands on top. This
            # scalar chain is independent across sub-packets, so it packs
            # into the VLIW slots left by the other sub-packets' vector
            # phases.
            more = None
            for j in range(fuse):
                nps, nis, lps, lis, rows_nl = popped[j]
                sn = jnp.minimum(sps[2 * j], NSTACK - 1)
                sl = jnp.minimum(sps[2 * j + 1], LSTACK - 1)
                if instanced:
                    is_tlas = [nps[i] < tlas_rows for i in range(nn)]
                msk = 2 * ncand if instanced else ncand
                for r in range(ncand - 1, -1, -1):
                    meta = mscr[j * msk + r, 0].astype(jnp.int32)
                    if instanced:
                        # TLAS rows have no leaf children: negative meta
                        # there is an INSTANCE entry -(i+1) -> push (blas
                        # root of i, i); positive meta is a TLAS subrow
                        # (rides instance 0, which TLAS pops always
                        # carry). BLAS rows keep the flat conventions with
                        # the popped row's instance inherited — resolved
                        # through the PERMUTED source-pop index (ranking
                        # reorders candidates across pops; indexing by
                        # r // 8 here was the nn>1 instanced bug).
                        srci = mscr[j * msk + ncand + r,
                                    0].astype(jnp.int32)
                        it = is_tlas[0]
                        inst_s = nis[0]
                        for i in range(1, nn):
                            sel = srci == i
                            it = jnp.where(sel, is_tlas[i], it)
                            inst_s = jnp.where(sel, nis[i], inst_s)
                        im = jnp.maximum(-meta - 1, 0)
                        root = aux[im, 12].astype(jnp.int32)
                        ne = jnp.where(it & (meta < 0), root * S + im,
                                       meta * S + inst_s)
                        push_n = jnp.where(it, meta != 0, meta > 0)
                        le = (-meta) * S + inst_s
                        push_l = (~it) & (meta < 0)
                    else:
                        ne, le = meta, -meta
                        push_n, push_l = meta > 0, meta < 0
                    nstack[j * NSTACK + sn] = ne
                    sn = jnp.minimum(sn + jnp.where(push_n, 1, 0),
                                     NSTACK - 1)
                    lstack[j * LSTACK + sl] = le
                    sl = jnp.minimum(sl + jnp.where(push_l, 1, 0),
                                     LSTACK - 1)
                sps[2 * j] = sn
                sps[2 * j + 1] = sl

                mj = (sn > 0) | (sl > 0)
                if streamed:
                    # the leaf rows now in flight still need their test
                    for li in lps:
                        mj |= li != ldummy
                if any_hit:
                    # one vector->scalar sync: any live lane still unhit?
                    mj &= jnp.max(jnp.where((bps[j] < 0.0)
                                            & ctxs[j]["live"], 1, 0)) > 0
                more = mj if more is None else more | mj
            return (more, *bts, *bps)

        for j in range(fuse):
            sps[2 * j] = 1      # node stack: root row 0 pre-pushed
            sps[2 * j + 1] = 0  # leaf stack
            nstack[j * NSTACK] = 0
        if streamed:
            # prime the pipeline with dummy-row copies so the first body
            # iteration's wait/test pair is uniform
            start_leaf_copies([ldummy] * nl)
        state = (jnp.bool_(True),) \
            + tuple(c["tmax"] for c in ctxs) \
            + tuple(jnp.full((rows, LANES), -1.0, jnp.float32)
                    for _ in ctxs)
        out = jax.lax.while_loop(cond, body, state)
        if streamed:
            # drain the copies started by the final iteration so the DMA
            # semaphores are balanced before the next grid step
            wait_leaf_copies()
        for j, ctx in enumerate(ctxs):
            t_out[ctx["sl"], :] = out[1 + j]
            p_out[ctx["sl"], :] = out[1 + fuse + j]

    def walk_group_instmajor(g):
        """Instance-major instanced walk: order instances near-first by
        packet-min world-bbox entry, then walk each instance's BLAS to
        completion with the FLAT body — the packet's rays transformed
        into the instance frame ONCE into registers, plain row stack
        entries, uniform leaf pid base. The interleaved policy measured
        5.4 us/iter vs the flat body's 1.48 (tools/bench_tlas_walk.py:
        every pop re-loads 6 ray comps from the xray scratch at a
        dynamic sublane offset) for only ~10% fewer iterations
        (tools/sim_tlas.py) — instance-major takes the iteration hit to
        run at flat cost. Whole instances are skipped when their
        packet-min entry exceeds the packet-max best_t at switch time.
        """
        ctx = make_ctx(g, 0)
        (rox, roy, roz, rdx, rdy, rdz,
         ix, iy, iz, oix, oiy, oiz) = ctx["direct"]
        live = ctx["live"]
        tmax0 = ctx["tmax"]

        # phase 0: packet-min entry distance per instance (world-frame
        # slab test of the instance's exact world bbox, aux cols 14:20)
        ds = []
        for i in range(n_inst):
            t1 = aux[i, 14] * ix - oix
            t2 = aux[i, 17] * ix - oix
            tn = jnp.minimum(t1, t2)
            tf = jnp.maximum(t1, t2)
            t1 = aux[i, 15] * iy - oiy
            t2 = aux[i, 18] * iy - oiy
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
            t1 = aux[i, 16] * iz - oiz
            t2 = aux[i, 19] * iz - oiz
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
            hit = (tf > 1e-5) & (tn <= tf) & live & (tn <= tmax0)
            d = jnp.min(jnp.where(hit, jnp.maximum(tn, 0.0), BIG))
            ds.append((d, jnp.int32(i)))
        # near-first instance order: odd-even transposition network
        # (n_inst is static and small; traced-scalar compare-swaps)
        for r in range(n_inst):
            for k in range(r % 2, n_inst - 1, 2):
                (da, ia), (db, ib) = ds[k], ds[k + 1]
                sw = da > db
                ds[k] = (jnp.where(sw, db, da), jnp.where(sw, ib, ia))
                ds[k + 1] = (jnp.where(sw, da, db),
                             jnp.where(sw, ia, ib))
        for k in range(n_inst):
            ient[k] = ds[k][0]
            iid[k] = ds[k][1]

        def outer(k, carry):
            bt, bp = carry
            ii = iid[k]
            dk = ient[k]
            # whole-instance skip: packet-min entry beyond every live
            # lane's current best (entries ascend, but best_t shrinks,
            # so each instance re-checks)
            go = dk < BIG
            go &= dk <= jnp.max(jnp.where(live, bt, -BIG))
            if any_hit:
                go &= jnp.max(jnp.where((bp < 0.0) & live, 1, 0)) > 0
            m = [aux[ii, c] for c in range(12)]
            tox = m[0] * rox + m[1] * roy + m[2] * roz + m[3]
            toy = m[4] * rox + m[5] * roy + m[6] * roz + m[7]
            toz = m[8] * rox + m[9] * roy + m[10] * roz + m[11]
            tdx = m[0] * rdx + m[1] * rdy + m[2] * rdz
            tdy = m[4] * rdx + m[5] * rdy + m[6] * rdz
            tdz = m[8] * rdx + m[9] * rdy + m[10] * rdz
            tix = _safe_inv(tdx)
            tiy = _safe_inv(tdy)
            tiz = _safe_inv(tdz)
            ctx_i = dict(
                j=0,
                direct=(tox, toy, toz, tdx, tdy, tdz, tix, tiy, tiz,
                        tox * tix, toy * tiy, toz * tiz),
                tmin=ctx["tmin"], tmax=tmax0, live=live)
            lbase = aux[ii, 13]
            sps[0] = jnp.where(go, 1, 0)
            sps[1] = 0
            nstack[0] = aux[ii, 12].astype(jnp.int32)

            def icond(st):
                return st[0]

            def ibody(st):
                _, bt, bp = st
                # pop phase (flat conventions: plain row entries)
                sn = sps[0]
                nes = [jnp.where(sn > i,
                                 nstack[jnp.maximum(sn - 1 - i, 0)],
                                 dummy) for i in range(nn)]
                sps[0] = jnp.maximum(sn - nn, 0)
                sl = sps[1]
                les = [jnp.where(sl > i,
                                 lstack[jnp.maximum(sl - 1 - i, 0)],
                                 ldummy) for i in range(nl)]
                sps[1] = jnp.maximum(sl - nl, 0)
                rows_nl = tuple(tab[pl.ds(li, 1), :] for li in les)
                node_md = [node_tests(ctx_i, nes[i], 8 * i, bt, None)
                           for i in range(nn)]
                t_cand, p_cand = leaf_tests(ctx_i, rows_nl, bt, None,
                                            base0=lbase)
                upd = t_cand < jnp.inf
                bt = jnp.where(upd, t_cand, bt)
                bp = jnp.where(upd, p_cand, bp)
                # near-first push ranking (same idiom as the flat body)
                meta_lane, dist_lane = node_md[0]
                for md, dd in node_md[1:]:
                    meta_lane = meta_lane + md
                    dist_lane = dist_lane + dd
                dC = jnp.take_along_axis(
                    jnp.broadcast_to(dist_lane, (ncand, LANES)), subC,
                    axis=1)
                lt = (dC < dist_lane) \
                    | ((dC == dist_lane) & (subC < laneC))
                rank = jnp.sum(jnp.where(lt, 1, 0), axis=0,
                               keepdims=True)
                oh = (jnp.broadcast_to(rank, (ncand, LANES)) == subC) \
                    & (laneC < ncand)
                perm = jnp.sum(
                    jnp.where(oh, jnp.broadcast_to(meta_lane,
                                                   (ncand, LANES)),
                              0.0),
                    axis=1, keepdims=True)
                mscr[pl.ds(0, ncand), :] = jnp.broadcast_to(
                    perm, (ncand, LANES))
                # branch-free scalar pushes, far-to-near
                sn = jnp.minimum(sps[0], NSTACK - 1)
                sl = jnp.minimum(sps[1], LSTACK - 1)
                for r in range(ncand - 1, -1, -1):
                    meta = mscr[r, 0].astype(jnp.int32)
                    nstack[sn] = meta
                    sn = jnp.minimum(sn + jnp.where(meta > 0, 1, 0),
                                     NSTACK - 1)
                    lstack[sl] = -meta
                    sl = jnp.minimum(sl + jnp.where(meta < 0, 1, 0),
                                     LSTACK - 1)
                sps[0] = sn
                sps[1] = sl
                more = (sn > 0) | (sl > 0)
                if any_hit:
                    more &= jnp.max(jnp.where((bp < 0.0) & live,
                                              1, 0)) > 0
                return (more, bt, bp)

            st = jax.lax.while_loop(icond, ibody, (go, bt, bp))
            return (st[1], st[2])

        bt, bp = jax.lax.fori_loop(
            0, n_inst, outer,
            (tmax0, jnp.full((rows, LANES), -1.0, jnp.float32)))
        t_out[ctx["sl"], :] = bt
        p_out[ctx["sl"], :] = bp

    for g in range(subpk // fuse):
        if instanced and inst_major:
            walk_group_instmajor(g)
        else:
            walk_group(g)


@functools.partial(
    jax.jit, static_argnames=("has_tri", "has_sph", "has_lin", "any_hit",
                              "n8", "interpret", "slot_order", "packet_w",
                              "nn", "nl", "n_inst", "tlas_rows", "fuse",
                              "inst_major"))
def _packet_tpu_call(table, nodes4, aux, ro, rd, tmin, tmax, *, has_tri,
                     has_sph, has_lin, any_hit, n8=None, interpret=False,
                     slot_order=False, packet_w=PACKET_W, nn=NN, nl=NL,
                     n_inst=0, tlas_rows=0, fuse=FUSE, inst_major=False):
    assert not (n_inst and n8 is not None), \
        "instanced walk is resident-only"
    n = ro.shape[0]
    rows = packet_w // LANES
    assert rows >= 1 and (rows % BLOCK_ROWS == 0
                          or BLOCK_ROWS % rows == 0), packet_w
    block_rows = max(rows, BLOCK_ROWS)
    subpk = block_rows // rows
    if n8 is not None or fuse > subpk or (n_inst and inst_major):
        # streamed: single lbuf; instance-major: one fori/while nest per
        # sub-packet (no fused groups)
        fuse = 1 if (n8 is not None or (n_inst and inst_major)) else subpk
    assert subpk % fuse == 0, (subpk, fuse)
    blk = block_rows * LANES
    n_pad = (n + blk - 1) // blk * blk

    def prep(a):
        return jnp.pad(a, (0, n_pad - n)).reshape(-1, LANES)

    comps = [prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
             prep(rd[:, 0]), prep(rd[:, 1]), prep(rd[:, 2]),
             prep(jnp.broadcast_to(tmin, (n,))),
             prep(jnp.broadcast_to(tmax, (n,)))]
    g = n_pad // blk

    ray_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.ANY)

    n_rows = table.shape[0]
    resident_rows = n_rows if n8 is None else nodes4.shape[0]
    scratch = [
        pltpu.VMEM((resident_rows, LANES), jnp.float32),
        pltpu.SMEM((NSTACK,), jnp.int32),
        pltpu.SMEM((LSTACK,), jnp.int32),
        pltpu.SMEM((2,), jnp.int32),
        pltpu.SemaphoreType.DMA(()),
        # rank-permuted metas (+ permuted source-pop indices in the
        # interleaved instanced policy)
        pltpu.VMEM((fuse * 8 * nn
                    * (2 if (n_inst and not inst_major) else 1), LANES),
                   jnp.float32),
    ]
    inputs = (table,)
    in_specs = [tab_spec]
    if n8 is not None:
        scratch += [
            pltpu.VMEM((max(nl, 8), LANES), jnp.float32),  # leaf DMA buffer
        ] + [pltpu.SemaphoreType.DMA(())] * nl
        inputs = (nodes4, table)
        in_specs = [tab_spec, tab_spec]
    elif n_inst:
        # instance aux table: whole [n_inst, 128] in VMEM every grid step
        # (scalar-loaded: xforms, roots, bases, world bboxes). Policy
        # scratch: instance-major stages the sorted near-first instance
        # order in SMEM; interleaved pre-transforms the packet's rays
        # into every instance frame (12 comps x rows per instance).
        n_inst_pad = (n_inst + 7) // 8 * 8   # sublane-aligned block
        aux_pad = jnp.pad(aux, ((0, n_inst_pad - aux.shape[0]),
                                (0, LANES - aux.shape[1])))
        if inst_major:
            scratch += [pltpu.SMEM((n_inst,), jnp.float32),
                        pltpu.SMEM((n_inst,), jnp.int32)]
        else:
            scratch += [pltpu.VMEM((n_inst * 12 * rows, LANES),
                                   jnp.float32)]
        inputs = (table, aux_pad)
        in_specs = [tab_spec,
                    pl.BlockSpec((n_inst_pad, LANES), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)]
    kernel = functools.partial(
        _walk_kernel, has_tri=has_tri, has_sph=has_sph, has_lin=has_lin,
        any_hit=any_hit, n8=n8, slot_order=slot_order, rows=rows,
        subpk=subpk, nn=nn, nl=nl, n_inst=n_inst, tlas_rows=tlas_rows,
        inst_major=inst_major)
    t, p = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=in_specs + [ray_spec] * 8,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=resident_rows * LANES * 4 + 4 * 1024 * 1024),
        interpret=interpret,
    )(*inputs, *comps)
    t = t.reshape(-1)[:n]
    p = p.reshape(-1)[:n].astype(jnp.int32)
    return t, p, p >= 0


def supports(scene, static) -> bool:
    if getattr(static, "bvh8_n_inst", 0):
        return True   # instanced tables are resident by construction
    rows = int(scene.bvh8_table.shape[0])
    if rows <= RESIDENT_MAX_ROWS:
        return True
    return (static.bvh8_n8 + 3) // 4 + 1 <= NODE4_MAX_ROWS


def packet_traverse(scene, static, ro, rd, tmin, tmax, any_hit: bool,
                    interpret: bool = False, force_streamed: bool = False,
                    slot_order: bool = False, nn: int | None = None,
                    nl: int | None = None, packet_w: int | None = None,
                    fuse: int | None = None):
    """Drop-in for geom.packet.packet_traverse on the TPU backend.

    slot_order=True selects the unordered push policy (A/B baseline for
    tools/bench_walkcost.py); the default near-first ordering is always
    better or equal (tools/sim_walk.py). nn/nl select the per-iteration
    pop widths; packet_w the rays per walk (sub-packets of an 8-row
    block below 1024 — tools/sim_walk_stats.py). None reads the module
    config at TRACE time (not import time) so harnesses can retrace
    both configs in one process (interleaved timing is the only
    trustworthy comparison on the shared chip)."""
    nn = NN if nn is None else nn
    nl = NL if nl is None else nl
    if packet_w is None:
        packet_w = (PACKET_W_INST if getattr(static, "bvh8_n_inst", 0)
                    else PACKET_W)
    fuse = FUSE if fuse is None else fuse
    n = ro.shape[0]
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tmax_b = jnp.asarray(tmax, jnp.float32) * jnp.ones(n, jnp.float32)
    n_inst = getattr(static, "bvh8_n_inst", 0)
    if n_inst:
        return _packet_tpu_call(
            scene.bvh8_table, scene.bvh8_nodes4, scene.bvh8_aux,
            ro, rd, tmin_b, tmax_b,
            has_tri=static.has_triangles, has_sph=static.has_spheres,
            has_lin=static.has_lines, any_hit=any_hit, n8=None,
            interpret=interpret, slot_order=slot_order, nn=nn, nl=nl,
            packet_w=packet_w, fuse=fuse, n_inst=n_inst,
            tlas_rows=static.bvh8_tlas_rows, inst_major=bool(INST_MAJOR))
    rows = int(scene.bvh8_table.shape[0])
    n8 = None
    if force_streamed or rows > RESIDENT_MAX_ROWS:
        n8 = static.bvh8_n8
    return _packet_tpu_call(
        scene.bvh8_table, scene.bvh8_nodes4, None, ro, rd, tmin_b, tmax_b,
        has_tri=static.has_triangles, has_sph=static.has_spheres,
        has_lin=static.has_lines, any_hit=any_hit, n8=n8,
        interpret=interpret, slot_order=slot_order, nn=nn, nl=nl,
        packet_w=packet_w, fuse=fuse)
