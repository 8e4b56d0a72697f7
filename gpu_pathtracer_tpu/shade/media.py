"""Participating media: homogeneous + heterogeneous (delta tracking).

Wavefront re-expression of the reference media (medium.h:9-179) and the
interface-walking transmittance estimator Tr (pathtracer.cu:298-322):

- `medium_sample`: distance sampling inside the lane's current medium —
  homogeneous analytic (luminance-averaged sigma_t exponential,
  medium.h:40-48) or heterogeneous delta tracking (medium.h:133-157).
- `medium_tr`: transmittance through ONE medium segment — Beer-Lambert
  (homogeneous) or delta / ratio / residual-ratio tracking selected per
  medium (medium.h:64-131).
- `transmittance`: the shadow-ray walker that crosses material-less
  interface boundaries (matIdx == -1), multiplying per-segment Tr and
  switching media by crossing side. The reference loops unboundedly; we
  cap at TR_MAX_SEGMENTS nested-interface crossings (static shapes).

All stochastic loops are `lax.while_loop`s over the whole lane batch with
masked-active lanes and a shared iteration counter; randomness comes from
folding the loop counter into the stream key so every iteration draws
fresh uniforms.

Heterogeneous density fetches are trilinear lookups into the padded grid
`med_density [K, Dz, Dy, Dx]`; corner pairs are packed so one XLA gather
serves two corners.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.core.sampling import hg_phase, hg_sample
from gpu_pathtracer_tpu.core.vecmath import (
    LUMA, dot, make_coordinate, to_world,
)
from gpu_pathtracer_tpu.ops.gather import take_rows
from gpu_pathtracer_tpu.scene.model import MediumType

TR_MAX_SEGMENTS = 8   # interface-crossing budget for the Tr walker

# Force the TPU compaction path on other backends (tests): the compacted
# sorted-slice tracking is TPU-only by default because CPU/GPU gathers are
# already vectorized; without this flag it would have zero CPU test
# coverage.
FORCE_COMPACT = False


def _use_compaction():
    return FORCE_COMPACT or jax.default_backend() == "tpu"


# Flat candidate work-queue (see _flat_candidate_loop). False falls back
# to the per-lane [m, KSEG] chunk loops, which gather a full KSEG-wide
# density row block per lane per iteration regardless of how few
# candidates a lane actually drew (measured ~18% valid slots on the
# cornell smoke at 262k lanes — the flat queue gathers only real
# candidates).
FLAT_QUEUE = True

# Tracking density table: u8-quantized rows ([*, 2] i32 carriers +
# per-medium scale) instead of bf16 pairs ([*, 4]). Quantization rounds
# DOWN (see flatten._pack_u8_oct) so majorants stay valid — but the TPU
# A/B says NO (2026-08-20, cornell 512^2 VPT, interleaved min-of-reps:
# u8 0.538 vs bf16 0.578 spp/s): the row gather is ROW-bound at width 4
# (byte-bound only ABOVE w4 — tools/bench_density_gather.py), so
# halving bytes buys nothing and the 8-byte unpack costs ~7%. Kept as a
# measured-negative A/B knob; the remaining VPT cost is real candidate
# work (fewer candidates, not narrower rows, is the lever).
DENSITY_U8 = False


def gather_medium(scene, med_idx):
    """Per-lane medium record from a packed fetch. med_idx may be -1
    (vacuum); callers mask on that."""
    k = jnp.maximum(med_idx, 0)
    # med table is tiny; build the packed view once per trace
    table = jnp.concatenate([
        scene.med_type[:, None].astype(jnp.float32),
        scene.med_g[:, None],
        scene.med_sigma_a,
        scene.med_sigma_s,
        scene.med_sigma_t,
        scene.med_inv_max_density[:, None],
        scene.med_eval_tr_type[:, None].astype(jnp.float32),
        scene.med_p0,
        scene.med_p1,
        scene.med_n.astype(jnp.float32),
    ], axis=1)
    a = take_rows(table, k)
    return {
        "type": a[:, 0].astype(jnp.int32),
        "g": a[:, 1],
        "sigma_a": a[:, 2:5],
        "sigma_s": a[:, 5:8],
        "sigma_t": a[:, 8:11],
        "inv_max_density": a[:, 11],
        "ett": a[:, 12].astype(jnp.int32),
        "p0": a[:, 13:16],
        "p1": a[:, 16:19],
        "n": a[:, 19:22].astype(jnp.int32),
        "idx": k,
    }


def _density(scene, med, pos_norm):
    """Trilinear density lookup (medium.h:160-178). pos_norm in [0,1]^3
    grid space; out-of-range taps read 0.

    Uses the x-pair-packed grid: 4 gathers per lookup instead of 8 —
    this sits in the tracking loops' innermost iteration.
    """
    K, Dz, Dy, Dx, _ = scene.med_density_pairs.shape
    pairs = scene.med_density_pairs.reshape(-1, 2)

    nx = med["n"][:, 0]
    ny = med["n"][:, 1]
    nz = med["n"][:, 2]
    ps = pos_norm * med["n"].astype(jnp.float32)
    psi = jnp.floor(ps)
    d = ps - psi
    xi = psi[:, 0].astype(jnp.int32)
    yi = psi[:, 1].astype(jnp.int32)
    zi = psi[:, 2].astype(jnp.int32)

    x_lo_ok = (xi >= 0) & (xi <= nx - 1)
    x_hi_ok = (xi + 1 >= 0) & (xi + 1 <= nx - 1)
    xr = jnp.clip(jnp.maximum(xi, 0), 0, Dx - 1)

    def tap_pair(oy, oz):
        """(d(xi, y, z), d(xi+1, y, z)) lerped along x."""
        y = yi + oy
        z = zi + oz
        yz_ok = (y >= 0) & (y <= ny - 1) & (z >= 0) & (z <= nz - 1)
        flat = (jnp.where(yz_ok, z, 0) * (Dy * Dx)
                + jnp.where(yz_ok, y, 0) * Dx + xr)
        v = jnp.take(pairs, med["idx"] * (Dz * Dy * Dx) + flat, axis=0)
        # xi == -1 reads row 0: its pair0 IS d[0] == the xi+1 value
        v0 = jnp.where(yz_ok & x_lo_ok, v[:, 0], 0.0)
        v1_raw = jnp.where(xi >= 0, v[:, 1], v[:, 0])
        v1 = jnp.where(yz_ok & x_hi_ok, v1_raw, 0.0)
        return v0 * (1 - d[:, 0]) + v1 * d[:, 0]

    d00 = tap_pair(0, 0)
    d10 = tap_pair(1, 0)
    d01 = tap_pair(0, 1)
    d11 = tap_pair(1, 1)
    d0 = d00 * (1 - d[:, 1]) + d10 * d[:, 1]
    d1 = d01 * (1 - d[:, 1]) + d11 * d[:, 1]
    return d0 * (1 - d[:, 2]) + d1 * d[:, 2]


def _density_oct(scene, med_idx, med_n, pos_norm):
    """Trilinear density at [M] points with ONE row gather: the
    oct-packed grid holds all 8 corner values per cell (zero border),
    bf16-PAIR-packed to width 4 (scene/flatten.py::_pack_bf16_pairs) —
    the TPU row gather is byte-bound above width 4, so halving the row
    bytes ~2.5x's this fetch, which the in-jit knockout puts at ~90% of
    a transmittance call.

    Identical sampling semantics to `_density` (medium.h:160-178):
    grid coords ps = pos_norm * n, cell floor(ps), corners zeroed outside
    [0, n-1]; corner values carry <=2^-7 relative truncation error
    (bf16 truncation = 1 ulp of a 7-bit mantissa; measured max 0.0076),
    always downward (never above the supervoxel majorant).
    """
    K, Dz1, Dy1, Dx1, _ = scene.med_density_oct4.shape

    ps = pos_norm * med_n.astype(jnp.float32)
    psi = jnp.floor(ps)
    f = ps - psi
    # +1 for the zero border; clip keeps far-outside taps in border cells
    xi = jnp.clip(psi[:, 0].astype(jnp.int32) + 1, 0, Dx1 - 1)
    yi = jnp.clip(psi[:, 1].astype(jnp.int32) + 1, 0, Dy1 - 1)
    zi = jnp.clip(psi[:, 2].astype(jnp.int32) + 1, 0, Dz1 - 1)
    flat = (med_idx * (Dz1 * Dy1 * Dx1) + zi * (Dy1 * Dx1) + yi * Dx1 + xi)
    if DENSITY_U8:
        rows = scene.med_density_oct2.reshape(-1, 2)
        v2 = jnp.take(rows, flat, axis=0)   # [M, 2] i32 u8x4 carriers
        u = v2.astype(jnp.uint32)
        # per-lane scale: K is tiny and static — select, never gather
        scale = jnp.broadcast_to(scene.med_u8_scale[0], med_idx.shape)
        for k in range(1, K):
            scale = jnp.where(med_idx == k, scene.med_u8_scale[k], scale)
        b = [((u[:, c // 4] >> (8 * (c % 4))) & 0xFF).astype(jnp.float32)
             for c in range(8)]
        ve = jnp.stack([b[0], b[2], b[4], b[6]], axis=1) * scale[:, None]
        vo = jnp.stack([b[1], b[3], b[5], b[7]], axis=1) * scale[:, None]
    else:
        rows = scene.med_density_oct4.reshape(-1, 4)
        v4 = jnp.take(rows, flat, axis=0)   # [M, 4] bf16-pair carriers
        vi = jax.lax.bitcast_convert_type(v4, jnp.int32)
        himask = jnp.int32(-65536)   # 0xFFFF0000
        ve = jax.lax.bitcast_convert_type(vi & himask, jnp.float32)
        vo = jax.lax.bitcast_convert_type(
            jnp.left_shift(vi, 16), jnp.float32)

    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
    d00 = ve[:, 0] * (1 - fx) + vo[:, 0] * fx
    d10 = ve[:, 1] * (1 - fx) + vo[:, 1] * fx
    d01 = ve[:, 2] * (1 - fx) + vo[:, 2] * fx
    d11 = ve[:, 3] * (1 - fx) + vo[:, 3] * fx
    d0 = d00 * (1 - fy) + d10 * fy
    d1 = d01 * (1 - fy) + d11 * fy
    return d0 * (1 - fz) + d1 * fz


NSEG = 42         # fixed ray segments: ceil(sqrt(3) * SV), each no longer
                  # than a supervoxel, so its majorant is a 2x2x2-cell max
KSEG = 32         # candidates evaluated per chunk iteration (32, not 16:
                  # the chunk count is driven by the heaviest lane, and
                  # each chunk iteration pays fixed gather-op costs —
                  # fewer, wider chunks measured faster on v5e)
SEG_COUNT_CAP = 64


def _box_clip(med, ro, rd, tmax):
    """Ray / medium-box overlap [t0, t0+ln] within [0, tmax] — density is
    zero outside the grid box, so tracking only needs this range. Also
    guarantees the segment-majorant bound: the clipped extent along each
    axis is at most the box span, so each of the NSEG=14 segments spans
    < 1 supervoxel per axis."""
    eps = 1e-20
    inv = 1.0 / jnp.where(jnp.abs(rd) > eps, rd,
                          jnp.where(rd >= 0, eps, -eps))
    t1 = (med["p0"] - ro) * inv
    t2 = (med["p1"] - ro) * inv
    tn = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
    t0 = jnp.clip(tn, 0.0, tmax)
    t_end = jnp.clip(tf, 0.0, tmax)
    return t0, jnp.maximum(t_end - t0, 0.0)


def _segment_majorants(scene, med, ro, rd, tmax):
    """Local majorant per fixed ray segment via the supervoxel oct grid.

    Segments are tmax/NSEG long (never longer than one supervoxel), so
    the max over the 2x2x2 supervoxel block containing the segment's AABB
    min corner bounds the (dilated) density everywhere on the segment.
    Returns maj [N, NSEG].
    """
    from gpu_pathtracer_tpu.ops.small_gather import small_table_lookup
    K, S1, _, _, _ = scene.med_sv_oct.shape
    n = ro.shape[0]
    span = med["p1"] - med["p0"]
    seg = tmax / NSEG
    ts = jnp.arange(NSEG + 1, dtype=jnp.float32)[None, :] * seg[:, None]
    p = ro[:, None, :] + rd[:, None, :] * ts[..., None]
    svc = (p - med["p0"][:, None, :]) / span[:, None, :] * (S1 - 1.0)
    lo = jnp.minimum(svc[:, :-1], svc[:, 1:])                # [N, NSEG, 3]
    cell = jnp.floor(lo).astype(jnp.int32) + 1               # zero border
    cell = jnp.clip(cell, 0, S1 - 1)
    flat = (med["idx"][:, None] * (S1 * S1 * S1)
            + cell[..., 2] * (S1 * S1) + cell[..., 1] * S1 + cell[..., 0])
    maj = small_table_lookup(scene.med_sv_max, flat)
    # the 2x2x2 bound only holds while a segment spans <= 1 supervoxel
    # per axis; longer segments (tmax beyond the grid box) fall back to
    # the global majorant
    d_sv = jnp.abs(svc[:, 1] - svc[:, 0])
    local_ok = jnp.all(d_sv <= 1.0, axis=-1)
    maxd = 1.0 / jnp.maximum(med["inv_max_density"], 1e-30)
    return jnp.where(local_ok[:, None], maj, maxd[:, None])


def _bf16_up(x):
    """Round x up to the bf16 grid (result >= x, exactly representable).
    Majorants are quantized with this BEFORE Poisson rates are drawn so
    the candidate rate and the acceptance test use the same number — a
    rounded-DOWN majorant would make dens/maj exceed 1 and bias Tr."""
    y = x.astype(jnp.bfloat16).astype(jnp.float32)
    bumped = (x * (1.0 + 2.0 ** -7)).astype(jnp.bfloat16).astype(
        jnp.float32)
    return jnp.where(y < x, bumped, y)


def _pack_u16_pairs(c):
    """[m, 2k] i32 (values < 65536) -> [m, k] f32 carrying u16 pairs."""
    lo = c[:, 0::2].astype(jnp.uint32)
    hi = c[:, 1::2].astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(lo | (hi << 16), jnp.float32)


def _unpack_u16_pairs(p):
    """[n, k] f32 -> [n, 2k] i32 (inverse of _pack_u16_pairs)."""
    u = jax.lax.bitcast_convert_type(p, jnp.uint32)
    lo = (u & 0xFFFF).astype(jnp.int32)
    hi = (u >> 16).astype(jnp.int32)
    return jnp.stack([lo, hi], axis=-1).reshape(p.shape[0], -1)


def _pack_bf16_pairs(x):
    """[m, 2k] f32 (bf16-exact values) -> [m, k] f32 carrying bf16 pairs."""
    b = jax.lax.bitcast_convert_type(
        x.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(
        b[:, 0::2] | (b[:, 1::2] << 16), jnp.float32)


def _unpack_bf16_pairs(p):
    """[n, k] f32 -> [n, 2k] f32 (inverse of _pack_bf16_pairs)."""
    u = jax.lax.bitcast_convert_type(p, jnp.uint32)
    lo = jax.lax.bitcast_convert_type(
        (u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
    hi = jax.lax.bitcast_convert_type(
        (u >> 16).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
    return jnp.stack([lo, hi], axis=-1).reshape(p.shape[0], -1)


def _select_by_segment(table, seg_of):
    """table [N, NSEG] picked at seg_of [N, K] -> [N, K] WITHOUT a gather:
    XLA lowers take_along_axis to a serialized per-element gather (~50 ms
    for [64k, 16] on v5e); NSEG selects are pure VPU work."""
    out = jnp.zeros(seg_of.shape, table.dtype)
    for s_i in range(NSEG):
        out = jnp.where(seg_of == s_i, table[:, s_i:s_i + 1], out)
    return out


def _segment_counts(scene, med, ro, rd, tmax, rate_maj, key, active):
    """Poisson candidate counts per segment at the LOCAL majorant rate —
    empty space draws no candidates at all (the win over the reference's
    global-majorant walk, medium.h:59-157). Returns (counts [N,NSEG] i32,
    ccum [N,NSEG+1], seg_len [N])."""
    sigma = _luma_sigma(med["sigma_t"])
    seg_len = tmax / NSEG
    lam = sigma[:, None] * rate_maj * seg_len[:, None]
    counts = jax.random.poisson(
        jax.random.fold_in(key, 0),
        jnp.where(active[:, None], lam, 0.0)).astype(jnp.int32)
    counts = jnp.minimum(counts, SEG_COUNT_CAP)
    ccum = jnp.concatenate(
        [jnp.zeros((counts.shape[0], 1), jnp.int32),
         jnp.cumsum(counts, axis=1)], axis=1)
    return counts, ccum, seg_len


def _chunk_ids(chunk_i, ccum, total):
    """Flat candidate ids for this chunk and their segment indices.
    Returns (valid [N,KSEG], seg_of [N,KSEG] i32, next_base_seg [N])."""
    base = chunk_i * KSEG
    ids = base + jnp.arange(KSEG, dtype=jnp.int32)[None, :]
    valid = ids < total[:, None]
    seg_of = jnp.sum(ids[:, :, None] >= ccum[:, None, 1:],
                     axis=-1).astype(jnp.int32)
    next_seg = jnp.sum(base + KSEG >= ccum[:, 1:], axis=-1).astype(jnp.int32)
    return valid, seg_of, next_seg


def _chunk_density(scene, med, ro, rd, pos_t, valid):
    n, k = pos_t.shape
    span = med["p1"] - med["p0"]
    p = ro[:, None, :] + rd[:, None, :] * pos_t[..., None]
    p = (p - med["p0"][:, None, :]) / span[:, None, :]
    med_idx_f = jnp.broadcast_to(med["idx"][:, None], (n, k)).reshape(-1)
    med_n_f = jnp.broadcast_to(med["n"][:, None, :], (n, k, 3))
    return _density_oct(
        scene, jnp.where(valid.reshape(-1), med_idx_f, 0),
        med_n_f.reshape(-1, 3), p.reshape(-1, 3)).reshape(n, k)


def _luma_sigma(sigma_t):
    return jnp.maximum(jnp.sum(sigma_t * LUMA, axis=-1), 1e-12)


def _flat_candidate_loop(scene, ro_h, rd, seg_len, ccum, maj_q, ce, ett,
                         med, kkey, mode):
    """Flat work-queue over ALL tracking candidates of one slice.

    The chunked loops gather a [m, KSEG] density block per iteration —
    every lane pays KSEG row fetches per chunk even when it drew 1
    candidate (~18% of gathered rows were real candidates on the cornell
    smoke). Here candidates are laid out as one flat lane-ordered queue
    of T = sum(counts) slots and consumed in FK-wide chunks, so the
    density gather count equals the actual candidate count (padding only
    in the final chunk).

    Per chunk, slot->lane decoding uses no per-element gathers: the lane
    window is a contiguous `dynamic_slice` of the exclusive-cumsum base
    table (every queued lane has >= 1 candidate, so FK slots span <= FK
    lanes), lane ids come from a ones-scatter + lane-cumsum of the
    window's start positions, and the candidate's segment comes from the
    lane's per-segment ccum row, u16-packed into the same 32-wide row
    fetch as the ray data (x32 row gathers are in the measured-fast
    class; the 43-wide raw ccum is not). Majorants ride a second x32 row
    as bf16 pairs — quantized UP (`_bf16_up`) before the Poisson rates
    were drawn, so rate and acceptance use identical numbers.

    mode "tr": returns exp(sum log factors) per lane (the delta / ratio /
    residual product, medium.h:64-131; a hit contributes -1e30 so delta
    goes exactly black). The chunked path's mid-walk Russian roulette is
    deliberately dropped: it existed to bound walk length, the queue is
    already bounded, and the plain product is the same expectation at
    strictly lower variance.
    mode "sample": returns the first accepted collision t per lane
    (+inf if none) — the min over accepted candidates, identical in
    distribution to the sequential walk (medium.h:133-157).

    Returns [m] in slice order; lanes with zero candidates get 1 / +inf.
    """
    m = ro_h.shape[0]
    FK = int(min(65536, max(1024, 4 * m)))
    FKW = FK + 128
    sample_mode = mode == "sample"

    total = ccum[:, -1]
    qsrc, _ = _compact_partition(total > 0)

    rowA = jnp.concatenate([
        ro_h, rd, seg_len[:, None],
        med["idx"].astype(jnp.float32)[:, None],
        ce[:, None], ett.astype(jnp.float32)[:, None],
        _pack_u16_pairs(ccum[:, 1:]),
        jnp.zeros((m, 1), jnp.float32)], axis=1)          # [m, 32]
    rowB = jnp.concatenate([
        _pack_bf16_pairs(maj_q), med["p0"], med["p1"],
        med["n"].astype(jnp.float32),
        jnp.zeros((m, 2), jnp.float32)], axis=1)          # [m, 32]
    rowA = jnp.take(rowA, qsrc, axis=0)
    rowB = jnp.take(rowB, qsrc, axis=0)
    # per-lane total == ccum[NSEG], packed as the hi half of pair 20
    total_c = (jax.lax.bitcast_convert_type(rowA[:, 30], jnp.uint32)
               >> 16).astype(jnp.int32)
    csum = _cumsum_lanes(total_c)
    base = csum - total_c                                  # exclusive
    T = csum[-1]
    base_pad = jnp.concatenate(
        [base, jnp.full(FKW, 1 << 30, jnp.int32)])

    iota = jnp.arange(FK, dtype=jnp.int32)
    iota_w = jnp.arange(FKW, dtype=jnp.int32)
    acc0 = jnp.full(m, jnp.inf) if sample_mode else jnp.zeros(m)

    def cond(state):
        return state[0] < T

    def body(state):
        A, lane_lo, acc, c = state
        ckey = jax.random.fold_in(kkey, 600 + c)
        # ---- slot -> (lane, segment, ordinal) decode, gather-free ----
        win = jax.lax.dynamic_slice(base_pad, (lane_lo,), (FKW,))
        rel = win - A
        ok = (iota_w >= 1) & (rel >= 0) & (rel < FK)
        ones = jnp.zeros(FK, jnp.int32).at[
            jnp.clip(rel, 0, FK - 1)].add(ok.astype(jnp.int32))
        incr = _cumsum_lanes(ones)
        lane_of = jnp.clip(lane_lo + incr, 0, m - 1)
        start_pos = jnp.where(ones > 0, iota, -1)
        cm = jax.lax.cummax(start_pos)
        base_of = jnp.where(cm >= 0, A + cm, win[0])
        f = A + iota
        valid = f < T
        j_ord = f - base_of

        ra = jnp.take(rowA, lane_of, axis=0)
        rb = jnp.take(rowB, lane_of, axis=0)
        ccum_all = _unpack_u16_pairs(ra[:, 10:31])         # [FK, 42]
        seg_of = jnp.sum((j_ord[:, None] >= ccum_all).astype(jnp.int32),
                         axis=1)
        maj_all = _unpack_bf16_pairs(rb[:, 0:21])          # [FK, 42]
        maj_of = jnp.zeros(FK, jnp.float32)
        for s_i in range(NSEG):
            maj_of = jnp.where(seg_of == s_i, maj_all[:, s_i], maj_of)

        s_ro, s_rd = ra[:, 0:3], ra[:, 3:6]
        s_len = ra[:, 6]
        s_mi = ra[:, 7].astype(jnp.int32)
        s_ce = ra[:, 8]
        s_ett = ra[:, 9].astype(jnp.int32)
        p0, p1, n_f = rb[:, 21:24], rb[:, 24:27], rb[:, 27:30]

        u_pos = jax.random.uniform(jax.random.fold_in(ckey, 0), (FK,))
        u_acc = jax.random.uniform(jax.random.fold_in(ckey, 1), (FK,))
        pos_t = (seg_of.astype(jnp.float32) + u_pos) * s_len
        p = s_ro + s_rd * pos_t[:, None]
        pos_norm = (p - p0) / jnp.maximum(p1 - p0, 1e-30)
        pos_norm = jnp.where(valid[:, None], pos_norm, 0.5)
        dens = _density_oct(scene, jnp.where(valid, s_mi, 0), n_f,
                            pos_norm)

        if sample_mode:
            accept = valid & (dens > u_acc * maj_of)
            acc = acc.at[lane_of].min(jnp.where(accept, pos_t, jnp.inf))
        else:
            rate_of = jnp.where(s_ett == 2,
                                jnp.maximum(maj_of, s_ce), maj_of)
            hit = dens > u_acc * maj_of
            lf_ratio = jnp.log(jnp.maximum(
                1.0 - dens / jnp.maximum(maj_of, 1e-30), 1e-30))
            lf_res = jnp.log(jnp.maximum(
                1.0 - (dens - s_ce) / jnp.maximum(rate_of, 1e-30),
                1e-30))
            logf = jnp.where(
                s_ett == 0,
                jnp.where(hit, jnp.float32(-1e30), 0.0),
                jnp.where(s_ett == 1, lf_ratio, lf_res))
            acc = acc.at[lane_of].add(jnp.where(valid, logf, 0.0))
        return A + FK, lane_lo + incr[FK - 1], acc, c + 1

    _, _, acc, _ = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32), acc0,
         jnp.zeros((), jnp.int32)))

    res = acc if sample_mode else jnp.exp(jnp.minimum(acc, 80.0))
    return jnp.zeros(m, res.dtype).at[qsrc].set(res, unique_indices=True)


def medium_sample(scene, static, med_idx, ro, rd, tmax, key, active):
    """Distance sampling in the lane's current medium.

    Returns (weight[N,3], t[N], sampled_medium[N]). Lanes with
    med_idx == -1 or ~active return weight 1, sampled False.
    """
    n = ro.shape[0]
    in_medium = active & (med_idx >= 0)
    med = gather_medium(scene, med_idx)
    sigma = _luma_sigma(med["sigma_t"])

    u0 = jax.random.uniform(jax.random.fold_in(key, 0), (n,))

    # ---- homogeneous analytic (medium.h:40-48) -------------------------
    dist_h = -jnp.log(jnp.maximum(1.0 - u0, 1e-30)) / sigma  # Exponential
    tr_h = jnp.exp(med["sigma_t"] * (-dist_h[:, None]))
    pdf_h = sigma * jnp.exp(-sigma * dist_h)
    sampled_h = dist_h < tmax
    w_h = jnp.where(sampled_h[:, None],
                    tr_h * med["sigma_s"] / pdf_h[:, None],
                    med["sigma_t"] * tr_h / pdf_h[:, None])

    if not static.has_hetero:
        weight = jnp.where(in_medium[:, None], w_h, 1.0)
        t = jnp.where(in_medium, dist_h, tmax)
        sampled = in_medium & sampled_h
        return weight, t, sampled

    # ---- heterogeneous delta tracking (medium.h:133-157) ---------------
    # Reformulated: majorant collisions form a Poisson process, sampled
    # directly per ray segment at the LOCAL supervoxel majorant and
    # evaluated in KSEG-wide chunks (one batched density gather each).
    # The first accepted candidate (minimum position) is the collision —
    # identical in distribution to the sequential walk.
    is_het = in_medium & (med["type"] == int(MediumType.HETEROGENEOUS))
    t_box, ln_box = _box_clip(med, ro, rd, tmax)
    tmax_h = jnp.where(is_het, ln_box, 0.0)
    ro_h = ro + rd * t_box[:, None]

    def run_tracking(_):
        return _sample_tracking(scene, med, ro_h, rd, tmax_h, key, is_het)

    # whole-batch skip: when no lane's segment overlaps the density box
    # (common for shadow/connection rays), pay nothing
    found_t = jax.lax.cond(
        jnp.any(tmax_h > 0.0), run_tracking,
        lambda _: jnp.full(n, jnp.inf), None)
    hit_d = is_het & jnp.isfinite(found_t)
    dist_d = jnp.where(hit_d, t_box + found_t, tmax)

    w_d = jnp.where(hit_d[:, None],
                    med["sigma_s"] / jnp.maximum(med["sigma_t"], 1e-30),
                    1.0)

    weight = jnp.where(is_het[:, None], w_d,
                       jnp.where(in_medium[:, None], w_h, 1.0))
    t = jnp.where(is_het, dist_d, jnp.where(in_medium, dist_h, tmax))
    sampled = jnp.where(is_het, hit_d, in_medium & sampled_h)
    return weight, t, sampled


def _compact_partition(need):
    """Stable-partition permutation (active lanes first) via cumsums.

    The chunked density loops then run on cond-gated PREFIX SLICES sized
    to the actual active count instead of the whole wavefront — in real
    renders only 1-10% of lanes are inside a heterogeneous medium at any
    bounce, so this is where the order-of-magnitude win lives.

    Deliberately NOT a lax.sort: XLA:TPU compile time for multi-operand
    sorts explodes with operand count (measured on v5e: 2 operands 15 s,
    17 operands 164 s, 41 operands >25 min). Two cumsums + one i32
    scatter compile instantly and run in ~1 ms at 262k lanes; the
    payload moves via per-slice ROW gathers of a packed [N, C] matrix
    (row gathers run ~140M rows/s — it is per-element gathers that are
    slow on TPU).

    Returns (src, need_count): src[p] = source lane for compacted
    position p.
    """
    n = need.shape[0]
    ni = need.astype(jnp.int32)
    need_count = jnp.sum(ni)
    pos_active = _cumsum_lanes(ni) - 1
    # cumsum(1-ni)-1 == i - cumsum(ni) == i - (pos_active + 1)
    pos_rest = need_count + (jnp.arange(n, dtype=jnp.int32)
                             - pos_active - 1)
    dest = jnp.where(need, pos_active, pos_rest)
    src = jnp.zeros(n, jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True)
    return src, need_count


def _compact_sort(need, weight):
    """Active lanes first, HEAVIEST first, via a stable 2-operand sort.

    The chunked tracking loops run `ceil(max_total_in_slice / KSEG)`
    iterations at full slice width, so one thick-plume lane makes every
    light lane in its slice idle for the whole walk (measured: a 262k
    transmittance call through the cornell smoke = 262 ms, ~95% of it
    this idle work). Ordering actives by expected candidate count packs
    the heavy lanes into the narrow leading slice and lets the wide
    light slices retire in a few chunks. A 2-operand lax.sort compiles
    in seconds and runs ~0.1 ms at 262k (unlike wide-payload sorts —
    see CLAUDE.md); the payload moves by row gathers as before.

    Estimator note: chunk-loop uniforms are drawn by compacted POSITION,
    so re-ordering permutes which iid draw a lane sees — statistically
    identical, not bit-identical with the previous partition order.

    Returns (src, need_count): src[p] = source lane at position p.
    """
    n = need.shape[0]
    key = jnp.where(need, -weight, jnp.float32(3.0e38))
    _, src = jax.lax.sort(
        (key, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    return src, jnp.sum(need.astype(jnp.int32))


def _track_slices(n):
    """Slice ladder for the SORTED tracking loops: [n/8, n/4, rest].
    Descending-weight order means the first (narrow) slice carries the
    heavy walkers; each extra slice costs another compiled loop body,
    so three is the measured compile-time compromise."""
    s = [n // 8, n // 4]
    s.append(n - sum(s))
    return [x for x in s if x > 0]


def _cumsum_lanes(x):
    """Inclusive cumsum of an i32 [N] via a [rows, 128] two-level pass —
    XLA's 1-D lax.cumsum lowers to a serialized form on TPU (~80 ms at
    262k); the reshape form is pure vector work."""
    n = x.shape[0]
    if n % 128:
        return jnp.cumsum(x)
    m = x.reshape(-1, 128)
    within = jnp.cumsum(m, axis=1)
    rows = jnp.cumsum(within[:, -1])
    return (within + (rows - within[:, -1])[:, None]).reshape(-1)


def _prefix_slices(n):
    """Prefix-slice sizes [n/8, rest]: the small slice covers the common
    case (a few % of lanes inside a medium) at 1/8 the batch cost; the
    rest-slice only runs when the active prefix overflows. Two slices,
    not a geometric ladder — every extra slice instantiates another
    while_loop body and XLA:TPU compile time for this program is already
    minutes."""
    s = [n // 8]
    s.append(n - sum(s))
    return [x for x in s if x > 0]


def _sample_tracking(scene, med, ro_h, rd, tmax_h, key, is_het):
    """Chunked first-collision walk (see medium_sample), compacted:
    active lanes are partitioned to a prefix and EVERYTHING that scales
    with lane count — supervoxel majorants, Poisson candidate counts, and
    the chunked density loop — runs per cond-gated prefix slice, so idle
    lanes cost nothing."""
    n = ro_h.shape[0]
    kkey = jax.random.fold_in(key, 77)

    if not _use_compaction():
        # CPU/GPU gathers are vectorized; compaction only pays on TPU
        maj = _segment_majorants(scene, med, ro_h, rd, tmax_h)
        counts, ccum, seg_len = _segment_counts(
            scene, med, ro_h, rd, tmax_h, maj, kkey, is_het)
        total = ccum[:, -1]
        need = is_het & (total > 0)
        found_t = _sample_chunk_loop(
            scene, med, ro_h, rd, seg_len,
            jnp.where(need, total, 0), ccum, maj,
            jax.random.fold_in(kkey, 1000))
        return jnp.where(need, found_t, jnp.inf)

    # packed per-lane columns: ro(3) rd(3) tmax med_idx — the partition
    # key needs nothing random, so counts/majorants move into the slices
    need = is_het & (tmax_h > 0.0)
    packed = jnp.concatenate(
        [ro_h, rd, tmax_h[:, None],
         med["idx"].astype(jnp.float32)[:, None]], axis=1)
    # weight = expected candidates under the global majorant: groups
    # heavy walkers into the narrow leading slice (see _compact_sort)
    maxd = 1.0 / jnp.maximum(med["inv_max_density"], 1e-30)
    src, need_count = _compact_sort(
        need, _luma_sigma(med["sigma_t"]) * maxd * tmax_h)

    found_t = jnp.full(n, jnp.inf)
    start = 0
    for slice_i, size in enumerate(_track_slices(n)):
        sel = src[start:start + size]

        def run(_, sel=sel, slice_i=slice_i, size=size):
            sp = jnp.take(packed, sel, axis=0)
            s_ro = sp[:, 0:3]
            s_rd = sp[:, 3:6]
            s_tmax = sp[:, 6]
            s_med = gather_medium(scene, sp[:, 7].astype(jnp.int32))
            s_maj = _segment_majorants(scene, s_med, s_ro, s_rd, s_tmax)
            if FLAT_QUEUE:
                s_maj = _bf16_up(s_maj)
            _, s_ccum, s_seg_len = _segment_counts(
                scene, s_med, s_ro, s_rd, s_tmax, s_maj,
                jax.random.fold_in(kkey, 3000 + slice_i),
                jnp.ones(size, bool))
            if FLAT_QUEUE:
                zc = jnp.zeros(size, jnp.float32)
                return _flat_candidate_loop(
                    scene, s_ro, s_rd, s_seg_len, s_ccum, s_maj, zc,
                    s_med["ett"], s_med,
                    jax.random.fold_in(kkey, 1000 + slice_i), "sample")
            return _sample_chunk_loop(
                scene, s_med, s_ro, s_rd, s_seg_len, s_ccum[:, -1],
                s_ccum, s_maj, jax.random.fold_in(kkey, 1000 + slice_i))

        # slices beyond the active prefix skip entirely
        part = jax.lax.cond(
            need_count > start, run,
            lambda _, size=size: jnp.full(size, jnp.inf), None)
        found_t = found_t.at[sel].set(part, unique_indices=True)
        start += size

    return jnp.where(need, found_t, jnp.inf)


def _sample_chunk_loop(scene, med, ro_h, rd, seg_len, total, ccum, maj,
                       kkey):
    """The first-collision chunk loop over one compacted slice."""
    n = ro_h.shape[0]
    max_chunks = (NSEG * SEG_COUNT_CAP) // KSEG

    def cond(state):
        chunk_i, found_t, done = state
        return jnp.any(~done) & (chunk_i < max_chunks)

    def body(state):
        chunk_i, found_t, done = state
        ckey = jax.random.fold_in(kkey, 100 + chunk_i)
        valid, seg_of, next_seg = _chunk_ids(chunk_i, ccum, total)
        valid &= ~done[:, None]
        u_pos = jax.random.uniform(jax.random.fold_in(ckey, 0),
                                   valid.shape)
        u_acc = jax.random.uniform(jax.random.fold_in(ckey, 1),
                                   valid.shape)
        pos_t = (seg_of.astype(jnp.float32) + u_pos) * seg_len[:, None]
        dens = _chunk_density(scene, med, ro_h, rd, pos_t, valid)
        maj_of = _select_by_segment(maj, seg_of)
        accept = valid & (dens > u_acc * maj_of)
        found_t = jnp.minimum(
            found_t, jnp.min(jnp.where(accept, pos_t, jnp.inf), axis=1))
        exhausted = (chunk_i + 1) * KSEG >= total
        # stop once every remaining candidate lies past the collision
        past = found_t <= next_seg.astype(jnp.float32) * seg_len
        return chunk_i + 1, found_t, done | exhausted | past

    done0 = total == 0
    _, found_t, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), jnp.full(n, jnp.inf),
                     done0))
    return found_t


def medium_tr_segment(scene, static, med_idx, ro, rd, tmax, key, active):
    """Transmittance through a single medium segment of length tmax.

    Homogeneous: exp(-sigma_t * tmax) (medium.h:14-17).
    Heterogeneous: delta(0) / ratio(1) / residual-ratio(2) tracking
    (medium.h:64-131). Returns tr [N, 3].
    """
    n = ro.shape[0]
    in_medium = active & (med_idx >= 0)
    med = gather_medium(scene, med_idx)
    sigma = _luma_sigma(med["sigma_t"])

    tr_h = jnp.exp(med["sigma_t"] * (-tmax[:, None]))

    if not static.has_hetero:
        return jnp.where(in_medium[:, None], tr_h, 1.0)

    is_het = in_medium & (med["type"] == int(MediumType.HETEROGENEOUS))
    span = med["p1"] - med["p0"]
    max_density = 1.0 / jnp.maximum(med["inv_max_density"], 1e-30)
    ett = med["ett"]

    # residual-ratio control: ce = 0.5 * maxDensity (medium.h:107-109).
    # The control spans only the ray/box overlap: outside it d == 0 and
    # the reference's control-times-tracking product is 1 in expectation.
    ce = 0.5 * max_density
    ett = med["ett"]

    # Segmented Poisson-batch tracking (see medium_sample): candidates at
    # the local supervoxel majorant rate; delta/ratio/residual factors as
    # in medium.h:64-131. The mid-walk Russian roulette below tr=0.1 is
    # kept per chunk (it bounds the walk in thick media). Residual uses
    # rate max(maj, ce) so its factor stays in [0, 1+] (|d-ce| bound).
    t_box, ln_box = _box_clip(med, ro, rd, tmax)
    tmax_h = jnp.where(is_het, ln_box, 0.0)
    ro_h = ro + rd * t_box[:, None]
    tc = jnp.exp(-ln_box * ce * sigma)

    tr_d = jax.lax.cond(
        jnp.any(tmax_h > 0.0),
        lambda _: _tr_tracking(scene, med, ro_h, rd, tmax_h, ce,
                               max_density, ett, key, is_het),
        lambda _: jnp.ones(n), None)
    tr_d = tr_d * jnp.where(ett == 2, tc, 1.0)

    tr = jnp.where(is_het[:, None], tr_d[:, None],
                   jnp.where(in_medium[:, None], tr_h, 1.0))
    return tr


def _tr_tracking(scene, med, ro_h, rd, tmax_h, ce, max_density, ett, key,
                 is_het):
    """Chunked transmittance walk (see medium_tr_segment), compacted the
    same way as _sample_tracking: cond-gated prefix slices."""
    n = ro_h.shape[0]
    kkey = jax.random.fold_in(key, 88)

    if not _use_compaction():
        maj = _segment_majorants(scene, med, ro_h, rd, tmax_h)
        rate = jnp.where((ett == 2)[:, None],
                         jnp.maximum(maj, ce[:, None]), maj)
        counts, ccum, seg_len = _segment_counts(
            scene, med, ro_h, rd, tmax_h, rate, kkey, is_het)
        total = ccum[:, -1]
        need = is_het & (total > 0)
        tr_d = _tr_chunk_loop(
            scene, med, ro_h, rd, seg_len,
            jnp.where(need, total, 0), ccum, maj, rate,
            ce, ett, jax.random.fold_in(kkey, 2000))
        return jnp.where(need, tr_d, 1.0)

    # see _sample_tracking: majorants/counts computed per prefix slice,
    # actives sorted heaviest-first so slice trip counts stay tight
    need = is_het & (tmax_h > 0.0)
    packed = jnp.concatenate(
        [ro_h, rd, tmax_h[:, None],
         med["idx"].astype(jnp.float32)[:, None]], axis=1)
    src, need_count = _compact_sort(
        need, _luma_sigma(med["sigma_t"]) * max_density * tmax_h)

    tr_d = jnp.ones(n)
    start = 0
    for slice_i, size in enumerate(_track_slices(n)):
        sel = src[start:start + size]

        def run(_, sel=sel, slice_i=slice_i, size=size):
            sp = jnp.take(packed, sel, axis=0)
            s_ro = sp[:, 0:3]
            s_rd = sp[:, 3:6]
            s_tmax = sp[:, 6]
            s_med = gather_medium(scene, sp[:, 7].astype(jnp.int32))
            s_maj = _segment_majorants(scene, s_med, s_ro, s_rd, s_tmax)
            if FLAT_QUEUE:
                s_maj = _bf16_up(s_maj)
            s_maxd = 1.0 / jnp.maximum(s_med["inv_max_density"], 1e-30)
            s_ce = 0.5 * s_maxd
            s_ett = s_med["ett"]
            s_rate = jnp.where((s_ett == 2)[:, None],
                               jnp.maximum(s_maj, s_ce[:, None]), s_maj)
            _, s_ccum, s_seg_len = _segment_counts(
                scene, s_med, s_ro, s_rd, s_tmax, s_rate,
                jax.random.fold_in(kkey, 4000 + slice_i),
                jnp.ones(size, bool))
            if FLAT_QUEUE:
                return _flat_candidate_loop(
                    scene, s_ro, s_rd, s_seg_len, s_ccum, s_maj, s_ce,
                    s_ett, s_med,
                    jax.random.fold_in(kkey, 2000 + slice_i), "tr")
            return _tr_chunk_loop(
                scene, s_med, s_ro, s_rd, s_seg_len, s_ccum[:, -1],
                s_ccum, s_maj, s_rate, s_ce, s_ett,
                jax.random.fold_in(kkey, 2000 + slice_i))

        part = jax.lax.cond(
            need_count > start, run,
            lambda _, size=size: jnp.ones(size), None)
        tr_d = tr_d.at[sel].set(part, unique_indices=True)
        start += size

    return jnp.where(need, tr_d, 1.0)


def _tr_chunk_loop(scene, med, ro_h, rd, seg_len, total, ccum, maj, rate,
                   ce, ett, kkey):
    """The transmittance chunk loop over one compacted slice."""
    n = ro_h.shape[0]
    max_chunks = (NSEG * SEG_COUNT_CAP) // KSEG

    def cond(state):
        chunk_i, tr_run, done = state
        return jnp.any(~done) & (chunk_i < max_chunks)

    def body(state):
        chunk_i, tr_run, done = state
        ckey = jax.random.fold_in(kkey, 200 + chunk_i)
        valid, seg_of, _ = _chunk_ids(chunk_i, ccum, total)
        valid &= ~done[:, None]
        u_pos = jax.random.uniform(jax.random.fold_in(ckey, 0),
                                   valid.shape)
        u_acc = jax.random.uniform(jax.random.fold_in(ckey, 1),
                                   valid.shape)
        pos_t = (seg_of.astype(jnp.float32) + u_pos) * seg_len[:, None]
        dens = _chunk_density(scene, med, ro_h, rd, pos_t, valid)
        maj_of = _select_by_segment(maj, seg_of)
        rate_of = _select_by_segment(rate, seg_of)

        # delta (medium.h:71-86): black on any real collision
        hit = valid & (dens > u_acc * maj_of)
        f_delta = jnp.where(jnp.any(hit, axis=1), 0.0, 1.0)
        # ratio (medium.h:88-105)
        f_ratio = jnp.prod(jnp.where(
            valid, 1.0 - dens / jnp.maximum(maj_of, 1e-30), 1.0), axis=1)
        # residual ratio (medium.h:106-128)
        f_res = jnp.prod(jnp.where(
            valid, 1.0 - (dens - ce[:, None])
            / jnp.maximum(rate_of, 1e-30), 1.0), axis=1)

        factor = jnp.where(ett == 0, f_delta,
                           jnp.where(ett == 1, f_ratio, f_res))
        tr_new = tr_run * factor

        # Russian roulette below 0.1 (medium.h:95-104, 117-127):
        # kill with prob 1-tr, survivors carry weight tr/(tr) = 1
        u_rr = jax.random.uniform(jax.random.fold_in(ckey, 2), (n,))
        rr = ~done & (tr_new < 0.1) & (tr_new >= 0.0)
        kill = rr & (u_rr < 1.0 - tr_new)
        tr_new = jnp.where(kill, 0.0, jnp.where(rr, 1.0, tr_new))

        exhausted = (chunk_i + 1) * KSEG >= total
        done_new = done | kill | (tr_new == 0.0) | exhausted
        tr_run = jnp.where(done, tr_run, tr_new)
        return chunk_i + 1, tr_run, done_new

    done0 = total == 0
    _, tr_d, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), jnp.ones(n), done0))
    return tr_d


def transmittance(scene, static, med_idx, ro, rd, tmax, key, active):
    """Shadow transmittance with interface crossings (pathtracer.cu:298-322).

    Walks up to TR_MAX_SEGMENTS segments: any hit with a real material
    blocks (tr = 0); material-less hits switch the medium by crossing side
    and continue. Returns tr [N, 3].

    On TPU the whole walker (traversal included) runs on compacted
    prefix slices: medium-NEE shadow rays come from the few lanes that
    scattered in a medium, so the full-batch walk wasted >90% of its
    traversal and tracking work.
    """
    n = ro.shape[0]
    if _use_compaction():
        need = active & (tmax > 0.0)
        packed = jnp.concatenate(
            [ro, rd, tmax[:, None],
             med_idx.astype(jnp.float32)[:, None]], axis=1)
        src, need_count = _compact_partition(need)

        tr = jnp.ones((n, 3), jnp.float32)
        start = 0
        for slice_i, size in enumerate(_prefix_slices(n)):
            sel = src[start:start + size]

            def run(_, sel=sel, slice_i=slice_i, size=size, start=start):
                sp = jnp.take(packed, sel, axis=0)
                # positions past the active prefix are idle lanes whose
                # ray data may be garbage — keep them masked
                act = (start + jnp.arange(size)) < need_count
                return _transmittance_walk(
                    scene, static, sp[:, 7].astype(jnp.int32),
                    sp[:, 0:3], sp[:, 3:6], sp[:, 6],
                    jax.random.fold_in(key, 5000 + slice_i), act)

            part = jax.lax.cond(
                need_count > start, run,
                lambda _, size=size: jnp.ones((size, 3), jnp.float32),
                None)
            tr = tr.at[sel].set(part, unique_indices=True)
            start += size
        return jnp.where(need[:, None], tr, 1.0)

    return _transmittance_walk(scene, static, med_idx, ro, rd, tmax, key,
                               active)


def _transmittance_walk(scene, static, med_idx, ro, rd, tmax, key, active):
    """The interface-crossing walk itself (one batch, no compaction)."""
    from gpu_pathtracer_tpu.geom import traverse

    n = ro.shape[0]
    tr = jnp.ones((n, 3), jnp.float32)
    cur_o = ro
    cur_med = med_idx
    remaining = tmax
    walking = active

    def segment(seg, state):
        tr, cur_o, cur_med, remaining, walking = state
        seg_key = jax.random.fold_in(key, 7000 + seg)
        hit = traverse.intersect_closest(
            scene, static, cur_o, rd, scene.epsilon,
            jnp.where(walking, remaining, 0.0))
        blocked = walking & hit.valid & (hit.mat_idx != -1)
        tr = jnp.where(blocked[:, None], 0.0, tr)
        walking &= ~blocked

        seg_len = jnp.where(hit.valid, hit.t, remaining)
        if static.has_media:
            seg_tr = medium_tr_segment(
                scene, static, cur_med, cur_o, rd, seg_len, seg_key,
                walking)
            tr = jnp.where(walking[:, None], tr * seg_tr, tr)

        # stop lanes that escaped without hitting an interface
        walking &= hit.valid

        # cross the interface: pick medium by side (pathtracer.cu:315-316)
        going_out = dot(rd, hit.nor) > 0.0
        next_med = jnp.where(going_out, hit.medium_outside,
                             hit.medium_inside)
        cur_med = jnp.where(walking, next_med, cur_med)
        remaining = jnp.where(walking, remaining - hit.t, remaining)
        cur_o = jnp.where(walking[:, None], hit.pos, cur_o)
        return tr, cur_o, cur_med, remaining, walking

    # lax.scan over segments, NOT a Python unroll: the body (traversal +
    # tracking loops) compiles ONCE instead of TR_MAX_SEGMENTS times —
    # the unrolled form multiplied XLA/Mosaic compile time unacceptably.
    # Most shadow rays cross <= 2 interfaces; the cond skips the body at
    # runtime once every lane has finished walking.
    def scan_step(state, seg):
        state = jax.lax.cond(
            jnp.any(state[4]),
            lambda s: segment(seg, s),
            lambda s: s,
            state)
        return state, None

    state = (tr, ro, med_idx, tmax, active)
    state, _ = jax.lax.scan(scan_step, state,
                            jnp.arange(TR_MAX_SEGMENTS, dtype=jnp.int32))
    return state[0]


def sample_phase(scene, med_idx, wi, u1, u2):
    """Medium::SamplePhase (medium.h:197-220): HG or isotropic.
    Returns (dir[N,3], phase[N]) with pdf == phase. The local frame is
    built around -wi like the reference's implicit convention."""
    med = gather_medium(scene, med_idx)
    d_local, ph = hg_sample(u1, u2, med["g"])
    # NOTE deviation: the reference samples the HG direction in a fixed
    # world frame (+Y polar axis, medium.h:197-220) which disagrees with
    # its own Phase(in, out) = f(dot(in, out)) eval for g != 0. We sample
    # around `wi` so the returned phase equals phase(wi, d). Identical
    # behavior for g == 0 — which is every bundled scene (none sets "g").
    axis = wi
    uu, ww = make_coordinate(axis)
    d = to_world(d_local, uu, axis, ww)
    return d, ph


def phase(scene, med_idx, wi, wo):
    """Medium::Phase (medium.h:222-234). wi/wo as in the reference call
    Phase(-r.d, shadowRay.d, ...)."""
    med = gather_medium(scene, med_idx)
    return hg_phase(dot(wi, wo), med["g"])
