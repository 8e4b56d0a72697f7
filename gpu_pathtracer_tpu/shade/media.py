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


def _luma_sigma(sigma_t):
    return jnp.maximum(jnp.sum(sigma_t * LUMA, axis=-1), 1e-12)


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
    is_het = in_medium & (med["type"] == int(MediumType.HETEROGENEOUS))
    span = med["p1"] - med["p0"]

    def cond(state):
        i, dist, done, hit = state
        return jnp.any(~done) & (i < static.med_iter_max)

    def body(state):
        i, dist, done, hit = state
        k1 = jax.random.fold_in(key, 1000 + i)
        us = jax.random.uniform(k1, (n, 2))
        step = -jnp.log(jnp.maximum(us[:, 0], 1e-30)) \
            * med["inv_max_density"] / sigma
        dist_new = dist + step
        escaped = dist_new >= tmax
        p = ro + rd * dist_new[:, None]
        p = (p - med["p0"]) / span
        dens = _density(scene, med, p)
        scat = dens * med["inv_max_density"] > us[:, 1]
        newly_hit = ~done & ~escaped & scat
        newly_done = ~done & (escaped | scat)
        dist = jnp.where(done, dist, dist_new)
        return (i + 1, dist, done | newly_done, hit | newly_hit)

    dist0 = jnp.zeros(n)
    done0 = ~is_het
    hit0 = jnp.zeros(n, bool)
    _, dist_d, _, hit_d = jax.lax.while_loop(
        cond, body, (0, dist0, done0, hit0))

    w_d = jnp.where(hit_d[:, None],
                    med["sigma_s"] / jnp.maximum(med["sigma_t"], 1e-30),
                    1.0)

    weight = jnp.where(is_het[:, None], w_d,
                       jnp.where(in_medium[:, None], w_h, 1.0))
    t = jnp.where(is_het, dist_d, jnp.where(in_medium, dist_h, tmax))
    sampled = jnp.where(is_het, hit_d, in_medium & sampled_h)
    return weight, t, sampled


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

    # residual-ratio control: ce = 0.5 * maxDensity (medium.h:107-109)
    ce = 0.5 * max_density
    tc = jnp.exp(-tmax * ce * sigma)

    # step scale: delta/ratio use 1/maxDensity, residual uses
    # 1/(maxDensity - ce)
    step_scale = jnp.where(ett == 2,
                           1.0 / jnp.maximum(max_density - ce, 1e-30),
                           med["inv_max_density"]) / sigma

    def cond(state):
        i, dist, tr, done = state
        return jnp.any(~done) & (i < static.med_iter_max)

    def body(state):
        i, dist, tr, done = state
        k1 = jax.random.fold_in(key, 5000 + i)
        us = jax.random.uniform(k1, (n, 3))
        step = -jnp.log(jnp.maximum(us[:, 0], 1e-30)) * step_scale
        dist_new = dist + step
        escaped = dist_new >= tmax
        p = ro + rd * dist_new[:, None]
        p = (p - med["p0"]) / span
        dens = _density(scene, med, p)

        # delta tracking: terminate black on real collision (medium.h:71-86)
        delta_hit = dens * med["inv_max_density"] > us[:, 1]
        tr_delta = jnp.where(delta_hit, 0.0, tr)
        done_delta = escaped | delta_hit

        # ratio tracking (medium.h:88-105) with RR below 0.1
        tr_ratio = tr * (1.0 - dens * med["inv_max_density"])
        rr_r = tr_ratio < 0.1
        kill_r = rr_r & (us[:, 2] < (1.0 - tr_ratio))
        tr_ratio = jnp.where(kill_r, 0.0, jnp.where(rr_r, 1.0, tr_ratio))
        done_ratio = escaped | kill_r

        # residual-ratio tracking (medium.h:106-128)
        tr_res = tr * (1.0 - (dens - ce) / jnp.maximum(
            max_density - ce, 1e-30))
        rr_s = tr_res < 0.1
        q = 1.0 - tr_res
        kill_s = rr_s & (us[:, 2] < q)
        tr_res = jnp.where(kill_s, 0.0,
                           jnp.where(rr_s, tr_res / jnp.maximum(
                               1.0 - q, 1e-30), tr_res))
        done_res = escaped | kill_s

        tr_new = jnp.where(ett == 0, tr_delta,
                           jnp.where(ett == 1, tr_ratio, tr_res))
        done_new = jnp.where(ett == 0, done_delta,
                             jnp.where(ett == 1, done_ratio, done_res))
        tr = jnp.where(done, tr, jnp.where(escaped, tr, tr_new))
        dist = jnp.where(done, dist, dist_new)
        return (i + 1, dist, tr, done | done_new)

    done0 = ~is_het
    _, _, tr_d, _ = jax.lax.while_loop(
        cond, body, (0, jnp.zeros(n), jnp.ones(n), done0))
    tr_d = tr_d * jnp.where(ett == 2, tc, 1.0)

    tr = jnp.where(is_het[:, None], tr_d[:, None],
                   jnp.where(in_medium[:, None], tr_h, 1.0))
    return tr


def transmittance(scene, static, med_idx, ro, rd, tmax, key, active):
    """Shadow transmittance with interface crossings (pathtracer.cu:298-322).

    Walks up to TR_MAX_SEGMENTS segments: any hit with a real material
    blocks (tr = 0); material-less hits switch the medium by crossing side
    and continue. Returns tr [N, 3].
    """
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

    state = (tr, ro, med_idx, tmax, active)
    state = segment(0, state)
    for seg in range(1, TR_MAX_SEGMENTS):
        # most shadow rays cross <= 2 interfaces; skip whole segments at
        # runtime once every lane has finished walking
        tr, cur_o, cur_med, remaining, walking = state
        state = jax.lax.cond(
            jnp.any(walking),
            lambda s, seg=seg: segment(seg, s),
            lambda s: s,
            state)
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
