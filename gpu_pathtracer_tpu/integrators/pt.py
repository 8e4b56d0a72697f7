"""Wavefront path tracer (reference Path kernel, pathtracer.cu:880-1021).

The CUDA megakernel's per-thread bounce loop becomes a `lax.scan` over
bounces carrying fixed-shape lane state; dead lanes are masked.

Estimator note: the reference draws TWO independent BSDF samples per
bounce — one for the MIS BSDF-side branch (pathtracer.cu:953-992, its own
closest-hit) and one for the continuation ray (997-1008). Here the
continuation sample IS the MIS sample (the standard PBRT formulation):
emitter/environment hits are credited at the next bounce's intersection
with the power-heuristic weight against the stored BSDF pdf. Same
expectation, one less traversal and one less BSDF sample per bounce —
the wavefront's per-bounce cost drops ~1/3.

Per bounce: closest-hit -> arrival credit (emitter/env with MIS) -> NEE
light branch -> BSDF sample (continuation + MIS pdf) -> Russian roulette
(luminance-based after bounce 3, pathtracer.cu:1010-1016). An epilogue
intersection collects the final bounce's arrival credit.

Media are ignored here exactly like the reference PT (the next-bounce ray
drops the medium pointer, pathtracer.cu:1008); `vpt.py` is the
medium-aware variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.core.rng import RngStream
from gpu_pathtracer_tpu.core.sampling import power_heuristic
from gpu_pathtracer_tpu.core.vecmath import dot, is_black, luminance
from gpu_pathtracer_tpu.geom import traverse
from gpu_pathtracer_tpu.integrators import common
from gpu_pathtracer_tpu.integrators.common import (
    direct_light_nee, primary_rays,
)
from gpu_pathtracer_tpu.shade import bsdf as bsdf_mod
from gpu_pathtracer_tpu.shade import lights as lights_mod


def _arrival_credit(scene, static, hit, ro, rd, li, beta, specular,
                    prev_pdf, alive, first):
    """Emitter/env radiance reached by the continuation ray, MIS-weighted
    against the BSDF pdf that generated it (folds pathtracer.cu:906-908,
    917-922, 953-992 into one site). Returns (li, alive)."""
    miss = alive & ~hit.valid
    full = first | specular
    if static.has_infinite:
        env = lights_mod.infinite_le(scene, rd)
        choice_inf = lights_mod.light_choice_pdf(
            scene, jnp.full(rd.shape[0], static.n_lights, jnp.int32))
        _, pdf_w_inf = lights_mod.infinite_pdf(scene)
        w = jnp.where(full, 1.0,
                      power_heuristic(1, prev_pdf, 1, pdf_w_inf * choice_inf))
        li += jnp.where(miss[:, None], beta * env * w[:, None], 0.0)
    alive &= hit.valid

    if static.n_lights > 0:
        emitter = alive & (hit.light_idx >= 0)
        le = lights_mod.area_light_le(scene, hit.light_idx, hit.nor, -rd)
        pdf_area, _ = lights_mod.area_light_pdf(
            scene, jnp.maximum(hit.light_idx, 0), rd, hit.nor)
        lchoice = lights_mod.light_choice_pdf(
            scene, jnp.maximum(hit.light_idx, 0))
        seg = hit.pos - ro
        len2 = dot(seg, seg)
        cos_l = jnp.abs(dot(hit.nor, rd))
        l_pdf = pdf_area * len2 / jnp.maximum(cos_l, 1e-30)
        w = jnp.where(full, 1.0,
                      power_heuristic(1, prev_pdf, 1, l_pdf * lchoice))
        emitter &= ~is_black(le)
        li += jnp.where(emitter[:, None], beta * le * w[:, None], 0.0)
        # the reference terminates only bounce-0/specular emitter hits
        # (pathtracer.cu:917-922); MIS-credited hits continue
        alive &= ~(alive & (hit.light_idx >= 0) & full)
    return li, alive


def _sort_key(scene, ro, rd, alive):
    """Wavefront coherence key: direction octant + 4-bit/axis origin
    morton. Dead lanes sort to the end (compaction). The block-culled
    traversal (geom/dense_tpu.py) wins when a ray tile shares a frustum;
    raster order only gives that to primary rays — secondary rays get it
    from this sort."""
    c = scene.world_center
    r = jnp.maximum(scene.world_radius, 1e-6)
    q = jnp.clip(((ro - c) / (2.0 * r) + 0.5) * 15.999, 0.0,
                 15.0).astype(jnp.int32)
    morton = jnp.zeros(ro.shape[0], jnp.int32)
    for b in range(4):
        for a in range(3):
            morton = morton | (((q[:, a] >> b) & 1) << (3 * b + a))
    octant = ((rd[:, 0] > 0).astype(jnp.int32)
              | ((rd[:, 1] > 0).astype(jnp.int32) << 1)
              | ((rd[:, 2] > 0).astype(jnp.int32) << 2))
    key = (octant << 12) | morton
    return jnp.where(alive, key, 1 << 20)


def render_lanes(scene, static, key, pixel_x, pixel_y, with_stats=False,
                 psample=None):
    """Returns per-lane radiance [N, 3] for one path-traced sample.

    with_stats=True additionally returns the number of rays traced
    (closest-hit + any-hit across all bounces) for throughput metrics.

    psample (PSSMLT, integrators/mlt.py): a [D, N] primary-sample matrix
    replacing the counter-based RNG — lane i's path becomes the fixed
    deterministic map f(psample[:, i]) a Markov chain can mutate. Layout
    per core.rng: rows [0, PSS_CAM_DIMS) camera, then PSS_BOUNCE_DIMS
    per bounce. Requires the unsorted (dense-regime) wavefront: lane
    shuffling would make lane i's draws depend on OTHER lanes' sort
    order, breaking the per-chain mapping.
    """
    from gpu_pathtracer_tpu.geom.dense import DENSE_MAX
    from gpu_pathtracer_tpu.integrators import pt_fused
    if psample is None and jax.default_backend() == "tpu" \
            and pt_fused.supports(static):
        # whole-path megakernel: one Pallas call per iteration instead of
        # ~50 HBM-bound XLA fusions per bounce (see pt_fused docstring)
        return pt_fused.render_lanes(scene, static, key, pixel_x, pixel_y,
                                     with_stats)
    n = pixel_x.shape[0]
    if psample is None:
        rng0 = RngStream(key)
    else:
        from gpu_pathtracer_tpu.core.rng import (
            PSS_CAM_DIMS, PrimarySampleStream)
        rng0 = PrimarySampleStream(psample, 0, budget=PSS_CAM_DIMS)
    ro, rd = primary_rays(scene, static, rng0, pixel_x, pixel_y)
    eps = scene.epsilon
    # lane shuffling is only worth it when traversal cares about
    # coherence (block-culled / packet paths); dense scenes skip it
    do_sort = static.n_primitives > DENSE_MAX \
        and "sort" not in common.KNOCK
    if psample is not None:
        assert not do_sort, \
            "PSSMLT requires the unsorted dense-regime wavefront"

    li = jnp.zeros((n, 3), jnp.float32)
    beta = jnp.ones((n, 3), jnp.float32)
    specular = jnp.zeros(n, bool)
    alive = jnp.ones(n, bool)
    prev_pdf = jnp.ones(n, jnp.float32)
    lane_id = jnp.arange(n, dtype=jnp.int32)

    if do_sort:
        # primary rays arrive in raster order: long scanlines that
        # union wide BVH subtrees per packet. A 2-D pixel-morton
        # shuffle tiles each packet into a compact screen square —
        # measured 13.7 -> 7.6 iters/packet on the dragon primaries
        # (tools/sim_walk.py; _sort_key is no help here because all
        # primaries share one origin cell). All other lane state is
        # still uniform at this point; the final lane_id sort undoes
        # the shuffle.
        mkey = jnp.zeros(n, jnp.int32)
        for b in range(10):
            mkey = mkey | (((pixel_x >> b) & 1) << (2 * b)) \
                | (((pixel_y >> b) & 1) << (2 * b + 1))
        (_, rox, roy, roz, rdx, rdy, rdz, lane_id) = jax.lax.sort(
            (mkey, ro[:, 0], ro[:, 1], ro[:, 2],
             rd[:, 0], rd[:, 1], rd[:, 2], lane_id), num_keys=1)
        ro = jnp.stack([rox, roy, roz], axis=-1)
        rd = jnp.stack([rdx, rdy, rdz], axis=-1)

    def bounce(carry, bounce_idx):
        ro, rd, li, beta, specular, alive, prev_pdf, lane_id = carry
        if psample is None:
            rng = RngStream(jax.random.fold_in(key, 1000 + bounce_idx))
        else:
            from gpu_pathtracer_tpu.core.rng import (
                PSS_BOUNCE_DIMS, PSS_CAM_DIMS, PrimarySampleStream)
            rng = PrimarySampleStream(
                psample, PSS_CAM_DIMS + bounce_idx * PSS_BOUNCE_DIMS,
                budget=PSS_BOUNCE_DIMS)
        n_alive_in = jnp.sum(alive.astype(jnp.int32))

        hit = traverse.intersect_closest(
            scene, static, ro, rd, eps,
            jnp.where(alive, jnp.inf, eps))

        li, alive = _arrival_credit(
            scene, static, hit, ro, rd, li, beta, specular, prev_pdf,
            alive, bounce_idx == 0)

        # subsurface hits: dipole single+multiple scatter, then terminate.
        # The reference ships SingleScatter/MultipleScatter dormant
        # (pathtracer.cu:362-487, no kernel calls them); here they are the
        # live shading path for primitives with a bssrdf index.
        if static.has_bssrdf:
            from gpu_pathtracer_tpu.shade import bssrdf as bssrdf_mod
            sss = alive & (hit.bssrdf_idx >= 0)
            ls = bssrdf_mod.single_scatter(
                scene, static, rng, hit.pos, hit.nor, hit.bssrdf_idx,
                -rd, sss)
            ls += bssrdf_mod.multiple_scatter(
                scene, static, rng, hit.pos, hit.nor, hit.bssrdf_idx,
                -rd, sss)
            ls_ok = jnp.all(jnp.isfinite(ls), axis=-1)
            li += jnp.where((sss & ls_ok)[:, None], beta * ls, 0.0)
            alive &= ~sss

        mat = bsdf_mod.gather_materials(scene, static, hit.mat_idx, hit.uv)
        wi = -rd
        not_delta = ~bsdf_mod.is_delta(mat.type)

        # NEE light-sample branch (pathtracer.cu:925-951)
        if "nee" not in common.KNOCK:
            ld = direct_light_nee(scene, static, rng, hit.pos, hit.nor,
                                  hit.dpdu, mat, wi, alive & not_delta)
            li += beta * ld

        # one BSDF sample: continuation + MIS pdf (pathtracer.cu:997-1008)
        u1, u2, u3 = rng.uniform3((n,))
        wo, fr, pdf = bsdf_mod.sample_bsdf(
            mat, wi, hit.nor, hit.dpdu, u1, u2, u3, static.material_types)
        dead = is_black(fr) | (pdf <= 0.0)
        alive &= ~dead
        beta_next = beta * fr * jnp.abs(dot(hit.nor, wo))[:, None] \
            / jnp.maximum(pdf, 1e-30)[:, None]
        beta = jnp.where(alive[:, None], beta_next, beta)
        specular = jnp.where(alive, bsdf_mod.is_delta(mat.type), specular)
        prev_pdf = jnp.where(alive, pdf, prev_pdf)

        ro = jnp.where(alive[:, None], hit.pos, ro)
        rd = jnp.where(alive[:, None], wo, rd)

        # Russian roulette after bounce 3 (pathtracer.cu:1010-1016)
        u_rr = rng.uniform((n,))
        illumate = jnp.clip(1.0 - luminance(beta), 0.0, 1.0)
        do_rr = (bounce_idx > 3) & alive
        alive &= ~(do_rr & (u_rr < illumate))
        rr_scale = 1.0 / jnp.maximum(1.0 - illumate, 1e-30)
        beta = jnp.where((do_rr & alive)[:, None], beta * rr_scale[:, None],
                         beta)

        # re-sort the wavefront by the next ray's coherence key — a
        # multi-operand lax.sort (bitonic network, ~0.1 ms at 262k lanes),
        # NOT a gather; dead lanes compact to the tail
        if do_sort:
            skey = _sort_key(scene, ro, rd, alive)
            (_, rox, roy, roz, rdx, rdy, rdz, l0, l1, l2, b0, b1, b2,
             spec_i, alive_i, prev_pdf, lane_id) = jax.lax.sort(
                (skey, ro[:, 0], ro[:, 1], ro[:, 2],
                 rd[:, 0], rd[:, 1], rd[:, 2],
                 li[:, 0], li[:, 1], li[:, 2],
                 beta[:, 0], beta[:, 1], beta[:, 2],
                 specular.astype(jnp.int32), alive.astype(jnp.int32),
                 prev_pdf, lane_id), num_keys=1)
            ro = jnp.stack([rox, roy, roz], axis=-1)
            rd = jnp.stack([rdx, rdy, rdz], axis=-1)
            li = jnp.stack([l0, l1, l2], axis=-1)
            beta = jnp.stack([b0, b1, b2], axis=-1)
            specular = spec_i.astype(bool)
            alive = alive_i.astype(bool)

        # rays this bounce: 1 closest + NEE shadow on non-delta lanes
        nee_lanes = jnp.sum((alive & not_delta).astype(jnp.int32))
        rays = n_alive_in + nee_lanes
        return (ro, rd, li, beta, specular, alive, prev_pdf, lane_id), rays

    carry = (ro, rd, li, beta, specular, alive, prev_pdf, lane_id)
    carry, rays_per_bounce = jax.lax.scan(
        bounce, carry, jnp.arange(static.max_depth))
    ro, rd, li, beta, specular, alive, prev_pdf, lane_id = carry

    # epilogue: the last bounce's continuation ray still owes its
    # emitter/env credit (the reference's BSDF-side branch at the final
    # depth, pathtracer.cu:953-992)
    hit = traverse.intersect_closest(
        scene, static, ro, rd, eps, jnp.where(alive, jnp.inf, eps))
    li, _ = _arrival_credit(
        scene, static, hit, ro, rd, li, beta, specular, prev_pdf,
        alive, jnp.zeros(n, bool))
    tail_rays = jnp.sum(alive.astype(jnp.int32))

    # restore pixel order after the coherence shuffles (another sort
    # network keyed by lane id — no scatter)
    if do_sort:
        (_, l0, l1, l2) = jax.lax.sort(
            (lane_id, li[:, 0], li[:, 1], li[:, 2]), num_keys=1)
        li = jnp.stack([l0, l1, l2], axis=-1)

    # NaN/Inf guard (pathtracer.cu:1019-1020); unlike the reference (which
    # keeps the previous frame's value) we zero poisoned lanes.
    bad = jnp.any(~jnp.isfinite(li), axis=-1)
    li = jnp.where(bad[:, None], 0.0, li)
    if with_stats:
        return li, jnp.sum(rays_per_bounce) + tail_rays
    return li
