"""Shared integrator pieces: primary-ray generation and NEE direct lighting.

The direct-lighting estimator here is the MIS pair from the reference Path
kernel (pathtracer.cu:924-995): a light-sample branch (area or infinite,
shadow-tested with any-hit) and a BSDF-sample branch (closest-hit re-tested
against emitters), combined with the power heuristic.
"""

from __future__ import annotations

import jax.numpy as jnp

from gpu_pathtracer_tpu.core.rng import RngStream
from gpu_pathtracer_tpu.core.sampling import power_heuristic, uniform_disk
from gpu_pathtracer_tpu.core.vecmath import dot, is_black
from gpu_pathtracer_tpu.geom import traverse
from gpu_pathtracer_tpu.shade import bsdf as bsdf_mod
from gpu_pathtracer_tpu.shade import camera as camera_mod
from gpu_pathtracer_tpu.shade import lights as lights_mod

# Trace-time knockout set for in-jit cost anatomy (tools/
# bench_pt_anatomy.py — same pattern as integrators/bdpt.py::KNOCK).
# Members: "nee_walk" (NEE occlusion walk skipped, tr=1), "nee" (whole
# NEE branch, read by pt.py), "sort" (wavefront coherence sorts, read by
# pt.py), "nee_sort" (the dedicated shadow-ray sort below); vpt.py reads
# "msample" (medium distance sampling), "tr_scatter" (in-scatter NEE Tr),
# "tr_surf" (surface NEE Tr), "tr_seg" (emitter full-credit segment Tr).
# Never set in production paths.
KNOCK: frozenset = frozenset()

# None = auto (TPU packet regime only); tests force True/False to check
# sorted-vs-direct equivalence off-TPU
FORCE_SHADOW_SORT = None


def _shadow_sort_key(scene, pos, active):
    """Origin-morton (6 bits/axis) coherence key for NEE shadow rays.

    Shadow rays all aim at the same light, so direction coherence is
    free and ORIGIN clustering is the whole game: the any-hit packet
    walk simulator (tools/sim_shadow.py, dragon 100k) measures 69
    iters/packet for origin-morton-sorted shadow rays vs 161 unsorted
    and 266 for closest-hit bounce walks — the wavefront's bounce-key
    order (octant-major) scatters shadow origins across packets.
    Inactive lanes sort past every live key so all-dead packets retire
    in one iteration of the early-exit any-hit walk."""
    q = jnp.clip(((pos - scene.world_center) / (2.0 * scene.world_radius)
                  + 0.5) * 63.999, 0.0, 63.0).astype(jnp.int32)
    m = jnp.zeros(pos.shape[0], jnp.int32)
    for b in range(6):
        for a in range(3):
            m |= ((q[:, a] >> b) & 1) << (3 * b + a)
    return jnp.where(active, m, jnp.int32(1) << 24)


def _occluded_sorted(scene, static, pos, sd, st, cand, eps):
    """Any-hit occlusion, shadow-sorted in the packet-walk regime.

    Sorts (key, ray, lane) with one multi-operand lax.sort (bitonic,
    ~0.1 ms at 262k — CLAUDE.md), walks, scatters the verdict back by
    lane id. Light-sample draws happen BEFORE this call, so lane rng
    streams are untouched and the estimator is bit-identical."""
    import jax
    on_tpu = jax.default_backend() == "tpu"
    use_sort = (on_tpu and (static.n_primitives > 65536
                            or static.bvh8_n_inst)
                and pos.shape[0] >= 4096) \
        if FORCE_SHADOW_SORT is None else FORCE_SHADOW_SORT
    use_sort = use_sort and "nee_sort" not in KNOCK
    st_w = jnp.where(cand, st, 0.0)
    if not use_sort:
        return traverse.intersect_any(scene, static, pos, sd, eps, st_w)
    n = pos.shape[0]
    lane = jnp.arange(n, dtype=jnp.int32)
    key9 = _shadow_sort_key(scene, pos, cand & (st_w > 0.0))
    (_, px, py, pz, dx, dy, dz, st_s, lane_s) = jax.lax.sort(
        (key9, pos[:, 0], pos[:, 1], pos[:, 2],
         sd[:, 0], sd[:, 1], sd[:, 2], st_w, lane),
        dimension=0, num_keys=1)
    occ_s = traverse.intersect_any(
        scene, static, jnp.stack([px, py, pz], axis=-1),
        jnp.stack([dx, dy, dz], axis=-1), eps, st_s)
    return jnp.zeros(n, bool).at[lane_s].set(occ_s, unique_indices=True)


def primary_rays(scene, static, rng: RngStream, pixel_x, pixel_y):
    """Jittered primary rays with aperture samples (pathtracer.cu:892-897)."""
    ox = rng.uniform(pixel_x.shape) - 0.5
    oy = rng.uniform(pixel_x.shape) - 0.5
    u1, u2 = rng.uniform2(pixel_x.shape)
    aperture, _ = uniform_disk(u1, u2)
    ro, rd = camera_mod.generate_primary_ray(
        scene.camera, pixel_x.astype(jnp.float32) + ox,
        pixel_y.astype(jnp.float32) + oy, aperture,
        static.environment_camera)
    return ro, rd


def direct_light_nee(scene, static, rng: RngStream, pos, nor, dpdu,
                     mat: bsdf_mod.MatParams, wi, active):
    """The light-sample half of the MIS pair (pathtracer.cu:925-951) on
    its own. The BSDF-sample half is folded into the path's continuation
    ray by integrators that reuse the bounce sample (integrators.pt) —
    same estimator, one less traversal + BSDF sample per bounce."""
    n_lane = pos.shape[0]
    ld = jnp.zeros((n_lane, 3), jnp.float32)
    eps = scene.epsilon

    u_pick = rng.uniform((n_lane,))
    idx, choice_pdf = lights_mod.pick_light(scene, u_pick)
    is_inf = idx == static.n_lights
    u1, u2 = rng.uniform2((n_lane,))

    if static.n_lights > 0:
        (rad_a, so_a, sd_a, st_a, _ln_a, pdf_a) = \
            lights_mod.sample_area_light(scene, idx, pos, u1, u2, eps)
    else:
        rad_a = jnp.zeros((n_lane, 3))
        sd_a = nor
        st_a = jnp.zeros(n_lane)
        pdf_a = jnp.zeros(n_lane)
    if static.has_infinite:
        (rad_i, so_i, sd_i, st_i, _ln_i, pdf_i) = \
            lights_mod.sample_infinite_light(scene, pos, u1, u2, eps)
        rad = jnp.where(is_inf[:, None], rad_i, rad_a)
        sd = jnp.where(is_inf[:, None], sd_i, sd_a)
        st = jnp.where(is_inf, st_i, st_a)
        light_pdf = jnp.where(is_inf, pdf_i, pdf_a)
    else:
        rad, sd, st, light_pdf = rad_a, sd_a, st_a, pdf_a

    cand = active & ~is_black(rad) & (light_pdf > 0.0)
    if "nee_walk" not in KNOCK:
        occluded = _occluded_sorted(scene, static, pos, sd, st, cand, eps)
        cand &= ~occluded

    fr, sample_pdf = bsdf_mod.eval_bsdf(
        mat, wi, sd, nor, dpdu, static.material_types)
    weight = power_heuristic(1, light_pdf * choice_pdf, 1, sample_pdf)
    denom = jnp.maximum(light_pdf * choice_pdf, 1e-30)
    contrib = weight[:, None] * fr * rad * \
        jnp.abs(dot(nor, sd))[:, None] / denom[:, None]
    return ld + jnp.where(cand[:, None], contrib, 0.0)


def direct_light(scene, static, rng: RngStream, pos, nor, dpdu,
                 mat: bsdf_mod.MatParams, wi, active):
    """One-sample NEE with MIS for surface points (pathtracer.cu:924-995).

    `active` masks lanes that should compute (non-delta, alive). Returns
    Ld [N, 3] (zero on inactive lanes).
    """
    n_lane = pos.shape[0]
    ld = jnp.zeros((n_lane, 3), jnp.float32)
    eps = scene.epsilon

    # ---- light-sample branch ------------------------------------------
    u_pick = rng.uniform((n_lane,))
    idx, choice_pdf = lights_mod.pick_light(scene, u_pick)
    is_inf = idx == static.n_lights
    u1, u2 = rng.uniform2((n_lane,))

    if static.n_lights > 0:
        (rad_a, so_a, sd_a, st_a, _ln_a, pdf_a) = \
            lights_mod.sample_area_light(scene, idx, pos, u1, u2, eps)
    else:
        rad_a = jnp.zeros((n_lane, 3))
        so_a, sd_a = pos, nor
        st_a = jnp.zeros(n_lane)
        pdf_a = jnp.zeros(n_lane)
    if static.has_infinite:
        (rad_i, so_i, sd_i, st_i, _ln_i, pdf_i) = \
            lights_mod.sample_infinite_light(scene, pos, u1, u2, eps)
        rad = jnp.where(is_inf[:, None], rad_i, rad_a)
        sd = jnp.where(is_inf[:, None], sd_i, sd_a)
        st = jnp.where(is_inf, st_i, st_a)
        light_pdf = jnp.where(is_inf, pdf_i, pdf_a)
    else:
        rad, sd, st, light_pdf = rad_a, sd_a, st_a, pdf_a

    cand = active & ~is_black(rad) & (light_pdf > 0.0)
    # shadow test only for candidate lanes (others get tmax<=0 -> no work)
    occluded = traverse.intersect_any(
        scene, static, pos, sd, eps, jnp.where(cand, st, 0.0))
    cand &= ~occluded

    fr, sample_pdf = bsdf_mod.eval_bsdf(
        mat, wi, sd, nor, dpdu, static.material_types)
    weight = power_heuristic(1, light_pdf * choice_pdf, 1, sample_pdf)
    denom = jnp.maximum(light_pdf * choice_pdf, 1e-30)
    contrib = weight[:, None] * fr * rad * \
        jnp.abs(dot(nor, sd))[:, None] / denom[:, None]
    ld += jnp.where(cand[:, None], contrib, 0.0)

    # ---- BSDF-sample branch -------------------------------------------
    u1, u2, u3 = rng.uniform3((n_lane,))
    wo, fr_s, pdf_s = bsdf_mod.sample_bsdf(
        mat, wi, nor, dpdu, u1, u2, u3, static.material_types)
    cand_b = active & ~(is_black(fr_s) | (pdf_s == 0.0))
    hit = traverse.intersect_closest(
        scene, static, pos, wo, eps,
        jnp.where(cand_b, jnp.inf, eps))

    # hit an emitter (pathtracer.cu:960-977)
    if static.n_lights > 0:
        hit_light = cand_b & hit.valid & (hit.light_idx >= 0)
        le = lights_mod.area_light_le(scene, hit.light_idx, hit.nor, -wo)
        pdf_area, _ = lights_mod.area_light_pdf(scene, hit.light_idx, wo,
                                                hit.nor)
        lchoice = lights_mod.light_choice_pdf(scene, hit.light_idx)
        len2 = dot(hit.pos - pos, hit.pos - pos)
        cos_l = jnp.abs(dot(hit.nor, wo))
        l_pdf = pdf_area * len2 / jnp.maximum(cos_l, 1e-30)
        w_b = power_heuristic(1, pdf_s, 1, l_pdf * lchoice)
        contrib_b = w_b[:, None] * fr_s * le * \
            jnp.abs(dot(wo, nor))[:, None] / jnp.maximum(
                pdf_s, 1e-30)[:, None]
        hit_light &= ~is_black(le)
        ld += jnp.where(hit_light[:, None], contrib_b, 0.0)

    # missed everything -> infinite light (pathtracer.cu:978-991)
    if static.has_infinite:
        miss = cand_b & ~hit.valid
        le_inf = lights_mod.infinite_le(scene, wo)
        choice_inf = lights_mod.light_choice_pdf(
            scene, jnp.full_like(hit.light_idx, static.n_lights))
        _, pdf_w_inf = lights_mod.infinite_pdf(scene)
        w_i = power_heuristic(1, pdf_s, 1, pdf_w_inf * choice_inf)
        contrib_i = w_i[:, None] * fr_s * le_inf * \
            jnp.abs(dot(wo, nor))[:, None] / jnp.maximum(
                pdf_s, 1e-30)[:, None]
        ld += jnp.where(miss[:, None], contrib_i, 0.0)

    return ld
