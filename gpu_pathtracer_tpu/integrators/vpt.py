"""Volumetric path tracer (reference Volpath kernel, pathtracer.cu:1025-1242).

PT plus participating media:
- distance sampling in the lane's current medium each segment;
- medium interactions do phase-function NEE (shadow rays attenuated by the
  interface-walking transmittance) and phase sampling;
- material-less hits (matIdx == -1) are medium interfaces: the ray passes
  through, switching media by crossing side, WITHOUT consuming a bounce
  (the reference decrements the loop counter, pathtracer.cu:1117-1124; we
  carry an explicit per-lane depth and give the scan a bounded
  interface-crossing budget);
- surface NEE/BSDF branches attenuate by transmittance instead of a binary
  shadow test, and the next-bounce medium follows the crossing side
  (pathtracer.cu:1224-1226);
- the camera may start inside a medium (pathtracer.cu:1043).

Estimator note (mirrors integrators.pt): the reference samples the BSDF
twice per surface bounce — once for its MIS branch (pathtracer.cu:
1157-1208) and once for the continuation. Here the continuation sample IS
the MIS sample: emitter/env arrivals of surface-sampled rays are credited
at the next intersection with the power-heuristic weight against the
stored BSDF pdf. Phase-sampled continuations get no arrival credit,
matching the reference (its medium NEE is light-sample-only and emitter
hits need bounces==0||specular, pathtracer.cu:1071-1101, 1103-1115).
Deviation: the reference attenuates its MIS branch by the current-segment
Tr only (no interface walk, quirk at 1178-1184); the reform's arrival
credit is attenuated by the distance-sampling weights of the actual
segments crossed — the physically consistent estimate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.core.rng import RngStream
from gpu_pathtracer_tpu.core.sampling import power_heuristic
from gpu_pathtracer_tpu.core.vecmath import dot, is_black, luminance
from gpu_pathtracer_tpu.geom import traverse
from gpu_pathtracer_tpu.integrators import common
from gpu_pathtracer_tpu.integrators.common import primary_rays
from gpu_pathtracer_tpu.shade import bsdf as bsdf_mod
from gpu_pathtracer_tpu.shade import lights as lights_mod
from gpu_pathtracer_tpu.shade import media as media_mod

INTERFACE_BUDGET = 8  # extra scan iterations for interface crossings


def _sample_light_toward(scene, static, rng, pos):
    """Shared light pick + sample (area or infinite) toward `pos`.
    Returns (radiance, dir, tmax, light_pdf, choice_pdf)."""
    n = pos.shape[0]
    eps = scene.epsilon
    u_pick = rng.uniform((n,))
    idx, choice_pdf = lights_mod.pick_light(scene, u_pick)
    is_inf = idx == static.n_lights
    u1, u2 = rng.uniform2((n,))

    if static.n_lights > 0:
        rad_a, _, sd_a, st_a, _, pdf_a = lights_mod.sample_area_light(
            scene, idx, pos, u1, u2, eps)
    else:
        rad_a = jnp.zeros((n, 3))
        sd_a = pos
        st_a = jnp.zeros(n)
        pdf_a = jnp.zeros(n)
    if static.has_infinite:
        rad_i, _, sd_i, st_i, _, pdf_i = lights_mod.sample_infinite_light(
            scene, pos, u1, u2, eps)
        rad = jnp.where(is_inf[:, None], rad_i, rad_a)
        sd = jnp.where(is_inf[:, None], sd_i, sd_a)
        st = jnp.where(is_inf, st_i, st_a)
        light_pdf = jnp.where(is_inf, pdf_i, pdf_a)
    else:
        rad, sd, st, light_pdf = rad_a, sd_a, st_a, pdf_a
    return rad, sd, st, light_pdf, choice_pdf


def _direct_light_vol(scene, static, rng, key, pos, nor, dpdu, mat, wi,
                      med_idx, active):
    """Surface NEE light branch with MIS weight, shadow rays attenuated by
    the interface-walking transmittance (pathtracer.cu:1128-1155). The
    BSDF-side branch lives in the arrival credit of the continuation ray
    (see module docstring)."""
    n = pos.shape[0]
    eps = scene.epsilon
    ld = jnp.zeros((n, 3), jnp.float32)

    rad, sd, st, light_pdf, choice_pdf = _sample_light_toward(
        scene, static, rng, pos)
    cand = active & ~is_black(rad) & (light_pdf > 0.0)
    fr, sample_pdf = bsdf_mod.eval_bsdf(
        mat, wi, sd, nor, dpdu, static.material_types)
    if "tr_surf" in common.KNOCK:
        tr = jnp.ones((n, 3), jnp.float32)
    else:
        tr = media_mod.transmittance(
            scene, static, med_idx, pos, sd,
            jnp.where(cand, st, 0.0), jax.random.fold_in(key, 101), cand)
    weight = power_heuristic(1, light_pdf * choice_pdf, 1, sample_pdf)
    denom = jnp.maximum(light_pdf * choice_pdf, 1e-30)
    contrib = weight[:, None] * tr * fr * rad * \
        jnp.abs(dot(nor, sd))[:, None] / denom[:, None]
    ld += jnp.where(cand[:, None], contrib, 0.0)

    return ld


def render_lanes(scene, static, key, pixel_x, pixel_y):
    """Returns per-lane radiance [N, 3] for one volumetric-PT sample."""
    n = pixel_x.shape[0]
    rng0 = RngStream(key)
    ro, rd = primary_rays(scene, static, rng0, pixel_x, pixel_y)
    eps = scene.epsilon

    li = jnp.zeros((n, 3), jnp.float32)
    beta = jnp.ones((n, 3), jnp.float32)
    specular = jnp.zeros(n, bool)
    alive = jnp.ones(n, bool)
    depth = jnp.zeros(n, jnp.int32)
    med = jnp.full(n, static.camera_medium, jnp.int32)  # pathtracer.cu:1043
    prev_pdf = jnp.ones(n, jnp.float32)
    from_surf = jnp.zeros(n, bool)

    # +1: the final bounce's continuation still owes its arrival credit
    n_iters = static.max_depth + INTERFACE_BUDGET + 1

    def step(carry, it):
        (ro, rd, li, beta, specular, alive, depth, med, prev_pdf,
         from_surf) = carry
        skey = jax.random.fold_in(key, 10_000 + it)
        rng = RngStream(jax.random.fold_in(skey, 0))

        hit = traverse.intersect_closest(
            scene, static, ro, rd, eps, jnp.where(alive, jnp.inf, eps))

        # miss -> env on primary/specular (pathtracer.cu:1051-1055)
        miss = alive & ~hit.valid
        if static.has_infinite:
            env = lights_mod.infinite_le(scene, rd)
            full = (depth == 0) | specular
            choice_inf = lights_mod.light_choice_pdf(
                scene, jnp.full(n, static.n_lights, jnp.int32))
            _, pdf_w_inf = lights_mod.infinite_pdf(scene)
            w_env = jnp.where(full, 1.0, power_heuristic(
                1, prev_pdf, 1, pdf_w_inf * choice_inf))
            take_env = miss & (full | from_surf)
            li += jnp.where(take_env[:, None],
                            beta * env * w_env[:, None], 0.0)
        alive &= hit.valid

        # medium distance sampling over [0, hit.t] (pathtracer.cu:1062-1070)
        if static.has_media and "msample" not in common.KNOCK:
            weight, t_med, sampled = media_mod.medium_sample(
                scene, static, med, ro, rd, hit.t,
                jax.random.fold_in(skey, 1), alive)
            beta = jnp.where(alive[:, None], beta * weight, beta)
            alive &= ~is_black(beta)
        else:
            sampled = jnp.zeros(n, bool)
            t_med = hit.t

        # crediting-only lanes (past max_depth) that scatter in a medium
        # never reach their surface credit: they are done
        at_max = depth >= static.max_depth
        alive &= ~(sampled & at_max)

        # ---------- medium interaction (pathtracer.cu:1071-1101) --------
        in_scatter = alive & sampled
        sample_pos = ro + rd * t_med[:, None]
        if static.has_media:
            rad, sd, st, light_pdf, choice_pdf = _sample_light_toward(
                scene, static, rng, sample_pos)
            cand = in_scatter & ~is_black(rad) & (light_pdf > 0.0)
            if "tr_scatter" in common.KNOCK:
                tr = jnp.ones((n, 3), jnp.float32)
            else:
                tr = media_mod.transmittance(
                    scene, static, med, sample_pos, sd,
                    jnp.where(cand, st, 0.0),
                    jax.random.fold_in(skey, 2), cand)
            ph = media_mod.phase(scene, med, -rd, sd)
            denom = jnp.maximum(light_pdf * choice_pdf, 1e-30)
            contrib = tr * beta * (ph / denom)[:, None] * rad
            li += jnp.where(cand[:, None], contrib, 0.0)

            u1, u2 = rng.uniform2((n,))
            new_dir, _ = media_mod.sample_phase(scene, med, -rd, u1, u2)
            ro = jnp.where(in_scatter[:, None], sample_pos, ro)
            rd = jnp.where(in_scatter[:, None], new_dir, rd)
            specular = jnp.where(in_scatter, False, specular)
            from_surf = jnp.where(in_scatter, False, from_surf)

        # ---------- surface interaction ---------------------------------
        on_surface = alive & ~sampled

        # emitter arrival (pathtracer.cu:1103-1115 + the reformulated
        # MIS branch of 1157-1208)
        if static.n_lights > 0:
            full = (depth == 0) | specular
            emitter = on_surface & (hit.light_idx >= 0)
            le = lights_mod.area_light_le(scene, hit.light_idx, hit.nor,
                                          -rd)
            # full-credit quirk kept: extra segment-Tr factor (cu:1105-1112)
            tr_e = media_mod.medium_tr_segment(
                scene, static, med, ro, rd,
                jnp.where(emitter & full, hit.t, 0.0),
                jax.random.fold_in(skey, 3), emitter & full) \
                if static.has_media and "tr_seg" not in common.KNOCK \
                else jnp.ones((n, 3))
            li += jnp.where((emitter & full)[:, None],
                            tr_e * beta * le, 0.0)
            pdf_area, _ = lights_mod.area_light_pdf(
                scene, jnp.maximum(hit.light_idx, 0), rd, hit.nor)
            lchoice = lights_mod.light_choice_pdf(
                scene, jnp.maximum(hit.light_idx, 0))
            seg = hit.pos - ro
            len2 = dot(seg, seg)
            cos_l = jnp.abs(dot(hit.nor, rd))
            l_pdf = pdf_area * len2 / jnp.maximum(cos_l, 1e-30)
            w_le = power_heuristic(1, prev_pdf, 1, l_pdf * lchoice)
            mis_hit = emitter & ~full & from_surf & ~is_black(le)
            li += jnp.where(mis_hit[:, None],
                            beta * le * w_le[:, None], 0.0)
            died = emitter & full
            alive &= ~died
            on_surface &= ~died

        # lanes past max_depth existed only to collect arrival credit
        alive &= ~at_max
        on_surface &= ~at_max

        # medium interface: pass through, no bounce consumed
        # (pathtracer.cu:1117-1124)
        interface = on_surface & (hit.mat_idx == -1)
        going_out = dot(rd, hit.nor) > 0.0
        side_med = jnp.where(going_out, hit.medium_outside,
                             hit.medium_inside)
        med = jnp.where(interface, side_med, med)
        ro = jnp.where(interface[:, None], hit.pos, ro)
        on_surface &= ~interface

        # real surface: NEE + BSDF sample (pathtracer.cu:1126-1228)
        mat = bsdf_mod.gather_materials(scene, static, hit.mat_idx, hit.uv)
        wi = -rd
        not_delta = ~bsdf_mod.is_delta(mat.type)
        ld = _direct_light_vol(
            scene, static, rng, skey, hit.pos, hit.nor, hit.dpdu, mat, wi,
            med, on_surface & not_delta)
        li += beta * ld

        u1, u2, u3 = rng.uniform3((n,))
        wo, fr, pdf = bsdf_mod.sample_bsdf(
            mat, wi, hit.nor, hit.dpdu, u1, u2, u3, static.material_types)
        dead = on_surface & (is_black(fr) | (pdf <= 0.0))
        alive &= ~dead
        surf_go = on_surface & ~dead

        beta_next = beta * fr * jnp.abs(dot(hit.nor, wo))[:, None] \
            / jnp.maximum(pdf, 1e-30)[:, None]
        beta = jnp.where(surf_go[:, None], beta_next, beta)
        specular = jnp.where(surf_go, bsdf_mod.is_delta(mat.type), specular)
        prev_pdf = jnp.where(surf_go, pdf, prev_pdf)
        from_surf = jnp.where(surf_go, ~bsdf_mod.is_delta(mat.type),
                              from_surf)

        # next-bounce medium by crossing side; reflections keep the
        # current medium (pathtracer.cu:1224-1226)
        out_side = jnp.where(dot(wo, hit.nor) > 0.0, hit.medium_outside,
                             hit.medium_inside)
        same_side = dot(wi, hit.nor) * dot(wo, hit.nor) > 0.0
        med = jnp.where(surf_go, jnp.where(same_side, med, out_side), med)
        ro = jnp.where(surf_go[:, None], hit.pos, ro)
        rd = jnp.where(surf_go[:, None], wo, rd)

        # depth: medium scatters + real surfaces consume a bounce;
        # interfaces don't (pathtracer.cu:1118)
        consumed = in_scatter | surf_go
        depth = jnp.where(consumed, depth + 1, depth)
        # lanes reaching max_depth stay alive ONE more intersection for
        # their arrival credit (killed at the top of the next step)

        # Russian roulette (pathtracer.cu:1231-1237); skipped on
        # interface passes (reference `continue`)
        u_rr = rng.uniform((n,))
        illumate = jnp.clip(1.0 - luminance(beta), 0.0, 1.0)
        do_rr = (depth > 4) & alive & consumed
        alive &= ~(do_rr & (u_rr < illumate))
        rr_scale = 1.0 / jnp.maximum(1.0 - illumate, 1e-30)
        beta = jnp.where((do_rr & alive)[:, None],
                         beta * rr_scale[:, None], beta)

        return (ro, rd, li, beta, specular, alive, depth, med, prev_pdf,
                from_surf), None

    def gated_step(carry, it):
        # whole-step skip once every path has terminated: with RR after
        # depth 4 most lanes die well before maxDepth+INTERFACE_BUDGET,
        # and a full step (traversal + tracking + NEE) is expensive
        return jax.lax.cond(
            jnp.any(carry[5]),
            lambda c: step(c, it)[0],
            lambda c: c,
            carry), None

    carry = (ro, rd, li, beta, specular, alive, depth, med, prev_pdf,
             from_surf)
    carry, _ = jax.lax.scan(gated_step, carry, jnp.arange(n_iters))
    li = carry[2]

    bad = jnp.any(~jnp.isfinite(li), axis=-1)
    return jnp.where(bad[:, None], 0.0, li)
