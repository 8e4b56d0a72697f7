"""Light tracing: paths start at lights and splat to the camera.

Re-expression of the reference LightTracing kernel (pathtracer.cu:
1246-1389). One light path per lane per iteration; at the emission point
and every scattering event the path connects to the camera through
`SampleCamera` and splats `beta * we * fr * Tr / cameraPdf` at the raster
pixel. The CUDA atomicAdd film (pathtracer.cu:1320-1322) becomes a
deterministic scatter-add into a per-tile film that the driver sums —
order-independent, reproducible.

Quirk kept: the emission-point splat adds `tr * radiance` without the
camera importance factor (pathtracer.cu:1282-1286).

BSDF sampling uses TransportMode::Importance (pathtracer.cu:1370) so the
dielectric radiance-compression factor lands on the correct side.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.core.rng import RngStream
from gpu_pathtracer_tpu.core.vecmath import dot, is_black, luminance
from gpu_pathtracer_tpu.geom import traverse
from gpu_pathtracer_tpu.shade import bsdf as bsdf_mod
from gpu_pathtracer_tpu.shade import camera as camera_mod
from gpu_pathtracer_tpu.shade import lights as lights_mod
from gpu_pathtracer_tpu.shade import media as media_mod

INTERFACE_BUDGET = 8


def _splat(film, raster_x, raster_y, width, L, valid):
    """Deterministic scatter-add splat (replaces atomicAdd)."""
    ok = valid & jnp.all(jnp.isfinite(L), axis=-1)
    idx = jnp.where(ok, raster_x + raster_y * width, 0)
    contrib = jnp.where(ok[:, None], L, 0.0)
    return film.at[idx].add(contrib)


def _connect_camera(scene, static, key, pos, med_idx, active):
    """SampleCamera + transmittance toward the lens.
    Returns (we[N], inv_pdf[N], tr[N,3], rx, ry, ok)."""
    eps = scene.epsilon
    ro, sd, st, we, pdf, rx, ry = camera_mod.sample_camera(
        scene.camera, pos, eps)
    ok = active & (pdf != 0.0)
    if static.has_media:
        tr = media_mod.transmittance(
            scene, static, med_idx, ro, sd, jnp.where(ok, st, 0.0),
            key, ok)
    else:
        blocked = traverse.intersect_any(
            scene, static, ro, sd, eps, jnp.where(ok, st, 0.0))
        tr = jnp.where(blocked[:, None], 0.0, 1.0) * jnp.ones(
            pos.shape, jnp.float32)
    ok &= ~is_black(tr)
    inv_pdf = 1.0 / jnp.maximum(pdf, 1e-30)
    return we, inv_pdf, tr, rx, ry, ok


def render_film(scene, static, key, n_paths: int):
    """Trace n_paths light paths; returns a film [W*H, 3] of splats."""
    n = n_paths
    width = static.width
    film = jnp.zeros((static.width * static.height, 3), jnp.float32)
    rng = RngStream(key)
    eps = scene.epsilon

    # ---- emission sampling (area.h:21-26; pathtracer.cu:1264-1275) ------
    u_pick = rng.uniform((n,))
    light_idx, choice_pdf = lights_mod.pick_light(scene, u_pick)
    # LT ignores the infinite light as a source (reference indexes
    # kernel_lights directly); clamp to area lights
    light_idx = jnp.minimum(light_idx, max(static.n_lights - 1, 0))
    u1, u2, u3, = rng.uniform3((n,))
    u4 = rng.uniform((n,))
    ro, rd, l_nor, radiance, pdf_a, pdf_w = \
        lights_mod.sample_area_light_emission(
            scene, light_idx, u1, u2, u3, u4, eps)
    med = jnp.full(n, -1, jnp.int32)
    if static.has_media:
        l_med = jnp.take(scene.l_medium, jnp.minimum(
            light_idx, max(static.n_lights - 1, 0)), axis=0)
        med = l_med

    denom = jnp.maximum(pdf_a * pdf_w * choice_pdf, 1e-30)
    beta = radiance * (jnp.abs(dot(rd, l_nor)) / denom)[:, None]
    alive = jnp.ones(n, bool) & (static.n_lights > 0)

    # emission-point splat (quirk: adds tr * radiance only,
    # pathtracer.cu:1282-1286)
    _, _, tr0, rx0, ry0, ok0 = _connect_camera(
        scene, static, jax.random.fold_in(key, 1), ro, med, alive)
    film = _splat(film, rx0, ry0, width, tr0 * radiance, ok0)

    depth = jnp.zeros(n, jnp.int32)
    n_iters = static.max_depth + (INTERFACE_BUDGET if static.has_media
                                  else 0)

    def step(carry, it):
        film, ro, rd, beta, alive, depth, med = carry
        skey = jax.random.fold_in(key, 100 + it)
        rng = RngStream(jax.random.fold_in(skey, 0))

        hit = traverse.intersect_closest(
            scene, static, ro, rd, eps, jnp.where(alive, jnp.inf, eps))
        alive &= hit.valid

        if static.has_media:
            weight, t_med, sampled = media_mod.medium_sample(
                scene, static, med, ro, rd, hit.t,
                jax.random.fold_in(skey, 1), alive)
            beta = jnp.where(alive[:, None], beta * weight, beta)
            alive &= ~is_black(beta)
        else:
            sampled = jnp.zeros(n, bool)
            t_med = hit.t

        # ---- medium scatter: splat + phase bounce (cu:1306-1330) -------
        in_scatter = alive & sampled
        sample_pos = ro + rd * t_med[:, None]
        if static.has_media:
            we, inv_pdf, tr, rx, ry, ok = _connect_camera(
                scene, static, jax.random.fold_in(skey, 2), sample_pos,
                med, in_scatter)
            # phase toward the camera
            _, sd, _, _, pdf_c, _, _ = camera_mod.sample_camera(
                scene.camera, sample_pos, eps)
            ph = media_mod.phase(scene, med, -rd, sd)
            L = beta * (we * inv_pdf * ph)[:, None] * tr
            film = _splat(film, rx, ry, width, L, ok)

            pu1, pu2 = rng.uniform2((n,))
            new_dir, _ = media_mod.sample_phase(scene, med, -rd, pu1, pu2)
            ro = jnp.where(in_scatter[:, None], sample_pos, ro)
            rd = jnp.where(in_scatter[:, None], new_dir, rd)

        # ---- surface ----------------------------------------------------
        on_surface = alive & ~sampled
        interface = on_surface & (hit.mat_idx == -1)
        going_out = dot(rd, hit.nor) > 0.0
        side_med = jnp.where(going_out, hit.medium_outside,
                             hit.medium_inside)
        med = jnp.where(interface, side_med, med)
        ro = jnp.where(interface[:, None], hit.pos, ro)
        on_surface &= ~interface

        mat = bsdf_mod.gather_materials(scene, static, hit.mat_idx, hit.uv)
        wi = -rd
        not_delta = ~bsdf_mod.is_delta(mat.type)

        # camera connection from the surface (cu:1344-1365)
        conn = on_surface & not_delta
        we, inv_pdf, tr, rx, ry, ok = _connect_camera(
            scene, static, jax.random.fold_in(skey, 3), hit.pos, med, conn)
        _, sd, _, _, _, _, _ = camera_mod.sample_camera(
            scene.camera, hit.pos, eps)
        fr, _ = bsdf_mod.eval_bsdf(
            mat, wi, sd, hit.nor, hit.dpdu, static.material_types,
            mode=bsdf_mod.IMPORTANCE)
        L = tr * beta * fr * (we * inv_pdf
                              * jnp.abs(dot(sd, hit.nor)))[:, None]
        film = _splat(film, rx, ry, width, L, ok)

        # bounce with importance transport (cu:1367-1378)
        u1, u2, u3 = rng.uniform3((n,))
        wo, fr_s, pdf_s = bsdf_mod.sample_bsdf(
            mat, wi, hit.nor, hit.dpdu, u1, u2, u3, static.material_types,
            mode=bsdf_mod.IMPORTANCE)
        dead = on_surface & (is_black(fr_s) | (pdf_s <= 0.0))
        alive &= ~dead
        surf_go = on_surface & ~dead
        beta_next = beta * fr_s * jnp.abs(dot(wo, hit.nor))[:, None] \
            / jnp.maximum(pdf_s, 1e-30)[:, None]
        beta = jnp.where(surf_go[:, None], beta_next, beta)
        out_side = jnp.where(dot(wo, hit.nor) > 0.0, hit.medium_outside,
                             hit.medium_inside)
        same_side = dot(wi, hit.nor) * dot(wo, hit.nor) > 0.0
        med = jnp.where(surf_go, jnp.where(same_side, med, out_side), med)
        ro = jnp.where(surf_go[:, None], hit.pos, ro)
        rd = jnp.where(surf_go[:, None], wo, rd)

        consumed = in_scatter | surf_go
        depth = jnp.where(consumed, depth + 1, depth)
        alive &= depth < static.max_depth

        # RR (cu:1381-1387)
        u_rr = rng.uniform((n,))
        illumate = jnp.clip(1.0 - luminance(beta), 0.0, 1.0)
        do_rr = (depth > 4) & alive & consumed
        alive &= ~(do_rr & (u_rr < illumate))
        rr_scale = 1.0 / jnp.maximum(1.0 - illumate, 1e-30)
        beta = jnp.where((do_rr & alive)[:, None],
                         beta * rr_scale[:, None], beta)

        return (film, ro, rd, beta, alive, depth, med), None

    carry = (film, ro, rd, beta, alive, depth, med)
    carry, _ = jax.lax.scan(step, carry, jnp.arange(n_iters))
    return carry[0]
