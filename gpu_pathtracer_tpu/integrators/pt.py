"""Wavefront path tracer (reference Path kernel, pathtracer.cu:880-1021).

The CUDA megakernel's per-thread bounce loop becomes a `lax.scan` over
bounces carrying fixed-shape lane state; dead lanes are masked. Per bounce:
closest-hit -> emitter/env accounting -> NEE with MIS -> BSDF sample ->
Russian roulette (luminance-based after bounce 3, pathtracer.cu:1010-1016).

Media are ignored here exactly like the reference PT (the next-bounce ray
drops the medium pointer, pathtracer.cu:1008); `vpt.py` is the
medium-aware variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.core.rng import RngStream
from gpu_pathtracer_tpu.core.vecmath import dot, is_black, luminance
from gpu_pathtracer_tpu.geom import traverse
from gpu_pathtracer_tpu.integrators.common import direct_light, primary_rays
from gpu_pathtracer_tpu.shade import bsdf as bsdf_mod
from gpu_pathtracer_tpu.shade import lights as lights_mod


def render_lanes(scene, static, key, pixel_x, pixel_y, with_stats=False):
    """Returns per-lane radiance [N, 3] for one path-traced sample.

    with_stats=True additionally returns the number of rays traced
    (closest-hit + any-hit across all bounces) for throughput metrics.
    """
    n = pixel_x.shape[0]
    rng0 = RngStream(key)
    ro, rd = primary_rays(scene, static, rng0, pixel_x, pixel_y)
    eps = scene.epsilon

    li = jnp.zeros((n, 3), jnp.float32)
    beta = jnp.ones((n, 3), jnp.float32)
    specular = jnp.zeros(n, bool)
    alive = jnp.ones(n, bool)

    def bounce(carry, bounce_idx):
        ro, rd, li, beta, specular, alive = carry
        rng = RngStream(jax.random.fold_in(key, 1000 + bounce_idx))
        n_alive_in = jnp.sum(alive.astype(jnp.int32))

        hit = traverse.intersect_closest(
            scene, static, ro, rd, eps,
            jnp.where(alive, jnp.inf, eps))

        # miss -> environment on primary/specular rays (pathtracer.cu:905-909)
        miss = alive & ~hit.valid
        if static.has_infinite:
            env = lights_mod.infinite_le(scene, rd)
            take_env = miss & ((bounce_idx == 0) | specular)
            li += jnp.where(take_env[:, None], beta * env, 0.0)
        alive &= hit.valid

        # hit an emitter on primary/specular rays (pathtracer.cu:917-922)
        if static.n_lights > 0:
            hit_light = alive & (hit.light_idx >= 0) & \
                ((bounce_idx == 0) | specular)
            le = lights_mod.area_light_le(scene, hit.light_idx, hit.nor, -rd)
            li += jnp.where(hit_light[:, None], beta * le, 0.0)
            # the reference breaks out after crediting the emitter
            alive &= ~(alive & (hit.light_idx >= 0)
                       & ((bounce_idx == 0) | specular))

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

        # NEE with MIS (pathtracer.cu:924-995)
        ld = direct_light(scene, static, rng, hit.pos, hit.nor, hit.dpdu,
                          mat, wi, alive & not_delta)
        li += beta * ld

        # sample the next bounce direction (pathtracer.cu:997-1008)
        u1, u2, u3 = rng.uniform3((n,))
        wo, fr, pdf = bsdf_mod.sample_bsdf(
            mat, wi, hit.nor, hit.dpdu, u1, u2, u3, static.material_types)
        dead = is_black(fr) | (pdf <= 0.0)
        alive &= ~dead
        beta_next = beta * fr * jnp.abs(dot(hit.nor, wo))[:, None] \
            / jnp.maximum(pdf, 1e-30)[:, None]
        beta = jnp.where(alive[:, None], beta_next, beta)
        specular = jnp.where(alive, bsdf_mod.is_delta(mat.type), specular)

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

        # rays this bounce: 1 closest + (NEE shadow + MIS closest) on
        # non-delta lanes (pathtracer.cu: Intersect x2 + IntersectP)
        nee_lanes = jnp.sum((alive & not_delta).astype(jnp.int32))
        rays = n_alive_in + 2 * nee_lanes
        return (ro, rd, li, beta, specular, alive), rays

    carry = (ro, rd, li, beta, specular, alive)
    (ro, rd, li, beta, specular, alive), rays_per_bounce = jax.lax.scan(
        bounce, carry, jnp.arange(static.max_depth))

    # NaN/Inf guard (pathtracer.cu:1019-1020); unlike the reference (which
    # keeps the previous frame's value) we zero poisoned lanes.
    bad = jnp.any(~jnp.isfinite(li), axis=-1)
    li = jnp.where(bad[:, None], 0.0, li)
    if with_stats:
        return li, jnp.sum(rays_per_bounce)
    return li
