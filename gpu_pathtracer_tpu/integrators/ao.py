"""Ambient-occlusion integrator (reference Ao kernel, pathtracer.cu:830-877).

One primary ray per lane, one cosine-weighted occlusion probe capped at
maxDist.
"""

from __future__ import annotations

import jax.numpy as jnp

from gpu_pathtracer_tpu.core.rng import RngStream
from gpu_pathtracer_tpu.core.sampling import cosine_hemisphere
from gpu_pathtracer_tpu.core.vecmath import (
    INV_PI, cross, dot, face_forward, to_world,
)
from gpu_pathtracer_tpu.geom import traverse
from gpu_pathtracer_tpu.integrators.common import primary_rays


def render_lanes(scene, static, key, pixel_x, pixel_y):
    """Returns per-lane radiance [N, 3] for one AO sample."""
    rng = RngStream(key)
    ro, rd = primary_rays(scene, static, rng, pixel_x, pixel_y)
    eps = scene.epsilon

    hit = traverse.intersect_closest(
        scene, static, ro, rd, eps, jnp.full(ro.shape[0], jnp.inf))

    nor = face_forward(hit.nor, -rd)
    u1, u2 = rng.uniform2((ro.shape[0],))
    local, pdf = cosine_hemisphere(u1, u2)
    uu = hit.dpdu
    ww = cross(uu, nor)
    probe = to_world(local, uu, nor, ww)
    cosine = dot(probe, nor)

    occluded = traverse.intersect_any(
        scene, static, hit.pos, probe, eps,
        jnp.where(hit.valid, jnp.float32(static.max_dist), 0.0))

    v = cosine * INV_PI / jnp.maximum(pdf, 1e-30)
    v = jnp.where(hit.valid & ~occluded, v, 0.0)
    v = jnp.where(jnp.isnan(v), 0.0, v)
    return jnp.stack([v, v, v], axis=-1)
