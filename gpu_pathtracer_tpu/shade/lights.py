"""Light sampling: area (emissive triangles) + infinite environment light.

Batched re-expression of Area (area.h:7-42), Infinite (infinite.h:6-95) and
the light-pick distribution (scene.h:64-82, pathtracer.cu:171-185). The
reference's linear-scan CDF lookup (flagged "should use binary search" at
pathtracer.cu:171) becomes `jnp.searchsorted` — an actual binary search.
"""

from __future__ import annotations

import jax.numpy as jnp

from gpu_pathtracer_tpu.core.sampling import (
    cosine_hemisphere, uniform_sphere, uniform_triangle,
)
from gpu_pathtracer_tpu.core.vecmath import (
    INV_FOUR_PI, INV_PI, PI, TWO_PI, cross, dot, length, make_coordinate,
    normalize, to_world,
)
from gpu_pathtracer_tpu.shade.texture import env_lookup


def pick_light(scene, u):
    """Binary-search the normalized power CDF. Returns (idx[N], choice_pdf[N]).

    idx == n_lights denotes the infinite light (pathtracer.cu:930-931).
    """
    cdf = scene.light_cdf
    idx = jnp.clip(jnp.searchsorted(cdf, u, side="right") - 1,
                   0, cdf.shape[0] - 2).astype(jnp.int32)
    return idx, light_choice_pdf(scene, idx)


def light_choice_pdf(scene, idx):
    """PdfFromLightDistribution (pathtracer.cu:183-185)."""
    from gpu_pathtracer_tpu.ops.gather import take_rows
    cdf = scene.light_cdf
    # one MXU fetch of (cdf[i], cdf[i+1]) instead of two XLA gathers
    pair = jnp.stack([cdf[:-1], cdf[1:]], axis=-1)
    r = take_rows(pair, jnp.clip(idx, 0, cdf.shape[0] - 2))
    return r[:, 1] - r[:, 0]


def _gather_light_tri(scene, idx):
    """One packed fetch from light_attrs [L, 24] (ops/gather.py layout)."""
    from gpu_pathtracer_tpu.ops.gather import take_rows
    i = jnp.maximum(idx, 0)
    a = take_rows(scene.light_attrs, i)
    return (a[:, 0:3], a[:, 3:6], a[:, 6:9],
            a[:, 9:12], a[:, 12:15], a[:, 15:18], a[:, 18:21])


def _tri_area(v0, v1, v2):
    return 0.5 * length(cross(v1 - v0, v2 - v0))


def sample_area_light(scene, idx, pos, u1, u2, epsilon):
    """Area::SampleLight toward a shading point (area.h:14-19 +
    mesh.h:100-109): solid-angle pdf with one-sided emission.

    Returns (radiance[N,3], shadow_o, shadow_d, shadow_tmax, light_nor, pdf).
    """
    v0, v1, v2, n0, n1, n2, rad = _gather_light_tri(scene, idx)
    bu, bv = uniform_triangle(u1, u2)
    w = (1.0 - bu - bv)
    p = bu[..., None] * v0 + bv[..., None] * v1 + w[..., None] * v2
    nor = normalize(bu[..., None] * n0 + bv[..., None] * n1
                    + w[..., None] * n2)
    d = p - pos
    dist2 = dot(d, d)
    nd = normalize(d)
    area = _tri_area(v0, v1, v2)
    cos_l = jnp.abs(dot(nor, nd))
    pdf = dist2 / jnp.maximum(area * cos_l, 1e-30)
    # one-sided: emission only against the normal (mesh.h:107-108)
    pdf = jnp.where(dot(nor, d) >= 0.0, 0.0, pdf)
    radiance = jnp.where((pdf != 0.0)[..., None], rad, 0.0)
    tmax = jnp.sqrt(jnp.maximum(dist2 - epsilon, 0.0))
    return radiance, pos, nd, tmax, nor, pdf


def sample_area_light_emission(scene, idx, u1, u2, u3, u4, epsilon):
    """Area::SampleLight emitting a photon (area.h:21-26 + mesh.h:111-120).

    Returns (ray_o, ray_d, light_nor, radiance, pdf_a, pdf_w).
    """
    v0, v1, v2, n0, n1, n2, rad = _gather_light_tri(scene, idx)
    bu, bv = uniform_triangle(u1, u2)
    w = (1.0 - bu - bv)
    p = bu[..., None] * v0 + bv[..., None] * v1 + w[..., None] * v2
    nor = normalize(bu[..., None] * n0 + bv[..., None] * n1
                    + w[..., None] * n2)
    local, pdf_w = cosine_hemisphere(u3, u4)
    uu, ww = make_coordinate(nor)
    d = to_world(local, uu, nor, ww)
    pdf_a = 1.0 / jnp.maximum(_tri_area(v0, v1, v2), 1e-30)
    return p, d, nor, rad, pdf_a, pdf_w


def area_light_pdf(scene, idx, ray_d, nor):
    """Area::Pdf (area.h:28-32): pdfA = 1/area, pdfW = |cos|/pi (quirk:
    cosine-hemisphere pdf even though SampleLight uses solid-angle)."""
    v0, v1, v2, _, _, _, _ = _gather_light_tri(scene, idx)
    pdf_a = 1.0 / jnp.maximum(_tri_area(v0, v1, v2), 1e-30)
    pdf_w = jnp.abs(dot(ray_d, nor)) * INV_PI
    return pdf_a, pdf_w


def area_light_le(scene, idx, nor, dir_out):
    """Area::Le (area.h:38-41): one-sided emission."""
    from gpu_pathtracer_tpu.ops.gather import take_rows
    rad = take_rows(scene.light_attrs, jnp.maximum(idx, 0))[:, 18:21]
    return jnp.where((dot(nor, dir_out) > 0.0)[..., None], rad, 0.0)


# ---------------------------------------------------------------------------
# Infinite environment light (infinite.h)
# ---------------------------------------------------------------------------

def _env_uv_from_dir(scene, d):
    """Direction -> equirect uv in the light's rotated frame
    (infinite.h:47-58)."""
    costheta = dot(d, scene.env_v)
    theta = jnp.arccos(jnp.clip(costheta, -1.0, 1.0))
    flat = normalize(d - costheta[..., None] * scene.env_v)
    cosphi = dot(flat, scene.env_u)
    phi = jnp.arccos(jnp.clip(cosphi, -1.0, 1.0))
    c = dot(flat, scene.env_w)
    phi = jnp.where(c > 0.0, TWO_PI - phi, phi)
    uu = phi * (1.0 / TWO_PI)
    vv = theta * (1.0 / PI)
    return jnp.stack([1.0 - uu, vv], axis=-1)


def infinite_le(scene, d):
    """Infinite::Le (infinite.h:47-59)."""
    return env_lookup(scene, _env_uv_from_dir(scene, d))


def sample_infinite_light(scene, pos, u1, u2, epsilon):
    """Infinite::SampleLight (infinite.h:17-36): uniform-sphere direction
    (importance sampling is a TODO in the reference too).

    Returns (radiance, shadow_o, shadow_d, shadow_tmax, light_nor, pdf).
    """
    d, pdf = uniform_sphere(u1, u2)
    rad = env_lookup(scene, _env_uv_from_dir(scene, d))
    tmax = 2.0 * scene.world_radius - epsilon
    return rad, pos, d, tmax, -d, pdf


def infinite_pdf(scene):
    """Infinite::Pdf (infinite.h:38-41): (pdfA, pdfW)."""
    pdf_w = jnp.float32(INV_FOUR_PI)
    pdf_a = 1.0 / (PI * scene.world_radius * scene.world_radius)
    return pdf_a, pdf_w
