"""BSDF sampling and evaluation for the six material models.

Wavefront re-expression of the reference's SampleBSDF / Fr
(pathtracer.cu:491-826): instead of a per-thread switch, every material
model present in the scene is evaluated masked over the whole lane batch and
the results selected by material type. Models absent from a scene
(StaticConfig.material_types) are pruned at trace time, so a lambertian-only
scene compiles only the lambertian math.

Conventions (identical to the reference):
- `wi` points AWAY from the surface toward the incoming ray origin
  (the reference's `in` = -ray.d);
- `wo` is the sampled outgoing direction;
- normals are the shading normals as intersected (not pre-flipped);
- pdf == 0 and fr == 0 mark invalid samples.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
from flax import struct

from gpu_pathtracer_tpu.core.vecmath import (
    INV_PI, PI, TWO_PI, cross, dot, dot3, face_forward, normalize, reflect,
    refract, same_hemisphere, to_world,
)
from gpu_pathtracer_tpu.core.sampling import cosine_hemisphere
from gpu_pathtracer_tpu.scene.model import MaterialType

RADIANCE = 0      # TransportMode::Radiance (material.h:8)
IMPORTANCE = 1    # TransportMode::Importance


@struct.dataclass
class MatParams:
    """Per-lane material parameters gathered at the hit's mat_idx."""
    type: jnp.ndarray       # [N] i32
    alpha_u: jnp.ndarray    # [N]
    alpha_v: jnp.ndarray    # [N]
    inside_ior: jnp.ndarray  # [N]
    outside_ior: jnp.ndarray  # [N]
    k: jnp.ndarray          # [N, 3]
    eta: jnp.ndarray        # [N, 3]
    specular: jnp.ndarray   # [N, 3]
    diffuse: jnp.ndarray    # [N, 3] texel-resolved diffuse color
    # static: scene has any anisotropic material (compile-time gate for
    # the tan/arctan branch of sample_ggx)
    aniso: bool = struct.field(pytree_node=False, default=True)


def gather_materials(scene, static, mat_idx, uv) -> MatParams:
    """Gather material records + resolve the diffuse texel once per lane.

    One packed-table fetch (ops/gather.py layout: mat_attrs [M, 24]).
    """
    from gpu_pathtracer_tpu.ops.gather import f2i, take_rows
    from gpu_pathtracer_tpu.shade.texture import get_texel

    m = jnp.maximum(mat_idx, 0)
    a = take_rows(scene.mat_attrs, m)
    diffuse = a[:, 11:14]
    if static.has_textures:
        diffuse = get_texel(scene, m, uv, True)
    return MatParams(
        type=f2i(a[:, 0]),
        alpha_u=a[:, 1],
        alpha_v=a[:, 2],
        inside_ior=a[:, 3],
        outside_ior=a[:, 4],
        k=a[:, 5:8],
        eta=a[:, 8:11],
        specular=a[:, 14:17],
        diffuse=diffuse,
        aniso=getattr(static, "has_aniso", True),
    )


def is_delta(mtype):
    """material.h:37-39."""
    return (mtype == int(MaterialType.MIRROR)) | (
        mtype == int(MaterialType.DIELECTRIC))


def is_glossy(mtype):
    """material.h:32-34."""
    return (mtype == int(MaterialType.ROUGHCONDUCTOR)) | (
        mtype == int(MaterialType.ROUGHDIELECTRIC)) | (
        mtype == int(MaterialType.SUBSTRATE))


# ---------------------------------------------------------------------------
# Fresnel + microfacet building blocks (pathtracer.cu:51-164)
# ---------------------------------------------------------------------------

def dielectric_fresnel(cosi, cost, etai, etat):
    """pathtracer.cu:51-56."""
    rparl = (etat * cosi - etai * cost) / jnp.where(
        jnp.abs(etat * cosi + etai * cost) > 1e-30,
        etat * cosi + etai * cost, 1.0)
    rperp = (etai * cosi - etat * cost) / jnp.where(
        jnp.abs(etai * cosi + etat * cost) > 1e-30,
        etai * cosi + etat * cost, 1.0)
    return 0.5 * (rparl * rparl + rperp * rperp)


def conduct_fresnel(cosi, eta, k):
    """pathtracer.cu:58-66. cosi [N], eta/k [N,3] -> [N,3]."""
    c = cosi[..., None]
    tmp = (eta * eta + k * k) * c * c
    rparl2 = (tmp - 2.0 * eta * c + 1.0) / (tmp + 2.0 * eta * c + 1.0)
    tmp_f = eta * eta + k * k
    rperp2 = (tmp_f - 2.0 * eta * c + c * c) / (tmp_f + 2.0 * eta * c + c * c)
    return 0.5 * (rparl2 + rperp2)


def schlick_fresnel(specular, costheta):
    """pathtracer.cu:160-164."""
    c = 1.0 - costheta[..., None]
    return specular + c ** 5 * (1.0 - specular)


def _phi_frame_cos(w_perp, dpdu):
    """cos(phi) of a direction's projection against the anisotropy frame."""
    d = normalize(w_perp)
    return dot(d, dpdu)


def ggx_d(wh, n, dpdu, alpha_u, alpha_v):
    """Anisotropic GGX NDF (pathtracer.cu:68-84)."""
    costheta = dot(wh, n)
    ok = costheta > 0.0
    ct = jnp.clip(costheta, 0.0, 1.0)
    ct2 = ct * ct
    st2 = 1.0 - ct2
    ct4 = ct2 * ct2
    tt2 = st2 / jnp.maximum(ct2, 1e-12)
    cosphi = _phi_frame_cos(wh - ct[..., None] * n, dpdu)
    cosphi2 = cosphi * cosphi
    sinphi2 = 1.0 - cosphi2
    sqr = 1.0 + tt2 * (cosphi2 / (alpha_u * alpha_u)
                       + sinphi2 / (alpha_v * alpha_v))
    d = 1.0 / (PI * alpha_u * alpha_v * jnp.maximum(ct4 * sqr * sqr, 1e-30))
    return jnp.where(ok, d, 0.0)


def smith_g(w, n, wh, dpdu, alpha_u, alpha_v):
    """pathtracer.cu:86-101."""
    wdn = dot(w, n)
    ok = wdn * dot(w, wh) >= 0.0
    sintheta = jnp.sqrt(jnp.clip(1.0 - wdn * wdn, 0.0, 1.0))
    tantheta = sintheta / jnp.where(jnp.abs(wdn) > 1e-12, wdn, 1e-12)
    finite = jnp.isfinite(tantheta)
    cosphi = _phi_frame_cos(w - wdn[..., None] * n, dpdu)
    cosphi2 = cosphi * cosphi
    sinphi2 = 1.0 - cosphi2
    alpha2 = cosphi2 * alpha_u * alpha_u + sinphi2 * alpha_v * alpha_v
    sqr = alpha2 * tantheta * tantheta
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + sqr))
    return jnp.where(ok & finite, g, 0.0)


def ggx_g(wo, wi, n, wh, dpdu, alpha_u, alpha_v):
    """pathtracer.cu:103-105."""
    return smith_g(wo, n, wh, dpdu, alpha_u, alpha_v) * \
        smith_g(wi, n, wh, dpdu, alpha_u, alpha_v)


def sample_ggx(alpha_u, alpha_v, u1, u2, aniso=True):
    """pathtracer.cu:107-138, local (+Y up) half vector.

    `aniso=False` (static, from StaticConfig.has_aniso) compiles out the
    tan/arctan anisotropic branch — a large share of PT's transcendental
    cost when every scene material is isotropic.
    """
    # isotropic branch
    denom = u1 * (alpha_u * alpha_v - 1.0) + 1.0
    ct_iso = jnp.sqrt(jnp.clip((1.0 - u1) / jnp.maximum(denom, 1e-30),
                               0.0, 1.0))
    phi_iso = TWO_PI * u2
    if not aniso:
        from gpu_pathtracer_tpu.core.sampling import sincos_2pi
        cphi, sphi = sincos_2pi(u2)
        st_iso = jnp.sqrt(jnp.clip(1.0 - ct_iso * ct_iso, 0.0, 1.0))
        return jnp.stack([st_iso * cphi, ct_iso, st_iso * sphi], axis=-1)

    # anisotropic branch
    base = jnp.arctan(alpha_v / alpha_u * jnp.tan(TWO_PI * u2))
    phi_a = jnp.where(
        u2 <= 0.25, base,
        jnp.where(u2 >= 0.75, base + TWO_PI, base + PI))
    sinphi = jnp.sin(phi_a)
    cosphi2 = 1.0 - sinphi * sinphi
    sinphi2 = sinphi * sinphi
    inv_a = 1.0 / (cosphi2 / (alpha_u * alpha_u)
                   + sinphi2 / (alpha_v * alpha_v))
    theta = jnp.arctan(jnp.sqrt(jnp.maximum(
        inv_a * u1 / jnp.maximum(1.0 - u1, 1e-12), 0.0)))
    ct_a = jnp.cos(theta)

    iso = alpha_u == alpha_v
    costheta = jnp.where(iso, ct_iso, ct_a)
    phi = jnp.where(iso, phi_iso, phi_a)
    sintheta = jnp.sqrt(jnp.clip(1.0 - costheta * costheta, 0.0, 1.0))
    return jnp.stack([sintheta * jnp.cos(phi), costheta,
                      sintheta * jnp.sin(phi)], axis=-1)


def _shading_frame(n, dpdu):
    """uu = dpdu, ww = cross(uu, n): the frame every sampler uses
    (pathtracer.cu:499-501 et al)."""
    ww = cross(dpdu, n)
    return dpdu, ww


# ---------------------------------------------------------------------------
# Per-model sample + eval (each masked over the full batch)
# ---------------------------------------------------------------------------

def _sample_lambertian(mat, wi, nor, dpdu, u1, u2):
    n = face_forward(nor, wi)
    local, pdf = cosine_hemisphere(u1, u2)
    uu, ww = _shading_frame(n, dpdu)
    wo = to_world(local, uu, n, ww)
    fr = mat.diffuse * INV_PI
    return wo, fr, pdf


def _eval_lambertian(mat, wi, wo, nor):
    ok = same_hemisphere(wi, wo, nor)
    fr = mat.diffuse * INV_PI
    pdf = jnp.abs(dot(wo, nor)) * INV_PI
    return jnp.where(ok[..., None], fr, 0.0), jnp.where(ok, pdf, 0.0)


def _sample_mirror(mat, wi, nor):
    wo = reflect(wi, nor)
    fr = mat.specular / jnp.maximum(jnp.abs(dot3(wo, nor)), 1e-12)
    pdf = jnp.ones(wi.shape[:-1], jnp.float32)
    return wo, fr, pdf


def _sample_dielectric(mat, wi_in, nor, u1, mode):
    """pathtracer.cu:512-551. wi_in = reference `in` (= -ray.d)."""
    wi = -wi_in
    n = nor
    cosi = dot(wi, n)
    enter = cosi < 0.0
    ei = jnp.where(enter, mat.outside_ior, mat.inside_ior)
    et = jnp.where(enter, mat.inside_ior, mat.outside_ior)
    eta = ei / et
    sint2 = eta * eta * (1.0 - cosi * cosi)
    cost = jnp.sqrt(jnp.clip(1.0 - sint2, 0.0, 1.0))
    rdir = reflect(wi_in, n)
    tdir = refract(wi_in, nor, mat.outside_ior, mat.inside_ior)

    tir = sint2 > 1.0
    fresnel = dielectric_fresnel(jnp.abs(cost), jnp.abs(cosi), et, ei)
    choose_refract = (~tir) & (u1 > fresnel)

    wo = jnp.where(choose_refract[..., None], tdir, rdir)
    abs_cos = jnp.maximum(jnp.abs(dot(wo, n)), 1e-12)[..., None]
    fr_reflect = mat.specular / abs_cos * jnp.where(
        tir, 1.0, fresnel)[..., None]
    # radiance transport squeezes/expands the beam through the interface
    # (pathtracer.cu:541-543)
    scale = eta * eta if mode == RADIANCE else jnp.ones_like(eta)
    fr_refract = mat.specular / abs_cos * (1.0 - fresnel)[..., None] \
        * scale[..., None]
    fr = jnp.where(choose_refract[..., None], fr_refract, fr_reflect)
    pdf = jnp.where(tir, 1.0,
                    jnp.where(choose_refract, 1.0 - fresnel, fresnel))
    return wo, fr, pdf


def _sample_roughconduct(mat, wi, nor, dpdu, u1, u2):
    """pathtracer.cu:553-578."""
    n = face_forward(nor, wi)
    wh_local = sample_ggx(mat.alpha_u, mat.alpha_v, u1, u2,
                          mat.aniso)
    uu, ww = _shading_frame(n, dpdu)
    wh = to_world(wh_local, uu, n, ww)
    wo = reflect(wi, wh)
    ok = same_hemisphere(wi, wo, nor)

    cosi = dot(wo, wh)
    F = conduct_fresnel(jnp.abs(cosi), mat.eta, mat.k)
    D = ggx_d(wh, n, dpdu, mat.alpha_u, mat.alpha_v)
    G = ggx_g(wi, wo, n, wh, dpdu, mat.alpha_u, mat.alpha_v)
    denom = 4.0 * jnp.abs(dot(wi, n)) * jnp.abs(dot(wo, n))
    fr = mat.specular * F * (D * G / jnp.maximum(denom, 1e-12))[..., None]
    pdf = D * jnp.abs(dot(wh, n)) / jnp.maximum(
        4.0 * jnp.abs(dot(wi, wh)), 1e-12)
    fr = jnp.where(ok[..., None], fr, 0.0)
    pdf = jnp.where(ok, pdf, 0.0)
    return wo, fr, pdf


def _eval_roughconduct(mat, wi, wo, nor, dpdu):
    """pathtracer.cu:721-740."""
    ok = same_hemisphere(wi, wo, nor)
    n = face_forward(nor, wi)
    wh = normalize(wi + wo)
    cosi = dot(wo, wh)
    D = ggx_d(wh, n, dpdu, mat.alpha_u, mat.alpha_v)
    G = ggx_g(wi, wo, n, wh, dpdu, mat.alpha_u, mat.alpha_v)
    F = conduct_fresnel(jnp.abs(cosi), mat.eta, mat.k)
    denom = 4.0 * jnp.abs(dot(wi, n)) * jnp.abs(dot(wo, n))
    fr = mat.specular * F * (D * G / jnp.maximum(denom, 1e-12))[..., None]
    pdf = D * jnp.abs(dot(wh, n)) / jnp.maximum(
        4.0 * jnp.abs(dot(wi, wh)), 1e-12)
    return jnp.where(ok[..., None], fr, 0.0), jnp.where(ok, pdf, 0.0)


def _substrate_fr_pdf(mat, wi, wo, n, dpdu):
    """Shared substrate fr/pdf (pathtracer.cu:604-637 == 749-783)."""
    c0 = jnp.abs(dot(wi, n))
    c1 = jnp.abs(dot(wo, n))
    rd = mat.diffuse
    rs = mat.specular
    cons0 = 1.0 - 0.5 * c0
    cons1 = 1.0 - 0.5 * c1
    diffuse = (28.0 / (23.0 * PI)) * rd * (1.0 - rs) * \
        ((1.0 - cons0 ** 5) * (1.0 - cons1 ** 5))[..., None]
    wh = normalize(wi + wo)
    D = ggx_d(wh, n, dpdu, mat.alpha_u, mat.alpha_v)
    denom = 4.0 * jnp.abs(dot(wo, wh)) * jnp.maximum(c0, c1)
    specular = (D / jnp.maximum(denom, 1e-12))[..., None] * \
        schlick_fresnel(rs, dot(wo, wh))
    fr = diffuse + specular
    # NOTE: reference uses a signed dot(in, wh) in the pdf here (quirk kept)
    pdf = 0.5 * (c1 * INV_PI + D * jnp.abs(dot(wh, n))
                 / (4.0 * jnp.where(jnp.abs(dot(wi, wh)) > 1e-12,
                                    dot(wi, wh), 1e-12)))
    return fr, pdf


def _sample_substrate(mat, wi, nor, dpdu, u1, u2):
    """pathtracer.cu:580-640."""
    n = face_forward(nor, wi)
    uu, ww = _shading_frame(n, dpdu)
    # diffuse half
    local, _ = cosine_hemisphere(jnp.minimum(u1 * 2.0, 1.0), u2)
    wo_diff = to_world(local, uu, n, ww)
    # specular half
    ux = jnp.clip((u1 - 0.5) * 2.0, 0.0, 1.0)
    wh = to_world(sample_ggx(mat.alpha_u, mat.alpha_v, ux, u2,
                             mat.aniso), uu, n, ww)
    wo_spec = reflect(wi, wh)
    wo = jnp.where((u1 < 0.5)[..., None], wo_diff, wo_spec)
    ok = same_hemisphere(wi, wo, n)
    fr, pdf = _substrate_fr_pdf(mat, wi, wo, n, dpdu)
    return wo, jnp.where(ok[..., None], fr, 0.0), jnp.where(ok, pdf, 0.0)


def _eval_substrate(mat, wi, wo, nor, dpdu):
    ok = same_hemisphere(wi, wo, nor)
    n = face_forward(nor, wi)
    fr, pdf = _substrate_fr_pdf(mat, wi, wo, n, dpdu)
    return jnp.where(ok[..., None], fr, 0.0), jnp.where(ok, pdf, 0.0)


def _sample_roughdielectric(mat, wi_in, nor, dpdu, u1, u2, u3, mode):
    """pathtracer.cu:642-693."""
    wi = -wi_in
    n = nor
    uu, ww = _shading_frame(n, dpdu)
    wh = to_world(sample_ggx(mat.alpha_u, mat.alpha_v, u1, u2,
                             mat.aniso), uu, n, ww)

    cosi_n = dot(wi, n)
    enter = cosi_n < 0.0
    ei = jnp.where(enter, mat.outside_ior, mat.inside_ior)
    et = jnp.where(enter, mat.inside_ior, mat.outside_ior)
    D = ggx_d(wh, n, dpdu, mat.alpha_u, mat.alpha_v)
    eta = ei / et
    cosi = dot(wi, wh)
    sint2 = eta * eta * (1.0 - cosi * cosi)
    cost = jnp.sqrt(jnp.clip(1.0 - sint2, 0.0, 1.0))
    rdir = reflect(-wi, wh)
    sign = jnp.where(enter, -1.0, 1.0)
    tdir = normalize((wi - wh * cosi[..., None]) * eta[..., None]
                     + (sign * cost)[..., None] * wh)

    tir = sint2 > 1.0
    fresnel = dielectric_fresnel(jnp.abs(cost), jnp.abs(cosi), et, ei)
    choose_refract = (~tir) & (u3 > fresnel)
    wo = jnp.where(choose_refract[..., None], tdir, rdir)

    G = ggx_g(wi_in, wo, n, wh, dpdu, mat.alpha_u, mat.alpha_v)
    abs_in_n = jnp.abs(dot(wi_in, n))
    abs_out_n = jnp.abs(dot(wo, n))

    # reflection branch (incl. TIR): specular * F * D * G / (4 |i.n||o.n|)
    f_refl = jnp.where(tir, 1.0, fresnel)
    fr_refl = mat.specular * (f_refl * D * G / jnp.maximum(
        4.0 * abs_in_n * abs_out_n, 1e-12))[..., None]
    pdf_refl = D * jnp.abs(dot(wh, n)) / jnp.maximum(
        4.0 * jnp.abs(dot(wh, wi_in)), 1e-12) * jnp.where(tir, 1.0, fresnel)

    # refraction branch
    c = et * dot(wo, wh) + ei * dot(wi_in, wh)
    c2 = jnp.maximum(c * c, 1e-12)
    fr_refr_scale = (ei * ei * D * G * (1.0 - fresnel)
                     * jnp.abs(dot(wi_in, wh)) * jnp.abs(dot(wo, wh))
                     / jnp.maximum(abs_out_n * abs_in_n * c2, 1e-12))
    radiance_fix = 1.0 / jnp.maximum(eta * eta, 1e-12) \
        if mode == RADIANCE else jnp.ones_like(eta)
    fr_refr = mat.specular * (fr_refr_scale * radiance_fix)[..., None]
    pdf_refr = (1.0 - fresnel) * D * jnp.abs(dot(wh, n)) * et * et \
        * jnp.abs(dot(wo, wh)) / c2

    fr = jnp.where(choose_refract[..., None], fr_refr, fr_refl)
    pdf = jnp.where(choose_refract, pdf_refr, pdf_refl)
    return wo, fr, pdf


def _eval_roughdielectric(mat, wi_in, wo, nor, dpdu, mode):
    """pathtracer.cu:787-824."""
    wi = -wi_in
    n = nor
    is_reflect = dot(wi_in, n) * dot(wo, n) > 0.0
    cosi_n = dot(wi, n)
    enter = cosi_n < 0.0
    ei = jnp.where(enter, mat.outside_ior, mat.inside_ior)
    et = jnp.where(enter, mat.inside_ior, mat.outside_ior)
    wh = normalize(-(ei[..., None] * wi_in + et[..., None] * wo))
    eta = ei / et
    cosi = dot(wi, wh)
    sint2 = eta * eta * (1.0 - cosi * cosi)
    cost = jnp.sqrt(jnp.clip(1.0 - sint2, 0.0, 1.0))
    fresnel = dielectric_fresnel(jnp.abs(cost), jnp.abs(cosi), et, ei)
    D = ggx_d(wh, n, dpdu, mat.alpha_u, mat.alpha_v)
    G = ggx_g(wi_in, wo, n, wh, dpdu, mat.alpha_u, mat.alpha_v)
    abs_in_n = jnp.abs(dot(wi_in, n))
    abs_out_n = jnp.abs(dot(wo, n))

    fr_refl = mat.specular * (fresnel * D * G / jnp.maximum(
        4.0 * abs_in_n * abs_out_n, 1e-12))[..., None]
    pdf_refl = fresnel * D * jnp.abs(dot(wh, n)) / jnp.maximum(
        4.0 * jnp.abs(dot(wh, wi_in)), 1e-12)

    c = et * dot(wo, wh) + ei * dot(wi_in, wh)
    c2 = jnp.maximum(c * c, 1e-12)
    scale = (ei * ei * D * G * (1.0 - fresnel)
             * jnp.abs(dot(wi_in, wh)) * jnp.abs(dot(wo, wh))
             / jnp.maximum(abs_out_n * abs_in_n * c2, 1e-12))
    radiance_fix = 1.0 / jnp.maximum(eta * eta, 1e-12) \
        if mode == RADIANCE else jnp.ones_like(eta)
    fr_refr = mat.specular * (scale * radiance_fix)[..., None]
    pdf_refr = (1.0 - fresnel) * D * jnp.abs(dot(wh, n)) * et * et \
        * jnp.abs(dot(wo, wh)) / c2

    fr = jnp.where(is_reflect[..., None], fr_refl, fr_refr)
    pdf = jnp.where(is_reflect, pdf_refl, pdf_refr)
    return fr, pdf


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def sample_bsdf(mat: MatParams, wi, nor, dpdu, u1, u2, u3,
                material_types: tuple, mode: int = RADIANCE):
    """SampleBSDF dispatch (pathtracer.cu:491-695).

    Returns (wo[N,3], fr[N,3], pdf[N]). Only the material models listed in
    `material_types` are compiled.
    """
    n_lane = wi.shape[0]
    wo = jnp.zeros_like(wi)
    fr = jnp.zeros_like(wi)
    pdf = jnp.zeros(n_lane, jnp.float32)

    def sel(mask, wo_c, fr_c, pdf_c, wo, fr, pdf):
        m3 = mask[..., None]
        return (jnp.where(m3, wo_c, wo), jnp.where(m3, fr_c, fr),
                jnp.where(mask, pdf_c, pdf))

    mt = mat.type
    if int(MaterialType.LAMBERTIAN) in material_types:
        c = _sample_lambertian(mat, wi, nor, dpdu, u1, u2)
        wo, fr, pdf = sel(mt == int(MaterialType.LAMBERTIAN), *c, wo, fr, pdf)
    if int(MaterialType.MIRROR) in material_types:
        c = _sample_mirror(mat, wi, nor)
        wo, fr, pdf = sel(mt == int(MaterialType.MIRROR), *c, wo, fr, pdf)
    if int(MaterialType.DIELECTRIC) in material_types:
        c = _sample_dielectric(mat, wi, nor, u1, mode)
        wo, fr, pdf = sel(mt == int(MaterialType.DIELECTRIC), *c, wo, fr, pdf)
    if int(MaterialType.ROUGHCONDUCTOR) in material_types:
        c = _sample_roughconduct(mat, wi, nor, dpdu, u1, u2)
        wo, fr, pdf = sel(
            mt == int(MaterialType.ROUGHCONDUCTOR), *c, wo, fr, pdf)
    if int(MaterialType.SUBSTRATE) in material_types:
        c = _sample_substrate(mat, wi, nor, dpdu, u1, u2)
        wo, fr, pdf = sel(mt == int(MaterialType.SUBSTRATE), *c, wo, fr, pdf)
    if int(MaterialType.ROUGHDIELECTRIC) in material_types:
        c = _sample_roughdielectric(mat, wi, nor, dpdu, u1, u2, u3, mode)
        wo, fr, pdf = sel(
            mt == int(MaterialType.ROUGHDIELECTRIC), *c, wo, fr, pdf)
    return wo, fr, pdf


def eval_bsdf(mat: MatParams, wi, wo, nor, dpdu,
              material_types: tuple, mode: int = RADIANCE):
    """Fr dispatch (pathtracer.cu:698-826). Delta materials return 0.

    Returns (fr[N,3], pdf[N]).
    """
    fr = jnp.zeros_like(wi)
    pdf = jnp.zeros(wi.shape[0], jnp.float32)

    def sel(mask, fr_c, pdf_c, fr, pdf):
        return (jnp.where(mask[..., None], fr_c, fr),
                jnp.where(mask, pdf_c, pdf))

    mt = mat.type
    if int(MaterialType.LAMBERTIAN) in material_types:
        c = _eval_lambertian(mat, wi, wo, nor)
        fr, pdf = sel(mt == int(MaterialType.LAMBERTIAN), *c, fr, pdf)
    if int(MaterialType.ROUGHCONDUCTOR) in material_types:
        c = _eval_roughconduct(mat, wi, wo, nor, dpdu)
        fr, pdf = sel(mt == int(MaterialType.ROUGHCONDUCTOR), *c, fr, pdf)
    if int(MaterialType.SUBSTRATE) in material_types:
        c = _eval_substrate(mat, wi, wo, nor, dpdu)
        fr, pdf = sel(mt == int(MaterialType.SUBSTRATE), *c, fr, pdf)
    if int(MaterialType.ROUGHDIELECTRIC) in material_types:
        c = _eval_roughdielectric(mat, wi, wo, nor, dpdu, mode)
        fr, pdf = sel(mt == int(MaterialType.ROUGHDIELECTRIC), *c, fr, pdf)
    # MIRROR / DIELECTRIC: fr = 0, pdf = 0 (pathtracer.cu:711-719)
    return fr, pdf
