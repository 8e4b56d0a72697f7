"""Dipole-diffusion BSSRDF (subsurface scattering).

TPU re-expression of the reference's Bssrdf (bssrdf.h:18-141) and the
kernel-side single/multiple scatter hooks (pathtracer.cu:362-487). The
reference shipped this code dormant (no integrator called it); here it is a
live feature wired into the PT integrator via `integrators.pt`.

Host-side: `convert_from_diffuse` (pbrt-v2 style kd -> sigma conversion,
bssrdf.h:104-140). Device-side: batched Rd / Fdr / probe-ray sampling.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gpu_pathtracer_tpu.core.vecmath import INV_PI
from gpu_pathtracer_tpu.core import sampling
from gpu_pathtracer_tpu.core.vecmath import make_coordinate, to_world


def fdr(eta: float) -> float:
    """Internal diffuse Fresnel reflectivity, polynomial approximation
    (bssrdf.h:32-41, Donner 2006 ch.5)."""
    if eta < 1.0:
        return (-0.4399 + 0.7099 / eta - 0.3199 / (eta * eta)
                + 0.0636 / (eta ** 3))
    return -1.4399 / (eta * eta) + 0.7099 / eta + 0.6911 + 0.0636 * eta


def _rd_integral(alphap: float, A: float) -> float:
    """bssrdf.h:104-107."""
    sqrt_term = np.sqrt(3.0 * (1.0 - alphap))
    return (alphap / 2.0 * (1.0 + np.exp(-4.0 / 3.0 * A * sqrt_term))
            * np.exp(-sqrt_term))


def convert_from_diffuse(kd: np.ndarray, mean_path_length: float,
                         eta: float, g: float = 0.0):
    """kd + mean path length -> dipole (sigmaA, sigmaS') via 16-step
    bisection on the Rd integral (bssrdf.h:110-140). Returns a model.Bssrdf."""
    from gpu_pathtracer_tpu.scene.model import Bssrdf

    f = fdr(eta)
    A = (1.0 + f) / (1.0 - f)
    sigma_sp = np.zeros(3, np.float32)
    sigma_a = np.zeros(3, np.float32)
    for i in range(3):
        alpha_low, alpha_high = 0.0, 1.0
        for _ in range(16):
            alpha_mid = 0.5 * (alpha_low + alpha_high)
            if _rd_integral(alpha_mid, A) < kd[i]:
                alpha_low = alpha_mid
            else:
                alpha_high = alpha_mid
        alphap = 0.5 * (alpha_low + alpha_high)
        sigma_tr = 1.0 / mean_path_length
        sigma_prime_t = sigma_tr / np.sqrt(3.0 * (1.0 - alphap))
        sigma_sp[i] = alphap * sigma_prime_t
        sigma_a[i] = sigma_prime_t - sigma_sp[i]
    return Bssrdf(sigmaA=sigma_a, sigmaSP=sigma_sp, eta=eta, g=g)


# -------------------------------------------------------------------------
# Device-side (batched jnp) pieces
# -------------------------------------------------------------------------

def dipole_A(eta):
    """(1+Fdr)/(1-Fdr), batched over eta arrays."""
    f_lt = (-0.4399 + 0.7099 / eta - 0.3199 / (eta * eta)
            + 0.0636 / (eta ** 3))
    f_ge = -1.4399 / (eta * eta) + 0.7099 / eta + 0.6911 + 0.0636 * eta
    f = jnp.where(eta < 1.0, f_lt, f_ge)
    return (1.0 + f) / (1.0 - f)


def rd(d2, sigma_a, sigma_sp, A):
    """Dipole diffusion reflectance Rd(d^2) (bssrdf.h:44-68).

    d2: [...], sigma_a/sigma_sp: [..., 3], A: [..., 1] or scalar.
    """
    sigma_tp = sigma_a + sigma_sp
    sigma_tr = jnp.sqrt(3.0 * sigma_a * sigma_tp)
    zr = 1.0 / sigma_tp
    zv = zr + 4.0 / 3.0 * A * zr
    d2e = d2[..., None]
    dr = jnp.sqrt(zr * zr + d2e)
    dv = jnp.sqrt(zv * zv + d2e)
    alphap = sigma_sp / sigma_tp
    s_dr = sigma_tr * dr
    s_dv = sigma_tr * dv
    out = 0.25 * INV_PI * alphap * (
        zr * (1.0 + s_dr) * jnp.exp(-s_dr) / (dr ** 3)
        + zv * (1.0 + s_dv) * jnp.exp(-s_dv) / (dv ** 3))
    return jnp.maximum(out, 0.0)


def sample_probe_ray(pos, nor, u1, u2, sigma_tr, r_max):
    """Gaussian-disk probe ray for multiple scattering (bssrdf.h:70-83).

    Returns (origin[...,3], dir[...,3], tmax[...], pdf[...]).
    """
    xy = sampling.gaussian_disk(u1, u2, sigma_tr, r_max)
    d2 = jnp.sum(xy * xy, axis=-1)
    half_chord = jnp.sqrt(jnp.maximum(r_max * r_max - d2, 0.0))
    uu, ww = make_coordinate(nor)
    p_local = jnp.stack([xy[..., 0], -half_chord, xy[..., 1]], axis=-1)
    origin = to_world(p_local, uu, nor, ww) + pos
    pdf = sampling.gaussian_disk_pdf(xy[..., 0], xy[..., 1], sigma_tr, r_max)
    return origin, nor, 2.0 * half_chord, pdf


# -------------------------------------------------------------------------
# Integrator hooks: the reference shipped these dormant (no kernel calls
# SingleScatter/MultipleScatter, SURVEY.md feature list); here they are a
# live feature invoked by integrators.pt for hits with bssrdf_idx >= 0.
# -------------------------------------------------------------------------

def _gather_bssrdf(scene, idx):
    i = jnp.maximum(idx, 0)
    sigma_a = jnp.take(scene.b_sigma_a, i, axis=0)
    sigma_sp = jnp.take(scene.b_sigma_sp, i, axis=0)
    eta = jnp.take(scene.b_eta, i)
    g = jnp.take(scene.b_g, i)
    return sigma_a, sigma_sp, eta, g


def _sample_one_area_light(scene, static, rng, pos):
    """Light pick + solid-angle sample, clamped to area lights (the
    reference indexes kernel_lights directly, pathtracer.cu:394-400)."""
    from gpu_pathtracer_tpu.shade import lights as lights_mod
    n = pos.shape[0]
    u = rng.uniform((n,))
    idx, choice = lights_mod.pick_light(scene, u)
    idx = jnp.minimum(idx, max(static.n_lights - 1, 0))
    u1, u2 = rng.uniform2((n,))
    rad, _, sd, st, lnor, lpdf = lights_mod.sample_area_light(
        scene, idx, pos, u1, u2, scene.epsilon)
    return rad, sd, st, lnor, lpdf * choice


def single_scatter(scene, static, rng, pos, nor, bssrdf_idx, wi, active):
    """SingleScatter (pathtracer.cu:362-436): one refracted-path sample.

    `wi` points away from the surface (the reference passes `-ray.d`-style
    `in` to Reflect/Refract). Deviation: the refracted probe uses tmin =
    epsilon; the reference passes kernel_hdr_height as tmin (the env-map
    pixel height, an obvious slip, pathtracer.cu:384).
    """
    from gpu_pathtracer_tpu.core.vecmath import (
        dot, is_black, length, luminance, reflect, refract,
    )
    from gpu_pathtracer_tpu.core.sampling import exponential, exponential_pdf
    from gpu_pathtracer_tpu.geom import traverse
    from gpu_pathtracer_tpu.shade import lights as lights_mod
    from gpu_pathtracer_tpu.shade.bsdf import dielectric_fresnel

    n = pos.shape[0]
    eps = scene.epsilon
    L = jnp.zeros((n, 3), jnp.float32)
    if static.n_lights == 0:
        return L
    sigma_a, sigma_sp, eta, g = _gather_bssrdf(scene, bssrdf_idx)
    coso = jnp.abs(dot(wi, nor))
    sino2 = 1.0 - coso * coso
    cosi_t = jnp.sqrt(jnp.maximum(1.0 - sino2 / (eta * eta), 0.0))
    fresnel = 1.0 - dielectric_fresnel(coso, cosi_t, 1.0, eta)
    sigma_tr = luminance(jnp.sqrt(3.0 * sigma_a * (sigma_a + sigma_sp)))
    sigma_s = sigma_sp / jnp.maximum(1.0 - g, 1e-6)[:, None]
    sigma_t = sigma_s + sigma_a

    # reflected branch: specular credit of a directly visible emitter
    rdir = reflect(wi, nor)
    hit_r = traverse.intersect_closest(
        scene, static, pos, rdir, eps, jnp.where(active, jnp.inf, eps))
    le = lights_mod.area_light_le(scene, hit_r.light_idx, hit_r.nor, -rdir)
    take_r = active & hit_r.valid & (hit_r.light_idx >= 0)
    L += jnp.where(take_r[:, None], (1.0 - fresnel)[:, None] * le, 0.0)

    # refracted branch: single scattering along the internal ray
    tdir = refract(wi, nor, 1.0, eta)
    hit_t = traverse.intersect_closest(
        scene, static, pos, tdir, eps, jnp.where(active, jnp.inf, eps))
    seg_len = jnp.where(hit_t.valid, length(hit_t.pos - pos), 0.0)
    d = exponential(rng.uniform((n,)), sigma_tr)
    ok = active & (d <= seg_len)
    p_sample = pos + tdir * d[:, None]
    pdf_d = exponential_pdf(d, sigma_tr)

    rad, sd, st, lnor, lpdf = _sample_one_area_light(
        scene, static, rng, p_sample)
    ok &= ~is_black(rad) & (lpdf > 0.0)
    # first boundary toward the light must be our own surface
    # (pathtracer.cu:405-411)
    hit_w = traverse.intersect_closest(
        scene, static, p_sample, sd, eps, jnp.where(ok, st, eps))
    same = hit_w.valid & (hit_w.bssrdf_idx == bssrdf_idx)
    occluded = traverse.intersect_any(
        scene, static, p_sample, sd, hit_w.t + eps,
        jnp.where(ok & same, st, 0.0))
    ok &= same & ~occluded

    phase = jnp.float32(1.0 / (4.0 * jnp.pi))
    cosi = jnp.abs(dot(hit_w.nor, sd))
    sini2 = 1.0 - cosi * cosi
    coso2 = jnp.sqrt(jnp.maximum(1.0 - sini2 / (eta * eta), 0.0))
    fresnel_i = 1.0 - dielectric_fresnel(cosi, coso2, 1.0, eta)
    G = jnp.abs(dot(hit_w.nor, tdir)) / jnp.maximum(cosi, 1e-6)
    sigma_tc = sigma_t * (1.0 + G)[:, None]
    di = length(hit_w.pos - p_sample)
    et = 1.0 / eta
    di_prime = di * jnp.abs(dot(sd, hit_w.nor)) / jnp.sqrt(jnp.maximum(
        1.0 - et * et * (1.0 - cosi * cosi), 1e-6))
    contrib = (fresnel * fresnel_i * phase)[:, None] * sigma_s / sigma_tc \
        * jnp.exp(-di_prime[:, None] * sigma_t) \
        * jnp.exp(-d[:, None] * sigma_t) * rad \
        / jnp.maximum(lpdf * pdf_d, 1e-30)[:, None]
    L += jnp.where(ok[:, None], contrib, 0.0)
    return L


def multiple_scatter(scene, static, rng, pos, nor, bssrdf_idx, wi, active):
    """MultipleScatter (pathtracer.cu:438-487): dipole Rd via one
    Gaussian-disk probe ray."""
    from gpu_pathtracer_tpu.core.vecmath import dot, is_black, luminance
    from gpu_pathtracer_tpu.geom import traverse
    from gpu_pathtracer_tpu.shade.bsdf import dielectric_fresnel

    n = pos.shape[0]
    eps = scene.epsilon
    L = jnp.zeros((n, 3), jnp.float32)
    if static.n_lights == 0:
        return L
    sigma_a, sigma_sp, eta, g = _gather_bssrdf(scene, bssrdf_idx)
    A = dipole_A(eta)
    coso = jnp.abs(dot(wi, nor))
    sino2 = 1.0 - coso * coso
    cosi_t = jnp.sqrt(jnp.maximum(1.0 - sino2 / (eta * eta), 0.0))
    fresnel = 1.0 - dielectric_fresnel(coso, cosi_t, 1.0, eta)
    sigma_tr = luminance(jnp.sqrt(3.0 * sigma_a * (sigma_a + sigma_sp)))
    r_max = jnp.sqrt(jnp.log(0.01) / -jnp.maximum(sigma_tr, 1e-30))

    u1, u2 = rng.uniform2((n,))
    probe_o, probe_d, probe_tmax, pdf = sample_probe_ray(
        pos, nor, u1, u2, sigma_tr, r_max)
    hit_p = traverse.intersect_closest(
        scene, static, probe_o, probe_d, eps,
        jnp.where(active, probe_tmax, eps))
    same = hit_p.valid & (hit_p.bssrdf_idx == bssrdf_idx)
    d2 = dot(hit_p.pos - pos, hit_p.pos - pos)
    rd_val = rd(d2, sigma_a, sigma_sp, A[:, None])

    rad, sd, st, lnor, lpdf = _sample_one_area_light(
        scene, static, rng, hit_p.pos)
    occluded = traverse.intersect_any(
        scene, static, hit_p.pos, sd, eps,
        jnp.where(active & same, st, 0.0))
    ok = active & same & ~is_black(rad) & (lpdf > 0.0) & ~occluded

    cosi = jnp.abs(dot(sd, hit_p.nor))
    sini2 = 1.0 - cosi * cosi
    cost = jnp.sqrt(jnp.maximum(1.0 - sini2 / (eta * eta), 0.0))
    irradiance = rad * (cosi / jnp.maximum(lpdf, 1e-30))[:, None]
    fresnel_i = 1.0 - dielectric_fresnel(cosi, cost, 1.0, eta)
    pdf_area = pdf * jnp.abs(dot(probe_d, hit_p.nor))
    contrib = (INV_PI * fresnel * fresnel_i)[:, None] * rd_val \
        * irradiance / jnp.maximum(pdf_area, 1e-30)[:, None]
    L += jnp.where(ok[:, None], contrib, 0.0)
    return L
