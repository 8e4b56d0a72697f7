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
