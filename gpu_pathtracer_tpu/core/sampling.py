"""Sampling warps: uniform-random squares -> useful distributions.

The TPU re-expression of the reference's wrap.h (sampling warps,
/root/reference/src/wrap.h:26-165). All functions are batched: the random
inputs u1/u2 are arrays of shape [...], outputs are [..., k] arrays plus a
pdf array [...]. Directions use the reference's local convention where the
surface normal is +Y (components are (x=sin*cos, y=cos, z=sin*sin)).
"""

from __future__ import annotations

import jax.numpy as jnp

from gpu_pathtracer_tpu.core.vecmath import (
    INV_FOUR_PI, INV_PI, INV_TWO_PI, PI, TWO_PI,
)


def _dir_from_u2(costheta, sintheta, u2):
    cphi, sphi = sincos_2pi(u2)
    return jnp.stack(
        [sintheta * cphi, costheta, sintheta * sphi], axis=-1)


def sincos_2pi(u):
    """(cos, sin) of phi = 2*pi*u for u in [0,1) with ONE transcendental.

    sin is recovered as sign(pi - phi) * sqrt(1 - cos^2): for u <= 0.5 the
    sine is non-negative, else negative. On the TPU VPU a sin/cos pair is
    two expensive polynomial evaluations; sqrt is cheap — profiled, the
    sampling warps' sincos pairs were the largest single compute cost of a
    PT bounce.
    """
    c = jnp.cos(TWO_PI * u)
    s = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
    return c, jnp.where(u <= 0.5, s, -s)



def uniform_sphere(u1, u2):
    """wrap.h:26-36. Returns (dir[...,3], pdf[...])."""
    costheta = 1.0 - 2.0 * u1
    sintheta = jnp.sqrt(jnp.maximum(1.0 - costheta * costheta, 0.0))
    pdf = jnp.full_like(u1, INV_FOUR_PI)
    return _dir_from_u2(costheta, sintheta, u2), pdf


def uniform_hemisphere(u1, u2):
    """wrap.h:38-49. Local frame, +Y up. Returns (dir, pdf)."""
    costheta = u1
    sintheta = jnp.sqrt(jnp.maximum(1.0 - costheta * costheta, 0.0))
    pdf = jnp.full_like(u1, INV_TWO_PI)
    return _dir_from_u2(costheta, sintheta, u2), pdf


def cosine_hemisphere(u1, u2):
    """wrap.h:51-62. Local frame, +Y up. Returns (dir, pdf=cos/pi)."""
    sintheta = jnp.sqrt(jnp.maximum(u1, 0.0))
    costheta = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    pdf = costheta * INV_PI
    return _dir_from_u2(costheta, sintheta, u2), pdf


def uniform_cone(u1, u2, costhetamax):
    """wrap.h:65-76. Returns (dir, pdf)."""
    costheta = 1.0 - u1 * (1.0 - costhetamax)
    sintheta = jnp.sqrt(jnp.maximum(1.0 - costheta * costheta, 0.0))
    pdf = 1.0 / (TWO_PI * (1.0 - costhetamax))
    return _dir_from_u2(costheta, sintheta, u2), pdf


def uniform_disk(u1, u2):
    """wrap.h:78-85. Returns (xy[...,2], pdf=1/pi)."""
    r = jnp.sqrt(jnp.maximum(u1, 0.0))
    cphi, sphi = sincos_2pi(u2)
    pdf = jnp.full_like(u1, INV_PI)
    return jnp.stack([r * cphi, r * sphi], axis=-1), pdf


def concentric_disk(u1, u2):
    """wrap.h:87-108 (PBRT concentric map). Returns (xy[...,2], pdf=1/pi)."""
    ox = 2.0 * u1 - 1.0
    oy = 2.0 * u2 - 1.0
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    safe = lambda num, den: num / jnp.where(jnp.abs(den) > 1e-12, den, 1.0)
    theta = jnp.where(
        use_x, PI * 0.25 * safe(oy, ox), PI * 0.5 - PI * 0.25 * safe(ox, oy))
    degenerate = (ox == 0.0) & (oy == 0.0)
    xy = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    xy = jnp.where(degenerate[..., None], 0.0, xy)
    pdf = jnp.full_like(u1, INV_PI)
    return xy, pdf


def uniform_triangle(u1, u2):
    """wrap.h:110-115. Returns barycentric (u, v) each [...]."""
    su1 = jnp.sqrt(jnp.maximum(u1, 0.0))
    return 1.0 - su1, u2 * su1


def exponential(u, falloff):
    """wrap.h:158-160: inverse-CDF sample of falloff*exp(-falloff*x)."""
    return -jnp.log(jnp.maximum(u, 1e-30)) / falloff


def exponential_pdf(x, falloff):
    """wrap.h:162-164."""
    return falloff * jnp.exp(-falloff * x)


def gaussian_disk_infinity(u1, u2, falloff):
    """wrap.h:125-130."""
    r = jnp.sqrt(jnp.log(jnp.maximum(u1, 1e-30)) / -falloff)
    ct, st = sincos_2pi(u2)
    return jnp.stack([r * ct, r * st], axis=-1)


def gaussian_disk_infinity_pdf(x, y, falloff):
    """wrap.h:132-134."""
    return INV_PI * falloff * jnp.exp(-falloff * (x * x + y * y))


def gaussian_disk(u1, u2, falloff, rmax):
    """wrap.h:142-147 (truncated gaussian disk)."""
    t = 1.0 - u1 * (1.0 - jnp.exp(-falloff * rmax * rmax))
    r = jnp.sqrt(jnp.log(jnp.maximum(t, 1e-30)) / -falloff)
    ct, st = sincos_2pi(u2)
    return jnp.stack([r * ct, r * st], axis=-1)


def gaussian_disk_pdf(x, y, falloff, rmax):
    """wrap.h:149-152."""
    return gaussian_disk_infinity_pdf(x, y, falloff) / (
        1.0 - jnp.exp(-falloff * rmax * rmax))


def equi_angular(u, D, theta_a, theta_b):
    """wrap.h:117-119."""
    return D * jnp.tan(u * (theta_b - theta_a) + theta_a)


def equi_angular_pdf(t, D, theta_a, theta_b):
    """wrap.h:121-123."""
    return D / ((theta_b - theta_a) * (t * t + D * D))


def hg_sample(u1, u2, g):
    """Henyey-Greenstein phase sample (reference medium.h:197-220).

    Returns (dir_local[...,3], phase[...]) where pdf == phase. g may be a
    per-lane array; g == 0 falls back to the uniform-sphere branch.
    """
    iso_dir, iso_pdf = uniform_sphere(u1, u2)

    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1.0, g)  # avoid div by ~0
    sqrt_term = (1.0 - g * g) / (1.0 - g + 2.0 * g * u1)
    cos_hg = (1.0 + g * g - sqrt_term * sqrt_term) / (2.0 * g_safe)
    costheta = jnp.where(jnp.abs(g) < 1e-3, 1.0 - 2.0 * u1, cos_hg)
    sintheta = jnp.sqrt(jnp.maximum(1.0 - costheta * costheta, 0.0))
    d = _dir_from_u2(costheta, sintheta, u2)
    cubic = 1.0 + g * g - 2.0 * g * costheta
    phase = INV_FOUR_PI * (1.0 - g * g) / jnp.sqrt(
        jnp.maximum(cubic * cubic * cubic, 1e-30))

    is_iso = (g == 0.0)
    dir_out = jnp.where(is_iso[..., None], iso_dir, d)
    phase_out = jnp.where(is_iso, INV_FOUR_PI, phase)
    return dir_out, phase_out


def hg_phase(cos_theta, g):
    """HG phase function value == pdf (reference medium.h:222-234)."""
    cubic = 1.0 + g * g - 2.0 * g * cos_theta
    ph = INV_FOUR_PI * (1.0 - g * g) / jnp.sqrt(
        jnp.maximum(cubic * cubic * cubic, 1e-30))
    return jnp.where(g == 0.0, INV_FOUR_PI, ph)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """MIS power heuristic beta=2 (reference pathtracer.cu:166-169)."""
    f = nf * f_pdf
    g = ng * g_pdf
    denom = f * f + g * g
    return jnp.where(denom > 0.0, f * f / jnp.where(denom > 0.0, denom, 1.0), 0.0)
