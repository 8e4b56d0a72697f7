"""Batched 3-vector math over jnp arrays of shape [..., 3].

The TPU analog of the reference's vendored cutil_math.h (float3 ops): instead
of scalar structs we operate on SoA/AoS jnp arrays so every op vectorizes on
the VPU. All functions are shape-polymorphic over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

# Rec.709 luminance weights (reference: pathtracer.cu:206-208)
LUMA = jnp.array([0.212671, 0.715160, 0.072169], dtype=jnp.float32)

PI = 3.14159265358979323846
TWO_PI = 2.0 * PI
FOUR_PI = 4.0 * PI
INV_PI = 1.0 / PI
INV_TWO_PI = 1.0 / TWO_PI
INV_FOUR_PI = 1.0 / FOUR_PI


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def dot3(a, b):
    """Dot product keeping the trailing dim for broadcasting: [..., 1]."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def length_sq(v):
    return dot(v, v)


def normalize(v, eps: float = 0.0):
    n = jnp.sqrt(jnp.maximum(dot3(v, v), 1e-30))
    return v / n


def luminance(c):
    """Rec.709 luminance of an RGB color batch [..., 3] -> [...]."""
    return dot(c, LUMA)


def reflect(wi, n):
    """Mirror reflection of `wi` about `n`; both point away from the surface.

    Matches the reference convention (pathtracer.cu:140-142):
    Reflect(in, nor) = 2*dot(in, nor)*nor - in.
    """
    return 2.0 * dot3(wi, n) * n - wi


def refract(wi, n, etai, etat):
    """Refract `wi` (pointing away from surface) through normal `n`.

    Behavior-parity with the reference Refract (pathtracer.cu:144-158):
    handles rays entering or exiting (cosi sign) by swapping etas.
    Caller must ensure total internal reflection was already rejected.
    """
    cosi = dot3(wi, n)
    enter = cosi > 0.0
    etai = jnp.asarray(etai)
    etat = jnp.asarray(etat)
    if etai.ndim == cosi.ndim - 1:
        etai = etai[..., None]
    if etat.ndim == cosi.ndim - 1:
        etat = etat[..., None]
    ei = jnp.where(enter, etai, etat)
    et = jnp.where(enter, etat, etai)
    eta = ei / et
    sini2 = 1.0 - cosi * cosi
    sint2 = sini2 * eta * eta
    cost = jnp.sqrt(jnp.maximum(1.0 - sint2, 0.0))
    sign = jnp.where(enter, -1.0, 1.0)
    return normalize((n * cosi - wi) * eta + sign * cost * n)


def make_coordinate(n):
    """Build an orthonormal frame (u, w) around unit normal n.

    Mirrors reference MakeCoordinate (wrap.h:6-16): returns (u, w) such that
    {u, n, w} spans R^3 with w chosen perpendicular to the dominant axis.
    """
    ax = jnp.abs(n[..., 0:1])
    ay = jnp.abs(n[..., 1:2])
    use_x = ax > ay
    inv_len_x = 1.0 / jnp.sqrt(n[..., 0:1] ** 2 + n[..., 2:3] ** 2 + 1e-30)
    wx = jnp.concatenate(
        [n[..., 2:3] * inv_len_x,
         jnp.zeros_like(inv_len_x),
         -n[..., 0:1] * inv_len_x], axis=-1)
    inv_len_y = 1.0 / jnp.sqrt(n[..., 1:2] ** 2 + n[..., 2:3] ** 2 + 1e-30)
    wy = jnp.concatenate(
        [jnp.zeros_like(inv_len_y),
         n[..., 2:3] * inv_len_y,
         -n[..., 1:2] * inv_len_y], axis=-1)
    w = jnp.where(use_x, wx, wy)
    u = cross(w, n)
    return u, w


def to_world(d, u, v, w):
    """Local->world: d.x*u + d.y*v + d.z*w (reference wrap.h:18-20)."""
    return (d[..., 0:1] * u + d[..., 1:2] * v + d[..., 2:3] * w)


def to_local(d, u, v, w):
    """World->local: (d.u, d.v, d.w) (reference wrap.h:22-24)."""
    return jnp.stack([dot(d, u), dot(d, v), dot(d, w)], axis=-1)


def is_black(c, eps: float = 0.0):
    """True where an RGB batch is exactly black (reference common.h IsBlack)."""
    return jnp.all(c <= eps, axis=-1)


def safe_div(a, b, eps: float = 1e-20):
    """a / b with 0-denominator protection (returns 0 there)."""
    return jnp.where(jnp.abs(b) > eps, a / jnp.where(jnp.abs(b) > eps, b, 1.0), 0.0)


def same_hemisphere(a, b, n):
    """dot(a,n) * dot(b,n) > 0 (reference pathtracer.cu:210-212)."""
    return dot(a, n) * dot(b, n) > 0.0


def face_forward(n, d):
    """Flip n so it faces the same hemisphere as d."""
    return jnp.where(dot3(n, d) < 0.0, -n, n)
