"""Texture fetch: bilinear, wrap-repeat + edge-clamp, from the flat atlas.

Re-expresses GetTexel/getTexel (pathtracer.cu:324-359) as batched gathers
from the single concatenated uint8 buffer that `flatten` builds. Values were
converted sRGB->linear and quantized at load (texture.h:15-27), so a texel
here round-trips bit-identically with the reference's uchar4 path.
"""

from __future__ import annotations

import jax.numpy as jnp


def _texel(scene, tex_idx, w, h, x, y):
    """Integer texel with the reference's wrap + clamp (pathtracer.cu:
    324-339): python-style modulo then edge clamp."""
    # reference: rx = x - (x/w)*w  (C integer division -> trunc toward 0)
    rx = x - (x // jnp.maximum(w, 1)) * w  # match C trunc for x>=0
    ry = y - (y // jnp.maximum(h, 1)) * h
    # negative results wrap by +w (then clamp)
    rx = jnp.where(rx < 0, rx + w, rx)
    ry = jnp.where(ry < 0, ry + h, ry)
    xi = jnp.clip(rx, 0, w - 1)
    yi = jnp.clip(ry, 0, h - 1)
    off = jnp.take(scene.tex_offset, tex_idx, axis=0)
    idx = off + yi * w + xi
    rgb = jnp.take(scene.tex_data, idx, axis=0).astype(jnp.float32)
    return rgb * (1.0 / 255.0)


def get_texel(scene, mat_idx, uv, has_textures: bool):
    """Bilinear diffuse lookup (pathtracer.cu:341-359); materials without a
    texture return their constant diffuse color.

    TPU path: ONE x32 row gather of the corner-packed atlas
    (scene.tex_corners, built in flatten) per lookup instead of 12
    element gathers — element gathers run ~130 Melem/s on v5e while
    x32 row gathers are in the measured fast class (CLAUDE.md), a
    ~10x cheaper fetch at 262k lanes. Numerics are identical: the
    corner rows bake texture.py::_texel's mod-then-clamp rule.
    """
    diffuse = jnp.take(scene.m_diffuse, mat_idx, axis=0)
    if not has_textures:
        return diffuse

    tex_idx = jnp.take(scene.m_tex_idx, mat_idx, axis=0)
    has_tex = tex_idx >= 0
    ti = jnp.where(has_tex, tex_idx, 0)
    w = jnp.take(scene.tex_w, ti, axis=0)
    h = jnp.take(scene.tex_h, ti, axis=0)
    xx = w.astype(jnp.float32) * uv[..., 0]
    yy = h.astype(jnp.float32) * uv[..., 1]
    x = jnp.floor(xx).astype(jnp.int32)
    y = jnp.floor(yy).astype(jnp.int32)
    dx = jnp.abs(xx - x)[..., None]
    dy = jnp.abs(yy - y)[..., None]
    # wrap+clamp the BASE texel (the +1 corners are baked into the row)
    rx = x - (x // jnp.maximum(w, 1)) * w
    ry = y - (y // jnp.maximum(h, 1)) * h
    rx = jnp.where(rx < 0, rx + w, rx)
    ry = jnp.where(ry < 0, ry + h, ry)
    xi = jnp.clip(rx, 0, w - 1)
    yi = jnp.clip(ry, 0, h - 1)
    off = jnp.take(scene.tex_offset, ti, axis=0)
    row = jnp.take(scene.tex_corners, off + yi * w + xi, axis=0)
    c00, c10, c01, c11 = (row[..., 0:3], row[..., 3:6],
                          row[..., 6:9], row[..., 9:12])
    tex = (1 - dy) * ((1 - dx) * c00 + dx * c10) \
        + dy * ((1 - dx) * c01 + dx * c11)
    return jnp.where(has_tex[..., None], tex, diffuse)


def env_lookup(scene, uv):
    """Bilinear env-map fetch (infinite.h:66-94): uv in [0,1]^2, wrap+clamp."""
    h, w, _ = scene.env_data.shape
    data = scene.env_data.reshape(-1, 3)
    xx = w * uv[..., 0]
    yy = h * uv[..., 1]
    x = jnp.floor(xx).astype(jnp.int32)
    y = jnp.floor(yy).astype(jnp.int32)
    dx = jnp.abs(xx - x)[..., None]
    dy = jnp.abs(yy - y)[..., None]

    def tx(xi, yi):
        rx = xi - (xi // w) * w
        ry = yi - (yi // h) * h
        rx = jnp.where(rx < 0, rx + w, rx)
        ry = jnp.where(ry < 0, ry + h, ry)
        xi2 = jnp.clip(rx, 0, w - 1)
        yi2 = jnp.clip(ry, 0, h - 1)
        return jnp.take(data, yi2 * w + xi2, axis=0)

    c00 = tx(x, y)
    c10 = tx(x + 1, y)
    c01 = tx(x, y + 1)
    c11 = tx(x + 1, y + 1)
    return (1 - dy) * ((1 - dx) * c00 + dx * c10) \
        + dy * ((1 - dx) * c01 + dx * c11)
