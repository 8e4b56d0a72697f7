"""Texture fetch: the corner-packed row-gather path (scene.tex_corners,
ops-level rationale in shade/texture.py) must be numerically identical
to the reference's element-gather formulation (pathtracer.cu:324-359,
kept as texture.py::_texel) including the mod-then-clamp wrap rule at
tile seams and negative/out-of-range uv."""

from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp

from gpu_pathtracer_tpu.shade.texture import _texel, get_texel


def _make_scene(w=5, h=3, seed=0):
    rs = np.random.RandomState(seed)
    data = rs.randint(0, 256, (h * w, 3)).astype(np.uint8)
    lin = data.astype(np.float32) / 255.0
    img = lin.reshape(h, w, 3)
    xp = (np.arange(w) + 1) % w
    yp = (np.arange(h) + 1) % h
    corners = np.concatenate([img, img[:, xp], img[yp], img[yp][:, xp]],
                             axis=-1).reshape(-1, 12)
    tex_corners = np.zeros((h * w, 32), np.float32)
    tex_corners[:, :12] = corners
    return SimpleNamespace(
        m_diffuse=jnp.asarray([[0.5, 0.5, 0.5], [1.0, 1.0, 1.0]]),
        m_tex_idx=jnp.asarray([0, -1], jnp.int32),
        tex_data=jnp.asarray(data),
        tex_offset=jnp.asarray([0], jnp.int32),
        tex_w=jnp.asarray([w], jnp.int32),
        tex_h=jnp.asarray([h], jnp.int32),
        tex_corners=jnp.asarray(tex_corners),
    )


def _reference_bilinear(scene, mat_idx, uv):
    """The element-gather formulation get_texel used before the
    corner-packed atlas (identical math to pathtracer.cu:341-359)."""
    ti = jnp.zeros_like(mat_idx)
    w = jnp.take(scene.tex_w, ti, axis=0)
    h = jnp.take(scene.tex_h, ti, axis=0)
    xx = w.astype(jnp.float32) * uv[..., 0]
    yy = h.astype(jnp.float32) * uv[..., 1]
    x = jnp.floor(xx).astype(jnp.int32)
    y = jnp.floor(yy).astype(jnp.int32)
    dx = jnp.abs(xx - x)[..., None]
    dy = jnp.abs(yy - y)[..., None]
    c00 = _texel(scene, ti, w, h, x, y)
    c10 = _texel(scene, ti, w, h, x + 1, y)
    c01 = _texel(scene, ti, w, h, x, y + 1)
    c11 = _texel(scene, ti, w, h, x + 1, y + 1)
    return (1 - dy) * ((1 - dx) * c00 + dx * c10) \
        + dy * ((1 - dx) * c01 + dx * c11)


def test_corner_packed_matches_element_gather():
    scene = _make_scene()
    rs = np.random.RandomState(1)
    # cover in-range, seam (u near 1), negative, and far-out-of-range uv
    uv = np.concatenate([
        rs.rand(256, 2),
        np.array([[0.999, 0.999], [0.0, 0.0], [1.0, 1.0],
                  [-0.25, 0.6], [3.7, -2.2], [0.2, 7.0]]),
    ]).astype(np.float32)
    mat = jnp.zeros(uv.shape[0], jnp.int32)
    got = get_texel(scene, mat, jnp.asarray(uv), True)
    want = _reference_bilinear(scene, mat, jnp.asarray(uv))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)


def test_untextured_material_returns_diffuse():
    scene = _make_scene()
    uv = jnp.asarray(np.random.RandomState(2).rand(16, 2), jnp.float32)
    mat = jnp.ones(16, jnp.int32)   # material 1 has no texture
    got = np.asarray(get_texel(scene, mat, uv, True))
    np.testing.assert_allclose(got, np.full((16, 3), 1.0), atol=0)
