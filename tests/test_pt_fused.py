"""Unit tests for the fused PT megakernel's building blocks.

The kernel body (integrators/pt_fused.py) is plain jnp on [rows, 128]
component arrays — its pieces run outside Pallas with tables passed as
arrays instead of refs, so every block is testable on the CPU backend
against the already-validated wavefront implementations:

  _closest_hit   vs geom.traverse.intersect_closest
  _decode_material vs shade.bsdf.gather_materials
  _sample_bsdf / _eval_bsdf vs shade.bsdf.sample_bsdf / eval_bsdf

(The full-kernel estimator equivalence was verified on TPU against both
the wavefront PT and a reference-style two-sample oracle; those runs need
real hardware and ~10^7 samples, so they live outside CI.)
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from gpu_pathtracer_tpu.geom import traverse
from gpu_pathtracer_tpu.integrators import pt_fused as F
from gpu_pathtracer_tpu.shade import bsdf as bsdf_mod
from gpu_pathtracer_tpu.scene.flatten import flatten_scene
from gpu_pathtracer_tpu.scene.model import IntegratorType


@pytest.fixture(scope="module")
def cornell(cornell_scene):
    import copy
    scene = copy.copy(cornell_scene)
    scene.width = scene.height = 32
    dev, static = flatten_scene(scene)
    static = dataclasses.replace(static, integrator=IntegratorType.PT,
                                 max_depth=5)
    return dev, static


def _rays(dev, n):
    rng = np.random.default_rng(11)
    c = np.asarray(dev.world_center)
    r = float(dev.world_radius)
    ro = c + (rng.random((n, 3)) - 0.5) * r * 0.8
    rd = rng.normal(size=(n, 3))
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return (jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32),
            rng)


def _tup(a, shape):
    return tuple(a[:, i].reshape(shape) for i in range(a.shape[1]))


def _flat(v):
    return np.stack([np.asarray(x).reshape(-1) for x in v], -1)


@pytest.mark.parametrize("blocked", [False, True])
def test_closest_hit_matches_traverse(cornell, blocked):
    dev, static = cornell
    n = 4 * 128
    shape = (4, 128)
    ro, rd, _ = _rays(dev, n)
    eps = float(dev.epsilon)

    hw = traverse.intersect_closest(dev, static, ro, rd, eps,
                                    jnp.full(n, jnp.inf))
    nb = int(dev.block_bbox.shape[0]) if blocked else 0
    hf = F._closest_hit(dev.dense_prims, dev.fused_attrs,
                        static.n_primitives, _tup(ro, shape),
                        _tup(rd, shape), jnp.float32(eps),
                        jnp.ones(shape, bool),
                        static.has_triangles, static.has_spheres,
                        static.has_lines,
                        dev.block_bbox if blocked else None, nb)

    m = np.asarray(hw.valid)
    assert np.array_equal(np.asarray(hf.valid).reshape(-1), m)
    assert np.allclose(np.asarray(hf.t).reshape(-1)[m],
                       np.asarray(hw.t)[m], atol=1e-5)
    assert np.allclose(_flat(hf.pos)[m], np.asarray(hw.pos)[m], atol=1e-4)
    assert np.allclose(_flat(hf.nor)[m], np.asarray(hw.nor)[m], atol=1e-5)
    assert np.allclose(_flat(hf.dpdu)[m], np.asarray(hw.dpdu)[m], atol=1e-5)
    assert np.array_equal(np.asarray(hf.mat_idx).reshape(-1)[m],
                          np.asarray(hw.mat_idx)[m].astype(np.float32))
    assert np.array_equal(np.asarray(hf.light_idx).reshape(-1)[m],
                          np.asarray(hw.light_idx)[m].astype(np.float32))


@pytest.mark.parametrize("blocked", [False, True])
def test_any_hit_matches_traverse(cornell, blocked):
    dev, static = cornell
    n = 4 * 128
    shape = (4, 128)
    ro, rd, _ = _rays(dev, n)
    eps = float(dev.epsilon)
    tmax = jnp.full(n, 2.0 * float(dev.world_radius))

    nb = int(dev.block_bbox.shape[0]) if blocked else 0
    occ_w = traverse.intersect_any(dev, static, ro, rd, eps, tmax)
    occ_f = F._any_hit(dev.dense_prims, static.n_primitives,
                       _tup(ro, shape), _tup(rd, shape), jnp.float32(eps),
                       tmax.reshape(shape), static.has_triangles,
                       static.has_spheres, static.has_lines,
                       dev.block_bbox if blocked else None, nb)
    assert np.array_equal(np.asarray(occ_f).reshape(-1), np.asarray(occ_w))


def test_decode_material_matches_table(cornell):
    dev, static = cornell
    M = int(dev.mat_attrs.shape[0])
    idx = jnp.asarray(np.tile(np.arange(M, dtype=np.float32), 128)
                      [:8 * 128].reshape(8, 128))
    m = F._decode_material(dev.mat_attrs, M, idx)
    tab = np.asarray(dev.mat_attrs)
    ii = np.asarray(idx).reshape(-1).astype(int)
    assert np.array_equal(np.asarray(m.type).reshape(-1), tab[ii, 0])
    assert np.allclose(_flat(m.diffuse), tab[ii, 11:14])
    assert np.allclose(_flat(m.specular), tab[ii, 14:17])
    assert np.allclose(np.asarray(m.alpha_u).reshape(-1), tab[ii, 1])


def test_sample_eval_bsdf_match_wavefront(cornell):
    dev, static = cornell
    n = 4 * 128
    shape = (4, 128)
    ro, rd, rng = _rays(dev, n)
    eps = float(dev.epsilon)
    hw = traverse.intersect_closest(dev, static, ro, rd, eps,
                                    jnp.full(n, jnp.inf))
    hf = F._closest_hit(dev.dense_prims, dev.fused_attrs,
                        static.n_primitives, _tup(ro, shape),
                        _tup(rd, shape), jnp.float32(eps),
                        jnp.ones(shape, bool),
                        static.has_triangles, static.has_spheres)
    m = np.asarray(hw.valid)

    mat_w = bsdf_mod.gather_materials(dev, static, hw.mat_idx, hw.uv)
    mat_f = F._decode_material(dev.mat_attrs, int(dev.mat_attrs.shape[0]),
                               jnp.maximum(jnp.asarray(hf.mat_idx), 0.0))

    u1 = jnp.asarray(rng.random(n), jnp.float32)
    u2 = jnp.asarray(rng.random(n), jnp.float32)
    u3 = jnp.asarray(rng.random(n), jnp.float32)
    wo_w, fr_w, pdf_w = bsdf_mod.sample_bsdf(
        mat_w, -rd, hw.nor, hw.dpdu, u1, u2, u3, static.material_types)
    wo_f, fr_f, pdf_f = F._sample_bsdf(
        mat_f, tuple(-x for x in _tup(rd, shape)), hf.nor, hf.dpdu,
        u1.reshape(shape), u2.reshape(shape), u3.reshape(shape),
        static.material_types, static.has_aniso)
    assert np.allclose(_flat(wo_f)[m], np.asarray(wo_w)[m], atol=1e-5)
    assert np.allclose(_flat(fr_f)[m], np.asarray(fr_w)[m],
                       atol=1e-4, rtol=1e-4)
    assert np.allclose(np.asarray(pdf_f).reshape(-1)[m],
                       np.asarray(pdf_w)[m], atol=1e-5)

    wo2 = rng.normal(size=(n, 3))
    wo2 /= np.linalg.norm(wo2, axis=-1, keepdims=True)
    wo2 = jnp.asarray(wo2, jnp.float32)
    fre_w, pde_w = bsdf_mod.eval_bsdf(mat_w, -rd, wo2, hw.nor, hw.dpdu,
                                      static.material_types)
    fre_f, pde_f = F._eval_bsdf(mat_f, tuple(-x for x in _tup(rd, shape)),
                                _tup(wo2, shape), hf.nor, hf.dpdu,
                                static.material_types, static.has_aniso)
    assert np.allclose(_flat(fre_f)[m], np.asarray(fre_w)[m],
                       atol=1e-4, rtol=1e-4)
    assert np.allclose(np.asarray(pde_f).reshape(-1)[m],
                       np.asarray(pde_w)[m], atol=1e-5)


def test_line_prim_hit_matches_oracle():
    """Line (fur) segments: fused _prim_hit vs traverse._line_intersect."""
    from gpu_pathtracer_tpu.geom.traverse import _line_intersect
    from gpu_pathtracer_tpu.scene.model import GeometryType

    rng = np.random.default_rng(5)
    n = 2 * 128
    shape = (2, 128)
    ro = jnp.asarray(rng.random((n, 3)) * 2 - 1, jnp.float32)
    rd = rng.normal(size=(n, 3))
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd, jnp.float32)

    p0 = rng.random(3).astype(np.float32) * 2 - 1
    p1 = rng.random(3).astype(np.float32) * 2 - 1
    w0, w1 = 0.05, 0.15
    row = np.zeros(16, np.float32)
    row[0:3] = p0
    row[3:6] = p1
    row[9] = float(int(GeometryType.LINE))
    row[10], row[11] = w0, w1
    prims = jnp.asarray(row[None, :])

    tmax = jnp.full(n, 100.0, jnp.float32)
    okw, tw, _ = _line_intersect(
        ro, rd, jnp.broadcast_to(jnp.asarray(p0), ro.shape),
        jnp.broadcast_to(jnp.asarray(p1), ro.shape), w0, w1, 1e-3, 100.0)
    okf, tf, _, _ = F._prim_hit(
        prims, 0,
        tuple(ro[:, i].reshape(shape) for i in range(3)),
        tuple(rd[:, i].reshape(shape) for i in range(3)),
        jnp.float32(1e-3), tmax.reshape(shape), False, False, True)
    assert np.array_equal(np.asarray(okf).reshape(-1), np.asarray(okw))
    mm = np.asarray(okw)
    assert np.allclose(np.asarray(tf).reshape(-1)[mm], np.asarray(tw)[mm],
                       atol=1e-5)


def test_supports_gating(cornell):
    dev, static = cornell
    from gpu_pathtracer_tpu.scene.model import MaterialType
    assert F.supports(static)
    # textured-LAMBERTIAN tri-only scenes are in scope (the XLA ratio
    # fold, see tests/test_pt_fused_textured.py); textured substrate and
    # textured+env are not
    assert F.supports(dataclasses.replace(
        static, has_textures=True,
        textured_types=(int(MaterialType.LAMBERTIAN),)))
    assert not F.supports(dataclasses.replace(
        static, has_textures=True,
        textured_types=(int(MaterialType.SUBSTRATE),)))
    assert not F.supports(dataclasses.replace(
        static, has_textures=True, has_infinite=True,
        textured_types=(int(MaterialType.LAMBERTIAN),)))
    assert F.supports(dataclasses.replace(static, has_infinite=True))
    assert not F.supports(dataclasses.replace(static, has_bssrdf=True))
    assert F.supports(dataclasses.replace(static, has_lines=True))
    assert not F.supports(dataclasses.replace(static, n_primitives=10000))
    # env-only scenes (no area lights) are in scope; dark scenes are not
    assert not F.supports(dataclasses.replace(static, n_lights=0))
    assert F.supports(dataclasses.replace(
        static, n_lights=0, has_infinite=True))
    assert not F.supports(dataclasses.replace(static, n_primitives=100000))
