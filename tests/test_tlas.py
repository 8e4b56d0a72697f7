"""Instanced (TLAS/BLAS) traversal: geom/tlas.py + the instanced walk
in geom/packet_tpu.py (interpret mode on CPU).

Oracle: brute_force_closest over the SAME flattened scene — the global
attribute arrays are laid out (instance, blas-local), so prim ids agree
exactly when the kernel's `local + base` math and the TLAS routing are
right.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from gpu_pathtracer_tpu.geom import tlas as tlas_mod
from gpu_pathtracer_tpu.scene import objloader
from gpu_pathtracer_tpu.scene.flatten import flatten_scene
from gpu_pathtracer_tpu.scene.model import (
    GeometryType, HostScene, InstanceUnit, Material, MaterialType,
    Primitive,
)


def _random_mesh(rs, n_tris, center, spread=0.6):
    v0 = rs.uniform(-1, 1, (n_tris, 3)) * spread + center
    e1 = rs.uniform(-0.3, 0.3, (n_tris, 3))
    e2 = rs.uniform(-0.3, 0.3, (n_tris, 3))
    pos = np.stack([v0, v0 + e1, v0 + e2], axis=1).astype(np.float32)
    nor = np.cross(e1, e2)
    nor /= np.maximum(np.linalg.norm(nor, axis=-1, keepdims=True), 1e-9)
    nor = np.repeat(nor[:, None, :], 3, axis=1).astype(np.float32)
    uvs = rs.uniform(0, 1, (n_tris, 3, 2)).astype(np.float32)
    return pos, nor, uvs


def _add_mesh_unit(scene, pos, nor, uvs, trs, mesh_key):
    mesh = objloader.TriMesh(positions=pos, normals=nor, uvs=uvs)
    mesh = objloader.transform_mesh(mesh, trs)
    tri_ids = scene.append_triangles(mesh)
    p_start = len(scene.primitives)
    for t in tri_ids:
        scene.primitives.append(Primitive(
            type=GeometryType.TRIANGLE, tri_index=int(t), matIdx=0))
    scene.units.append(InstanceUnit(
        mesh_key=mesh_key, trs=trs,
        prim_ids=np.arange(p_start, len(scene.primitives))))


@pytest.fixture(scope="module")
def instanced_scene(monkeypatch_module=None):
    rs = np.random.RandomState(3)
    scene = HostScene()
    scene.materials.append(Material(type=MaterialType.LAMBERTIAN))

    base_pos, base_nor, base_uvs = _random_mesh(rs, 60, np.zeros(3))
    trs_list = [
        objloader.trs_matrix([0, 0, 0], [0, 0, 0], [1, 1, 1]),
        objloader.trs_matrix([1.5, 0.2, -0.4], [0, 40, 0], [0.7, 0.7, 0.7]),
        objloader.trs_matrix([-1.2, -0.3, 0.8], [20, 0, -15],
                             [1.3, 0.9, 1.1]),   # non-uniform scale
    ]
    for k, trs in enumerate(trs_list):
        _add_mesh_unit(scene, base_pos, base_nor, base_uvs, trs, "meshA")

    # second instanced mesh (2 copies)
    pos_b, nor_b, uvs_b = _random_mesh(rs, 40, np.array([0, 2.0, 0]))
    for trs in (objloader.trs_matrix([0, 0, 0], [0, 0, 0], [1, 1, 1]),
                objloader.trs_matrix([2.0, -1.0, 1.0], [0, 0, 70],
                                     [0.5, 0.5, 0.5])):
        _add_mesh_unit(scene, pos_b, nor_b, uvs_b, trs, "meshB")

    # static remainder: one singleton mesh + a sphere + a line
    pos_c, nor_c, uvs_c = _random_mesh(rs, 25, np.array([-2.0, 1.0, -1.0]))
    _add_mesh_unit(scene, pos_c, nor_c, uvs_c,
                   objloader.trs_matrix([0, 0, 0], [0, 0, 0], [1, 1, 1]),
                   "meshC")
    scene.primitives.append(Primitive(
        type=GeometryType.SPHERE, center=np.array([0.5, -1.5, 0.5],
                                                  np.float32),
        radius=0.4, matIdx=0))
    scene.primitives.append(Primitive(
        type=GeometryType.LINE, p0=np.array([-1, -1, -1], np.float32),
        p1=np.array([1, -1.2, 1], np.float32), width0=0.05, width1=0.08,
        matIdx=0))
    return scene


def _flatten_instanced(scene, monkeypatch):
    monkeypatch.setenv("PTPU_FORCE_INSTANCING", "1")
    monkeypatch.setattr(tlas_mod, "MIN_INSTANCED_PRIMS", 8)
    dev, static = flatten_scene(scene, cache=False)
    return dev, static


def _rays(n, rs):
    ro = rs.uniform(-3, 3, (n, 3)).astype(np.float32)
    rd = rs.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_plan_groups(instanced_scene, monkeypatch):
    dev, static = _flatten_instanced(instanced_scene, monkeypatch)
    # static group + 3 meshA + 2 meshB
    assert static.bvh8_n_inst == 6
    assert static.bvh8_tlas_rows >= 1
    assert dev.bvh8_aux.shape[0] == 6


def test_instanced_closest_matches_bruteforce(instanced_scene,
                                              monkeypatch):
    from gpu_pathtracer_tpu.geom import traverse

    dev, static = _flatten_instanced(instanced_scene, monkeypatch)
    assert static.bvh8_n_inst > 0
    rs = np.random.RandomState(11)
    ro, rd = _rays(512, rs)
    hit = traverse.intersect_closest(dev, static, ro, rd, 1e-3, jnp.inf)
    ref = traverse.brute_force_closest(dev, static, ro, rd, 1e-3, jnp.inf)
    np.testing.assert_array_equal(np.asarray(hit.valid),
                                  np.asarray(ref.valid))
    v = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(hit.t)[v], np.asarray(ref.t)[v],
                               rtol=2e-5, atol=2e-5)
    # prim ids must agree exactly (modulo exact-tie ordering, which the
    # t check above already constrains); allow t-ties to differ
    ids_k = np.asarray(hit.prim_idx)[v]
    ids_r = np.asarray(ref.prim_idx)[v]
    agree = (ids_k == ids_r).mean()
    assert agree > 0.995, f"prim-id agreement {agree}"


def test_instanced_any_hit(instanced_scene, monkeypatch):
    from gpu_pathtracer_tpu.geom import traverse

    dev, static = _flatten_instanced(instanced_scene, monkeypatch)
    rs = np.random.RandomState(12)
    ro, rd = _rays(512, rs)
    ref = traverse.brute_force_closest(dev, static, ro, rd, 1e-3, jnp.inf)
    got = traverse.intersect_any(dev, static, ro, rd, 1e-3, jnp.inf)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref.valid))


def test_instanced_vs_flat_render(instanced_scene, monkeypatch):
    """The same scene flattened flat (no instancing) and instanced must
    return identical hit GEOMETRY (t, position, normal) — prim ids remap
    but the attribute rows they select are the same records."""
    from gpu_pathtracer_tpu.geom import traverse

    dev_i, static_i = _flatten_instanced(instanced_scene, monkeypatch)
    monkeypatch.delenv("PTPU_FORCE_INSTANCING")
    dev_f, static_f = flatten_scene(instanced_scene, cache=False)
    assert static_f.bvh8_n_inst == 0
    rs = np.random.RandomState(13)
    ro, rd = _rays(256, rs)
    hi = traverse.intersect_closest(dev_i, static_i, ro, rd, 1e-3, jnp.inf)
    hf = traverse.intersect_closest(dev_f, static_f, ro, rd, 1e-3, jnp.inf)
    np.testing.assert_array_equal(np.asarray(hi.valid),
                                  np.asarray(hf.valid))
    v = np.asarray(hf.valid)
    np.testing.assert_allclose(np.asarray(hi.t)[v], np.asarray(hf.t)[v],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(hi.nor)[v],
                               np.asarray(hf.nor)[v], rtol=1e-4, atol=1e-4)
