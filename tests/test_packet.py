"""Packet traversal vs brute force on a real mesh (> DENSE_MAX prims)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpu_pathtracer_tpu.geom import packet, traverse
from gpu_pathtracer_tpu.geom.dense import DENSE_MAX

TEAPOT = "/root/reference/scenes/cornell_box/geometry/teapot.obj"


@pytest.fixture(scope="module")
def teapot_flat():
    import os
    if not os.path.exists(TEAPOT):
        pytest.skip("teapot mesh unavailable")
    from gpu_pathtracer_tpu.scene import objloader
    from gpu_pathtracer_tpu.scene.flatten import flatten_scene
    from gpu_pathtracer_tpu.scene.model import (
        GeometryType, HostScene, Material, Primitive,
    )
    mesh = objloader.load_obj(TEAPOT)
    scene = HostScene()
    scene.materials.append(Material())
    ids = scene.append_triangles(mesh)
    for t in ids:
        scene.primitives.append(Primitive(
            type=GeometryType.TRIANGLE, tri_index=int(t), matIdx=0))
    dev, static = flatten_scene(scene, cache=False)
    assert static.n_primitives > DENSE_MAX  # must exercise the packet path
    return dev, static


def _rays(n, scene, seed=0):
    lo = np.asarray(scene.node_bbox_min[0])
    hi = np.asarray(scene.node_bbox_max[0])
    r = np.random.RandomState(seed)
    span = hi - lo
    ro = (lo - 0.5 * span) + r.uniform(0, 1, (n, 3)) * 2.0 * span
    rd = r.normal(size=(n, 3))
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32)


def test_packet_matches_simt_traversal(teapot_flat):
    scene, static = teapot_flat
    n = 384  # deliberately not a multiple of PACKET (tests padding)
    ro, rd = _rays(n, scene)
    tmin = jnp.full(n, 1e-3)
    tmax = jnp.full(n, np.inf)

    t_p, prim_p, found_p = packet.packet_traverse(
        scene, static, ro, rd, tmin, tmax, any_hit=False)
    # oracle: the lane-per-ray SIMT walk (independently tested vs brute
    # force on small scenes)
    t_s, prim_s, found_s = traverse._traverse(
        scene, static, ro, rd, tmin, tmax, any_hit=False)

    np.testing.assert_array_equal(np.asarray(found_p), np.asarray(found_s))
    f = np.asarray(found_p)
    np.testing.assert_allclose(
        np.asarray(t_p)[f], np.asarray(t_s)[f], rtol=1e-4)
    assert (np.asarray(prim_p)[f] == np.asarray(prim_s)[f]).mean() > 0.99


def test_packet_any_hit(teapot_flat):
    scene, static = teapot_flat
    n = 256
    ro, rd = _rays(n, scene, seed=5)
    tmin = jnp.full(n, 1e-3)
    tmax = jnp.full(n, np.inf)
    closest_t, _, found = packet.packet_traverse(
        scene, static, ro, rd, tmin, tmax, any_hit=False)
    any_found = traverse.intersect_any(scene, static, ro, rd, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(any_found), np.asarray(found))
    # tmax just before the closest hit -> unoccluded
    short = jnp.where(found, closest_t * 0.9, 1e-4)
    blocked = traverse.intersect_any(scene, static, ro, rd, tmin, short)
    assert not np.asarray(blocked)[np.asarray(found)].any()


def test_full_hit_attributes_through_packet_path(teapot_flat):
    scene, static = teapot_flat
    n = 256
    ro, rd = _rays(n, scene, seed=9)
    hit = traverse.intersect_closest(
        scene, static, ro, rd, jnp.full(n, 1e-3), jnp.full(n, np.inf))
    v = np.asarray(hit.valid)
    assert v.any()
    nor = np.asarray(hit.nor)[v]
    np.testing.assert_allclose(
        np.linalg.norm(nor, axis=-1), 1.0, atol=1e-4)
    assert (np.asarray(hit.mat_idx)[v] == 0).all()
