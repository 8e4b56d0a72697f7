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


def test_packet_tpu_kernel_matches_xla_walk(teapot_flat):
    """The Pallas in-kernel walk (interpret mode on CPU) must agree with
    the XLA packet walk on closest and any-hit queries."""
    from gpu_pathtracer_tpu.geom import packet_tpu
    scene, static = teapot_flat
    assert packet_tpu.supports(scene, static)
    n = 700  # not a multiple of PACKET_W (tests padding)
    ro, rd = _rays(n, scene, seed=3)
    tmin = jnp.full(n, 1e-3)
    tmax = jnp.full(n, np.inf)

    t_x, prim_x, found_x = packet.packet_traverse(
        scene, static, ro, rd, tmin, tmax, any_hit=False)
    t_k, prim_k, found_k = packet_tpu.packet_traverse(
        scene, static, ro, rd, tmin, tmax, any_hit=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(found_k), np.asarray(found_x))
    f = np.asarray(found_x)
    np.testing.assert_allclose(
        np.asarray(t_k)[f], np.asarray(t_x)[f], rtol=1e-4)
    assert (np.asarray(prim_k)[f] == np.asarray(prim_x)[f]).mean() > 0.99

    # any-hit with a finite tmax exercises early-exit + tmax gating
    _, _, any_x = packet.packet_traverse(
        scene, static, ro, rd, tmin, jnp.full(n, 2.0), any_hit=True)
    _, _, any_k = packet_tpu.packet_traverse(
        scene, static, ro, rd, tmin, jnp.full(n, 2.0), any_hit=True,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(any_k), np.asarray(any_x))


def test_packet_tpu_push_order_invariant(teapot_flat):
    """Near-first ordering is a traversal-schedule change only: results
    must match the unordered (slot_order) policy exactly."""
    from gpu_pathtracer_tpu.geom import packet_tpu
    scene, static = teapot_flat
    n = 1024
    ro, rd = _rays(n, scene, seed=11)
    tmin = jnp.full(n, 1e-3)
    tmax = jnp.full(n, np.inf)
    t_n, prim_n, found_n = packet_tpu.packet_traverse(
        scene, static, ro, rd, tmin, tmax, any_hit=False, interpret=True)
    t_s, prim_s, found_s = packet_tpu.packet_traverse(
        scene, static, ro, rd, tmin, tmax, any_hit=False, interpret=True,
        slot_order=True)
    np.testing.assert_array_equal(np.asarray(found_n), np.asarray(found_s))
    np.testing.assert_array_equal(np.asarray(prim_n), np.asarray(prim_s))
    np.testing.assert_array_equal(np.asarray(t_n), np.asarray(t_s))


def test_pack_nodes4_conservative(teapot_flat):
    """The bf16-packed node boxes must CONTAIN the f32 boxes (mins
    rounded down, maxs up) and carry identical metas."""
    scene, static = teapot_flat
    table = np.asarray(scene.bvh8_table)
    n8 = static.bvh8_n8
    packed = np.asarray(scene.bvh8_nodes4)
    nodes = table[:n8].reshape(n8, 16, 8)[:, :8, :]
    quad = packed[:-1].reshape(-1, 4, 8, 4).reshape(-1, 8, 4)[:n8]
    v = quad[..., 0:3].view(np.uint32)
    mn = (v & np.uint32(0xFFFF0000)).view(np.float32)
    mx = (v << np.uint32(16)).view(np.float32)
    fin = np.isfinite(nodes[..., 0:3])
    assert (mn[fin] <= nodes[..., 0:3][fin]).all()
    fin = np.isfinite(nodes[..., 3:6])
    assert (mx[fin] >= nodes[..., 3:6][fin]).all()
    np.testing.assert_array_equal(quad[..., 3], nodes[..., 6])
    # rounding must stay tight: within one bf16 ulp (~0.8%)
    rel = np.abs(mn[fin] - nodes[..., 0:3][fin])
    assert (rel <= np.abs(nodes[..., 0:3][fin]) * 0.01 + 1e-3).all()


def test_packet_tpu_streamed_matches_resident(teapot_flat):
    """The STREAMED kernel (VMEM-resident nodes + DMA'd leaf rows with a
    one-iteration pipeline) must agree with the XLA walk — forced on via
    force_streamed so the small fixture exercises the big-scene path."""
    from gpu_pathtracer_tpu.geom import packet_tpu
    scene, static = teapot_flat
    n = 700
    ro, rd = _rays(n, scene, seed=7)
    tmin = jnp.full(n, 1e-3)
    tmax = jnp.full(n, np.inf)

    t_x, prim_x, found_x = packet.packet_traverse(
        scene, static, ro, rd, tmin, tmax, any_hit=False)
    t_s, prim_s, found_s = packet_tpu.packet_traverse(
        scene, static, ro, rd, tmin, tmax, any_hit=False, interpret=True,
        force_streamed=True)
    np.testing.assert_array_equal(np.asarray(found_s), np.asarray(found_x))
    f = np.asarray(found_x)
    np.testing.assert_allclose(
        np.asarray(t_s)[f], np.asarray(t_x)[f], rtol=1e-4)
    assert (np.asarray(prim_s)[f] == np.asarray(prim_x)[f]).mean() > 0.99

    _, _, any_x = packet.packet_traverse(
        scene, static, ro, rd, tmin, jnp.full(n, 2.0), any_hit=True)
    _, _, any_s = packet_tpu.packet_traverse(
        scene, static, ro, rd, tmin, jnp.full(n, 2.0), any_hit=True,
        interpret=True, force_streamed=True)
    np.testing.assert_array_equal(np.asarray(any_s), np.asarray(any_x))


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
