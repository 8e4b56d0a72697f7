"""Scene ingest tests: OBJ loader, JSON parser, flatten."""

import numpy as np
import pytest

from gpu_pathtracer_tpu.scene import objloader
from gpu_pathtracer_tpu.scene.model import (
    GeometryType, IntegratorType, MaterialType, MediumType,
)


def test_obj_fan_triangulation(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1 2 3 4\n")
    mesh = objloader.load_obj(str(p))
    assert mesh.num_triangles == 2
    # generated smooth normals point +Z (CCW winding)
    np.testing.assert_allclose(mesh.normals[:, :, 2], 1.0, atol=1e-6)


def test_obj_explicit_normals_and_uv(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\n"
        "vn 0 0 1\nvn 0 0 1\nvn 0 0 1\n"
        "f 1/1/1 2/2/2 3/3/3\n")
    mesh = objloader.load_obj(str(p))
    assert mesh.num_triangles == 1
    np.testing.assert_allclose(mesh.normals[0, :, 2], 1.0)
    np.testing.assert_allclose(mesh.uvs[0], [[0, 0], [1, 0], [0, 1]])


def test_trs_matrix_order():
    # translate then rotate then scale: point (1,0,0) scaled by 2 -> (2,0,0),
    # rotated 90 about Y -> (0,0,-2), translated by (0,5,0) -> (0,5,-2)
    trs = objloader.trs_matrix([0, 5, 0], [0, 90, 0], [2, 2, 2])
    p = trs @ np.array([1.0, 0, 0, 1])
    np.testing.assert_allclose(p[:3], [0, 5, -2], atol=1e-6)


def test_smooth_normals_share_positions(tmp_path):
    # two triangles meeting at an edge with 90-degree fold: shared-edge
    # vertices average the two face normals
    p = tmp_path / "fold.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "v 0 0 0\nv 0 0 1\nv 1 0 0\n"
        "f 1 2 3\nf 4 5 6\n")
    mesh = objloader.load_obj(str(p))
    n_shared = mesh.normals[0, 0]  # vertex at origin, shared
    expected = np.array([0, 1, 1]) / np.sqrt(2)
    np.testing.assert_allclose(np.abs(n_shared), expected, atol=1e-6)


def test_parse_cornell(cornell_scene):
    s = cornell_scene
    assert s.width == 512 and s.height == 512
    assert s.integrator.type == IntegratorType.VPT
    assert s.integrator.maxDepth == 17
    assert abs(s.epsilon - 1e-3) < 1e-9
    assert len(s.materials) == 8
    assert s.materials[0].type == MaterialType.LAMBERTIAN
    np.testing.assert_allclose(
        s.materials[0].diffuse, [0.63, 0.065, 0.05], atol=1e-6)
    assert s.materials[6].type == MaterialType.ROUGHCONDUCTOR
    assert s.materials[7].type == MaterialType.DIELECTRIC
    assert s.materials[7].insideIOR == 1.5
    assert len(s.mediums) == 2
    assert s.mediums[0].type == MediumType.HOMOGENEOUS
    np.testing.assert_allclose(
        s.mediums[0].sigmaS, np.array([0.70, 1.22, 1.90]) * 25.0, rtol=1e-6)
    assert s.mediums[1].type == MediumType.HETEROGENEOUS
    assert s.mediums[1].density.shape == (40, 100, 100)
    # lights: one quad -> 2 triangles
    assert len(s.lights) == 2
    np.testing.assert_allclose(s.lights[0].radiance, [17, 12, 4])
    # interface mesh: density_render has no material -> matIdx -1
    interface = [p for p in s.primitives
                 if p.mediumInside == 1 and p.type == GeometryType.TRIANGLE]
    assert interface and all(p.matIdx == -1 for p in interface)
    # camera
    np.testing.assert_allclose(s.camera.position, [0, 1.0, 6.8])
    assert abs(s.camera.fov - 19.5) < 1e-6


def test_flatten_cornell(cornell_scene):
    from gpu_pathtracer_tpu.scene.flatten import flatten_scene
    dev, static = flatten_scene(cornell_scene, cache=False)
    assert static.n_lights == 2
    assert not static.has_infinite
    assert static.has_triangles and not static.has_spheres
    assert dev.node_bbox_min.shape[0] == static.n_nodes
    assert dev.prim_type.shape[0] == static.n_primitives
    # light CDF normalized
    cdf = np.asarray(dev.light_cdf)
    assert abs(cdf[-1] - 1.0) < 1e-6
    assert (np.diff(cdf) >= -1e-7).all()
    # root bbox encloses all primitive verts
    v0 = np.asarray(dev.v0)
    lo = np.asarray(dev.node_bbox_min[0])
    hi = np.asarray(dev.node_bbox_max[0])
    assert (v0 >= lo - 1e-4).all() and (v0 <= hi + 1e-4).all()
