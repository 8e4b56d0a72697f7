"""Camera tests: primary rays, splat round-trip, DoF focus, env mode."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpu_pathtracer_tpu.scene.flatten import flatten_scene
from gpu_pathtracer_tpu.shade import camera as camera_mod


@pytest.fixture(scope="module")
def cam(cornell_scene):
    dev, static = flatten_scene(cornell_scene, cache=False)
    return dev.camera


def test_center_ray_hits_lookat(cam):
    """The film-center ray points along -w (toward the lookat)."""
    n = 1
    w = float(cam.resolution[0]); h = float(cam.resolution[1])
    ro, rd = camera_mod.generate_primary_ray(
        cam, jnp.asarray([w / 2]), jnp.asarray([h / 2]),
        jnp.zeros((n, 2)), False)
    assert np.allclose(np.asarray(rd)[0], -np.asarray(cam.w), atol=1e-3)


def test_sample_camera_roundtrip(cam):
    """A point on pixel (x, y)'s primary ray splats back to (x, y)."""
    xs = jnp.asarray([100.0, 300.0, 480.0, 17.0])
    ys = jnp.asarray([50.0, 256.0, 111.0, 477.0])
    ro, rd = camera_mod.generate_primary_ray(
        cam, xs, ys, jnp.zeros((4, 2)), False)
    p = ro + rd * 2.5
    _, _, _, we, pdf, rx, ry = camera_mod.sample_camera(cam, p, 1e-4)
    assert (np.asarray(pdf) > 0).all()
    assert np.abs(np.asarray(rx) - np.asarray(xs)).max() <= 1
    assert np.abs(np.asarray(ry) - np.asarray(ys)).max() <= 1


def test_dof_rays_converge_at_focal_plane(cam):
    """Thin lens: rays through one pixel with different lens samples meet
    at the focal distance (camera.h:63-73)."""
    import flax
    c = cam.replace(aperture=jnp.float32(0.1), focal=jnp.float32(3.0),
                    ratio=jnp.float32(3.0) / cam.distance)
    x = jnp.full(8, 256.0); y = jnp.full(8, 256.0)
    ap = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (8, 2)),
                     jnp.float32)
    ro, rd = camera_mod.generate_primary_ray(c, x, y, ap, False)
    # march each ray to the focal plane (distance along -w)
    depth = jnp.sum((ro - c.position) * (-c.w), -1)
    t = (3.0 - depth) / jnp.sum(rd * (-c.w), -1)
    pts = np.asarray(ro + rd * t[:, None])
    spread = np.linalg.norm(pts - pts.mean(0), axis=1).max()
    assert spread < 1e-3, spread


def test_environment_camera_covers_sphere(cam):
    """360-degree mode: directions span the full sphere, unit length."""
    n = 512
    rng = np.random.default_rng(1)
    w = float(cam.resolution[0]); h = float(cam.resolution[1])
    x = jnp.asarray(rng.uniform(0, w, n), jnp.float32)
    y = jnp.asarray(rng.uniform(0, h, n), jnp.float32)
    ro, rd = camera_mod.generate_primary_ray(
        cam, x, y, jnp.zeros((n, 2)), True)
    d = np.asarray(rd)
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    assert d[:, 0].min() < -0.5 and d[:, 0].max() > 0.5
    assert d[:, 1].min() < -0.5 and d[:, 1].max() > 0.5


def test_pdf_camera_positive_in_frustum(cam):
    d = -np.asarray(cam.w) + np.asarray([0.05, 0.05, 0.0])
    d = jnp.asarray((d / np.linalg.norm(d))[None].astype(np.float32))
    _, pdf_w = camera_mod.pdf_camera(cam, d)
    assert float(pdf_w[0]) > 0
