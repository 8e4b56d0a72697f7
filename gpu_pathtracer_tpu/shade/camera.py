"""Camera: primary-ray generation, splat sampling, pdfs.

Batched re-expression of the reference Camera (camera.h:8-129). The camera
record is `flatten.DeviceCamera` (precomputed film constants); all functions
take pixel coordinate arrays and return ray batches.
"""

from __future__ import annotations

import jax.numpy as jnp

from gpu_pathtracer_tpu.core.vecmath import (
    PI, TWO_PI, dot, length, normalize, to_local,
)


def generate_primary_ray(cam, x, y, aperture_xy, environment: bool):
    """camera.h:48-84. x/y are continuous pixel coords [N]; aperture_xy is a
    unit-disk sample [N, 2]. Returns (origin[N,3], dir[N,3])."""
    if environment:
        theta = PI * (1.0 - y / cam.resolution[1])
        phi = TWO_PI * (1.0 - x / cam.resolution[0])
        st = jnp.sin(theta)
        d = jnp.stack([st * jnp.cos(phi), jnp.cos(theta),
                       st * jnp.sin(phi)], axis=-1)
        dirs = (d[..., 0:1] * cam.u + d[..., 1:2] * cam.v
                - d[..., 2:3] * cam.w)
        orig = jnp.broadcast_to(cam.position, dirs.shape)
        return orig, normalize(dirs)

    xx = x * cam.pixel2screen[0] - cam.half_w
    yy = y * cam.pixel2screen[1] - cam.half_h

    # thin lens (camera.h:63-73); aperture==0 falls back to pinhole
    ax = aperture_xy[..., 0] * cam.aperture
    ay = aperture_xy[..., 1] * cam.aperture
    focal_x = cam.ratio * xx
    focal_y = cam.ratio * yy
    dx = focal_x - ax
    dy = focal_y - ay
    dz = -cam.focal
    dir_lens = dx[..., None] * cam.u + dy[..., None] * cam.v \
        + dz * cam.w
    orig_lens = cam.position + ax[..., None] * cam.u + ay[..., None] * cam.v

    dir_pin = xx[..., None] * cam.u + yy[..., None] * cam.v \
        - cam.distance * cam.w
    orig_pin = jnp.broadcast_to(cam.position, dir_pin.shape)

    use_lens = cam.aperture > 1e-5
    dirs = jnp.where(use_lens, dir_lens, dir_pin)
    orig = jnp.where(use_lens, orig_lens, orig_pin)
    return orig, normalize(dirs)


def sample_camera(cam, pos, epsilon):
    """camera.h:86-114: connect a world point to the pinhole camera.

    Returns (ray_o, ray_d, ray_tmax, we[N], pdf[N], raster_x[N], raster_y[N]).
    pdf == 0 marks failed connections (behind camera / off screen).
    """
    d = cam.position - pos
    nd = normalize(d)
    tmax = length(d) - epsilon
    cn = to_local(-nd, cam.u, cam.v, cam.w)
    ok = cn[..., 2] < 0.0
    costheta = -cn[..., 2]
    scale = -cam.distance / jnp.where(ok, cn[..., 2], -1.0)
    px = cn[..., 0] * scale / cam.half_w
    py = cn[..., 1] * scale / cam.half_h
    ok &= (jnp.abs(px) <= 1.0) & (jnp.abs(py) <= 1.0)
    sx = px * 0.5 + 0.5
    sy = py * 0.5 + 0.5
    rx = jnp.floor(sx * (cam.resolution[0] - 1.0) + 0.5).astype(jnp.int32)
    ry = jnp.floor(sy * (cam.resolution[1] - 1.0) + 0.5).astype(jnp.int32)
    pdf = jnp.where(ok, dot(d, d) / jnp.maximum(costheta, 1e-30), 0.0)
    c4 = costheta ** 4
    we = cam.distance * cam.distance / jnp.maximum(
        cam.area * c4, 1e-30)
    return pos, nd, tmax, we, pdf, rx, ry


def pdf_camera(cam, d):
    """camera.h:117-121: pdf of the camera ray through direction d
    (camera pos -> dest). Returns (pdfA=1, pdfW)."""
    costheta = dot(d, -cam.w)
    pdf_w = cam.distance * cam.distance / jnp.maximum(
        cam.area * costheta ** 3, 1e-30)
    return jnp.ones_like(costheta), pdf_w
