"""Generate sky.exr — the equirect environment map for scenes/env.

The reference's env scenes (scenes/house/scene.json) reference
textures/sky.exr, which is not shipped upstream; this script synthesizes
an equivalent: a vertical sky gradient (horizon haze -> zenith blue)
plus a warm disc sun, written with the repo's own EXR codec
(film/imageio.py::save_exr). Deterministic — safe to regenerate.

Usage: python scenes/env/make_sky.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

W, H = 256, 128
SUN_DIR = np.array([0.35, 0.55, 0.76])  # toward upper right of +z
SUN_COS = 0.995                          # ~5.7 deg disc
SUN_RGB = np.array([40.0, 32.0, 22.0])
ZENITH = np.array([0.20, 0.45, 1.05])
HORIZON = np.array([0.90, 0.95, 1.10])
GROUND = np.array([0.25, 0.22, 0.20])


def main():
    from gpu_pathtracer_tpu.film.imageio import save_exr

    sun = SUN_DIR / np.linalg.norm(SUN_DIR)
    # equirect: u in [0,1) -> phi, v in [0,1] -> theta from +y pole
    # (matches shade/lights.py::_env_uv_from_dir / infinite.h:47-58)
    u = (np.arange(W) + 0.5) / W
    v = (np.arange(H) + 0.5) / H
    phi = (2.0 * np.pi) * u[None, :]
    theta = np.pi * v[:, None]
    sy = np.cos(theta) * np.ones_like(phi)
    sx = np.sin(theta) * np.cos(phi)
    sz = np.sin(theta) * np.sin(phi)
    up = np.clip(sy, 0.0, 1.0)

    img = (HORIZON[None, None] * (1.0 - up[..., None]) ** 2
           + ZENITH[None, None] * (1.0 - (1.0 - up[..., None]) ** 2))
    img = np.where(sy[..., None] < 0.0,
                   GROUND[None, None] * (1.0 + 0.5 * sy[..., None]), img)
    cosang = sx * sun[0] + sy * sun[1] + sz * sun[2]
    img = img + SUN_RGB[None, None] * (cosang[..., None] > SUN_COS)

    out = os.path.join(os.path.dirname(__file__), "sky.exr")
    save_exr(out, img.astype(np.float32))
    print(f"wrote {out} ({W}x{H})")


if __name__ == "__main__":
    main()
