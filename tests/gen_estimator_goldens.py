"""Regenerate tests/goldens/*.npy — deterministic per-integrator renders.

Run after an INTENTIONAL estimator change (and say why in the commit):
    JAX_PLATFORMS=cpu python tests/gen_estimator_goldens.py

tests/test_estimator_goldens.py compares fresh renders against these
pixel-for-pixel (the RNG is counter-based, so a same-backend render is
reproducible to float determinism). Catches silent estimator drift that
mean-ratio windows cannot.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import pathlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SIZE = 24
SPP = 32
SCENE = "/root/reference/scenes/cornell_box/scene.json"
INTEGRATORS = ["pt", "vpt", "lt", "bdpt", "sppm", "ir", "mlt"]


def render_one(name):
    from gpu_pathtracer_tpu.run.renderer import Renderer
    from gpu_pathtracer_tpu.scene.parse import _INTEGRATOR_MAP, load_scene

    scene = load_scene(SCENE)
    scene.width = scene.height = SIZE
    r = Renderer(scene, integrator=_INTEGRATOR_MAP[name], max_depth=5)
    r.render(SPP)
    return r.radiance()


def main():
    out = REPO / "tests" / "goldens"
    out.mkdir(exist_ok=True)
    for name in INTEGRATORS:
        rad = render_one(name)
        np.save(out / f"cornell_{name}.npy", rad.astype(np.float32))
        print(f"{name}: mean {rad.mean():.4f} -> cornell_{name}.npy",
              flush=True)


if __name__ == "__main__":
    main()
