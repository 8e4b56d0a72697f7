"""Per-integrator pixelwise regression against committed golden arrays.

The RNG is counter-based (core/rng.py) so a same-backend render is
deterministic; any estimator change — MIS weights, pdf conversions,
light pick, splat placement — shifts pixels and fails here long before
it would move a 0.8-1.2 mean-ratio window. Regenerate deliberately with
tests/gen_estimator_goldens.py after an intentional estimator change.
"""

import os
import pathlib

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
GOLDENS = REPO / "tests" / "goldens"
SIZE = 24
SPP = 32
SCENE = "/root/reference/scenes/cornell_box/scene.json"

INTEGRATORS = ["pt", "vpt", "lt", "bdpt", "sppm", "ir", "mlt"]


@pytest.mark.parametrize("name", INTEGRATORS)
def test_estimator_matches_golden(name):
    from gpu_pathtracer_tpu.run.renderer import Renderer
    from gpu_pathtracer_tpu.scene.parse import _INTEGRATOR_MAP, load_scene

    path = GOLDENS / f"cornell_{name}.npy"
    golden = np.load(path)

    scene = load_scene(SCENE)
    scene.width = scene.height = SIZE
    r = Renderer(scene, integrator=_INTEGRATOR_MAP[name], max_depth=5)
    r.render(SPP)
    rad = r.radiance()

    # same seed + same backend => only float-associativity noise; the
    # tolerance is far below any estimator-level change
    np.testing.assert_allclose(rad, golden, rtol=2e-4, atol=2e-5)
