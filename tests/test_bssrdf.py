"""BSSRDF tests: dipole math + the live subsurface path in PT.

The reference shipped SingleScatter/MultipleScatter dormant
(pathtracer.cu:362-487 — no integrator called them); our PT invokes them
for bssrdf-indexed hits, so a jade-like sphere must render non-black and
finite. Fixture scene is synthetic (the reference ships no bssrdf
scene.json).
"""

import json
import pathlib

import numpy as np
import pytest

from gpu_pathtracer_tpu.run.renderer import Renderer
from gpu_pathtracer_tpu.scene.model import IntegratorType
from gpu_pathtracer_tpu.scene.parse import load_scene

QUAD_OBJ = """\
v -1 0 -1
v 1 0 -1
v 1 0 1
v -1 0 1
vn 0 -1 0
vn 0 -1 0
vn 0 -1 0
vn 0 -1 0
f 1//1 2//2 3//3
f 1//1 3//3 4//4
"""

SCENE = {
    "screen_width": 32,
    "screen_height": 32,
    "integrator": "pt",
    "maxDepth": 5,
    "camera": {
        "position": [0, 1.0, 4.0],
        "lookat": [0, 0.5, 0],
        "fov": 45,
        "filmicTonemap": False,
    },
    "material": [
        {"name": "matte", "bsdf": "lambertian", "diffuse": [0.7, 0.7, 0.7]},
        {"name": "jade", "bssrdf": True,
         "sigmaA": [0.0662, 0.0805, 0.125],
         "sigmaSP": [0.657, 0.786, 0.9], "scale": 5.0,
         "eta": 1.5, "g": 0.0},
    ],
    "scene": [
        {"sphere": True, "center": [0, 0.5, 0], "radius": 0.5,
         "material": "jade"},
    ],
    "light": [
        {"mesh": "quad.obj", "material": "matte",
         "radiance": [8, 8, 8], "translate": [0, 2.5, 0]},
    ],
}


@pytest.fixture(scope="module")
def bssrdf_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("bssrdf_scene")
    (d / "quad.obj").write_text(QUAD_OBJ)
    (d / "scene.json").write_text(json.dumps(SCENE))
    return load_scene(str(d / "scene.json"))


def test_scene_marks_bssrdf(bssrdf_scene):
    assert len(bssrdf_scene.bssrdfs) == 1
    sphere = [p for p in bssrdf_scene.primitives if p.bssrdfIdx >= 0]
    assert len(sphere) == 1
    assert sphere[0].matIdx == -1


def test_dipole_rd_monotone():
    """Rd decays monotonically with distance and is non-negative."""
    import jax.numpy as jnp
    from gpu_pathtracer_tpu.shade.bssrdf import dipole_A, rd
    sigma_a = jnp.full((8, 3), 0.05)
    sigma_sp = jnp.full((8, 3), 1.0)
    A = dipole_A(jnp.full(8, 1.5))
    d = jnp.linspace(0.01, 2.0, 8)
    vals = np.asarray(rd(d * d, sigma_a, sigma_sp, A[:, None]))
    assert (vals >= 0).all()
    assert (np.diff(vals[:, 0]) < 0).all()


def test_convert_from_diffuse_roundtrip():
    """kd -> sigma conversion reproduces kd through the Rd integral
    (bssrdf.h:104-140 bisection)."""
    from gpu_pathtracer_tpu.shade.bssrdf import (
        _rd_integral, convert_from_diffuse, fdr,
    )
    kd = np.array([0.3, 0.5, 0.8])
    b = convert_from_diffuse(kd, 0.5, 1.5)
    f = fdr(1.5)
    A = (1.0 + f) / (1.0 - f)
    for i in range(3):
        alphap = b.sigmaSP[i] / (b.sigmaSP[i] + b.sigmaA[i])
        assert abs(_rd_integral(alphap, A) - kd[i]) < 1e-3


def test_pt_renders_subsurface(bssrdf_scene):
    """The jade sphere must be lit (non-black) and finite under PT."""
    r = Renderer(bssrdf_scene, integrator=IntegratorType.PT,
                 tile_size=1024, seed=0, cache=False)
    r.render(16)
    rad = r.radiance()
    assert np.isfinite(rad).all()
    # center rows look at the sphere; it must glow, not be black
    center = rad[12:20, 12:20]
    assert center.mean() > 0.01, center.mean()
    assert rad.max() < 50.0
