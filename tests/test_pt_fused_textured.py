"""Fused-megakernel textured mode (pt_fused._TEX_ROWS).

The kernel traces with each textured material's MEAN texel as diffuse
and the XLA segment fold multiplies every bounce by the true-texel/mean
ratio (exact for lambertian — fr is linear in diffuse; matches the
reference's in-kernel GetTexel, pathtracer.cu:324-359). The estimator
equivalence test runs on real TPU only (the kernel PRNG has no CPU
interpret lowering, like tests/test_env_e2e.py::test_env_fused_furnace).
"""

import dataclasses
import json
import os

import numpy as np
import pytest

import jax

from gpu_pathtracer_tpu.scene.flatten import flatten_scene
from gpu_pathtracer_tpu.scene.model import IntegratorType
from gpu_pathtracer_tpu.scene.parse import load_scene


@pytest.fixture(scope="module")
def textured_box(tmp_path_factory):
    """A small tri-only box: checker-textured floor, grey walls, one
    area light — dense regime, textured-lambertian only."""
    from PIL import Image

    d = tmp_path_factory.mktemp("texbox")
    rs = np.random.RandomState(5)
    checker = np.zeros((8, 8, 3), np.uint8)
    checker[(np.arange(8)[:, None] + np.arange(8)) % 2 == 0] = (230, 60, 40)
    checker[(np.arange(8)[:, None] + np.arange(8)) % 2 == 1] = (40, 200, 230)
    Image.fromarray(checker).save(d / "checker.png")

    (d / "floor.obj").write_text(
        "v -1 0 -1\nv 1 0 -1\nv 1 0 1\nv -1 0 1\n"
        "vt 0 0\nvt 2 0\nvt 2 2\nvt 0 2\nvn 0 1 0\n"
        "f 1/1/1 2/2/1 3/3/1\nf 1/1/1 3/3/1 4/4/1\n")
    (d / "wall.obj").write_text(
        "v -1 0 -1\nv 1 0 -1\nv 1 2 -1\nv -1 2 -1\nvn 0 0 1\n"
        "f 1//1 2//1 3//1\nf 1//1 3//1 4//1\n")
    (d / "light.obj").write_text(
        "v -0.4 1.99 -0.4\nv 0.4 1.99 -0.4\nv 0.4 1.99 0.4\n"
        "v -0.4 1.99 0.4\nvn 0 -1 0\n"
        "f 1//1 3//1 2//1\nf 1//1 4//1 3//1\n")
    doc = {
        "screen_width": 24, "screen_height": 24,
        "integrator": "pt", "maxDepth": 5, "epsilon": 0.001,
        "camera": {"position": [0, 1.0, 3.2], "lookat": [0, 0.6, 0],
                   "fov": 40.0, "apertureRadius": 0.0,
                   "focalDistance": 3.2, "filmicTonemap": False},
        "material": [
            {"name": "Checker", "bsdf": "lambertian",
             "diffuse": "checker.png"},
            {"name": "Grey", "bsdf": "lambertian",
             "diffuse": [0.6, 0.6, 0.6]},
            {"name": "Black", "bsdf": "lambertian", "diffuse": [0, 0, 0]},
        ],
        "scene": [
            {"mesh": "floor.obj", "material": "Checker"},
            {"mesh": "wall.obj", "material": "Grey"},
        ],
        "light": [
            {"mesh": "light.obj", "material": "Black",
             "radiance": [12.0, 12.0, 12.0]},
        ],
    }
    (d / "scene.json").write_text(json.dumps(doc))
    return load_scene(str(d / "scene.json"))


def test_textured_supports(textured_box):
    from gpu_pathtracer_tpu.integrators import pt_fused
    from gpu_pathtracer_tpu.scene.model import MaterialType

    dev, static = flatten_scene(textured_box)
    static = dataclasses.replace(static, integrator=IntegratorType.PT)
    assert static.has_textures
    assert static.textured_types == (int(MaterialType.LAMBERTIAN),)
    assert pt_fused.supports(static)
    # textured non-lambertian falls back to the wavefront
    assert not pt_fused.supports(dataclasses.replace(
        static, textured_types=(int(MaterialType.SUBSTRATE),)))


@pytest.mark.skipif(
    "jax.default_backend() != 'tpu'",
    reason="the fused kernel's core PRNG (prng_seed) has no CPU "
           "interpret lowering; run on real TPU")
def test_fused_textured_matches_wavefront(textured_box, monkeypatch):
    """Same estimator target, two samplers: fused (mean-texel kernel +
    XLA ratio fold) vs the wavefront (in-bounce texel fetch) must agree
    in the mean. 5% gate on pixel means at 160 spp each."""
    import jax.numpy as jnp

    from gpu_pathtracer_tpu.integrators import pt, pt_fused

    dev, static = flatten_scene(textured_box)
    static = dataclasses.replace(static, integrator=IntegratorType.PT)
    assert pt_fused.supports(static)
    size = static.width
    n = size * size
    ids = np.arange(n)
    px = jnp.asarray((ids % size).astype(np.int32))
    py = jnp.asarray((ids // size).astype(np.int32))
    spp = 160

    def mean_img(fn, seed):
        acc = np.zeros((n, 3), np.float64)
        for it in range(spp):
            li = fn(dev, static, jax.random.fold_in(
                jax.random.PRNGKey(seed), it), px, py)
            acc += np.asarray(li, np.float64)
        return acc / spp

    img_fused = mean_img(pt_fused.render_lanes, 3)
    monkeypatch.setattr(pt_fused, "supports", lambda s: False)
    img_wave = mean_img(pt.render_lanes, 4)

    m_f, m_w = img_fused.mean(), img_wave.mean()
    assert abs(m_f - m_w) / m_w < 0.05, (m_f, m_w)
    # per-pixel structural agreement on the bright half
    bright = img_wave.mean(-1) > np.median(img_wave.mean(-1))
    rel = np.abs(img_fused - img_wave).mean(-1)[bright] \
        / np.maximum(img_wave.mean(-1)[bright], 1e-6)
    assert rel.mean() < 0.1, rel.mean()
