"""Checkpoint/resume: interrupted-and-resumed must equal uninterrupted.

The RNG is counter-based and keyed by (seed, iteration), so a renderer
restored from a checkpoint continues the exact sample stream —
interrupted+resumed and one-shot renders are bit-identical. Also covers
the fingerprint guard (wrong scene/config must refuse to load) and the
SPPM persistent-state round trip (run/checkpoint.py).
"""

import numpy as np
import pytest

from gpu_pathtracer_tpu.run.checkpoint import load_checkpoint, save_checkpoint
from gpu_pathtracer_tpu.run.renderer import Renderer
from gpu_pathtracer_tpu.scene.model import IntegratorType
from gpu_pathtracer_tpu.scene.parse import load_scene

SCENE = "/root/reference/scenes/cornell_box/scene.json"


def _scene(size=16):
    s = load_scene(SCENE)
    s.width = s.height = size
    return s


@pytest.mark.parametrize("integ", [IntegratorType.PT, IntegratorType.SPPM,
                                   IntegratorType.MLT])
def test_resume_bit_equal(tmp_path, integ):
    ck = str(tmp_path / "ck.npz")

    a = Renderer(_scene(), integrator=integ, max_depth=3)
    a.render(3)
    save_checkpoint(a, ck)
    a.render(3)

    b = Renderer(_scene(), integrator=integ, max_depth=3)
    load_checkpoint(b, ck)
    assert b.iteration == 3
    b.render(3)

    np.testing.assert_array_equal(a.radiance(), b.radiance())


def test_fingerprint_guard(tmp_path):
    ck = str(tmp_path / "ck.npz")
    a = Renderer(_scene(), integrator=IntegratorType.PT, max_depth=3)
    a.render(1)
    save_checkpoint(a, ck)

    wrong_depth = Renderer(_scene(), integrator=IntegratorType.PT,
                           max_depth=4)
    with pytest.raises(ValueError):
        load_checkpoint(wrong_depth, ck)

    wrong_integ = Renderer(_scene(), integrator=IntegratorType.AO,
                           max_depth=3)
    with pytest.raises(ValueError):
        load_checkpoint(wrong_integ, ck)
