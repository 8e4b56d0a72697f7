"""PSSMLT (integrators/mlt.py): the integrator the reference stubbed.

Gates:
- the primary-sample-space map f(u) is deterministic and actually
  controlled by u (mutating u changes the path);
- MLT converges to the PT image on a small cornell box — same estimator
  target, different sampler (Kelemen et al. 2002). The reference's Mlt
  kernel is empty (pathtracer.cu:1973-1983), so this is capability the
  reference never shipped; the gate is against OUR PT as ground truth.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpu_pathtracer_tpu.run.renderer import Renderer
from gpu_pathtracer_tpu.scene.model import IntegratorType
from gpu_pathtracer_tpu.scene.parse import load_scene

SCENE = "/root/reference/scenes/cornell_box/scene.json"
SIZE = 32
DEPTH = 4


def _host(size=SIZE):
    host = load_scene(SCENE)
    host.width = host.height = size
    return host


def test_psample_determinism():
    from gpu_pathtracer_tpu.integrators import mlt as mlt_mod
    from gpu_pathtracer_tpu.integrators import pt
    r = Renderer(_host(), integrator=IntegratorType.PT, max_depth=DEPTH)
    scene, static = r.device_scene, r.static
    n = 64
    d = mlt_mod.n_dims(static)
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (d, n))
    px = jnp.clip((u[0] * SIZE).astype(jnp.int32), 0, SIZE - 1)
    py = jnp.clip((u[1] * SIZE).astype(jnp.int32), 0, SIZE - 1)
    li1 = pt.render_lanes(scene, static, key, px, py, psample=u[2:])
    li2 = pt.render_lanes(scene, static, jax.random.PRNGKey(7), px, py,
                          psample=u[2:])
    # same u => identical paths regardless of the (unused) key
    np.testing.assert_array_equal(np.asarray(li1), np.asarray(li2))
    # perturbing u changes the result for most lanes
    u3 = (u + 0.37) % 1.0
    li3 = pt.render_lanes(scene, static, key, px, py, psample=u3[2:])
    frac_same = float(jnp.mean(jnp.all(li1 == li3, axis=-1)))
    assert frac_same < 0.7, frac_same


@pytest.mark.slow
def test_mlt_converges_to_pt():
    r_pt = Renderer(_host(), integrator=IntegratorType.PT, max_depth=DEPTH,
                    seed=3)
    img_pt = r_pt.render(192)

    r_mlt = Renderer(_host(), integrator=IntegratorType.MLT,
                     max_depth=DEPTH, seed=5)
    assert r_mlt.kind == "mlt"
    img_mlt = r_mlt.render(600)   # 600 mutation steps of W*H chains

    rmse = float(np.sqrt(((img_mlt - img_pt) ** 2).mean()))
    # tonemapped-space gate (measured 0.056 @200 / 0.032 @800 steps with
    # the bootstrap-resampled start): structural agreement, not noise
    # parity
    assert rmse < 0.06, rmse
    # the b-normalization is the easiest thing to get wrong: overall
    # brightness must match PT closely (measured within 1.7% @400 steps)
    m_pt, m_mlt = float(img_pt.mean()), float(img_mlt.mean())
    assert abs(m_mlt - m_pt) / max(m_pt, 1e-9) < 0.06, (m_pt, m_mlt)
