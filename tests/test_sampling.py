"""Unit tests for the sampling warps (core/sampling.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpu_pathtracer_tpu.core import sampling
from gpu_pathtracer_tpu.core.vecmath import PI

N = 200_000


@pytest.fixture(scope="module")
def uv():
    k = jax.random.PRNGKey(7)
    u = jax.random.uniform(k, (2, N))
    return u[0], u[1]


def test_uniform_sphere(uv):
    d, pdf = sampling.uniform_sphere(*uv)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)
    assert np.allclose(np.asarray(pdf), 1.0 / (4 * PI))
    # each octant roughly equally likely
    mean = np.asarray(d).mean(axis=0)
    assert np.all(np.abs(mean) < 0.01)


def test_cosine_hemisphere(uv):
    d, pdf = sampling.cosine_hemisphere(*uv)
    d = np.asarray(d)
    assert (d[:, 1] >= 0).all()  # +Y up
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # E[cos theta] = 2/3 for pdf = cos/pi
    assert abs(d[:, 1].mean() - 2.0 / 3.0) < 5e-3
    np.testing.assert_allclose(np.asarray(pdf), d[:, 1] / PI, atol=1e-5)


def test_uniform_disk(uv):
    xy, pdf = sampling.uniform_disk(*uv)
    r2 = np.asarray(jnp.sum(xy * xy, axis=-1))
    assert (r2 <= 1.0 + 1e-6).all()
    # uniform in area: E[r^2] = 1/2
    assert abs(r2.mean() - 0.5) < 5e-3


def test_concentric_disk(uv):
    xy, pdf = sampling.concentric_disk(*uv)
    r2 = np.asarray(jnp.sum(xy * xy, axis=-1))
    assert (r2 <= 1.0 + 1e-6).all()
    assert abs(r2.mean() - 0.5) < 5e-3


def test_uniform_triangle(uv):
    u, v = sampling.uniform_triangle(*uv)
    u = np.asarray(u)
    v = np.asarray(v)
    assert (u >= 0).all() and (v >= 0).all()
    assert (u + v <= 1.0 + 1e-6).all()
    # barycentric uniformity: E[u] = E[v] = 1/3
    assert abs(u.mean() - 1 / 3) < 5e-3
    assert abs(v.mean() - 1 / 3) < 5e-3


def test_hg_phase_normalizes():
    """Integral of the HG pdf over the sphere == 1 for several g."""
    mu = np.linspace(-1, 1, 20001)
    for g in [0.0, 0.3, -0.7, 0.9]:
        ph = np.asarray(sampling.hg_phase(jnp.asarray(mu), g))
        integral = 2 * PI * np.trapezoid(ph, mu)
        assert abs(integral - 1.0) < 1e-3, g


def test_hg_sample_matches_phase():
    k = jax.random.PRNGKey(3)
    u = jax.random.uniform(k, (2, N))
    g = 0.5
    d, phase = sampling.hg_sample(u[0], u[1], jnp.full(N, g))
    d = np.asarray(d)
    # sampled costheta distribution should have mean == g for HG
    assert abs(d[:, 1].mean() - g) < 5e-3
    np.testing.assert_allclose(
        np.asarray(phase),
        np.asarray(sampling.hg_phase(jnp.asarray(d[:, 1]), g)), rtol=2e-4)


def test_power_heuristic():
    w = sampling.power_heuristic(1, jnp.float32(1.0), 1, jnp.float32(2.0))
    assert abs(float(w) - 1.0 / 5.0) < 1e-6
    assert float(sampling.power_heuristic(
        1, jnp.float32(0.0), 1, jnp.float32(0.0))) == 0.0
