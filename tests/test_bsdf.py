"""BSDF tests: sample<->eval consistency, white furnace, pdf sanity.

The test strategy SURVEY.md §4 prescribes for the rebuild: deterministic
unit tests for the BSDF layer the reference never had.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpu_pathtracer_tpu.shade import bsdf as bsdf_mod
from gpu_pathtracer_tpu.scene.model import MaterialType

N = 4096
ALL_TYPES = tuple(int(t) for t in MaterialType)


def _mat(mtype, n=N, alpha=0.2):
    return bsdf_mod.MatParams(
        type=jnp.full(n, int(mtype), jnp.int32),
        alpha_u=jnp.full(n, alpha), alpha_v=jnp.full(n, alpha),
        inside_ior=jnp.full(n, 1.5), outside_ior=jnp.full(n, 1.0),
        k=jnp.full((n, 3), 3.9), eta=jnp.full((n, 3), 0.2),
        specular=jnp.full((n, 3), 0.9), diffuse=jnp.full((n, 3), 1.0),
        aniso=False)


def _frame(n=N):
    nor = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3))
    dpdu = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
    wi = jnp.broadcast_to(
        jnp.asarray([0.3, 0.8, 0.2]) / np.linalg.norm([0.3, 0.8, 0.2]),
        (n, 3))
    return nor, dpdu, wi


def _draw(mat, wi, nor, dpdu, seed=0):
    key = jax.random.PRNGKey(seed)
    u = jax.random.uniform(key, (3, N))
    return bsdf_mod.sample_bsdf(mat, wi, nor, dpdu, u[0], u[1], u[2],
                                ALL_TYPES)


@pytest.mark.parametrize("mtype", [
    MaterialType.LAMBERTIAN, MaterialType.ROUGHCONDUCTOR,
    MaterialType.SUBSTRATE,
])
def test_sample_eval_consistency(mtype):
    """eval_bsdf at a sampled direction reproduces the sample's fr/pdf
    (reflection-side models; roughdielectric's two-sided transport is
    covered by the integrator cross-checks)."""
    mat = _mat(mtype)
    nor, dpdu, wi = _frame()
    wo, fr_s, pdf_s = _draw(mat, wi, nor, dpdu)
    ok = pdf_s > 1e-5
    fr_e, pdf_e = bsdf_mod.eval_bsdf(mat, wi, wo, nor, dpdu, ALL_TYPES)
    fr_s, fr_e = np.asarray(fr_s)[np.asarray(ok)], np.asarray(fr_e)[np.asarray(ok)]
    pdf_s, pdf_e = np.asarray(pdf_s)[np.asarray(ok)], np.asarray(pdf_e)[np.asarray(ok)]
    assert np.allclose(fr_s, fr_e, rtol=2e-3, atol=1e-4)
    assert np.allclose(pdf_s, pdf_e, rtol=2e-3, atol=1e-4)


def test_lambertian_white_furnace():
    """E[fr * cos / pdf] == albedo == 1 for a white lambertian."""
    mat = _mat(MaterialType.LAMBERTIAN)
    nor, dpdu, wi = _frame()
    wo, fr, pdf = _draw(mat, wi, nor, dpdu)
    cos = np.abs(np.asarray(jnp.sum(wo * nor, -1)))
    est = np.asarray(fr)[:, 0] * cos / np.maximum(np.asarray(pdf), 1e-30)
    assert abs(est.mean() - 1.0) < 0.02, est.mean()


@pytest.mark.parametrize("mtype", [
    MaterialType.ROUGHCONDUCTOR, MaterialType.ROUGHDIELECTRIC,
    MaterialType.SUBSTRATE,
])
def test_energy_not_amplified(mtype):
    """E[fr * cos / pdf] <= 1 + tol: microfacet models must not create
    energy."""
    mat = _mat(mtype)
    nor, dpdu, wi = _frame()
    wo, fr, pdf = _draw(mat, wi, nor, dpdu)
    cos = np.abs(np.asarray(jnp.sum(wo * nor, -1)))
    w = np.asarray(fr) * cos[:, None] / np.maximum(
        np.asarray(pdf)[:, None], 1e-30)
    w = np.where(np.isfinite(w), w, 0.0)
    assert w.mean() <= 1.1, w.mean()


def test_delta_materials_flagged():
    assert bool(bsdf_mod.is_delta(jnp.int32(int(MaterialType.MIRROR))))
    assert bool(bsdf_mod.is_delta(jnp.int32(int(MaterialType.DIELECTRIC))))
    assert not bool(bsdf_mod.is_delta(jnp.int32(int(
        MaterialType.LAMBERTIAN))))


def test_mirror_reflects():
    mat = _mat(MaterialType.MIRROR)
    nor, dpdu, wi = _frame()
    wo, fr, pdf = _draw(mat, wi, nor, dpdu)
    expect = 2 * jnp.sum(wi * nor, -1, keepdims=True) * nor - wi
    assert np.allclose(np.asarray(wo), np.asarray(expect), atol=1e-5)


def test_dielectric_energy_split():
    """Reflection + refraction branches both appear and weights stay
    finite."""
    mat = _mat(MaterialType.DIELECTRIC)
    nor, dpdu, wi = _frame()
    wo, fr, pdf = _draw(mat, wi, nor, dpdu)
    up = np.asarray(jnp.sum(wo * nor, -1)) > 0
    assert 0.01 < up.mean() < 0.99  # both branches taken
    assert np.isfinite(np.asarray(fr)).all()
