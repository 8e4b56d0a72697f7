"""Media estimator tests: the three transmittance trackers and distance
sampling must agree with each other and with analytic ground truth.

The reference has no tests; its media correctness evidence is the smoke /
heterogeneous renders. Here the estimators are validated statistically:
E[delta Tr] = E[ratio Tr] = E[residual Tr] = exp(-integral sigma_t d), and
the distance sampler's escape probability equals the transmittance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpu_pathtracer_tpu.scene.flatten import flatten_scene
from gpu_pathtracer_tpu.shade import media


@pytest.fixture(scope="module")
def cornell_dev(cornell_scene):
    return flatten_scene(cornell_scene, cache=False)


def _het_setup(dev, n):
    het = int(np.argmax(np.asarray(dev.med_type) == 1))
    p0 = np.asarray(dev.med_p0)[het]
    p1 = np.asarray(dev.med_p1)[het]
    ro = jnp.broadcast_to(jnp.asarray(p0 + 0.01), (n, 3))
    rd = jnp.broadcast_to(jnp.asarray([0.57735] * 3), (n, 3))
    L = float(np.linalg.norm(p1 - p0)) * 0.8
    return het, ro, rd, jnp.full(n, L)


def test_tr_estimators_agree(cornell_dev):
    dev, static = cornell_dev
    n = 16384
    het, ro, rd, tmax = _het_setup(dev, n)
    med_idx = jnp.full(n, het, jnp.int32)
    act = jnp.ones(n, bool)
    means = {}
    for ett in (0, 1):
        d2 = dev.replace(
            med_eval_tr_type=jnp.full_like(dev.med_eval_tr_type, ett))
        tr = media.medium_tr_segment(
            d2, static, med_idx, ro, rd, tmax, jax.random.PRNGKey(1), act)
        means[ett] = float(np.asarray(tr)[:, 0].mean())
    # delta and ratio estimate the same expectation
    assert means[0] > 0
    assert abs(means[0] - means[1]) / means[0] < 0.35, means


def test_sample_escape_matches_tr(cornell_dev):
    """P[no collision over tmax] == E[delta Tr] (same Poisson process)."""
    dev, static = cornell_dev
    n = 16384
    het, ro, rd, tmax = _het_setup(dev, n)
    med_idx = jnp.full(n, het, jnp.int32)
    act = jnp.ones(n, bool)
    d0 = dev.replace(
        med_eval_tr_type=jnp.zeros_like(dev.med_eval_tr_type))
    tr = media.medium_tr_segment(
        d0, static, med_idx, ro, rd, tmax, jax.random.PRNGKey(3), act)
    _, _, sampled = media.medium_sample(
        dev, static, med_idx, ro, rd, tmax, jax.random.PRNGKey(4), act)
    escape = float((~np.asarray(sampled)).mean())
    tr_mean = float(np.asarray(tr)[:, 0].mean())
    assert abs(escape - tr_mean) < 0.02, (escape, tr_mean)


def test_empty_space_is_free(cornell_dev):
    """Rays missing the plume: Tr == 1 exactly (no candidates drawn)."""
    dev, static = cornell_dev
    n = 1024
    het = int(np.argmax(np.asarray(dev.med_type) == 1))
    p0 = np.asarray(dev.med_p0)[het]
    ro = jnp.broadcast_to(jnp.asarray(p0 + np.array([0.01, 0.01, 0.01],
                                                    np.float32)), (n, 3))
    rd = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
    tr = media.medium_tr_segment(
        dev, static, jnp.full(n, het, jnp.int32), ro, rd,
        jnp.full(n, 0.3), jax.random.PRNGKey(5), jnp.ones(n, bool))
    assert float(np.asarray(tr).min()) > 0.99


def test_homogeneous_tr_analytic(cornell_dev):
    """Homogeneous Tr is exact Beer-Lambert (medium.h:14-17)."""
    dev, static = cornell_dev
    hom = int(np.argmax(np.asarray(dev.med_type) == 0))
    n = 64
    ro = jnp.zeros((n, 3))
    rd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    t = jnp.full(n, 0.7)
    tr = media.medium_tr_segment(
        dev, static, jnp.full(n, hom, jnp.int32), ro, rd, t,
        jax.random.PRNGKey(0), jnp.ones(n, bool))
    expect = np.exp(-np.asarray(dev.med_sigma_t)[hom] * 0.7)
    assert np.allclose(np.asarray(tr)[0], expect, rtol=1e-5)


def test_hg_phase_normalization():
    """HG phase integrates to 1 over the sphere (medium.h:197-234)."""
    from gpu_pathtracer_tpu.core.sampling import hg_phase
    g = 0.4
    mu = np.linspace(-1, 1, 20001)
    vals = np.asarray(hg_phase(jnp.asarray(mu, jnp.float32), g))
    integral = 2 * np.pi * np.trapezoid(vals, mu)
    assert abs(integral - 1.0) < 1e-3, integral


def test_compact_partition_roundtrip():
    """_compact_partition: stable partition, active lanes first."""
    import numpy as np
    import jax.numpy as jnp
    from gpu_pathtracer_tpu.shade import media as M

    rng = np.random.default_rng(7)
    n = 4096
    need = jnp.asarray(rng.random(n) < 0.13)
    src, count = M._compact_partition(need)
    src_np = np.asarray(src)
    need_np = np.asarray(need)
    assert int(count) == need_np.sum()
    # prefix positions hold exactly the active lanes, original order kept
    active_lanes = np.nonzero(need_np)[0]
    assert np.array_equal(src_np[:len(active_lanes)], active_lanes)
    rest = np.nonzero(~need_np)[0]
    assert np.array_equal(src_np[len(active_lanes):], rest)
    # src is a permutation
    assert np.array_equal(np.sort(src_np), np.arange(n))


def test_compacted_tracking_matches_plain(cornell_dev, monkeypatch):
    """The TPU compaction path (sorted slices + cond-gated chunk loops)
    must estimate the same expectations as the plain full-batch path —
    it is TPU-only in production, so this is its sole CPU coverage.

    Lanes are a mix of plume-crossing, missing, and inactive so the
    partition/sort/scatter plumbing is actually exercised.
    """
    dev, static = cornell_dev
    n = 16384
    het, ro, rd, tmax = _het_setup(dev, n)
    rng = np.random.default_rng(11)
    act = jnp.asarray(rng.random(n) < 0.4)          # sparse actives
    miss = jnp.asarray(rng.random(n) < 0.3)         # some rays skip the box
    rd = jnp.where(miss[:, None], jnp.asarray([1.0, 0.0, 0.0]), rd)
    med_idx = jnp.where(act, het, -1).astype(jnp.int32)

    results = {}
    for forced in (False, True):
        monkeypatch.setattr(media, "FORCE_COMPACT", forced)
        tr = media.transmittance(
            dev, static, med_idx, ro, rd, tmax, jax.random.PRNGKey(9),
            act)
        w, t, sampled = media.medium_sample(
            dev, static, med_idx, ro, rd, tmax, jax.random.PRNGKey(10),
            act)
        results[forced] = (np.asarray(tr), np.asarray(t),
                           np.asarray(sampled), np.asarray(w))

    trs = {k: v[0] for k, v in results.items()}
    # inactive lanes untouched in both paths
    act_np = np.asarray(act)
    assert np.all(trs[True][~act_np] == 1.0)
    assert np.all(trs[False][~act_np] == 1.0)
    # same expectation on the tracked lanes (different iid draws)
    m0 = trs[False][act_np, 0].mean()
    m1 = trs[True][act_np, 0].mean()
    assert abs(m0 - m1) < 0.03, (m0, m1)
    # distance sampler: escape prob and mean collision distance agree
    for col in (1, 2):
        s0 = results[False][col][act_np].astype(np.float64)
        s1 = results[True][col][act_np].astype(np.float64)
        assert abs(s0.mean() - s1.mean()) / max(abs(s0.mean()), 1e-6) \
            < 0.05, (col, s0.mean(), s1.mean())


def test_cumsum_lanes_matches_cumsum():
    import numpy as np
    import jax.numpy as jnp
    from gpu_pathtracer_tpu.shade import media as M

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 5, size=2048).astype(np.int32))
    assert np.array_equal(np.asarray(M._cumsum_lanes(x)),
                          np.cumsum(np.asarray(x)))
    y = jnp.asarray(rng.integers(0, 5, size=100).astype(np.int32))  # n%128
    assert np.array_equal(np.asarray(M._cumsum_lanes(y)),
                          np.cumsum(np.asarray(y)))
