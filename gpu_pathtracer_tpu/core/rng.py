"""Deterministic counter-based RNG for wavefront rendering.

The reference seeds a thrust engine per pixel per frame with
WangHash(pixel)+WangHash(iter) (pathtracer.cu:40-49, 888). Bit-for-bit
replication is explicitly a non-goal (SURVEY.md §7); we instead use JAX's
counter-based threefry keys, folded per (iteration, draw-site), and draw
array-shaped uniforms so every lane gets an independent stream. This is
fully deterministic for a given (seed, iter, site) and reproducible across
shardings because draws are keyed by pixel-id, not array position, when
`ids` is provided.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class RngStream:
    """Hands out uniform random arrays; each call is a new fold of the key.

    The site counter is a Python int advanced at trace time, so under `jit`
    every draw site gets a distinct, fixed subkey — same program, same
    randomness. Use one stream per (integrator iteration).
    """

    def __init__(self, key: jax.Array):
        self._key = key
        self._site = 0

    def _next_key(self) -> jax.Array:
        k = jax.random.fold_in(self._key, self._site)
        self._site += 1
        return k

    def uniform(self, shape=()):
        """U[0,1) array of `shape`."""
        return jax.random.uniform(self._next_key(), shape, dtype=jnp.float32)

    def uniform2(self, shape=()):
        u = jax.random.uniform(self._next_key(), tuple(shape) + (2,),
                               dtype=jnp.float32)
        return u[..., 0], u[..., 1]

    def uniform3(self, shape=()):
        u = jax.random.uniform(self._next_key(), tuple(shape) + (3,),
                               dtype=jnp.float32)
        return u[..., 0], u[..., 1], u[..., 2]

    def fork(self) -> "RngStream":
        """An independent child stream (e.g. for a sub-loop body)."""
        return RngStream(self._next_key())


def iteration_key(seed: int | jax.Array, iteration: jax.Array) -> jax.Array:
    """Key for one progressive-rendering iteration (frame)."""
    base = jax.random.PRNGKey(seed) if isinstance(seed, int) else seed
    return jax.random.fold_in(base, iteration)


# Primary-sample-space dim budget for the PT lane program (PSSMLT,
# integrators/mlt.py). The camera consumes 4 (pixel jitter + aperture);
# a PT bounce consumes 7 (NEE pick + light uv, BSDF u1 u2 u3, RR) —
# budgeted to 8 so the layout survives small estimator changes. The
# stream asserts the budget at trace time.
PSS_CAM_DIMS = 4
PSS_BOUNCE_DIMS = 8


class PrimarySampleStream:
    """RngStream-compatible reader of an explicit primary-sample matrix.

    PSSMLT (Kelemen et al. 2002) drives the regular PT lane program with
    uniforms a Markov chain can MUTATE, so instead of folding a key per
    draw site, each site reads the next row of `u` [D, N] (one column
    per chain/lane). The site counter advances at trace time exactly
    like RngStream's fold counter, so a given (static config, bounce)
    always maps to the same dims — the fixed u -> path mapping MLT
    needs. `base` may be a traced scalar (the per-bounce offset inside
    the bounce lax.scan); `budget` bounds the dims a scope may consume.
    """

    def __init__(self, u: jax.Array, base=0, budget: int | None = None):
        self._u = u
        self._base = base
        self._site = 0
        self._budget = budget

    def _row(self) -> jax.Array:
        if self._budget is not None and self._site >= self._budget:
            raise ValueError(
                f"primary-sample budget exceeded: {self._site + 1} > "
                f"{self._budget} (raise PSS_BOUNCE_DIMS)")
        r = jax.lax.dynamic_slice_in_dim(
            self._u, self._base + self._site, 1, axis=0)[0]
        self._site += 1
        return r

    def uniform(self, shape=()):
        return self._row()

    def uniform2(self, shape=()):
        return self._row(), self._row()

    def uniform3(self, shape=()):
        return self._row(), self._row(), self._row()
