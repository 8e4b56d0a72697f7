"""A/B the film scatter-add width on the real TPU.

CLAUDE.md's row-scatter measurements put x8/x32 in the fast class and
x3 (the film's natural [P, 3]) outside it; VERDICT round-2 item 7 asks
for the padded-splat experiment. This times, in ONE jit with keyed
iterations (result-cache-proof), K scatter-adds of 262k contributions
into a 262k-pixel film at widths 3 and 8 (width-8 zero-padded, sliced
back at the end).

    python tools/bench_splat.py
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gpu_pathtracer_tpu.run.renderer import enable_compile_cache
enable_compile_cache()

N = 512 * 512
K = 32


@functools.partial(jax.jit, static_argnames=("w",))
def splat_loop(idx0, contrib, rep, w):
    # `rep` varies per timed call: identical jit calls through the
    # tunnel can be served from a RESULT cache (CLAUDE.md traps).
    film = jnp.zeros((N, w), jnp.float32)
    c = contrib if w == 3 else jnp.concatenate(
        [contrib, jnp.zeros((N, w - 3), jnp.float32)], axis=1)

    def step(film, k):
        # fold k into the indices so no two iterations are identical
        idx = (idx0 + k + rep * 7) % N
        return film.at[idx].add(c), 0

    film, _ = jax.lax.scan(step, film, jnp.arange(K, dtype=jnp.int32))
    return film[:, :3]


def main():
    rs = np.random.RandomState(3)
    idx0 = jnp.asarray(rs.randint(0, N, N).astype(np.int32))
    contrib = jnp.asarray(rs.rand(N, 3).astype(np.float32))

    ref = None
    for w in (3, 8, 4):
        out = jax.block_until_ready(
            splat_loop(idx0, contrib, jnp.int32(0), w))
        if ref is None:
            ref = out
        else:
            assert bool(jnp.allclose(ref, out, atol=1e-3)), w
    best = {}
    for r in range(5):
        for w in (3, 8, 4):
            t0 = time.perf_counter()
            jax.block_until_ready(
                splat_loop(idx0, contrib, jnp.int32(1 + r), w))
            dt = (time.perf_counter() - t0) / K
            best[w] = min(best.get(w, 1e9), dt)
    for w, dt in best.items():
        print(f"width {w}: {dt * 1e3:7.3f} ms/scatter "
              f"({N / dt / 1e6:6.1f} Msplat/s)", flush=True)


if __name__ == "__main__":
    main()
