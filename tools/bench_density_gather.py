"""Is the density row-gather byte-bound or row-rate-bound? (VERDICT #5)

The Tr anatomy (README) charges ~90% of a transmittance call to the
trilinear density row-gather of the oct-packed table ([836k, 8] f32 for
the cornell smoke). Quantizing the table (bf16 pairs -> [*, 4]; u8 ->
[*, 2]) only pays if the gather cost scales with row BYTES; if it is
per-row issue-rate bound, narrower rows buy nothing and the win must
come from gathering FEWER rows.

Times K keyed gathers of M random rows inside ONE jit (CLAUDE.md
measurement rules), at the real table geometry.

    python tools/bench_density_gather.py
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gpu_pathtracer_tpu.run.renderer import enable_compile_cache
enable_compile_cache()

R = 836352        # oct-table rows for the 100x100x40 cornell grid (+border)
M = 1 << 20       # gathered rows per rep (~1 candidate per lane x 4 chunks)
K = 64


@functools.partial(jax.jit, static_argnames=("w",))
def gather_loop(tab, idx0, rep, w):
    # `rep` varies per timed call: identical jit calls through the tunnel
    # can be served from a RESULT cache (CLAUDE.md measurement traps).
    # Each step's indices depend on the previous step's sum, so the K
    # gathers are serially dependent — nothing can overlap or fold.
    def step(acc, k):
        idx = (idx0 + (k + rep) * 977
               + acc.astype(jnp.int32) % 3) % R
        v = jnp.take(tab, idx, axis=0)
        return acc + jnp.sum(v, dtype=jnp.float32), 0

    acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                          jnp.arange(K, dtype=jnp.int32))
    return acc


def main():
    rs = np.random.RandomState(11)
    idx0 = jnp.asarray(rs.randint(0, R, M).astype(np.int32))
    tabs = {
        8: jnp.asarray(rs.rand(R, 8).astype(np.float32)),
        4: jnp.asarray(rs.rand(R, 4).astype(np.float32)),   # bf16-pair carrier
        2: jnp.asarray(rs.rand(R, 2).astype(np.float32)),   # u8x4 carrier
        16: jnp.asarray(rs.rand(R, 16).astype(np.float32)),
    }
    for w, tab in tabs.items():
        jax.block_until_ready(gather_loop(tab, idx0, jnp.int32(0), w))
    best = {}
    for r in range(5):
        for w, tab in tabs.items():
            t0 = time.perf_counter()
            jax.block_until_ready(gather_loop(tab, idx0,
                                              jnp.int32(1 + r), w))
            dt = (time.perf_counter() - t0) / K
            best[w] = min(best.get(w, 1e9), dt)
    for w, dt in sorted(best.items()):
        print(f"width {w:2d}: {dt * 1e3:7.2f} ms/gather of {M >> 20}M rows "
              f"({M / dt / 1e6:6.1f} Mrows/s)", flush=True)


if __name__ == "__main__":
    main()
