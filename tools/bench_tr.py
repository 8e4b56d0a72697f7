"""Volumetric transmittance cost on the real TPU: FLAT_QUEUE A/B and the
raw density-gather roofline.

Method per CLAUDE.md: a scan of K keyed reps inside ONE jit (no result
caching, no dispatch floor in the delta); rays are the cornell-smoke
geometry (camera rays toward the light through the medium cube), the
regime the Tr anatomy measured ~220 ms/call on.

    python tools/bench_tr.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.run.renderer import enable_compile_cache
enable_compile_cache()
from gpu_pathtracer_tpu.scene.parse import load_scene
from gpu_pathtracer_tpu.scene.flatten import flatten_scene
from gpu_pathtracer_tpu.core.rng import RngStream, iteration_key
from gpu_pathtracer_tpu.integrators.common import primary_rays
from gpu_pathtracer_tpu.shade import media


def main():
    size = 512
    host = load_scene("/root/reference/scenes/cornell_box/scene.json")
    host.width = host.height = size
    dev, static = flatten_scene(host)
    n = size * size
    ids = np.arange(n)
    px = jnp.asarray((ids % size).astype(np.int32))
    py = jnp.asarray((ids // size).astype(np.int32))
    rng = RngStream(iteration_key(0, 0))
    ro, rd = primary_rays(dev, static, rng, px, py)
    # pull origins to mid-box height aiming at the light: most lanes
    # cross the smoke (the heavy Tr regime)
    target = jnp.asarray([0.0, 1.95, 0.0])
    ro = ro * 0.3 + jnp.asarray([0.0, 0.5, 2.5]) * 0.7
    rd = target[None, :] - ro
    dist = jnp.linalg.norm(rd, axis=-1, keepdims=True)
    rd = rd / dist
    med = jnp.zeros(n, jnp.int32)
    # stop just SHORT of the light like a real NEE shadow ray — a fixed
    # overshooting tmax hit the ceiling behind it and every lane came
    # back blocked (tr = 0) before any tracking work ran
    tmax = dist[:, 0] * 0.98
    act = jnp.ones(n, bool)

    REPS = 4

    def make(scene):
        @jax.jit
        def many(key):
            def step(c, k):
                tr = media.transmittance(scene, static, med, ro, rd, tmax,
                                         jax.random.fold_in(key, k), act)
                return c + jnp.sum(tr), None
            tot, _ = jax.lax.scan(step, jnp.float32(0.0),
                                  jnp.arange(REPS))
            return tot
        return many

    for flat in (False, True):
        media.FLAT_QUEUE = flat
        f = make(dev)
        out = jax.block_until_ready(f(jax.random.PRNGKey(0)))  # compile
        best = 1e9
        for r in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(f(jax.random.PRNGKey(r)))
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(f"FLAT_QUEUE={int(flat)}: {best * 1e3:8.2f} ms/Tr-call "
              f"(sum {float(out):.2f})", flush=True)


if __name__ == "__main__":
    main()
