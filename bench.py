"""Benchmark harness: Mrays/s (traverse+shade) on cornell_box PT at 1024².

Run on the real TPU (default env). Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference publishes no numbers; the target is
>200 Mrays/s per v5e chip, so vs_baseline = value / 200.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORNELL = "/root/reference/scenes/cornell_box/scene.json"
TARGET_MRAYS = 200.0
SIZE = 1024
MAX_DEPTH = 5
WARMUP = 2
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpu_pathtracer_tpu.run.renderer import enable_compile_cache
    enable_compile_cache()  # timings exclude compile (warmup), cache
    # just makes repeated bench runs start fast

    from gpu_pathtracer_tpu.core.rng import iteration_key
    from gpu_pathtracer_tpu.integrators import pt
    from gpu_pathtracer_tpu.scene.flatten import flatten_scene
    from gpu_pathtracer_tpu.scene.model import IntegratorType
    from gpu_pathtracer_tpu.scene.parse import load_scene

    host = load_scene(CORNELL)
    host.width = host.height = SIZE
    dev, static = flatten_scene(host)
    static = dataclasses.replace(
        static, integrator=IntegratorType.PT, max_depth=MAX_DEPTH,
        width=SIZE, height=SIZE)

    n = SIZE * SIZE
    ids = np.arange(n)
    px = jnp.asarray((ids % SIZE).astype(np.int32))
    py = jnp.asarray((ids // SIZE).astype(np.int32))

    @jax.jit
    def step(scene, it):
        key = iteration_key(0, it)
        return pt.render_lanes(scene, static, key, px, py)

    @jax.jit
    def step_stats(scene, it):
        key = iteration_key(0, it)
        return pt.render_lanes(scene, static, key, px, py, with_stats=True)

    # warmup (compile) + measure rays/iteration once — the per-bounce
    # count reductions cost ~20% of an iteration, so the timed loop runs
    # the stats-free program
    rays_iter = 0
    for i in range(WARMUP):
        li, rays = step_stats(dev, jnp.int32(i + 1))
        rays_iter = int(rays)
    li = step(dev, jnp.int32(0))
    li.block_until_ready()

    t0 = time.time()
    for i in range(ITERS):
        li = step(dev, jnp.int32(100 + i))
    li.block_until_ready()
    dt = time.time() - t0
    total_rays = rays_iter * ITERS

    mrays = total_rays / dt / 1e6
    spp_s = ITERS / dt
    print(f"# cornell_box PT {SIZE}x{SIZE} depth={MAX_DEPTH}: "
          f"{spp_s:.3f} spp/s, {total_rays / ITERS / 1e6:.1f} Mrays/iter",
          file=sys.stderr)
    print(json.dumps({
        "metric": f"Mrays/s traverse+shade (cornell_box PT {SIZE}x{SIZE} "
                  f"depth {MAX_DEPTH}, v5e)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
        # the user-facing render speed; Mrays/s undercounts estimator
        # improvements that need FEWER rays per sample
        "spp_per_s_1024": round(spp_s, 3),
    }))


if __name__ == "__main__":
    main()
