"""Per-depth Mrays/s for one scene — splits primary-ray cost from
bounce-ray cost (instanced-walk anomaly hunt, VERDICT r4 #2).

Usage: python tools/bench_depthscan.py <scene.json> [size] [depths csv]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    path = sys.argv[1]
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    depths = [int(x) for x in (sys.argv[3].split(",") if len(sys.argv) > 3
                               else ["1", "2", "5"])]

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpu_pathtracer_tpu.core.rng import iteration_key
    from gpu_pathtracer_tpu.integrators import pt
    from gpu_pathtracer_tpu.run.renderer import enable_compile_cache
    from gpu_pathtracer_tpu.scene.flatten import flatten_scene
    from gpu_pathtracer_tpu.scene.model import IntegratorType
    from gpu_pathtracer_tpu.scene.parse import load_scene
    enable_compile_cache()

    host = load_scene(path)
    host.width = host.height = size
    dev, static0 = flatten_scene(host)
    n = size * size
    ids = np.arange(n)
    px = jnp.asarray((ids % size).astype(np.int32))
    py = jnp.asarray((ids // size).astype(np.int32))

    # same-process dispatch floor (CLAUDE.md measurement traps)
    trivial = jax.jit(lambda x: jnp.sum(x * 2.0))
    _ = trivial(px.astype(jnp.float32)).block_until_ready()
    t0 = time.time()
    for _ in range(5):
        trivial(px.astype(jnp.float32)).block_until_ready()
    floor = (time.time() - t0) / 5
    print(f"# dispatch floor: {floor*1e3:.1f} ms", flush=True)

    for depth in depths:
        static = dataclasses.replace(
            static0, integrator=IntegratorType.PT, max_depth=depth,
            width=size, height=size)

        @jax.jit
        def step(scene, it, static=static):
            key = iteration_key(0, it)
            return pt.render_lanes(scene, static, key, px, py)

        @jax.jit
        def step_stats(scene, it, static=static):
            key = iteration_key(0, it)
            return pt.render_lanes(scene, static, key, px, py,
                                   with_stats=True)

        li, rays = step_stats(dev, jnp.int32(1))
        rays_iter = int(rays)
        li = step(dev, jnp.int32(0))
        li.block_until_ready()
        iters = 4
        t0 = time.time()
        for i in range(iters):
            li = step(dev, jnp.int32(100 + i))
        li.block_until_ready()
        dt = (time.time() - t0) / iters
        print(f"# depth {depth}: {dt*1e3:.1f} ms/iter, "
              f"{rays_iter/1e6:.2f} Mrays/iter, "
              f"{rays_iter/dt/1e6:.2f} Mrays/s, "
              f"{rays_iter/max(dt-floor,1e-9)/1e6:.2f} Mrays/s-floor",
              flush=True)


if __name__ == "__main__":
    main()
