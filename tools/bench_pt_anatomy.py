"""In-jit knockout anatomy of the wavefront-PT iteration (verdict r3 #7).

Where does the dragon iteration's time go — closest-hit walks, NEE
shadow walks, coherence sorts, shading math? Each variant retraces
integrators/pt.py with one term disabled (common.KNOCK read at trace
time); full - knocked is that term's cost. Same-process interleaved
min-of-reps, keyed input per rep (CLAUDE.md measurement rules). A
trivial jitted op is timed first and reported as the dispatch floor.

    python tools/bench_pt_anatomy.py [scene.json] [size]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.run.renderer import enable_compile_cache
enable_compile_cache()
from gpu_pathtracer_tpu.scene.parse import load_scene
from gpu_pathtracer_tpu.scene.flatten import flatten_scene
from gpu_pathtracer_tpu.scene.model import IntegratorType
from gpu_pathtracer_tpu.core.rng import iteration_key
from gpu_pathtracer_tpu.integrators import common, pt


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scenes/dragon/scene.json")
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    host = load_scene(scene_path)
    host.width = host.height = size
    dev, static0 = flatten_scene(host)
    static0 = dataclasses.replace(static0, integrator=IntegratorType.PT,
                                  max_depth=5, width=size, height=size)
    print(f"{os.path.basename(os.path.dirname(scene_path))} {size}^2 "
          f"depth={static0.max_depth} prims={static0.n_primitives}",
          flush=True)
    n = size * size
    ids = np.arange(n)
    px = jnp.asarray((ids % size).astype(np.int32))
    py = jnp.asarray((ids // size).astype(np.int32))

    # same-process dispatch floor (CLAUDE.md: swings 5-23 ms between
    # processes; subtract before reading any absolute)
    tri = jax.jit(lambda x: jnp.sum(x * 2.0))
    xf = jnp.ones((256, 256), jnp.float32)
    jax.block_until_ready(tri(xf))
    floor = 1e9
    for _ in range(6):
        t0 = time.perf_counter()
        jax.block_until_ready(tri(xf + 1.0))
        floor = min(floor, time.perf_counter() - t0)
    print(f"dispatch floor ~{floor * 1e3:.1f} ms", flush=True)

    VARIANTS = [
        ("full", frozenset(), static0),
        ("no-nee-walk", frozenset({"nee_walk"}), static0),   # shadow walks
        ("no-nee-sort", frozenset({"nee_sort"}), static0),   # unsorted walk
        ("no-nee", frozenset({"nee"}), static0),  # + light sampling math
        ("no-sort", frozenset({"sort"}), static0),
        ("depth1", frozenset(), dataclasses.replace(static0, max_depth=1)),
    ]

    fns = {}
    for name, knock, st in VARIANTS:
        common.KNOCK = knock

        def step(it, _st=st):
            key = iteration_key(3, it)
            return jnp.sum(pt.render_lanes(dev, _st, key, px, py))

        fns[name] = jax.jit(step)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fns[name](jnp.int32(0)))
        print(f"  compile {name:12s} {time.perf_counter() - t0:6.1f}s "
              f"(sum {float(out):.3f})", flush=True)
    common.KNOCK = frozenset()

    REPS = 4
    best = {name: 1e9 for name, _, _ in VARIANTS}
    for r in range(REPS):
        for name, _, _ in VARIANTS:
            t0 = time.perf_counter()
            jax.block_until_ready(fns[name](jnp.int32(100 + r)))
            best[name] = min(best[name], time.perf_counter() - t0)
    full = best["full"]
    for name, _, _ in VARIANTS:
        d = full - best[name]
        print(f"{name:12s} {best[name] * 1e3:9.1f} ms/iter   "
              f"term cost {d * 1e3:+9.1f} ms ({d / full * 100:5.1f}%)",
              flush=True)


if __name__ == "__main__":
    main()
