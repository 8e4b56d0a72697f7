"""In-jit knockout anatomy of the BDPT iteration (round-3 verdict #3).

Which phase eats the 23 s/iter at cornell 512^2 depth 17? Each variant
retraces integrators/bdpt.py with one term disabled (bdpt.KNOCK is read
at trace time); the difference full - knocked is that term's cost.
Timings are same-process, interleaved min-of-reps, one jitted call per
iteration with a keyed input per rep (CLAUDE.md measurement rules).

    python tools/bench_bdpt_anatomy.py [size]
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
from gpu_pathtracer_tpu.scene.model import IntegratorType
from gpu_pathtracer_tpu.core.rng import iteration_key
from gpu_pathtracer_tpu.integrators import bdpt


def main():
    import dataclasses
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    host = load_scene("/root/reference/scenes/cornell_box/scene.json")
    host.width = host.height = size
    dev, static = flatten_scene(host)
    static = dataclasses.replace(static, integrator=IntegratorType.BDPT,
                                 width=size, height=size)
    print(f"cornell {size}^2 depth={static.max_depth} "
          f"has_media={static.has_media}", flush=True)
    n = size * size
    ids = np.arange(n)
    px = jnp.asarray((ids % size).astype(np.int32))
    py = jnp.asarray((ids // size).astype(np.int32))
    mask = jnp.ones(n, bool)

    VARIANTS = [
        ("full", frozenset()),
        ("no-tr", frozenset({"tr"})),
        ("no-mis", frozenset({"mis"})),
        ("no-gen", frozenset({"gen"})),
        ("no-t1", frozenset({"t1"})),
        ("no-s1", frozenset({"s1"})),
        ("subpaths-only", frozenset({"connect"})),
    ]

    fns = {}
    for name, knock in VARIANTS:
        bdpt.KNOCK = knock

        def step(it, _k=knock):
            key = iteration_key(7, it)
            li, film = bdpt.render_lanes(dev, static, key, px, py, mask)
            return jnp.sum(li) + jnp.sum(film)

        fns[name] = jax.jit(step)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fns[name](jnp.int32(0)))
        print(f"  compile {name:14s} {time.perf_counter() - t0:6.1f}s "
              f"(sum {float(out):.3f})", flush=True)
    bdpt.KNOCK = frozenset()

    REPS = 3
    best = {name: 1e9 for name, _ in VARIANTS}
    for r in range(REPS):
        for name, _ in VARIANTS:
            t0 = time.perf_counter()
            jax.block_until_ready(fns[name](jnp.int32(100 + r)))
            best[name] = min(best[name], time.perf_counter() - t0)
    full = best["full"]
    for name, _ in VARIANTS:
        d = full - best[name]
        print(f"{name:14s} {best[name]:8.3f} s/iter   "
              f"term cost {d:+8.3f} s ({d / full * 100:5.1f}%)",
              flush=True)


if __name__ == "__main__":
    main()
