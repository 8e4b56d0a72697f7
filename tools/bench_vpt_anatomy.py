"""In-jit knockout anatomy of the VPT iteration (verdict r3 #5 follow-up).

After bf16-packing the density table VPT sits at 0.60 spp/s @512^2
depth 17 (target >=1). Which term now dominates — medium distance
sampling (msample), the in-scatter NEE Tr, the surface NEE Tr, the
emitter full-credit segment Tr, or everything else (traversal + BSDF)?
Each variant retraces integrators/vpt.py with one term disabled
(common.KNOCK at trace time). Same-process interleaved min-of-reps.

    python tools/bench_vpt_anatomy.py [size]
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
from gpu_pathtracer_tpu.integrators import common, vpt


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    host = load_scene("/root/reference/scenes/cornell_box/scene.json")
    host.width = host.height = size
    dev, static = flatten_scene(host)
    static = dataclasses.replace(static, integrator=IntegratorType.VPT,
                                 width=size, height=size)
    print(f"cornell {size}^2 depth={static.max_depth}", flush=True)
    n = size * size
    ids = np.arange(n)
    px = jnp.asarray((ids % size).astype(np.int32))
    py = jnp.asarray((ids // size).astype(np.int32))

    VARIANTS = [
        ("full", frozenset()),
        ("no-msample", frozenset({"msample"})),
        ("no-tr-scatter", frozenset({"tr_scatter"})),
        ("no-tr-surf", frozenset({"tr_surf"})),
        ("no-tr-seg", frozenset({"tr_seg"})),
        ("no-media", frozenset({"msample", "tr_scatter", "tr_surf",
                                "tr_seg"})),
    ]

    fns = {}
    for name, knock in VARIANTS:
        common.KNOCK = knock

        def step(it):
            key = iteration_key(5, it)
            return jnp.sum(vpt.render_lanes(dev, static, key, px, py))

        fns[name] = jax.jit(step)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fns[name](jnp.int32(0)))
        print(f"  compile {name:14s} {time.perf_counter() - t0:6.1f}s "
              f"(sum {float(out):.3f})", flush=True)
    common.KNOCK = frozenset()

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
        print(f"{name:14s} {best[name] * 1e3:9.1f} ms/iter   "
              f"term cost {d * 1e3:+9.1f} ms ({d / full * 100:5.1f}%)",
              flush=True)


if __name__ == "__main__":
    main()
