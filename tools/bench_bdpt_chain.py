"""Chained-knockout BDPT anatomy: ADDITIVE decomposition (r5).

The r4 single-knockout anatomy double-counts: "no-gen" removes the gen
rounds' math AND their Tr chunk calls, while "no-tr" removes Tr from
every case — the two deltas overlap, which round-4's verdict note
("~20 ms Pallas dispatch x 323 calls") mis-attributed. This chain keeps
"tr" knocked everywhere and strips one case per step, so successive
differences isolate each case's MATH (incl. MIS + queue packing), and
full - no-tr isolates the whole Tr machinery (walker + chunk gathers +
scatters).

    python tools/bench_bdpt_chain.py [size]
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
from gpu_pathtracer_tpu.integrators import bdpt

VARIANTS = [
    ("full", frozenset()),
    ("no-tr", frozenset({"tr"})),
    ("no-tr-gen", frozenset({"tr", "gen"})),
    ("no-tr-gen-t1", frozenset({"tr", "gen", "t1"})),
    ("no-tr-gen-t1-s1", frozenset({"tr", "gen", "t1", "s1"})),
]


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    host = load_scene("/root/reference/scenes/cornell_box/scene.json")
    host.width = host.height = size
    dev, static = flatten_scene(host)
    static = dataclasses.replace(static, integrator=IntegratorType.BDPT,
                                 width=size, height=size)
    n = size * size
    ids = np.arange(n)
    px = jnp.asarray((ids % size).astype(np.int32))
    py = jnp.asarray((ids // size).astype(np.int32))
    mask = jnp.ones(n, bool)

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
        print(f"compile {name:18s} {time.perf_counter() - t0:6.1f}s "
              f"(sum {float(out):.3f})", flush=True)
    bdpt.KNOCK = frozenset()

    best = {name: 1e9 for name, _ in VARIANTS}
    for r in range(3):
        for name, _ in VARIANTS:
            t0 = time.perf_counter()
            jax.block_until_ready(fns[name](jnp.int32(100 + r)))
            best[name] = min(best[name], time.perf_counter() - t0)
    print()
    prev = None
    for name, _ in VARIANTS:
        d = "" if prev is None else f"  (delta vs prev {prev - best[name]:+7.3f} s)"
        print(f"{name:18s} {best[name]:8.3f} s/iter{d}", flush=True)
        prev = best[name]
    print(f"\nTr machinery total (full - no-tr): "
          f"{best['full'] - best['no-tr']:.3f} s")


if __name__ == "__main__":
    main()
