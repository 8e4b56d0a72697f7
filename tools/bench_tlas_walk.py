"""Time the INSTANCED packet walk on the real TPU (forest scene).

Companion to tools/sim_tlas.py: the sim gives exact iteration counts for
the same ray sets; time / (packets x sim-iters) is the instanced
kernel's per-iteration cost, to compare against the flat walk's
~1.48 us/iter (CLAUDE.md instruction audit).

    python tools/bench_tlas_walk.py
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.run.renderer import enable_compile_cache
enable_compile_cache()
from gpu_pathtracer_tpu.scene.parse import load_scene
from gpu_pathtracer_tpu.scene.flatten import flatten_scene
from gpu_pathtracer_tpu.integrators.common import primary_rays
from gpu_pathtracer_tpu.core.rng import RngStream, iteration_key
from gpu_pathtracer_tpu.geom import packet_tpu
from sim_walk import sort_key, morton2


def main():
    size = 512
    host = load_scene(os.path.join(os.path.dirname(__file__), "..",
                                   "scenes", "dragon_forest", "scene.json"))
    host.width = host.height = size
    dev, static = flatten_scene(host)
    print(f"n_inst={static.bvh8_n_inst} rows={dev.bvh8_table.shape[0]}",
          flush=True)
    n = size * size
    ids = np.arange(n)
    px = jnp.asarray((ids % size).astype(np.int32))
    py = jnp.asarray((ids // size).astype(np.int32))
    rng = RngStream(iteration_key(0, 0))
    ro, rd = primary_rays(dev, static, rng, px, py)
    ro = np.asarray(ro); rd = np.asarray(rd)
    wc = np.asarray(dev.world_center); wr = float(dev.world_radius)

    pm = np.argsort(morton2((ids % size).astype(np.int64),
                            (ids // size).astype(np.int64)))
    rs = np.random.RandomState(7)
    rro = rs.uniform(-0.9, 0.9, (n, 3)) + np.array([0.0, 1.0, 0.0])
    rrd = rs.normal(size=(n, 3))
    rrd /= np.linalg.norm(rrd, axis=-1, keepdims=True)
    p = np.argsort(sort_key(rro, rrd, wc, wr), kind="stable")

    cases = {
        "primary morton2d": (ro[pm], rd[pm]),
        "random sortkey": (rro[p], rrd[p]),
    }

    import functools

    @functools.partial(jax.jit, static_argnames=("w",))
    def walk(ro_, rd_, w):
        t, pr, _ = packet_tpu.packet_traverse(
            dev, static, ro_, rd_, 1e-3, jnp.inf, any_hit=False,
            packet_w=w)
        return t, pr

    # trivial jitted op: the same-process dispatch floor to subtract
    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    WIDTHS = (128, 256, 512)
    args = {k: (jnp.asarray(a), jnp.asarray(b)) for k, (a, b) in
            cases.items()}
    for k, (a, b) in args.items():
        for w in WIDTHS:
            out = jax.block_until_ready(walk(a, b, w))
            hits = float(jnp.mean((out[1] >= 0).astype(jnp.float32)))
            print(f"{k} W={w}: hit-rate {hits:.3f}", flush=True)

    floor = 1e9
    best = {(k, w): 1e9 for k in cases for w in WIDTHS}
    for _ in range(6):
        t0 = time.perf_counter()
        jax.block_until_ready(trivial(args["random sortkey"][0]))
        floor = min(floor, time.perf_counter() - t0)
        for k, (a, b) in args.items():
            for w in WIDTHS:
                t0 = time.perf_counter()
                jax.block_until_ready(walk(a, b, w))
                best[(k, w)] = min(best[(k, w)], time.perf_counter() - t0)
    print(f"dispatch floor: {floor * 1e3:.2f} ms", flush=True)
    for (k, w), t in sorted(best.items()):
        tt = t - floor
        npk = n // w
        print(f"{k:20s} W={w:4d}: {t * 1e3:8.2f} ms "
              f"({n / tt / 1e6:6.2f} Mrays/s, "
              f"{tt / npk * 1e6:7.2f} us/packet)", flush=True)


if __name__ == "__main__":
    main()
