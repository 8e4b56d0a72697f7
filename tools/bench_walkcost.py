"""Fit the packet-walk kernel's cost model on the real TPU.

Times the resident kernel (geom/packet_tpu.py) on ray sets whose exact
iteration counts tools/sim_walk.py computes on CPU; a linear fit of
time-vs-iterations separates the per-iteration cost from the per-packet
fixed cost, which decides whether ordering (fewer iterations) or kernel
engineering (cheaper iterations) is the right attack.

All timings are same-process interleaved min-of-reps inside one jit
per case (CLAUDE.md: cross-process numbers on the shared chip are
meaningless).

    python tools/bench_walkcost.py
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
from gpu_pathtracer_tpu.integrators.common import primary_rays
from gpu_pathtracer_tpu.core.rng import RngStream, iteration_key
from gpu_pathtracer_tpu.geom import packet_tpu


def main():
    size = 512
    host = load_scene(os.path.join(os.path.dirname(__file__), "..",
                                   "scenes", "dragon", "scene.json"))
    host.width = host.height = size
    dev, static = flatten_scene(host)
    n = size * size
    ids = np.arange(n)
    px = jnp.asarray((ids % size).astype(np.int32))
    py = jnp.asarray((ids // size).astype(np.int32))
    rng = RngStream(iteration_key(0, 0))
    ro, rd = primary_rays(dev, static, rng, px, py)
    ro = np.asarray(ro)
    rd = np.asarray(rd)
    wc = np.asarray(dev.world_center)
    wr = float(dev.world_radius)

    def skey(ro_, rd_):
        q = np.clip(((ro_ - wc) / (2 * wr) + 0.5) * 15.999, 0, 15).astype(np.int64)
        m = np.zeros(ro_.shape[0], np.int64)
        for b in range(4):
            for a in range(3):
                m |= ((q[:, a] >> b) & 1) << (3 * b + a)
        oc = ((rd_[:, 0] > 0).astype(np.int64)
              | ((rd_[:, 1] > 0).astype(np.int64) << 1)
              | ((rd_[:, 2] > 0).astype(np.int64) << 2))
        return (oc << 12) | m

    rs = np.random.RandomState(7)
    rro = rs.uniform(-0.9, 0.9, (n, 3)) + np.array([0.0, 1.0, 0.0])
    rrd = rs.normal(size=(n, 3))
    rrd /= np.linalg.norm(rrd, axis=-1, keepdims=True)
    p = np.argsort(skey(rro, rrd), kind="stable")

    cases = {
        "single-ray x262k": (np.broadcast_to(ro[1000], (n, 3)).copy(),
                             np.broadcast_to(rd[1000], (n, 3)).copy()),
        "primary raster": (ro, rd),
        "primary sortkey": (ro[np.argsort(skey(ro, rd), kind="stable")],
                            rd[np.argsort(skey(ro, rd), kind="stable")]),
        "random": (rro, rrd),
        "random sortkey": (rro[p], rrd[p]),
    }

    import functools

    @functools.partial(jax.jit, static_argnames=("slot",))
    def walk(ro_, rd_, slot=False):
        t, pr, _ = packet_tpu.packet_traverse(
            dev, static, ro_, rd_, 1e-3, jnp.inf, any_hit=False,
            slot_order=slot)
        return t, pr

    # compile + warm both policies
    args = {k: (jnp.asarray(a), jnp.asarray(b)) for k, (a, b) in cases.items()}
    for k, (a, b) in args.items():
        ref = jax.block_until_ready(walk(a, b, slot=True))
        new = jax.block_until_ready(walk(a, b, slot=False))
        agree = float(jnp.mean((ref[1] == new[1]).astype(jnp.float32)))
        print(f"{k:20s}: prim-id agreement {agree:.6f}", flush=True)

    REPS = 6
    best = {(k, s): 1e9 for k in cases for s in (True, False)}
    for _ in range(REPS):
        for k, (a, b) in args.items():
            for s in (True, False):
                t0 = time.perf_counter()
                jax.block_until_ready(walk(a, b, slot=s))
                best[(k, s)] = min(best[(k, s)],
                                   time.perf_counter() - t0)
    for k in cases:
        vs, vn = best[(k, True)], best[(k, False)]
        print(f"{k:20s}: slot {vs * 1e3:8.2f} ms ({n / vs / 1e6:7.1f} Mr/s)"
              f"  near {vn * 1e3:8.2f} ms ({n / vn / 1e6:7.1f} Mr/s)"
              f"  x{vs / vn:.2f}", flush=True)


if __name__ == "__main__":
    main()
