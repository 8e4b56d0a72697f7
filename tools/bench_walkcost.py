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
    scene_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "scenes", "dragon", "scene.json")
    host = load_scene(scene_path)
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
        "primary raster": (ro, rd, np.inf, False),
        "primary sortkey": (ro[np.argsort(skey(ro, rd), kind="stable")],
                            rd[np.argsort(skey(ro, rd), kind="stable")],
                            np.inf, False),
        "random sortkey": (rro[p], rrd[p], np.inf, False),
    }

    import functools

    # configs: (label, slot_order, nn, nl, packet_w, fuse)
    # TPU sweep history (dragon, 262k sorted bounce rays):
    # 2026-08-19 wider pops: W256(4,4) 67.1ms BEST; 6+6/8+8 LOSE (the
    # iteration is no longer purely latency-bound at 4+4) — hence fuse:
    # walk several sub-packets per while-loop so independent scalar/
    # vector chains overlap instead of widening one packet's pops.
    CONFIGS = [
        ("near 1+2 W1024", False, 1, 2, 1024, 1),   # cross-session anchor
        ("near 4+4 W256", False, 4, 4, 256, 1),     # shipped default
        ("near 4+4 W256 F2", False, 4, 4, 256, 2),
        ("near 4+4 W256 F4", False, 4, 4, 256, 4),
        ("near 2+2 W256 F4", False, 2, 2, 256, 4),
        ("near 4+4 W128 F4", False, 4, 4, 128, 4),
        ("near 4+4 W128 F8", False, 4, 4, 128, 8),
    ]

    @functools.partial(jax.jit,
                       static_argnames=("slot", "nn", "nl", "pw", "fu",
                                        "ah"))
    def walk(ro_, rd_, tmax=jnp.inf, slot=False, nn=2, nl=2, pw=1024,
             fu=1, ah=False):
        t, pr, _ = packet_tpu.packet_traverse(
            dev, static, ro_, rd_, 1e-3, tmax, any_hit=ah,
            slot_order=slot, nn=nn, nl=nl, packet_w=pw, fuse=fu)
        return t, pr

    # shadow rays: primary hit points toward a light-plane point —
    # the NEE any-hit workload (decides the any_hit-side walk config)
    t_prim = np.asarray(walk(jnp.asarray(ro), jnp.asarray(rd))[0])
    hitm = np.isfinite(t_prim) & (t_prim < 1e30)
    hp = ro + rd * np.where(hitm, t_prim * 0.999, 1.0)[:, None]
    lpt = wc + np.array([0.0, 0.95 * wr, 0.0])
    sd = lpt - hp
    sdist = np.linalg.norm(sd, axis=-1, keepdims=True)
    sd = sd / np.maximum(sdist, 1e-9)
    sp_ = np.argsort(skey(hp, sd), kind="stable")
    cases["shadow sortkey"] = (hp[sp_], sd[sp_], sdist[sp_, 0] * 0.98,
                               True)

    # compile + warm every config; verify agreement vs the baseline
    args = {k: (jnp.asarray(a), jnp.asarray(b), jnp.asarray(tm), ah)
            for k, (a, b, tm, ah) in cases.items()}
    for k, (a, b, tm, ah) in args.items():
        ref = None
        for lbl, s, nn, nl, pw, fu in CONFIGS:
            out = jax.block_until_ready(walk(a, b, tm, slot=s, nn=nn,
                                             nl=nl, pw=pw, fu=fu, ah=ah))
            # any-hit configs legitimately report different prim ids;
            # compare the found mask only
            cmp_ = (out[1] >= 0) if ah else out[1]
            if ref is None:
                ref = cmp_
            else:
                agree = float(jnp.mean((ref == cmp_).astype(jnp.float32)))
                if agree < 1.0:
                    print(f"{k:20s} {lbl}: prim-id agreement {agree:.6f}",
                          flush=True)

    REPS = 6
    best = {(k, c[0]): 1e9 for k in cases for c in CONFIGS}
    for _ in range(REPS):
        for k, (a, b, tm, ah) in args.items():
            for lbl, s, nn, nl, pw, fu in CONFIGS:
                t0 = time.perf_counter()
                jax.block_until_ready(walk(a, b, tm, slot=s, nn=nn, nl=nl,
                                           pw=pw, fu=fu, ah=ah))
                best[(k, lbl)] = min(best[(k, lbl)],
                                     time.perf_counter() - t0)
    for k in cases:
        base = best[(k, CONFIGS[0][0])]
        row = "  ".join(
            f"{lbl} {best[(k, lbl)] * 1e3:7.2f}ms"
            f"({n / best[(k, lbl)] / 1e6:5.1f}Mr/s x{base / best[(k, lbl)]:.2f})"
            for lbl, *_ in CONFIGS)
        print(f"{k:20s}: {row}", flush=True)


if __name__ == "__main__":
    main()
