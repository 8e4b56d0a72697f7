"""Benchmark harness: Mrays/s (traverse+shade) across the 3 traversal
regimes. Run on the real TPU (default env). Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The headline metric stays cornell_box PT at 1024² (the fused-megakernel
dense regime, comparable across rounds); the matrix adds the blocked/
packet regimes the BASELINE's sponza-class target lives in:
- dragon (100k tris): VMEM-resident Pallas packet walk
- dragon_forest (1M tris): bf16-packed nodes + HBM-streamed leaves

Baseline (BASELINE.md): the reference publishes no numbers; the target
is >200 Mrays/s per v5e chip, so vs_baseline = value / 200.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
TARGET_MRAYS = 200.0
MAX_DEPTH = 5

SCENES = [
    # (key, path, size, timed iters)
    ("cornell", "/root/reference/scenes/cornell_box/scene.json", 1024, 8),
    ("dragon_100k", f"{REPO}/scenes/dragon/scene.json", 512, 4),
    ("forest_1m", f"{REPO}/scenes/dragon_forest/scene.json", 512, 4),
]

# BENCH_SMOKE=1: tiny sizes to validate the harness itself (CPU-safe)
if os.environ.get("BENCH_SMOKE"):
    SCENES = [(k, p, 32, 1) for k, p, _, _ in SCENES]


def bench_scene(path, size, iters):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpu_pathtracer_tpu.core.rng import iteration_key
    from gpu_pathtracer_tpu.integrators import pt
    from gpu_pathtracer_tpu.scene.flatten import flatten_scene
    from gpu_pathtracer_tpu.scene.model import IntegratorType
    from gpu_pathtracer_tpu.scene.parse import load_scene

    host = load_scene(path)
    host.width = host.height = size
    dev, static = flatten_scene(host)
    static = dataclasses.replace(
        static, integrator=IntegratorType.PT, max_depth=MAX_DEPTH,
        width=size, height=size)

    n = size * size
    ids = np.arange(n)
    px = jnp.asarray((ids % size).astype(np.int32))
    py = jnp.asarray((ids // size).astype(np.int32))

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
    li, rays = step_stats(dev, jnp.int32(1))
    rays_iter = int(rays)
    li = step(dev, jnp.int32(0))
    li.block_until_ready()

    t0 = time.time()
    for i in range(iters):
        li = step(dev, jnp.int32(100 + i))
    li.block_until_ready()
    dt = (time.time() - t0) / iters
    return rays_iter / dt / 1e6, 1.0 / dt, rays_iter


# full integrator matrix on cornell 512^2 at the scene's own depth (17)
# — mirrors the reference's per-frame dispatch over all integrator
# kernels (pathtracer.cu:2711-2745), plus MLT (which the reference stubs
# but we implement). (name, timed iters)
INTEG_MATRIX = [("ao", 8), ("pt", 8), ("vpt", 2), ("lt", 2),
                ("bdpt", 1), ("sppm", 4), ("ir", 8), ("mlt", 8)]

# per-stage wall clock bound: warm steady-state stages finish in well
# under this; a watchdog-scale hang (the round-3 SPPM failure mode) gets
# reaped without blanking later stages
STAGE_TIMEOUT = 1500


def run_stage(name, iters, size):
    """One integrator stage, in-process. Prints one JSON line."""
    import time

    from gpu_pathtracer_tpu.run.renderer import (Renderer,
                                                 enable_compile_cache)
    from gpu_pathtracer_tpu.scene.parse import _INTEGRATOR_MAP, load_scene
    enable_compile_cache()

    host = load_scene("/root/reference/scenes/cornell_box/scene.json")
    host.width = host.height = size
    r = Renderer(host, integrator=_INTEGRATOR_MAP[name])
    r.render(1)   # compile + warm
    t0 = time.time()
    r.render(iters)
    dt = (time.time() - t0) / iters
    print(f"# integ {name}: {1 / dt:.3f} spp/s @{size}^2 "
          f"depth {r.static.max_depth}", file=sys.stderr)
    print(json.dumps({"spp_s": round(1.0 / dt, 4)}))


def bench_integrators(size=512):
    """Each stage runs in its OWN subprocess (own TPU client): one crashed
    or hung kernel can no longer blank every later row of the artifact
    (round-3 failure: SPPM's watchdog kill turned IR's row into -1 too)."""
    import subprocess

    if os.environ.get("BENCH_SMOKE"):
        size = 32
    out = {}
    for name, iters in INTEG_MATRIX:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--stage", name, str(iters), str(size)],
                capture_output=True, text=True, timeout=STAGE_TIMEOUT,
                cwd=REPO)
            sys.stderr.write(proc.stderr[-2000:] if proc.stderr else "")
            if proc.returncode == 0:
                out[name] = json.loads(proc.stdout.strip().splitlines()[-1])[
                    "spp_s"]
            else:
                print(f"# integ {name}: FAILED (rc={proc.returncode})",
                      file=sys.stderr)
                out[name] = -1.0
        except subprocess.TimeoutExpired:
            print(f"# integ {name}: FAILED (timeout {STAGE_TIMEOUT}s)",
                  file=sys.stderr)
            out[name] = -1.0
        except Exception as e:
            print(f"# integ {name}: FAILED ({type(e).__name__}: {e})",
                  file=sys.stderr)
            out[name] = -1.0
    return out


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--stage":
        run_stage(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return

    from gpu_pathtracer_tpu.run.renderer import enable_compile_cache
    enable_compile_cache()  # timings exclude compile (warmup); the cache
    # makes repeated bench runs start fast

    results = {}
    for key, path, size, iters in SCENES:
        mrays, spp_s, rays_iter = bench_scene(path, size, iters)
        results[key] = (mrays, spp_s)
        print(f"# {key} PT {size}x{size} depth={MAX_DEPTH}: "
              f"{spp_s:.3f} spp/s, {mrays:.1f} Mrays/s "
              f"({rays_iter / 1e6:.1f} Mrays/iter)", file=sys.stderr)
    integ = bench_integrators()

    mrays = results["cornell"][0]
    print(json.dumps({
        "metric": f"Mrays/s traverse+shade (cornell_box PT 1024x1024 "
                  f"depth {MAX_DEPTH}, v5e)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
        # the user-facing render speed; Mrays/s undercounts estimator
        # improvements that need FEWER rays per sample
        "spp_per_s_1024": round(results["cornell"][1], 3),
        # large-scene regimes (BASELINE sponza-class target)
        "dragon_100k_mrays": round(results["dragon_100k"][0], 3),
        "dragon_100k_spp_s_512": round(results["dragon_100k"][1], 3),
        "forest_1m_mrays": round(results["forest_1m"][0], 3),
        "forest_1m_spp_s_512": round(results["forest_1m"][1], 3),
        # all 8 integrators (7 reference + our real MLT), cornell 512^2
        # at the scene depth (17): spp/s keyed integ_<name>
        **{f"integ_{k}_spp_s_512": v for k, v in integ.items()},
    }))


if __name__ == "__main__":
    main()
