"""Benchmark harness: Mrays/s (traverse+shade) across the 3 traversal
regimes plus the full 8-integrator matrix. Run on the real TPU (default
env). Prints ONE JSON line per completed stage — each line is the full
merged result-so-far, so a driver kill at ANY point still leaves the
last printed line as a complete, parseable artifact of everything that
finished (round-4 failure: one terminal print + driver timeout =>
parsed:null). The final line is the complete result.

Budget discipline (BENCH_BUDGET seconds, default 1500):
- per-stage subprocess timeouts are capped by the remaining budget;
- stages skipped for budget print -2.0 (vs -1.0 for a real failure);
- every stage records the SAME-PROCESS dispatch floor (trivial jitted
  op, min-of-reps) so shared-chip contention is visible per row
  (CLAUDE.md: the floor swings 5-23 ms between processes).

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
BUDGET = float(os.environ.get("BENCH_BUDGET", 1500))
T0 = time.time()
PARTIAL_PATH = os.path.join(REPO, "BENCH_partial.json")

SCENES = [
    # (key, path, size, timed iters)
    ("cornell", "/root/reference/scenes/cornell_box/scene.json", 1024, 8),
    ("dragon_100k", f"{REPO}/scenes/dragon/scene.json", 512, 4),
    ("forest_1m", f"{REPO}/scenes/dragon_forest/scene.json", 512, 4),
]

# BENCH_SMOKE=1: tiny sizes to validate the harness itself (CPU-safe)
if os.environ.get("BENCH_SMOKE"):
    SCENES = [(k, p, 32, 1) for k, p, _, _ in SCENES]


def _remaining() -> float:
    return BUDGET - (time.time() - T0)


def _dispatch_floor_ms() -> float:
    """Min-of-reps cost of a trivial jitted op in THIS process — the
    per-call tunnel/dispatch floor, recorded per stage so a contended
    chip is distinguishable from a code regression (verdict r4 weak #2).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    x = jnp.ones((128,), jnp.float32)
    jax.block_until_ready(trivial(x))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(trivial(x))
        best = min(best, time.perf_counter() - t0)
    return round(best * 1e3, 2)


def emit(partial: dict) -> None:
    """Stream the merged result-so-far: one full JSON line to stdout +
    BENCH_partial.json on disk. The LAST line printed is always a
    complete artifact of everything finished so far."""
    line = json.dumps(partial)
    print(line, flush=True)
    try:
        with open(PARTIAL_PATH, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass


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
# but we implement). (name, timed iters). Ordered fastest-compile/
# cheapest-first so a budget cut hits the fewest rows.
INTEG_MATRIX = [("ao", 8), ("pt", 8), ("ir", 8), ("mlt", 8),
                ("sppm", 4), ("vpt", 2), ("lt", 2), ("bdpt", 1)]

# absolute per-stage wall bound (a watchdog-scale hang gets reaped
# without blanking later stages); the EFFECTIVE timeout is
# min(this, remaining budget) so the whole bench fits BUDGET. 900 not
# 600: a cold bdpt compile measured up to ~905 s through the shared
# compile service — with warm caches the budget is barely touched, so
# the headroom only matters in exactly that cold case.
STAGE_TIMEOUT = 900


def run_stage(name, iters, size):
    """One integrator stage, in-process. Prints one JSON line."""
    from gpu_pathtracer_tpu.run.renderer import (Renderer,
                                                 enable_compile_cache)
    from gpu_pathtracer_tpu.scene.parse import _INTEGRATOR_MAP, load_scene
    enable_compile_cache()

    floor_ms = _dispatch_floor_ms()
    host = load_scene("/root/reference/scenes/cornell_box/scene.json")
    host.width = host.height = size
    r = Renderer(host, integrator=_INTEGRATOR_MAP[name])
    r.render(1)   # compile + warm
    t0 = time.time()
    r.render(iters)
    dt = (time.time() - t0) / iters
    print(f"# integ {name}: {1 / dt:.3f} spp/s @{size}^2 "
          f"depth {r.static.max_depth} (floor {floor_ms} ms)",
          file=sys.stderr)
    print(json.dumps({"spp_s": round(1.0 / dt, 4), "floor_ms": floor_ms}))


def bench_integrators(partial, size=512):
    """Each stage runs in its OWN subprocess (own TPU client): one
    crashed or hung kernel can no longer blank every later row of the
    artifact (round-3 failure: SPPM's watchdog kill turned IR's row into
    -1 too). Streams the merged partial after every stage."""
    import subprocess

    if os.environ.get("BENCH_SMOKE"):
        size = 32
    for name, iters in INTEG_MATRIX:
        key = f"integ_{name}_spp_s_512"
        left = _remaining()
        if left < 30:
            print(f"# integ {name}: SKIPPED (budget exhausted, "
                  f"{left:.0f}s left)", file=sys.stderr)
            partial[key] = -2.0
            emit(partial)
            continue
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--stage", name, str(iters), str(size)],
                capture_output=True, text=True,
                timeout=min(STAGE_TIMEOUT, left), cwd=REPO)
            sys.stderr.write(proc.stderr[-2000:] if proc.stderr else "")
            if proc.returncode == 0:
                row = json.loads(proc.stdout.strip().splitlines()[-1])
                partial[key] = row["spp_s"]
                partial[f"integ_{name}_floor_ms"] = row["floor_ms"]
            else:
                print(f"# integ {name}: FAILED (rc={proc.returncode})",
                      file=sys.stderr)
                partial[key] = -1.0
        except subprocess.TimeoutExpired:
            print(f"# integ {name}: FAILED (timeout)", file=sys.stderr)
            partial[key] = -1.0
        except Exception as e:
            print(f"# integ {name}: FAILED ({type(e).__name__}: {e})",
                  file=sys.stderr)
            partial[key] = -1.0
        emit(partial)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--stage":
        run_stage(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return

    from gpu_pathtracer_tpu.run.renderer import enable_compile_cache
    enable_compile_cache()  # timings exclude compile (warmup); the cache
    # makes repeated bench runs start fast

    partial = {
        "metric": f"Mrays/s traverse+shade (cornell_box PT 1024x1024 "
                  f"depth {MAX_DEPTH}, v5e)",
        "value": -1.0,
        "unit": "Mrays/s",
        "vs_baseline": -1.0,
        "budget_s": BUDGET,
        "floor_ms": _dispatch_floor_ms(),
    }
    emit(partial)

    for key, path, size, iters in SCENES:
        if _remaining() < 60 and key != "cornell":
            print(f"# {key}: SKIPPED (budget)", file=sys.stderr)
            partial[f"{key}_mrays"] = -2.0
            emit(partial)
            continue
        try:
            mrays, spp_s, rays_iter = bench_scene(path, size, iters)
        except Exception as e:
            print(f"# {key}: FAILED ({type(e).__name__}: {e})",
                  file=sys.stderr)
            partial[f"{key}_mrays"] = -1.0
            emit(partial)
            continue
        print(f"# {key} PT {size}x{size} depth={MAX_DEPTH}: "
              f"{spp_s:.3f} spp/s, {mrays:.1f} Mrays/s "
              f"({rays_iter / 1e6:.1f} Mrays/iter)", file=sys.stderr)
        if key == "cornell":
            partial["value"] = round(mrays, 3)
            partial["vs_baseline"] = round(mrays / TARGET_MRAYS, 4)
            # the user-facing render speed; Mrays/s undercounts
            # estimator improvements that need FEWER rays per sample
            partial["spp_per_s_1024"] = round(spp_s, 3)
        else:
            partial[f"{key}_mrays"] = round(mrays, 3)
            partial[f"{key}_spp_s_512"] = round(spp_s, 3)
        emit(partial)

    bench_integrators(partial)
    partial["total_s"] = round(time.time() - T0, 1)
    emit(partial)


if __name__ == "__main__":
    main()
