"""A/B the fused megakernel's textured mode vs the wavefront on TPU.

VERDICT r2 item 5: textured scenes used to silently fall back to the
wavefront, losing the fused path's ~3-4x. This times both paths on a
512^2 textured-lambertian box (the test scene of
tests/test_pt_fused_textured.py) in one process, interleaved
min-of-reps.

    python tools/bench_textured.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.run.renderer import enable_compile_cache
enable_compile_cache()
from gpu_pathtracer_tpu.integrators import pt, pt_fused
from gpu_pathtracer_tpu.scene.flatten import flatten_scene
from gpu_pathtracer_tpu.scene.model import IntegratorType
from gpu_pathtracer_tpu.scene.parse import load_scene


def build_scene(d="/tmp/texbox_bench", size=512):
    from PIL import Image
    os.makedirs(d, exist_ok=True)
    checker = np.zeros((64, 64, 3), np.uint8)
    ij = np.arange(64)[:, None] + np.arange(64)
    checker[(ij // 8) % 2 == 0] = (230, 60, 40)
    checker[(ij // 8) % 2 == 1] = (40, 200, 230)
    Image.fromarray(checker).save(d + "/checker.png")
    open(d + "/floor.obj", "w").write(
        "v -1 0 -1\nv 1 0 -1\nv 1 0 1\nv -1 0 1\n"
        "vt 0 0\nvt 2 0\nvt 2 2\nvt 0 2\nvn 0 1 0\n"
        "f 1/1/1 2/2/1 3/3/1\nf 1/1/1 3/3/1 4/4/1\n")
    open(d + "/wall.obj", "w").write(
        "v -1 0 -1\nv 1 0 -1\nv 1 2 -1\nv -1 2 -1\nvn 0 0 1\n"
        "f 1//1 2//1 3//1\nf 1//1 3//1 4//1\n")
    open(d + "/light.obj", "w").write(
        "v -0.4 1.99 -0.4\nv 0.4 1.99 -0.4\nv 0.4 1.99 0.4\n"
        "v -0.4 1.99 0.4\nvn 0 -1 0\n"
        "f 1//1 3//1 2//1\nf 1//1 4//1 3//1\n")
    doc = {
        "screen_width": size, "screen_height": size,
        "integrator": "pt", "maxDepth": 5, "epsilon": 0.001,
        "camera": {"position": [0, 1.0, 3.2], "lookat": [0, 0.6, 0],
                   "fov": 40.0, "apertureRadius": 0.0,
                   "focalDistance": 3.2, "filmicTonemap": False},
        "material": [
            {"name": "Checker", "bsdf": "lambertian",
             "diffuse": "checker.png"},
            {"name": "Grey", "bsdf": "lambertian",
             "diffuse": [0.6, 0.6, 0.6]},
            {"name": "Black", "bsdf": "lambertian", "diffuse": [0, 0, 0]},
        ],
        "scene": [{"mesh": "floor.obj", "material": "Checker"},
                  {"mesh": "wall.obj", "material": "Grey"}],
        "light": [{"mesh": "light.obj", "material": "Black",
                   "radiance": [12.0, 12.0, 12.0]}],
    }
    open(d + "/scene.json", "w").write(json.dumps(doc))
    host = load_scene(d + "/scene.json")
    dev, static = flatten_scene(host)
    return dev, dataclasses.replace(static, integrator=IntegratorType.PT)


def main():
    size = 512
    dev, static = build_scene(size=size)
    assert pt_fused.supports(static)
    n = size * size
    ids = np.arange(n)
    px = jnp.asarray((ids % size).astype(np.int32))
    py = jnp.asarray((ids // size).astype(np.int32))

    # route selection: pt.render_lanes picks fused vs wavefront through
    # pt_fused.supports at trace time; tracing two separate jits with
    # supports monkeypatched gives both programs in one process
    sup = pt_fused.supports
    out = {}
    for name in ("fused", "wavefront"):
        pt_fused.supports = sup if name == "fused" else (lambda s: False)
        fn = jax.jit(lambda dscene, it: pt.render_lanes(
            dscene, static, jax.random.fold_in(jax.random.PRNGKey(0), it),
            px, py))
        jax.block_until_ready(fn(dev, jnp.int32(0)))
        best = 1e9
        for r in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(dev, jnp.int32(10 + r)))
            best = min(best, time.perf_counter() - t0)
        out[name] = best
        print(f"{name:10s}: {best * 1e3:8.2f} ms/spp "
              f"({1.0 / best:6.2f} spp/s at {size}^2)", flush=True)
    pt_fused.supports = sup
    print(f"fused speedup: x{out['wavefront'] / out['fused']:.2f}")


if __name__ == "__main__":
    main()
