"""Steady-state spp/s for every integrator on cornell 512^2 (real TPU).

Run after perf work to refresh the README integrator matrix:
    python tools/integ_matrix.py
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, jax
from gpu_pathtracer_tpu.run.renderer import enable_compile_cache
enable_compile_cache()
from gpu_pathtracer_tpu.scene.parse import load_scene
from gpu_pathtracer_tpu.run.renderer import Renderer
from gpu_pathtracer_tpu.scene.model import IntegratorType

CASES = [
    ("ao",   IntegratorType.AO,   None),
    ("pt",   IntegratorType.PT,   None),
    ("vpt",  IntegratorType.VPT,  None),
    ("lt",   IntegratorType.LT,   None),
    ("bdpt", IntegratorType.BDPT, None),
    ("sppm", IntegratorType.SPPM, None),
    ("ir",   IntegratorType.IR,   None),
]
for name, integ, depth in CASES:
    host = load_scene("/root/reference/scenes/cornell_box/scene.json")
    host.width = host.height = 512
    r = Renderer(host, integrator=integ, max_depth=depth)
    t0 = time.time(); r.render(1)
    c = time.time() - t0
    iters = 16 if name in ("ao", "pt") else 4
    t0 = time.time(); r.render(iters)
    dt = (time.time() - t0) / iters
    img = r.radiance()
    print(f"{name:5s}: {1/dt:8.3f} spp/s @512^2 depth{r.static.max_depth} "
          f"(compile+1st {c:.0f}s, mean {img.mean():.4f})", flush=True)
