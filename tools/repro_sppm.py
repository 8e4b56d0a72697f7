"""Reproduce/bisect the SPPM TPU worker crash (VERDICT r3 item #1).

Usage: python tools/repro_sppm.py [size] [iters] [integrator]
Runs cornell at size^2 for iters, prints timing per iteration.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    name = sys.argv[3] if len(sys.argv) > 3 else "sppm"

    from gpu_pathtracer_tpu.run.renderer import Renderer, enable_compile_cache
    from gpu_pathtracer_tpu.scene.parse import _INTEGRATOR_MAP, load_scene
    enable_compile_cache()

    host = load_scene("/root/reference/scenes/cornell_box/scene.json")
    host.width = host.height = size
    r = Renderer(host, integrator=_INTEGRATOR_MAP[name])
    print(f"# {name} {size}^2 depth={r.static.max_depth} "
          f"photons/iter={getattr(r.static, 'photons_per_iteration', '-')}",
          flush=True)
    for i in range(iters):
        t0 = time.time()
        r.render(1)
        print(f"# iter {i}: {time.time() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
