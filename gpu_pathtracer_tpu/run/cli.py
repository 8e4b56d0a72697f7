"""Command-line renderer: `python -m gpu_pathtracer_tpu.run.cli scene.json`.

The headless replacement for the reference's GLUT viewer (main.cpp:280-311):
renders N progressive samples and writes a PNG (and optionally EXR).
"""

from __future__ import annotations

import argparse
import time

from gpu_pathtracer_tpu.film.imageio import save_exr, save_png
from gpu_pathtracer_tpu.run.renderer import Renderer


def main(argv=None):
    ap = argparse.ArgumentParser(description="TPU wavefront path tracer")
    ap.add_argument("scene", help="scene JSON (reference-compatible schema)")
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--out", default="out.png")
    ap.add_argument("--exr", default=None, help="also dump radiance EXR")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tile", type=int, default=1 << 16)
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--integrator", default=None,
                    choices=["ao", "pt", "vpt", "lt", "bdpt", "sppm", "ir"],
                    help="override the scene's integrator")
    args = ap.parse_args(argv)

    integrator = None
    if args.integrator:
        from gpu_pathtracer_tpu.scene.parse import _INTEGRATOR_MAP
        integrator = _INTEGRATOR_MAP[args.integrator]

    t0 = time.time()
    r = Renderer(args.scene, tile_size=args.tile, seed=args.seed,
                 cache=not args.no_cache, integrator=integrator)
    print(f"[scene] {r.static.n_primitives} prims, {r.static.n_nodes} BVH "
          f"nodes, {r.width}x{r.height}, integrator={r.static.integrator.name}"
          f" (built in {time.time() - t0:.2f}s)")

    t0 = time.time()
    for i in range(args.spp):
        r.render_iteration()
        if (i + 1) % 16 == 0 or i == 0:
            r.acc.block_until_ready()
            dt = time.time() - t0
            print(f"[render] {i + 1}/{args.spp} spp, "
                  f"{(i + 1) / dt:.2f} spp/s")
    r.acc.block_until_ready()
    dt = time.time() - t0
    print(f"[render] {args.spp} spp in {dt:.2f}s "
          f"({args.spp / dt:.2f} spp/s)")

    save_png(args.out, r.image())
    print(f"[out] wrote {args.out}")
    if args.exr:
        save_exr(args.exr, r.radiance()[::-1])
        print(f"[out] wrote {args.exr}")


if __name__ == "__main__":
    main()
