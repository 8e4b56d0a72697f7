"""Command-line renderer: `python -m gpu_pathtracer_tpu.run.cli scene.json`.

The headless replacement for the reference's GLUT viewer (main.cpp:280-311):
renders N progressive samples and writes a PNG (and optionally EXR).
"""

from __future__ import annotations

import argparse
import time

from gpu_pathtracer_tpu.film.imageio import save_exr, save_png
from gpu_pathtracer_tpu.run.renderer import Renderer, enable_compile_cache


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
                    choices=["ao", "pt", "vpt", "lt", "bdpt", "sppm", "ir",
                             "mlt"],
                    help="override the scene's integrator")
    ap.add_argument("--checkpoint", default=None,
                    help="npz render checkpoint: resumed from if it "
                         "exists, written after the render (and every "
                         "--checkpoint-every spp)")
    ap.add_argument("--checkpoint-every", type=int, default=64)
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the render loop")
    ap.add_argument("--no-compile-cache", action="store_true",
                    help="skip the persistent XLA compilation cache")
    ap.add_argument("--init-radius", type=float, default=None,
                    help="SPPM initial gather radius (scene default 0.5; "
                         "the reference default is far too large for "
                         "unit-scale scenes — try ~2-4 pixel footprints)")
    ap.add_argument("--photons", type=int, default=None,
                    help="SPPM photons per iteration override")
    ap.add_argument("--shard", action="store_true",
                    help="shard the render over all visible devices "
                         "(jax.sharding.Mesh over the lane axis; no-op "
                         "with a single device)")
    ap.add_argument("--size", type=int, default=None,
                    help="override the square render resolution")
    ap.add_argument("--depth", type=int, default=None,
                    help="override the scene's maxDepth")
    args = ap.parse_args(argv)

    if not args.no_compile_cache:
        enable_compile_cache()

    integrator = None
    if args.integrator:
        from gpu_pathtracer_tpu.scene.parse import _INTEGRATOR_MAP
        integrator = _INTEGRATOR_MAP[args.integrator]

    t0 = time.time()
    scene = args.scene
    if args.size is not None:
        from gpu_pathtracer_tpu.scene.parse import load_scene
        scene = load_scene(scene)
        scene.width = scene.height = args.size
    r = Renderer(scene, tile_size=args.tile, seed=args.seed,
                 cache=not args.no_cache, integrator=integrator,
                 max_depth=args.depth, init_radius=args.init_radius,
                 photons_per_iteration=args.photons, shard=args.shard)
    print(f"[scene] {r.static.n_primitives} prims, {r.static.n_nodes} BVH "
          f"nodes, {r.width}x{r.height}, integrator={r.static.integrator.name}"
          f" (built in {time.time() - t0:.2f}s)")
    if args.shard:
        nd = r.mesh.devices.size if r.mesh is not None else 1
        print(f"[shard] {nd} device(s)" +
              ("" if r.mesh is not None else " — sharding disabled"))

    # HBM usage breakdown (the reference prints the same per-category
    # VRAM summary at startup, pathtracer.cu:2689-2694)
    d = r.device_scene
    mb = 1.0 / (1024 * 1024)

    def _sz(*arrs):
        return sum(a.nbytes for a in arrs) * mb

    geo = _sz(d.v0, d.v1, d.v2, d.n0, d.n1, d.n2, d.uv0, d.uv1, d.uv2,
              d.prim_attrs)
    bvh = _sz(d.node_bbox_min, d.node_bbox_max, d.bvh8_table)
    print(f"[hbm] geometry {geo:.1f} MB, bvh {bvh:.1f} MB, "
          f"materials {_sz(d.mat_attrs):.2f} MB, "
          f"lights {_sz(d.light_attrs, d.light_cdf):.2f} MB, "
          f"textures {_sz(d.tex_data):.1f} MB, "
          f"env {_sz(d.env_data):.1f} MB, "
          f"media {_sz(d.med_density, d.med_density_pairs):.1f} MB")

    from gpu_pathtracer_tpu.run import checkpoint as ckpt
    import os
    start = 0
    if args.checkpoint and os.path.exists(args.checkpoint):
        ckpt.load_checkpoint(r, args.checkpoint)
        start = r.iteration
        print(f"[resume] {args.checkpoint} @ {start} spp")

    if args.profile:
        import jax
        jax.profiler.start_trace(args.profile)

    t0 = time.time()
    for i in range(start, args.spp):
        r.render_iteration()
        if (i + 1) % 16 == 0 or i == start:
            r.acc.block_until_ready()
            dt = time.time() - t0
            print(f"[render] {i + 1}/{args.spp} spp, "
                  f"{(i + 1 - start) / dt:.2f} spp/s")
        if args.checkpoint and (i + 1) % args.checkpoint_every == 0:
            r.acc.block_until_ready()
            ckpt.save_checkpoint(r, args.checkpoint)
    r.acc.block_until_ready()
    dt = time.time() - t0
    if args.profile:
        import jax
        jax.profiler.stop_trace()
        print(f"[profile] trace in {args.profile}")
    done = args.spp - start
    print(f"[render] {done} spp in {dt:.2f}s "
          f"({max(done, 1) / dt:.2f} spp/s)")
    if args.checkpoint:
        ckpt.save_checkpoint(r, args.checkpoint)
        print(f"[out] checkpoint {args.checkpoint} @ {r.iteration} spp")

    save_png(args.out, r.image())
    print(f"[out] wrote {args.out}")
    if args.exr:
        save_exr(args.exr, r.radiance()[::-1])
        print(f"[out] wrote {args.exr}")


if __name__ == "__main__":
    main()
