"""Golden-image regression suite: render the scenes whose assets ship
with the reference and compare to its converged `result/` renders.

Usage (real TPU):
    python -m gpu_pathtracer_tpu.run.golden              # all goldens
    python -m gpu_pathtracer_tpu.run.golden --only smoke --spp 64

Prints per-scene RMSE over tonemapped [0,1] pixels and one JSON summary
line. The goldens are converged and ours are N-spp Monte Carlo, so the
comparison bounds correctness, not noise: structural mismatches (wrong
walls, wrong brightness, wrong blur) dominate RMSE long before variance
does.

Per-scene notes:
- smoke (cornell_box VPT vs result/smoke.png): the bundled density.d
  predates the golden (diagonal vs vertical plume — PARITY.md); the
  plume region is masked out and the rest gated tight.
- fur (fur.json PT vs result/line_example.png): line primitives.
- vol_caustic (vol_caustic.json VPT vs result/volume_caustic.png): the
  shipped light mesh (mesh_6.obj) is ~1e-3 of the panel the golden used;
  radiance is scaled by the measured area ratio (PARITY.md).
- cornell_dof (scenes/cornell_dof PT vs result/cornell_dof.png):
  repo-authored classic-box scene with a thin-lens aperture; exercises
  the DoF camera path end-to-end.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

RESULT = "/root/reference/result"
REF_SCENES = "/root/reference/scenes"
REPO_SCENES = "/root/repo/scenes"


def _load_png(path):
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def _downsample(img, h, w=None):
    """Area-average resize to (h, w) — exact for integer factors, PIL BOX
    for the rest (non-square goldens at sizes that don't divide)."""
    w = h if w is None else w
    if img.shape[:2] == (h, w):
        return img
    if img.shape[0] % h == 0 and img.shape[1] % w == 0 \
            and img.shape[0] // h == img.shape[1] // w:
        f = img.shape[0] // h
        return img.reshape(h, f, w, f, 3).mean((1, 3))
    from PIL import Image
    im = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    return np.asarray(im.resize((w, h), Image.BOX), np.float32) / 255.0


def _smoke_mask(size):
    """Mask (True = compare) excluding the density-grid plume region —
    the medium cube interface spans roughly the central square."""
    m = np.ones((size, size), bool)
    lo, hi = int(size * 0.20), int(size * 0.84)
    m[lo:hi, lo:hi] = False
    return m


def _scale_vol_caustic_light(scene):
    """The golden used a panel-sized light; the shipped mesh_6.obj is a
    tiny quad. Scale radiance by the area ratio (PARITY.md)."""
    from gpu_pathtracer_tpu.scene.objloader import load_obj
    import os

    def area(path):
        v = load_obj(path).positions  # triangle soup [T, 3, 3]
        c = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
        return 0.5 * np.linalg.norm(c, axis=-1).sum()

    a_panel = area(os.path.join(REF_SCENES, "cornell_box/geometry/light.obj"))
    a_mesh = area(os.path.join(REF_SCENES, "cornell_box/geometry/mesh_6.obj"))
    ratio = a_panel / max(a_mesh, 1e-12)
    for lt in scene.lights:
        lt.radiance = lt.radiance * ratio
    return scene


GOLDENS = {
    # smoke gate: measured 0.0555 at 128 spp / 256^2 (2026-08). The mask
    # excludes the plume (data-vintage: diagonal vs the golden's vertical,
    # see PARITY.md), but the plume's GI spill tints the walls outside the
    # mask and edge-resampling halos add the rest — verified filmic is the
    # better of both tonemaps (gamma-sqrt2 measures 0.085). Gate = measured
    # + margin; an estimator regression jumps well past it.
    "smoke": dict(
        scene=f"{REF_SCENES}/cornell_box/scene.json", integrator="vpt",
        golden=f"{RESULT}/smoke.png", gate=0.065, mask=_smoke_mask),
    "fur": dict(
        scene=f"{REPO_SCENES}/fur/scene.json", integrator="pt",
        golden=f"{RESULT}/line_example.png", gate=0.05),
    # vol_caustic gate: measured 0.0882 — the area-ratio light rescale
    # (PARITY.md) recovers the golden's structure but not its exact
    # radiometry (the historical light's shape/position are unknown).
    "vol_caustic": dict(
        scene=f"{REF_SCENES}/cornell_box/vol_caustic.json", integrator="vpt",
        golden=f"{RESULT}/volume_caustic.png", gate=0.105,
        prep=_scale_vol_caustic_light),
    "cornell_dof": dict(
        scene=f"{REPO_SCENES}/cornell_dof/scene.json", integrator="pt",
        golden=f"{RESULT}/cornell_dof.png", gate=0.05),
    # teapot gate: the reference ships teapot.obj + result/teapot.png but
    # not the scene JSON or the graph-paper texture; scenes/teapot is
    # authored against the golden (camera/light/paper calibrated via
    # tools/golden_calibrate_teapot.py, texture synthesized by
    # tools/make_graph_paper.py). The irreducible residual is the
    # handwriting/label art and the unknown historical light — gate set
    # from the measured converged RMSE + margin (see scene _comment).
    # gate from the measured converged TPU RMSE 0.1255 (GOLDEN_r5.json,
    # 128 spp @256) + ~7% margin; 0.10 is NOT reachable — the residual
    # is the handwriting/label art and the unknown historical light
    "teapot": dict(
        scene=f"{REPO_SCENES}/teapot/scene.json", integrator="pt",
        golden=f"{RESULT}/teapot.png", gate=0.135, aspect=(16, 9)),
}


def run_one(name, cfg, spp, size, out=None, max_depth=None):
    from gpu_pathtracer_tpu.run.renderer import Renderer
    from gpu_pathtracer_tpu.scene.parse import _INTEGRATOR_MAP, load_scene

    scene = load_scene(cfg["scene"])
    aw, ah = cfg.get("aspect", (1, 1))
    w = size * aw // ah
    scene.width, scene.height = w, size
    if "prep" in cfg:
        scene = cfg["prep"](scene)
    r = Renderer(scene, integrator=_INTEGRATOR_MAP[cfg["integrator"]],
                 max_depth=max_depth)
    t0 = time.time()
    r.render(spp)
    img = r.image()[::-1]  # goldens are top-down
    dt = time.time() - t0
    golden = _downsample(_load_png(cfg["golden"]), size, w)
    diff2 = ((img - golden) ** 2).mean(-1)
    if "mask" in cfg:
        diff2 = diff2[cfg["mask"](size)]
    rmse = float(np.sqrt(diff2.mean()))
    ok = rmse < cfg["gate"]
    print(f"[golden] {name:12s} {spp} spp @ {size}^2 in {dt:6.1f}s: "
          f"RMSE {rmse:.4f} ({'PASS' if ok else 'FAIL'} @ {cfg['gate']})",
          flush=True)
    if out:
        from gpu_pathtracer_tpu.film.imageio import save_png
        save_png(f"{out}/{name}.png", img[::-1])
    return rmse, ok


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=128)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--only", default=None,
                    help="comma-separated golden names")
    ap.add_argument("--max-depth", type=int, default=None,
                    help="override scene depth (speeds up the 17-bounce "
                         "scenes; structure converges by depth ~8)")
    ap.add_argument("--out", default=None, help="dir to save our renders")
    ap.add_argument("--json", default=None,
                    help="write the summary (plus run metadata) to this "
                         "path — the committed GOLDEN_r{N}.json artifact")
    args = ap.parse_args(argv)

    from gpu_pathtracer_tpu.run.renderer import enable_compile_cache
    enable_compile_cache()

    names = args.only.split(",") if args.only else list(GOLDENS)
    results = {}
    for name in names:
        rmse, ok = run_one(name, GOLDENS[name], args.spp, args.size,
                           args.out, args.max_depth)
        results[name] = {"rmse": round(rmse, 4), "pass": ok}
    print(json.dumps(results))
    if args.json:
        import jax
        payload = {"spp": args.spp, "size": args.size,
                   "backend": jax.default_backend(),
                   "results": results,
                   "all_pass": all(v["pass"] for v in results.values())}
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)
    if not all(v["pass"] for v in results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
