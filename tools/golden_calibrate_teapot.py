"""Calibrate scenes/teapot against result/teapot.png (like
tools/golden_calibrate_dof.py did for cornell_dof).

Renders the scene at a reduced 16:9 size on the default backend,
compares to the downsampled golden, prints RMSE and saves a
side-by-side to /tmp/teapot_cal.png.

    python tools/golden_calibrate_teapot.py [--spp 16] [--h 135]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--h", type=int, default=135)
    ap.add_argument("--scene", default=None)
    args = ap.parse_args()

    from PIL import Image

    from gpu_pathtracer_tpu.run.renderer import Renderer, enable_compile_cache
    from gpu_pathtracer_tpu.scene.parse import load_scene

    enable_compile_cache()
    h = args.h
    w = h * 16 // 9
    scene = load_scene(args.scene or os.path.join(
        os.path.dirname(__file__), "..", "scenes", "teapot", "scene.json"))
    scene.width, scene.height = w, h
    r = Renderer(scene, cache=False)
    r.render(args.spp)
    img = r.image()[::-1]

    g = np.asarray(Image.open("/root/reference/result/teapot.png")
                   .convert("RGB"), np.float32) / 255.0
    fy, fx = g.shape[0] // h, g.shape[1] // w
    g = g[:fy * h, :fx * w].reshape(h, fy, w, fx, 3).mean((1, 3))
    rmse = float(np.sqrt(((img - g) ** 2).mean()))
    print(f"RMSE {rmse:.4f} at {w}x{h} {args.spp}spp")
    side = np.concatenate([img, g], axis=0)
    Image.fromarray((np.clip(side, 0, 1) * 255).astype(np.uint8)).save(
        "/tmp/teapot_cal.png")
    print("wrote /tmp/teapot_cal.png (ours on top, golden below)")


if __name__ == "__main__":
    main()
