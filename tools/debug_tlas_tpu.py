"""Minimal TPU repro: instanced packet walk vs interpret mode.

    python tools/debug_tlas_tpu.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.run.renderer import enable_compile_cache
enable_compile_cache()
from gpu_pathtracer_tpu.scene.parse import load_scene
from gpu_pathtracer_tpu.scene.flatten import flatten_scene
from gpu_pathtracer_tpu.geom import packet_tpu


def main():
    host = load_scene("/root/repo/scenes/dragon_forest/scene.json")
    dev, static = flatten_scene(host)
    print("n_inst", static.bvh8_n_inst, "tlas", static.bvh8_tlas_rows)
    rs = np.random.RandomState(5)
    n = 4096
    ro = rs.uniform(-1, 1, (n, 3)).astype(np.float32) \
        + np.array([0, 1.0, 3.0], np.float32)
    rd = np.array([0, 0.9, 0], np.float32)[None] \
        + rs.normal(size=(n, 3)).astype(np.float32) * 0.3 - ro * 0.25
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = jnp.asarray(ro)
    rd = jnp.asarray(rd)

    ti, pi, fi = jax.block_until_ready(packet_tpu.packet_traverse(
        dev, static, ro, rd, 1e-3, jnp.inf, any_hit=False, interpret=True))
    print("interpret: hits", int(fi.sum()), "t_mean",
          float(jnp.where(fi, ti, 0).sum()) / max(int(fi.sum()), 1))
    tk, pk, fk = jax.block_until_ready(packet_tpu.packet_traverse(
        dev, static, ro, rd, 1e-3, jnp.inf, any_hit=False))
    print("kernel   : hits", int(fk.sum()), "t_mean",
          float(jnp.where(fk, tk, 0).sum()) / max(int(fk.sum()), 1))
    same = np.asarray(fi) == np.asarray(fk)
    print("found agreement", same.mean())
    both = np.asarray(fi) & np.asarray(fk)
    if both.any():
        dt = np.abs(np.asarray(ti) - np.asarray(tk))[both]
        pid = (np.asarray(pi) == np.asarray(pk))[both]
        print("t maxdiff", dt.max(), "pid agreement", pid.mean())

    # any-hit (shadow) with finite tmax — the NEE regime
    tmax = jnp.full(ro.shape[0], 2.0, jnp.float32)
    _, _, ai = jax.block_until_ready(packet_tpu.packet_traverse(
        dev, static, ro, rd, 1e-3, tmax, any_hit=True, interpret=True))
    _, _, ak = jax.block_until_ready(packet_tpu.packet_traverse(
        dev, static, ro, rd, 1e-3, tmax, any_hit=True))
    print("any-hit interpret blocked", int(ai.sum()),
          "kernel blocked", int(ak.sum()),
          "agreement", float((np.asarray(ai) == np.asarray(ak)).mean()))


if __name__ == "__main__":
    main()
