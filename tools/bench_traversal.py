"""Raw traversal throughput: resident vs streamed packet kernel on the
100k-tri dragon (real TPU), with cross-checks between modes.

    python tools/bench_traversal.py
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from gpu_pathtracer_tpu.run.renderer import enable_compile_cache
enable_compile_cache()
from gpu_pathtracer_tpu.scene.parse import load_scene
from gpu_pathtracer_tpu.scene.flatten import flatten_scene
from gpu_pathtracer_tpu.integrators.common import primary_rays
from gpu_pathtracer_tpu.core.rng import RngStream
from gpu_pathtracer_tpu.geom import packet_tpu

host = load_scene("/root/repo/scenes/dragon/scene.json")
host.width = host.height = 512
dev, static = flatten_scene(host)
n = 512 * 512
ids = np.arange(n)
px = jnp.asarray((ids % 512).astype(np.int32))
py = jnp.asarray((ids // 512).astype(np.int32))

@jax.jit
def rays_primary(scene, key):
    rng = RngStream(key)
    return primary_rays(scene, static, rng, px, py)

@jax.jit
def rays_random(key):
    k1, k2 = jax.random.split(key)
    ro = jax.random.uniform(k1, (n, 3), minval=-0.9, maxval=0.9) \
        + jnp.array([0.0, 1.0, 0.0])
    rd = jax.random.normal(k2, (n, 3))
    return ro, rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

cases = {"primary": rays_primary(dev, jax.random.PRNGKey(0)),
         "random": rays_random(jax.random.PRNGKey(1))}

ref = {}
for mode, forced in [("resident", False), ("streamed", True)]:
    for name, (ro, rd) in cases.items():
        t, p, f = packet_tpu.packet_traverse(dev, static, ro, rd, 1e-3,
                                             jnp.inf, False,
                                             force_streamed=forced)
        t.block_until_ready()
        t0 = time.time()
        for _ in range(3):
            t, p, f = packet_tpu.packet_traverse(dev, static, ro, rd, 1e-3,
                                                 jnp.inf, False,
                                                 force_streamed=forced)
        t.block_until_ready()
        dt = (time.time() - t0) / 3
        key = (name,)
        if mode == "resident":
            ref[key] = (np.asarray(t), np.asarray(p))
        else:
            rt, rp = ref[key]
            ok = np.allclose(rt, np.asarray(t), rtol=1e-5) and \
                (rp == np.asarray(p)).mean() > 0.999
            print(f"   match vs resident: {ok}")
        print(f"{mode:9s} {name:8s}: {dt*1e3:7.2f} ms = "
              f"{n/dt/1e6:6.1f} Mrays/s (hit {int(jnp.sum(f))})", flush=True)
