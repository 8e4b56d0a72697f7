"""Where does the bilinear texel fetch cost go on TPU?

Times, inside ONE jit with keyed reps (result-cache-proof):
- the raw corner-packed row gather ([T, 32] table, 262k rows)
- the full new get_texel (corner-packed)
- the old element-gather formulation (12 jnp.takes)
across table sizes (a 64^2 checker vs a 512^2-scale table).

    python tools/bench_texel.py
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.run.renderer import enable_compile_cache
enable_compile_cache()

N = 512 * 512
K = 16


def timed(fn, *args):
    jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


def main():
    from types import SimpleNamespace

    rs = np.random.RandomState(0)
    for texn in (64, 512):
        T = texn * texn
        data = rs.randint(0, 256, (T, 3)).astype(np.uint8)
        corners = rs.rand(T, 32).astype(np.float32)
        scene = SimpleNamespace(
            m_diffuse=jnp.asarray(np.ones((4, 3), np.float32)),
            m_tex_idx=jnp.asarray([0, 0, 0, 0], jnp.int32),
            tex_data=jnp.asarray(data),
            tex_offset=jnp.asarray([0], jnp.int32),
            tex_w=jnp.asarray([texn], jnp.int32),
            tex_h=jnp.asarray([texn], jnp.int32),
            tex_corners=jnp.asarray(corners),
        )
        uv = jnp.asarray(rs.rand(N, 2).astype(np.float32) * 2.0)
        mat = jnp.asarray(rs.randint(0, 4, N).astype(np.int32))

        @jax.jit
        def raw_gather(uv, k0):
            def step(acc, k):
                idx = (jnp.arange(N) * 40503 + k) % T
                return acc + scene.tex_corners[idx].sum(-1), 0
            acc, _ = jax.lax.scan(step, jnp.zeros(N), k0 + jnp.arange(K))
            return acc

        @jax.jit
        def new_fetch(uv, k0):
            from gpu_pathtracer_tpu.shade.texture import get_texel
            def step(acc, k):
                u = (uv + k * 0.001) % 1.0
                return acc + get_texel(scene, mat, u, True), 0
            acc, _ = jax.lax.scan(step, jnp.zeros((N, 3)),
                                  k0 + jnp.arange(K))
            return acc

        @jax.jit
        def old_fetch(uv, k0):
            from gpu_pathtracer_tpu.shade.texture import _texel
            def step(acc, k):
                u = (uv + k * 0.001) % 1.0
                w = jnp.take(scene.tex_w, mat * 0, axis=0)
                h = jnp.take(scene.tex_h, mat * 0, axis=0)
                xx = w.astype(jnp.float32) * u[..., 0]
                yy = h.astype(jnp.float32) * u[..., 1]
                x = jnp.floor(xx).astype(jnp.int32)
                y = jnp.floor(yy).astype(jnp.int32)
                dx = jnp.abs(xx - x)[..., None]
                dy = jnp.abs(yy - y)[..., None]
                c00 = _texel(scene, mat * 0, w, h, x, y)
                c10 = _texel(scene, mat * 0, w, h, x + 1, y)
                c01 = _texel(scene, mat * 0, w, h, x, y + 1)
                c11 = _texel(scene, mat * 0, w, h, x + 1, y + 1)
                t = (1 - dy) * ((1 - dx) * c00 + dx * c10) \
                    + dy * ((1 - dx) * c01 + dx * c11)
                return acc + t, 0
            acc, _ = jax.lax.scan(step, jnp.zeros((N, 3)),
                                  k0 + jnp.arange(K))
            return acc

        k0 = jnp.int32(1)
        print(f"table {texn}^2 ({T} rows):", flush=True)
        print(f"  raw x32 row gather : {timed(raw_gather, uv, k0):7.3f} ms")
        print(f"  get_texel (corner) : {timed(new_fetch, uv, k0):7.3f} ms")
        print(f"  get_texel (old 12x): {timed(old_fetch, uv, k0):7.3f} ms")


if __name__ == "__main__":
    main()
