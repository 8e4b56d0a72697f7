"""Knockout anatomy for SPPM on TPU (VERDICT r4 ask #1).

Times each pass (eye, grid, photon, density) as its own jitted call with
keyed iterations, same-process, min-of-reps. Usage:
  python tools/bench_sppm_passes.py [size] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return min(ts), out


if __name__ == "__main__":
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpu_pathtracer_tpu.integrators import sppm
    from gpu_pathtracer_tpu.run.renderer import enable_compile_cache
    from gpu_pathtracer_tpu.scene.flatten import flatten_scene
    from gpu_pathtracer_tpu.scene.model import IntegratorType
    from gpu_pathtracer_tpu.scene.parse import load_scene
    enable_compile_cache()

    host = load_scene("/root/reference/scenes/cornell_box/scene.json")
    host.width = host.height = size
    dev, static = flatten_scene(host)
    static = dataclasses.replace(static, integrator=IntegratorType.SPPM,
                                 width=size, height=size)
    n = size * size
    px = jnp.asarray(np.arange(n, dtype=np.int32) % size)
    py = jnp.asarray(np.arange(n, dtype=np.int32) // size)
    key = jax.random.PRNGKey(1)
    state = sppm.init_state(n, static.init_radius)
    print(f"# size={size} n={n} photons={static.photons_per_iteration} "
          f"depth={static.max_depth} r_init={static.init_radius}",
          flush=True)

    eye = jax.jit(lambda st, k: sppm.eye_pass(dev, static, k, px, py, st,
                                              jnp.int32(1)))
    t_eye, state = timeit(eye, state, key, reps=reps)
    print(f"# eye_pass: {t_eye*1e3:.1f} ms", flush=True)

    grid_fn = jax.jit(lambda st: sppm.build_grid(st, n))
    t_grid, grid = timeit(grid_fn, state, reps=reps)
    print(f"# build_grid: {t_grid*1e3:.1f} ms", flush=True)

    # bucket stats (host side)
    sorted_vp, bucket_start, bmin, bmax, res = map(np.asarray, grid)
    blen = np.diff(bucket_start)
    print(f"# grid res={res} buckets: nonzero={np.count_nonzero(blen)} "
          f"mean={blen[blen > 0].mean():.1f} p50={np.percentile(blen[blen > 0], 50):.0f} "
          f"p99={np.percentile(blen[blen > 0], 99):.0f} max={blen.max()}",
          flush=True)
    # per-photon pair-work estimate: photons land in cells ~ uniformly
    # over VP cells; the real number comes from the photon pass itself

    ph = jax.jit(lambda st, k: sppm.photon_pass(
        dev, static, k, st, grid, static.photons_per_iteration, n))
    t_ph, (phi, m) = timeit(ph, state, key, reps=reps)
    print(f"# photon_pass: {t_ph*1e3:.1f} ms  (total deposits M={float(jnp.sum(m)):.0f})",
          flush=True)

    dens = jax.jit(lambda st, pm: sppm.density_pass(
        st, pm[0], pm[1], jnp.int32(1), static.photons_per_iteration))
    t_d, _ = timeit(dens, state, (phi, m), reps=reps)
    print(f"# density_pass: {t_d*1e3:.1f} ms", flush=True)
