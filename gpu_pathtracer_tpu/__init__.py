"""gpu_pathtracer_tpu — a TPU-native physically based renderer in JAX.

A ground-up rebuild of the capabilities of brickray/gpu-pathtracer (a CUDA
megakernel path tracer) as an idiomatic TPU wavefront renderer:

- Scene ingest (JSON schema compatible with the reference, OBJ meshes,
  textures, density grids) happens on the host in numpy / C++.
- A SAH BVH is built on the host (C++ fast path, numpy fallback) and
  flattened into SoA device arrays.
- Integrators (AO, PT, VPT, LT, BDPT, SPPM, IR) are wavefront programs:
  fixed-shape ray/path-state arrays, `lax.scan` over bounces, pure-jnp
  shading, and vectorized BVH traversal.
- Multi-chip scaling shards pixels/samples over a `jax.sharding.Mesh`
  with film reduction via collectives (no atomics needed — everything is
  a deterministic reduction).

Reference behavior citations throughout point at /root/reference (file:line).
"""

__version__ = "0.1.0"

from gpu_pathtracer_tpu.scene.parse import load_scene  # noqa: F401
