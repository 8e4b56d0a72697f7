"""Render-state checkpoint/resume.

The reference's only persistence is (1) the BVH disk cache
(bvh.cpp:189-218; our analog is the npz cache in geom/bvh.py) and (2) the
in-memory progressive accumulation buffer that a camera move resets
(pathtracer.cu:2521). This module adds the piece the reference lacks: a
durable render checkpoint so long progressive renders survive preemption —
the accumulated film, the iteration counter, the RNG seed, and (for SPPM)
the full per-pixel VisiblePoint statistics, stored as one npz keyed by a
scene fingerprint so a checkpoint is never resumed against a different
scene or config.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import jax.numpy as jnp


def _fingerprint(renderer) -> str:
    """Scene+config fingerprint: resolution, integrator config, and a hash
    of the flattened geometry/material tables."""
    s = renderer.static
    h = hashlib.sha256()
    h.update(json.dumps({
        "w": s.width, "h": s.height, "integrator": int(s.integrator),
        "max_depth": s.max_depth, "seed": renderer.seed,
    }, sort_keys=True).encode())
    d = renderer.device_scene
    for arr in (d.prim_attrs, d.mat_attrs, d.light_attrs):
        h.update(np.asarray(arr).tobytes())
    return h.hexdigest()[:16]


def save_checkpoint(renderer, path: str) -> None:
    """Write film + iteration (+ SPPM state) to `path` (npz)."""
    payload = {
        "fingerprint": np.frombuffer(
            _fingerprint(renderer).encode(), dtype=np.uint8),
        "iteration": np.int64(renderer.iteration),
        "acc": np.asarray(renderer.acc),
    }
    if renderer.kind == "sppm":
        st = renderer._sppm_state
        for name in ("ld", "ind", "beta", "dir", "pos", "nor", "uv",
                     "dpdu", "mat_idx", "tau", "radius", "n", "valid"):
            payload[f"sppm_{name}"] = np.asarray(getattr(st, name))
    if renderer.kind == "ir" and renderer._vpls is not None:
        v = renderer._vpls
        for name in ("beta", "dir", "pos", "nor", "uv", "dpdu", "mat_idx",
                     "pdf0", "count"):
            payload[f"vpl_{name}"] = np.asarray(getattr(v, name))
    if renderer.kind == "mlt" and renderer._mlt_state is not None:
        # full Markov-chain state: without it a resumed MLT render would
        # silently restart its chains against a stale film
        for name, arr in renderer._mlt_state.items():
            payload[f"mlt_{name}"] = np.asarray(arr)
    np.savez_compressed(path, **payload)


def load_checkpoint(renderer, path: str) -> None:
    """Restore a checkpoint written by `save_checkpoint`. Raises ValueError
    on a scene/config mismatch instead of silently blending films."""
    data = np.load(path)
    want = _fingerprint(renderer)
    got = bytes(data["fingerprint"]).decode()
    if got != want:
        raise ValueError(
            f"checkpoint fingerprint {got} does not match scene {want}; "
            "refusing to resume")
    renderer.iteration = int(data["iteration"])
    renderer.acc = jnp.asarray(data["acc"])
    if renderer.kind == "sppm":
        st = renderer._sppm_state
        renderer._sppm_state = st.replace(**{
            name: jnp.asarray(data[f"sppm_{name}"])
            for name in ("ld", "ind", "beta", "dir", "pos", "nor", "uv",
                         "dpdu", "mat_idx", "tau", "radius", "n", "valid")})
    if renderer.kind == "ir" and "vpl_beta" in data:
        from gpu_pathtracer_tpu.integrators.ir import VplStore
        renderer._vpls = VplStore(**{
            name: jnp.asarray(data[f"vpl_{name}"])
            for name in ("beta", "dir", "pos", "nor", "uv", "dpdu",
                         "mat_idx", "pdf0", "count")})
    if renderer.kind == "mlt" and "mlt_u" in data:
        renderer._mlt_state = renderer._place_mlt_state({
            name: jnp.asarray(data[f"mlt_{name}"])
            for name in ("u", "lum", "li", "px", "py", "film",
                         "b_sum", "b_cnt", "steps")})
