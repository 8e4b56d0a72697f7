"""Multi-chip rendering: shard pixels/samples over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2 checklist); this module
is the TPU-native scale-out design it never had:

- **Data parallelism over pixels**: the lane axis (pixel-samples) is
  sharded across a 1-D `Mesh(("lanes",))`; the scene pytree is replicated
  (read-only in HBM on every chip).
- **Film reduction**: each device accumulates its own pixel shard, so the
  per-iteration image concatenates without communication. Sample-split
  mode (same pixels, different seeds on each device) instead reduces with
  `psum` — the deterministic replacement for the reference's atomicAdd
  splatting, and the path LT/BDPT use.
- Everything goes through `jax.jit` with `NamedSharding` constraints; XLA
  inserts the collectives (ICI within a slice, DCN across hosts).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def lane_mesh(devices=None) -> Mesh:
    """1-D device mesh over the lane (pixel/sample) axis."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), ("lanes",))


def shard_lanes(mesh: Mesh, *arrays):
    """Place lane-major arrays so dim 0 is split across the mesh."""
    out = []
    for a in arrays:
        spec = P("lanes", *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out) if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (the scene) across every device in the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def make_sharded_step(program, static, mesh: Mesh, n_lanes: int):
    """Build a jitted render step where lanes are device-sharded.

    `program(scene, static, key, px, py) -> [N, 3]` is any integrator's
    lane function. Returns (step, n_padded) where
    `step(scene, acc, key, px, py) -> acc + radiance` runs one iteration
    with `acc`, `px`, `py` sharded along dim 0 and the scene replicated.
    """
    n_dev = mesh.devices.size
    n_padded = round_up(n_lanes, n_dev)
    lane_sharding = NamedSharding(mesh, P("lanes"))
    lane3_sharding = NamedSharding(mesh, P("lanes", None))

    @jax.jit
    def step(scene, acc, key, px, py):
        px = jax.lax.with_sharding_constraint(px, lane_sharding)
        py = jax.lax.with_sharding_constraint(py, lane_sharding)
        li = program(scene, static, key, px, py)
        li = jax.lax.with_sharding_constraint(li, lane3_sharding)
        return acc + li

    return step, n_padded


def lane_spec(ndim: int) -> P:
    """PartitionSpec splitting dim 0 over the lane axis."""
    return P("lanes", *([None] * (ndim - 1)))


def constrain_lanes(mesh: Mesh, x):
    """Inside jit: pin dim 0 of x across the mesh (GSPMD constraint)."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, lane_spec(x.ndim)))


def constrain_replicated(mesh: Mesh, x):
    """Inside jit: pin x replicated — after a sharded film scatter this is
    where XLA inserts the cross-device all-reduce (the deterministic
    replacement for the reference's atomicAdd splatting,
    pathtracer.cu:1320-1322)."""
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))


def psum_film(mesh: Mesh, films):
    """Reduce per-tile films [T, WH, 3] (tile axis device-sharded) to one
    film [WH, 3]. Under GSPMD the sharded-axis sum lowers to local sums +
    an ICI all-reduce — the actual cross-device film psum used by the
    LT/BDPT/SPPM paths."""
    return constrain_replicated(mesh, jnp.sum(films, axis=0))
