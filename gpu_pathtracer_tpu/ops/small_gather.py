"""Pallas lookup for SMALL tables: per-lane gather without XLA's gather.

XLA lowers gathers to a serialized per-element loop (~130 Melem/s
measured on v5e). For tables that fit a few 128-lane registers there is a
fully vectorized alternative: broadcast each 128-entry group of the table
across sublanes and use the TPU's lane-axis dynamic gather
(`take_along_axis(axis=-1)`, the one shuffle the VPU supports), selecting
between groups by the index's high bits. Cost is O(groups) vector ops per
tile — ~250x faster than the XLA gather for the supervoxel-majorant
lookups in shade/media.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE = 8192
MAX_GROUPS = 256  # tables up to 32768 entries (cost is O(groups))
SMALL_M_XLA = 65536  # below this many gathered elements the XLA gather
                     # beats the Pallas call's fixed cost (read at trace
                     # time; A/B knob)


def _kernel(tab_ref, idx_ref, out_ref, *, n_groups):
    idx = idx_ref[...]
    lo = jnp.remainder(idx, LANES)
    hi = idx // LANES
    acc = jnp.zeros(idx.shape, jnp.float32)
    for g in range(n_groups):
        row = tab_ref[g, :].reshape(1, LANES)
        row8 = jnp.broadcast_to(row, idx.shape)
        part = jnp.take_along_axis(row8, lo, axis=1)
        acc = jnp.where(hi == g, part, acc)
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("n_groups",))
def _lookup(tab, idx2d, *, n_groups):
    n_tiles = idx2d.shape[0] // (TILE // LANES)
    rows = TILE // LANES
    return pl.pallas_call(
        functools.partial(_kernel, n_groups=n_groups),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(idx2d.shape, jnp.float32),
    )(tab, idx2d)


def small_table_lookup(table, idx):
    """table [T] f32 (T <= MAX_GROUPS*128), idx [...] i32 -> values [...].

    Falls back to jnp.take off-TPU. Out-of-range indices are the caller's
    responsibility (clip first).
    """
    if jax.default_backend() != "tpu":
        return jnp.take(table, idx, axis=0)
    m_total = 1
    for s in idx.shape:
        m_total *= s
    if m_total <= SMALL_M_XLA:
        # small batch: XLA's serialized gather (~130 Melem/s => <=0.5 ms)
        # beats the Pallas call's ~1.3-2 ms fixed cost, and fuses
        return jnp.take(table, idx, axis=0)
    t = table.shape[0]
    n_groups = (t + LANES - 1) // LANES
    assert n_groups <= MAX_GROUPS, f"table too large: {t}"
    tab = jnp.pad(table, (0, n_groups * LANES - t)).reshape(n_groups, LANES)
    shape = idx.shape
    flat = idx.reshape(-1)
    m = flat.shape[0]
    m_pad = (m + TILE - 1) // TILE * TILE
    flat = jnp.pad(flat, (0, m_pad - m)).reshape(-1, LANES)
    out = _lookup(tab, flat, n_groups=n_groups)
    return out.reshape(-1)[:m].reshape(shape)
