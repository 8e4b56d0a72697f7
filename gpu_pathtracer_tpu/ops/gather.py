"""TPU-native table lookup: one-hot matmul on the MXU for small tables.

XLA's gather op runs element-at-a-time on TPU (~2 GB/s effective —
measured); a one-hot [N, P] @ [P, D] matmul at HIGHEST precision is
bit-exact row selection and runs ~30x faster for P <= ~1024. All scene
attribute lookups (hit attributes, materials, lights) go through
`take_rows` on packed [P, D] float32 tables; integer columns are stored as
exactly-representable floats (|v| < 2^24) and cast back after the fetch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ONEHOT_MAX = 1024


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows: table [P, D] f32, idx [N] int -> [N, D] f32.

    idx must be in [0, P). Uses the MXU one-hot path for small P (exact),
    falling back to XLA gather for large tables.
    """
    P = table.shape[0]
    if P <= ONEHOT_MAX:
        oh = (idx[:, None] == jnp.arange(P, dtype=idx.dtype)[None, :]
              ).astype(jnp.float32)
        return jnp.dot(oh, table, precision=jax.lax.Precision.HIGHEST)
    return jnp.take(table, idx, axis=0)


def f2i(col: jnp.ndarray) -> jnp.ndarray:
    """Float-packed integer column -> int32 (values exact in f32)."""
    return col.astype(jnp.int32)
