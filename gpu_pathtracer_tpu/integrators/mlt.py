"""MLT placeholder, matching the reference's stub.

The reference declares `MLTSampler{}` and an empty `Mlt` kernel
(pathtracer.cu:1973-1983) and its parser accepts "mlt"
(parsescene.cpp:206-209), but the Render dispatch never launches it
(pathtracer.cu:2711-2745) — selecting MLT yields a black frame. This
module reproduces that surface: the scene loads, the renderer runs, and
every iteration contributes zero radiance.
"""

from __future__ import annotations

import jax.numpy as jnp


def render_lanes(scene, static, key, pixel_x, pixel_y):
    """Empty Mlt kernel (pathtracer.cu:1979-1982): no contribution."""
    return jnp.zeros((pixel_x.shape[0], 3), jnp.float32)
