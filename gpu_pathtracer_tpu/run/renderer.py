"""Progressive renderer driver: the TPU analog of BeginRender/Render/display.

Owns the device scene, the accumulation film, and the jitted per-iteration
lane programs. Pixels are processed in fixed-size tiles (static shapes under
jit); one `render_iteration` call adds one sample per pixel, mirroring the
reference's progressive display loop (main.cpp:178-202, pathtracer.cu:
2705-2750).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from gpu_pathtracer_tpu.core.rng import iteration_key
from gpu_pathtracer_tpu.film import film as film_mod
from gpu_pathtracer_tpu.scene.flatten import flatten_scene
from gpu_pathtracer_tpu.scene.model import HostScene, IntegratorType
from gpu_pathtracer_tpu.scene.parse import load_scene

DEFAULT_TILE = 1 << 16


def lane_program(integrator: IntegratorType):
    """Integrator dispatch (pathtracer.cu:2711-2745).

    Returns (kind, fn): kind "pixel" maps lanes to pixels
    (fn(scene, static, key, px, py) -> [N, 3]); kind "film" traces
    lane-many paths and returns a whole splatted film
    (fn(scene, static, key, n_paths) -> [W*H, 3]); kind "hybrid" does both
    (fn(scene, static, key, px, py, mask) -> ([N, 3], [W*H, 3])).
    """
    from gpu_pathtracer_tpu.integrators import ao, pt
    if integrator == IntegratorType.AO:
        return "pixel", ao.render_lanes
    if integrator == IntegratorType.PT:
        return "pixel", pt.render_lanes
    if integrator == IntegratorType.VPT:
        from gpu_pathtracer_tpu.integrators import vpt
        return "pixel", vpt.render_lanes
    if integrator == IntegratorType.LT:
        from gpu_pathtracer_tpu.integrators import lt
        return "film", lt.render_film
    if integrator == IntegratorType.BDPT:
        from gpu_pathtracer_tpu.integrators import bdpt
        return "hybrid", bdpt.render_lanes
    raise NotImplementedError(f"integrator {integrator!r} not yet built")


class Renderer:
    def __init__(self, scene: HostScene | str, tile_size: int = DEFAULT_TILE,
                 seed: int = 0, cache: bool = True,
                 integrator: IntegratorType | None = None,
                 max_depth: int | None = None):
        if isinstance(scene, str):
            scene = load_scene(scene)
        self.host = scene
        self.device_scene, self.static = flatten_scene(scene, cache=cache)
        if integrator is not None or max_depth is not None:
            import dataclasses
            repl = {}
            if integrator is not None:
                repl["integrator"] = integrator
            if max_depth is not None:
                repl["max_depth"] = max_depth
            self.static = dataclasses.replace(self.static, **repl)
        self.width = self.static.width
        self.height = self.static.height
        self.seed = seed
        n = self.width * self.height
        self.tile_size = min(tile_size, n)
        self.n_tiles = (n + self.tile_size - 1) // self.tile_size

        # pixel coordinates per tile (y=0 is the bottom row, like the
        # reference's GL-oriented film)
        ids = np.arange(self.n_tiles * self.tile_size) % n
        self._px = jnp.asarray((ids % self.width).astype(np.int32)
                               .reshape(self.n_tiles, self.tile_size))
        self._py = jnp.asarray((ids // self.width).astype(np.int32)
                               .reshape(self.n_tiles, self.tile_size))
        self._mask = jnp.asarray(
            (np.arange(self.n_tiles * self.tile_size) < n)
            .reshape(self.n_tiles, self.tile_size))

        self.acc = jnp.zeros((n, 3), jnp.float32)
        self.iteration = 0

        self.kind, program = lane_program(self.static.integrator)
        static = self.static

        # one jitted program per TILE (compiled once, reused for every
        # tile and iteration) — compiling all tiles into a single graph
        # multiplies compile time by n_tiles for zero runtime gain
        if self.kind == "pixel":
            @jax.jit
            def tile_step(dscene, key, px, py):
                return program(dscene, static, key, px, py)
        elif self.kind == "hybrid":
            @jax.jit
            def tile_step(dscene, key, px, py, mask):
                return program(dscene, static, key, px, py, mask)
        else:
            @jax.jit
            def tile_step(dscene, key):
                return program(dscene, static, key, self.tile_size)

        self._tile_step = tile_step

    def render_iteration(self) -> None:
        """Add one sample per pixel to the accumulation film."""
        self.iteration += 1
        n = self.width * self.height
        key = iteration_key(self.seed, jnp.int32(self.iteration))
        if self.kind == "pixel":
            tiles = []
            for t in range(self.n_tiles):
                tile_key = jax.random.fold_in(key, t)
                li = self._tile_step(self.device_scene, tile_key,
                                     self._px[t], self._py[t])
                tiles.append(jnp.where(self._mask[t][:, None], li, 0.0))
            img = jnp.concatenate(tiles, axis=0)[:n] if len(tiles) > 1 \
                else tiles[0][:n]
        elif self.kind == "hybrid":
            # per-pixel strategies land on the lane's own pixel; s==1
            # splats land on a shared film (Bdpt, pathtracer.cu:1952-1967)
            img = jnp.zeros((n, 3), jnp.float32)
            for t in range(self.n_tiles):
                tile_key = jax.random.fold_in(key, t)
                li, film = self._tile_step(self.device_scene, tile_key,
                                           self._px[t], self._py[t],
                                           self._mask[t])
                li = jnp.where(self._mask[t][:, None], li, 0.0)
                pix = (self._px[t] + self._py[t] * self.width)
                img = img + film
                img = img.at[jnp.where(self._mask[t], pix, 0)].add(li)
        else:
            # film-splat integrators (LT/BDPT): each tile traces
            # tile_size paths and returns a full film; the reference uses
            # exactly W*H paths per frame, so normalize by path count
            img = jnp.zeros((n, 3), jnp.float32)
            for t in range(self.n_tiles):
                tile_key = jax.random.fold_in(key, t)
                img = img + self._tile_step(self.device_scene, tile_key)
            img = img * (n / (self.n_tiles * self.tile_size))
        self.acc = self.acc + img

    def render(self, spp: int) -> np.ndarray:
        for _ in range(spp):
            self.render_iteration()
        return self.image()

    def reset(self) -> None:
        """Camera moved / restart accumulation (pathtracer.cu:2521)."""
        self.acc = jnp.zeros_like(self.acc)
        self.iteration = 0

    def radiance(self) -> np.ndarray:
        """Mean radiance film [H, W, 3] (row 0 = bottom), pre-tonemap."""
        acc = np.asarray(self.acc).reshape(self.height, self.width, 3)
        return acc / max(self.iteration, 1)

    def image(self) -> np.ndarray:
        """Tonemapped display image [H, W, 3] (row 0 = bottom)."""
        img = film_mod.tonemap(self.acc, jnp.float32(self.iteration),
                               self.static.filmic)
        return np.asarray(img).reshape(self.height, self.width, 3)
