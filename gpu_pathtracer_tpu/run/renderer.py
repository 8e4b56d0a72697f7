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
    if integrator == IntegratorType.SPPM:
        from gpu_pathtracer_tpu.integrators import sppm
        return "sppm", sppm.render_iteration
    if integrator == IntegratorType.IR:
        from gpu_pathtracer_tpu.integrators import ir
        return "ir", ir.render_lanes
    if integrator == IntegratorType.MLT:
        # stub parity: the reference's Mlt kernel is empty and never
        # dispatched (pathtracer.cu:1973-1983, 2711-2745)
        from gpu_pathtracer_tpu.integrators import mlt
        return "pixel", mlt.render_lanes
    raise NotImplementedError(f"integrator {integrator!r} not yet built")


class Renderer:
    def __init__(self, scene: HostScene | str, tile_size: int = DEFAULT_TILE,
                 seed: int = 0, cache: bool = True,
                 integrator: IntegratorType | None = None,
                 max_depth: int | None = None,
                 photons_per_iteration: int | None = None,
                 init_radius: float | None = None):
        if isinstance(scene, str):
            scene = load_scene(scene)
        self.host = scene
        self.device_scene, self.static = flatten_scene(scene, cache=cache)
        import dataclasses
        repl = {}
        if integrator is not None:
            repl["integrator"] = integrator
        if max_depth is not None:
            repl["max_depth"] = max_depth
        if photons_per_iteration is not None:
            repl["photons_per_iteration"] = photons_per_iteration
        if init_radius is not None:
            repl["init_radius"] = init_radius
        if repl:
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

        if self.kind == "sppm":
            # SPPM couples all pixels through the photon grid: runs
            # untiled, keeps persistent per-pixel VisiblePoint state, and
            # its film is absolute, not accumulated (pathtracer.cu:
            # 2524-2527)
            from gpu_pathtracer_tpu.integrators import sppm as sppm_mod
            self._sppm_state = sppm_mod.init_state(
                n, self.static.init_radius)
            px = jnp.asarray(np.arange(n, dtype=np.int32) % self.width)
            py = jnp.asarray(np.arange(n, dtype=np.int32) // self.width)

            @jax.jit
            def sppm_step(dscene, state, key, iteration):
                return program(dscene, static, key, state, iteration,
                               px, py)

            self._sppm_step = sppm_step
            return

        # one jitted program per TILE (compiled once, reused for every
        # tile and iteration) — compiling all tiles into a single graph
        # multiplies compile time by n_tiles for zero runtime gain
        if self.kind == "ir":
            # VPL sets are regenerated every IR_MAX_VPLS iterations and one
            # row is gathered per frame (pathtracer.cu:2739-2744)
            from gpu_pathtracer_tpu.integrators import ir as ir_mod
            self._vpls = None
            self._gen_vpls = jax.jit(
                lambda dscene, key: ir_mod.generate_vpls(dscene, static,
                                                         key))

            @jax.jit
            def tile_step(dscene, key, px, py, vpls, vpl_iter):
                return program(dscene, static, key, px, py, vpls, vpl_iter)
        elif self.kind == "pixel":
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
        if self.kind == "sppm":
            self._sppm_state, film = self._sppm_step(
                self.device_scene, self._sppm_state, key,
                jnp.int32(self.iteration))
            self.acc = film  # absolute, already divided by iteration
            return
        if self.kind == "ir":
            from gpu_pathtracer_tpu.integrators import ir as ir_mod
            slot = (self.iteration - 1) % ir_mod.IR_MAX_VPLS
            if slot == 0 or self._vpls is None:
                self._vpls = self._gen_vpls(
                    self.device_scene, jax.random.fold_in(key, 777))
            tiles = []
            for t in range(self.n_tiles):
                tile_key = jax.random.fold_in(key, t)
                li = self._tile_step(self.device_scene, tile_key,
                                     self._px[t], self._py[t],
                                     self._vpls, jnp.int32(slot))
                tiles.append(jnp.where(self._mask[t][:, None], li, 0.0))
            img = jnp.concatenate(tiles, axis=0)[:n] if len(tiles) > 1 \
                else tiles[0][:n]
        elif self.kind == "pixel":
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
        if self.kind == "sppm":
            from gpu_pathtracer_tpu.integrators import sppm as sppm_mod
            self._sppm_state = sppm_mod.init_state(
                self.width * self.height, self.static.init_radius)

    def radiance(self) -> np.ndarray:
        """Mean radiance film [H, W, 3] (row 0 = bottom), pre-tonemap."""
        acc = np.asarray(self.acc).reshape(self.height, self.width, 3)
        if self.kind == "sppm":
            return acc
        return acc / max(self.iteration, 1)

    def image(self) -> np.ndarray:
        """Tonemapped display image [H, W, 3] (row 0 = bottom)."""
        it = 1 if self.kind == "sppm" else self.iteration
        img = film_mod.tonemap(self.acc, jnp.float32(it),
                               self.static.filmic)
        return np.asarray(img).reshape(self.height, self.width, 3)
