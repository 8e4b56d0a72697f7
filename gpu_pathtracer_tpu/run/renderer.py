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

# one 1024^2 frame per tile: per-call fixed costs (pallas launch, scan
# plumbing) dominate below ~1M lanes, and lane state is small enough that
# HBM holds a full frame; pass a smaller --tile for BDPT at high depth
DEFAULT_TILE = 1 << 20


def enable_compile_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache.

    XLA/Mosaic compiles of the render programs cost minutes on TPU (and
    are wildly variable through a shared compile service); the cache
    makes every run after the first start in seconds. The analog of the
    reference's bvh.cache disk cache (bvh.cpp:189-218), but for compiled
    programs instead of the accelerator tree."""
    import os
    if path is None:
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "gpu_pathtracer_tpu", "jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


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
        # the reference's Mlt kernel is an empty stub it never dispatches
        # (pathtracer.cu:1973-1983, 2711-2745); ours is a real PSSMLT
        # (integrators/mlt.py) with persistent chain state
        from gpu_pathtracer_tpu.integrators import mlt
        return "mlt", mlt.render_iteration
    raise NotImplementedError(f"integrator {integrator!r} not yet built")


class Renderer:
    def __init__(self, scene: HostScene | str, tile_size: int = DEFAULT_TILE,
                 seed: int = 0, cache: bool = True,
                 integrator: IntegratorType | None = None,
                 max_depth: int | None = None,
                 photons_per_iteration: int | None = None,
                 init_radius: float | None = None,
                 shard: bool = False, devices=None):
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
        self.kind, program = lane_program(self.static.integrator)

        # multi-chip: lane axis sharded over a 1-D mesh (SURVEY.md §2
        # SPMD checklist). The program stays the GLOBAL single-device
        # computation — GSPMD splits it, so enabling sharding never
        # changes the rendered image (bit-exact for pixel kinds; film
        # splat kinds differ only in reduction order).
        self.mesh = None
        if shard:
            devs = jax.devices() if devices is None else devices
            if len(devs) > 1:
                from gpu_pathtracer_tpu.parallel import dist
                self.mesh = dist.lane_mesh(devs)
                if self.kind == "film":
                    # LT generates its lanes internally, so the TILE axis
                    # is the sharded one: exactly one tile per device
                    self.tile_size = dist.round_up(
                        (n + len(devs) - 1) // len(devs), 8)
                else:
                    # lanes per tile must split evenly across devices
                    self.tile_size = dist.round_up(
                        min(tile_size, n), len(devs))
        if self.mesh is None:
            self.tile_size = min(tile_size, n)
        self.n_tiles = (n + self.tile_size - 1) // self.tile_size
        if self.mesh is not None and self.kind == "film":
            self.n_tiles = self.mesh.devices.size

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

        static = self.static

        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from gpu_pathtracer_tpu.parallel import dist
            # scene replicated on every chip; per-tile lane arrays split
            # along the lane dim; the film kept replicated (it is the
            # cross-device reduction target)
            self.device_scene = dist.replicate(mesh, self.device_scene)
            tile_sh = NamedSharding(mesh, P(None, "lanes"))
            self._px = jax.device_put(self._px, tile_sh)
            self._py = jax.device_put(self._py, tile_sh)
            self._mask = jax.device_put(self._mask, tile_sh)
            self.acc = jax.device_put(self.acc, NamedSharding(mesh, P()))

            def c_lanes(x):
                return dist.constrain_lanes(mesh, x)

            def c_rep(x):
                return dist.constrain_replicated(mesh, x)
        else:
            def c_lanes(x):
                return x

            def c_rep(x):
                return x

        if self.kind == "mlt":
            # PSSMLT: persistent Markov-chain state (one chain per
            # pixel-count lane), absolute film like SPPM. Mutation steps
            # run untiled: one step = one PT iteration's worth of rays.
            from gpu_pathtracer_tpu.integrators import mlt as mlt_mod
            self._mlt_state = None   # bootstrapped on first iteration
            self._mlt_boot = jax.jit(functools.partial(
                mlt_mod.bootstrap, static=static, n_chains=n))

            if mesh is not None:
                # chains shard over the mesh: u is [D, N] (lanes on axis
                # 1), lum/li/px/py are lane-major, film + the b statistics
                # are the cross-device reduction targets (replicated)
                from jax.sharding import NamedSharding, PartitionSpec as P
                from gpu_pathtracer_tpu.parallel import dist as dist_mod

                def _mlt_spec(name, a):
                    if name == "u":
                        return P(None, "lanes")
                    if name in ("lum", "li", "px", "py"):
                        return dist_mod.lane_spec(a.ndim)
                    return P()

                def place_mlt(state):
                    return {k: jax.device_put(
                        v, NamedSharding(mesh, _mlt_spec(k, v)))
                        for k, v in state.items()}

                def c_mlt(state):
                    return {k: jax.lax.with_sharding_constraint(
                        v, NamedSharding(mesh, _mlt_spec(k, v)))
                        for k, v in state.items()}
            else:
                def place_mlt(state):
                    return state

                def c_mlt(state):
                    return state
            self._place_mlt_state = place_mlt

            @jax.jit
            def mlt_step(dscene, state, key):
                state, film = program(dscene, static, key, c_mlt(state))
                return c_mlt(state), c_rep(film)

            self._mlt_step = mlt_step
            return

        if self.kind == "sppm":
            # SPPM couples all pixels through the photon grid: runs
            # untiled, keeps persistent per-pixel VisiblePoint state, and
            # its film is absolute, not accumulated (pathtracer.cu:
            # 2524-2527)
            from gpu_pathtracer_tpu.integrators import sppm as sppm_mod
            px = jnp.asarray(np.arange(n, dtype=np.int32) % self.width)
            py = jnp.asarray(np.arange(n, dtype=np.int32) // self.width)
            shard_sppm = mesh is not None and n % mesh.devices.size == 0
            if shard_sppm:
                # pixel (visible-point) state and camera lanes shard over
                # the mesh; the photon pass's lanes and the grid
                # interaction pick up shardings from GSPMD propagation,
                # with collectives at the sort/gather boundaries
                from jax.sharding import NamedSharding, PartitionSpec as P
                from gpu_pathtracer_tpu.parallel import dist as dist_mod
                lane_sh = NamedSharding(mesh, P("lanes"))
                px = jax.device_put(px, lane_sh)
                py = jax.device_put(py, lane_sh)
                self._place_sppm_state = lambda s: jax.tree_util.tree_map(
                    lambda a: jax.device_put(
                        a, NamedSharding(mesh, dist_mod.lane_spec(a.ndim))),
                    s)
            else:
                self._place_sppm_state = lambda s: s
            self._sppm_state = self._place_sppm_state(
                sppm_mod.init_state(n, self.static.init_radius))

            @jax.jit
            def sppm_step(dscene, state, key, iteration):
                state, film = program(dscene, static, key, state, iteration,
                                      px, py)
                if shard_sppm:
                    state = jax.tree_util.tree_map(c_lanes, state)
                    film = c_rep(film)
                return state, film

            self._sppm_step = sppm_step
            return

        # ONE jitted step per iteration: the tile loop is a lax.scan
        # INSIDE the jit (body compiled once), and the key derivation,
        # masking and film accumulation are fused in. Under the tunneled
        # TPU backend every eager dispatch costs ~10s of ms of latency, so
        # an iteration must be exactly one device call.
        if self.kind == "ir":
            # VPL sets are regenerated every IR_MAX_VPLS iterations and one
            # row is gathered per frame (pathtracer.cu:2739-2744)
            from gpu_pathtracer_tpu.integrators import ir as ir_mod
            self._vpls = None
            self._gen_vpls = jax.jit(
                lambda dscene, key: ir_mod.generate_vpls(dscene, static,
                                                         key))
            px, py, mask = self._px, self._py, self._mask

            @jax.jit
            def step(dscene, acc, it, vpls, vpl_slot):
                key = iteration_key(self.seed, it)

                def tile(_, xs):
                    tkey, tpx, tpy, tmask = xs
                    li = c_lanes(program(dscene, static, tkey, tpx, tpy,
                                         vpls, vpl_slot))
                    return None, jnp.where(tmask[:, None], li, 0.0)

                keys = jax.vmap(lambda t: jax.random.fold_in(key, t))(
                    jnp.arange(self.n_tiles))
                _, tiles = jax.lax.scan(tile, None, (keys, px, py, mask))
                return c_rep(acc + tiles.reshape(-1, 3)[:n])
        elif self.kind == "pixel":
            px, py, mask = self._px, self._py, self._mask

            @jax.jit
            def step(dscene, acc, it):
                key = iteration_key(self.seed, it)

                def tile(_, xs):
                    tkey, tpx, tpy, tmask = xs
                    li = c_lanes(program(dscene, static, tkey, tpx, tpy))
                    return None, jnp.where(tmask[:, None], li, 0.0)

                keys = jax.vmap(lambda t: jax.random.fold_in(key, t))(
                    jnp.arange(self.n_tiles))
                _, tiles = jax.lax.scan(tile, None, (keys, px, py, mask))
                return c_rep(acc + tiles.reshape(-1, 3)[:n])
        elif self.kind == "hybrid":
            # per-pixel strategies land on the lane's own pixel; s==1
            # splats land on a shared film (Bdpt, pathtracer.cu:1952-1967)
            px, py, mask = self._px, self._py, self._mask
            pix = jnp.where(mask, px + py * self.width, 0)

            @jax.jit
            def step(dscene, acc, it):
                key = iteration_key(self.seed, it)

                def tile(img, xs):
                    tkey, tpx, tpy, tmask, tpix = xs
                    li, film = program(dscene, static, tkey, tpx, tpy,
                                       tmask)
                    li = jnp.where(tmask[:, None], c_lanes(li), 0.0)
                    # sharded-lane splats land on the replicated film:
                    # GSPMD turns the scatter-add + constraint into local
                    # scatters + an ICI all-reduce (atomicAdd replacement)
                    img = c_rep(img + film)
                    return c_rep(img.at[tpix].add(li)), None

                keys = jax.vmap(lambda t: jax.random.fold_in(key, t))(
                    jnp.arange(self.n_tiles))
                img, _ = jax.lax.scan(
                    tile, jnp.zeros((n, 3), jnp.float32),
                    (keys, px, py, mask, pix))
                return c_rep(acc + img)
        elif self.kind == "film" and mesh is not None:
            # film-splat integrators, sharded: one tile of paths PER
            # DEVICE (the tile axis is the mesh axis); summing the
            # per-tile films is the cross-device film psum
            from gpu_pathtracer_tpu.parallel import dist as dist_mod
            norm = n / (self.n_tiles * self.tile_size)

            @jax.jit
            def step(dscene, acc, it):
                key = iteration_key(self.seed, it)
                keys = jax.vmap(lambda t: jax.random.fold_in(key, t))(
                    jnp.arange(self.n_tiles))
                keys = dist_mod.constrain_lanes(mesh, keys)
                films = jax.vmap(lambda tkey: program(
                    dscene, static, tkey, self.tile_size))(keys)
                img = dist_mod.psum_film(mesh, films)
                return c_rep(acc + img * norm)
        else:
            # film-splat integrators (LT): each tile traces tile_size
            # paths returning a whole film; the reference uses exactly
            # W*H paths per frame, so normalize by path count
            @jax.jit
            def step(dscene, acc, it):
                key = iteration_key(self.seed, it)

                def tile(img, tkey):
                    return img + program(dscene, static, tkey,
                                         self.tile_size), None

                keys = jax.vmap(lambda t: jax.random.fold_in(key, t))(
                    jnp.arange(self.n_tiles))
                img, _ = jax.lax.scan(
                    tile, jnp.zeros((n, 3), jnp.float32), keys)
                return acc + img * (n / (self.n_tiles * self.tile_size))

        self._step = step

    def render_iteration(self) -> None:
        """Add one sample per pixel to the accumulation film — exactly one
        device dispatch (mirrors the reference's per-frame Render +
        Output, pathtracer.cu:2705-2750)."""
        self.iteration += 1
        if self.kind == "mlt":
            key = iteration_key(self.seed, jnp.int32(self.iteration))
            if self._mlt_state is None:
                self._mlt_state = self._place_mlt_state(self._mlt_boot(
                    self.device_scene, key=jax.random.fold_in(key, 999)))
            self._mlt_state, film = self._mlt_step(
                self.device_scene, self._mlt_state, key)
            self.acc = film  # absolute estimate (b-normalized)
            return
        if self.kind == "sppm":
            key = iteration_key(self.seed, jnp.int32(self.iteration))
            self._sppm_state, film = self._sppm_step(
                self.device_scene, self._sppm_state, key,
                jnp.int32(self.iteration))
            self.acc = film  # absolute, already divided by iteration
            return
        if self.kind == "ir":
            from gpu_pathtracer_tpu.integrators import ir as ir_mod
            slot = (self.iteration - 1) % ir_mod.IR_MAX_VPLS
            if slot == 0 or self._vpls is None:
                key = iteration_key(self.seed, jnp.int32(self.iteration))
                self._vpls = self._gen_vpls(
                    self.device_scene, jax.random.fold_in(key, 777))
            self.acc = self._step(self.device_scene, self.acc,
                                  jnp.int32(self.iteration), self._vpls,
                                  jnp.int32(slot))
            return
        self.acc = self._step(self.device_scene, self.acc,
                              jnp.int32(self.iteration))

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
            self._sppm_state = self._place_sppm_state(sppm_mod.init_state(
                self.width * self.height, self.static.init_radius))
        if self.kind == "mlt":
            self._mlt_state = None   # re-bootstraps on next iteration

    def radiance(self) -> np.ndarray:
        """Mean radiance film [H, W, 3] (row 0 = bottom), pre-tonemap."""
        acc = np.asarray(self.acc).reshape(self.height, self.width, 3)
        if self.kind in ("sppm", "mlt"):
            return acc
        return acc / max(self.iteration, 1)

    def image(self) -> np.ndarray:
        """Tonemapped display image [H, W, 3] (row 0 = bottom)."""
        it = 1 if self.kind in ("sppm", "mlt") else self.iteration
        img = film_mod.tonemap(self.acc, jnp.float32(it),
                               self.static.filmic)
        return np.asarray(img).reshape(self.height, self.width, 3)
