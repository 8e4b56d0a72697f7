"""Stochastic progressive photon mapping with a device-resident photon grid.

Re-expression of the reference SPPM (pathtracer.cu:1986-2348). The three
passes per iteration survive, but the CPU hash-grid rebuild the author
flags as the bottleneck ("Still too slow", pathtracer.cu:2038) becomes a
fully on-device sort: every visible point emits 27 (cell, vp) candidate
entries covering its radius-box (the splat loop at pathtracer.cu:2066-2076),
entries are argsorted by cell hash, and photons binary-search their cell's
bucket — no host round-trip, no per-iteration reallocation.

Pass structure (Render dispatch, pathtracer.cu:2726-2737):
1. Eye pass: one camera path per pixel walks through delta and low-alpha
   glossy surfaces, accumulates direct light with MIS inline, and parks a
   VisiblePoint at the first diffuse-ish hit (TraceRay, 2101-2205).
2. Grid build (device sort, replaces BuildHashTable, 2039-2099).
3. Photon pass: light paths deposit flux into every visible point within
   radius in their cell (TracePhoton, 2207-2281).
4. Density pass: progressive radius shrink with alpha = 0.7 and
   tau / (pi r^2 N iter) estimate (TP kernel, 2330-2348). The film is
   written absolutely, not accumulated (Output quirk, 2524-2527).

Deviations (documented):
- The reference's per-photon radius/tau read-modify-write is racy by
  design (comment at 2249). We use the standard batched SPPM update
  (n' = n + alpha*M, g = n'/(n+M), tau' = (tau + beta*Phi) * g) — a
  deterministic reduction with the same alpha = 0.7 semantics.
- Grid bounds span valid visible points only; the reference expands over
  every pixel's (possibly stale/uninitialized) record (2046-2050).
- Le at a bounce-0 non-emitter hit indexes kernel_lights[-1] in the
  reference (2174-2176, out-of-bounds); we guard light_idx >= 0.
- Like the reference: no depth of field, no media, no infinite-light
  sampling in SPPM (the light pick is clamped to area lights).

State persists across iterations in `SppmState`; pixels whose eye path
escapes keep their previous visible point, exactly like the reference
(valid is only cleared at iteration 1, pathtracer.cu:2103-2109).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gpu_pathtracer_tpu.core.rng import RngStream
from gpu_pathtracer_tpu.core.sampling import power_heuristic
from gpu_pathtracer_tpu.core.vecmath import PI, dot, is_black, luminance
from gpu_pathtracer_tpu.geom import traverse
from gpu_pathtracer_tpu.shade import bsdf as bsdf_mod
from gpu_pathtracer_tpu.shade import camera as camera_mod
from gpu_pathtracer_tpu.shade import lights as lights_mod

SPPM_ALPHA = 0.7  # progressive shrink factor (pathtracer.cu:2252)


@struct.dataclass
class SppmState:
    """Per-pixel VisiblePoint store (pathtracer.cu:1986-1997)."""
    ld: jnp.ndarray       # [N, 3] accumulated direct light
    ind: jnp.ndarray      # [N, 3] last finite indirect estimate
    beta: jnp.ndarray     # [N, 3] eye-path throughput at the VP
    dir: jnp.ndarray      # [N, 3] -ray.d at the VP
    pos: jnp.ndarray      # [N, 3]
    nor: jnp.ndarray      # [N, 3]
    uv: jnp.ndarray       # [N, 2]
    dpdu: jnp.ndarray     # [N, 3]
    mat_idx: jnp.ndarray  # [N] i32
    tau: jnp.ndarray      # [N, 3]
    radius: jnp.ndarray   # [N]
    n: jnp.ndarray        # [N] photon count statistic
    valid: jnp.ndarray    # [N] bool


def init_state(n: int, init_radius: float) -> SppmState:
    z3 = jnp.zeros((n, 3), jnp.float32)
    return SppmState(
        ld=z3, ind=z3, beta=z3, dir=z3, pos=z3, nor=z3,
        uv=jnp.zeros((n, 2), jnp.float32), dpdu=z3,
        mat_idx=jnp.full(n, -1, jnp.int32), tau=z3,
        radius=jnp.full(n, init_radius, jnp.float32),
        n=jnp.zeros(n, jnp.float32), valid=jnp.zeros(n, bool))


def _direct_light_no_env(scene, static, rng: RngStream, pos, nor, dpdu,
                         mat, wi, active):
    """SPPM's inline NEE with MIS: area lights only, no media
    (TraceRay, pathtracer.cu:2125-2172)."""
    n_lane = pos.shape[0]
    eps = scene.epsilon
    ld = jnp.zeros((n_lane, 3), jnp.float32)
    if static.n_lights == 0:
        return ld

    u_pick = rng.uniform((n_lane,))
    idx, choice_pdf = lights_mod.pick_light(scene, u_pick)
    idx = jnp.minimum(idx, static.n_lights - 1)
    u1, u2 = rng.uniform2((n_lane,))
    rad, so, sd, st, _ln, lpdf = lights_mod.sample_area_light(
        scene, idx, pos, u1, u2, eps)
    cand = active & ~is_black(rad) & (lpdf > 0.0)
    occluded = traverse.intersect_any(
        scene, static, pos, sd, eps, jnp.where(cand, st, 0.0))
    cand &= ~occluded
    fr, sample_pdf = bsdf_mod.eval_bsdf(
        mat, wi, sd, nor, dpdu, static.material_types)
    weight = power_heuristic(1, lpdf * choice_pdf, 1, sample_pdf)
    contrib = weight[:, None] * fr * rad * \
        jnp.abs(dot(nor, sd))[:, None] \
        / jnp.maximum(lpdf * choice_pdf, 1e-30)[:, None]
    ld += jnp.where(cand[:, None], contrib, 0.0)

    # BSDF-sample branch against emitters (pathtracer.cu:2146-2171)
    u1, u2, u3 = rng.uniform3((n_lane,))
    wo, fr_s, pdf_s = bsdf_mod.sample_bsdf(
        mat, wi, nor, dpdu, u1, u2, u3, static.material_types)
    cand_b = active & ~(is_black(fr_s) | (pdf_s == 0.0))
    hit = traverse.intersect_closest(
        scene, static, pos, wo, eps, jnp.where(cand_b, jnp.inf, eps))
    hit_light = cand_b & hit.valid & (hit.light_idx >= 0)
    le = lights_mod.area_light_le(scene, hit.light_idx, hit.nor, -wo)
    pdf_area, _ = lights_mod.area_light_pdf(scene, hit.light_idx, wo,
                                            hit.nor)
    lchoice = lights_mod.light_choice_pdf(scene, jnp.maximum(hit.light_idx,
                                                             0))
    len2 = dot(hit.pos - pos, hit.pos - pos)
    cos_l = jnp.abs(dot(hit.nor, wo))
    l_pdf = pdf_area * len2 / jnp.maximum(cos_l, 1e-30)
    w_b = power_heuristic(1, pdf_s, 1, l_pdf * lchoice)
    contrib_b = w_b[:, None] * fr_s * le * \
        jnp.abs(dot(wo, nor))[:, None] / jnp.maximum(pdf_s, 1e-30)[:, None]
    hit_light &= ~is_black(le)
    ld += jnp.where(hit_light[:, None], contrib_b, 0.0)
    return ld


def eye_pass(scene, static, key, pixel_x, pixel_y, state: SppmState,
             iteration):
    """TraceRay per pixel (pathtracer.cu:2101-2205, FP kernel 2289-2307)."""
    n = pixel_x.shape[0]
    eps = scene.epsilon
    rng0 = RngStream(jax.random.fold_in(key, 0))
    ox = rng0.uniform((n,)) - 0.5
    oy = rng0.uniform((n,)) - 0.5
    # no DoF (quirk, pathtracer.cu:2302-2304)
    ro, rd = camera_mod.generate_primary_ray(
        scene.camera, pixel_x.astype(jnp.float32) + ox,
        pixel_y.astype(jnp.float32) + oy,
        jnp.zeros((n, 2), jnp.float32), static.environment_camera)

    first = iteration == 1
    z3 = jnp.zeros((n, 3), jnp.float32)
    state = state.replace(
        radius=jnp.where(first, static.init_radius, state.radius),
        n=jnp.where(first, 0.0, state.n),
        ld=jnp.where(first, 0.0, state.ld),
        tau=jnp.where(first, 0.0, state.tau),
        ind=jnp.where(first, 0.0, state.ind),
        valid=jnp.where(first, False, state.valid))

    ld_add = z3
    beta = jnp.ones((n, 3), jnp.float32)
    specular = jnp.zeros(n, bool)
    alive = jnp.ones(n, bool)
    stored = jnp.zeros(n, bool)
    vp_beta, vp_dir, vp_pos, vp_nor, vp_dpdu = z3, z3, z3, z3, z3
    vp_uv = jnp.zeros((n, 2), jnp.float32)
    vp_mat = jnp.full(n, -1, jnp.int32)

    def bounce(carry, bounce_idx):
        (ro, rd, beta, specular, alive, stored, ld_add,
         vp_beta, vp_dir, vp_pos, vp_nor, vp_uv, vp_dpdu, vp_mat) = carry
        rng = RngStream(jax.random.fold_in(key, 100 + bounce_idx))

        hit = traverse.intersect_closest(
            scene, static, ro, rd, eps, jnp.where(alive, jnp.inf, eps))
        alive &= hit.valid

        mat = bsdf_mod.gather_materials(scene, static, hit.mat_idx, hit.uv)
        wi = -rd
        not_delta = ~bsdf_mod.is_delta(mat.type)

        ld = _direct_light_no_env(
            scene, static, rng, hit.pos, hit.nor, hit.dpdu, mat, wi,
            alive & not_delta & (hit.light_idx == -1))

        # emitter hit credit (quirk-guarded: light_idx >= 0)
        take_le = alive & (hit.light_idx >= 0) & \
            ((bounce_idx == 0) | specular)
        le = lights_mod.area_light_le(scene, hit.light_idx, hit.nor, -rd)
        ld += jnp.where(take_le[:, None], le, 0.0)
        ld_ok = jnp.all(jnp.isfinite(ld), axis=-1)
        ld_add = ld_add + jnp.where((alive & ld_ok)[:, None], beta * ld, 0.0)

        # walk through delta / low-alpha glossy (pathtracer.cu:2183-2196)
        walk = bsdf_mod.is_delta(mat.type) | (
            bsdf_mod.is_glossy(mat.type) & (mat.alpha_u < 0.2))
        u1, u2, u3 = rng.uniform3((n,))
        wo, fr, pdf = bsdf_mod.sample_bsdf(
            mat, wi, hit.nor, hit.dpdu, u1, u2, u3, static.material_types)
        dead = is_black(fr)
        go = alive & walk & ~dead
        beta = jnp.where(go[:, None],
                         beta * fr * jnp.abs(dot(wo, hit.nor))[:, None]
                         / jnp.maximum(pdf, 1e-30)[:, None], beta)
        specular = jnp.where(go, bsdf_mod.is_delta(mat.type), specular)
        ro = jnp.where(go[:, None], hit.pos, ro)
        rd = jnp.where(go[:, None], wo, rd)

        # park the visible point (pathtracer.cu:2198-2203)
        park = alive & ~walk
        vp_beta = jnp.where(park[:, None], beta, vp_beta)
        vp_dir = jnp.where(park[:, None], wi, vp_dir)
        vp_pos = jnp.where(park[:, None], hit.pos, vp_pos)
        vp_nor = jnp.where(park[:, None], hit.nor, vp_nor)
        vp_uv = jnp.where(park[:, None], hit.uv, vp_uv)
        vp_dpdu = jnp.where(park[:, None], hit.dpdu, vp_dpdu)
        vp_mat = jnp.where(park, hit.mat_idx, vp_mat)
        stored |= park
        alive &= ~park & ~(alive & walk & dead)

        return (ro, rd, beta, specular, alive, stored, ld_add,
                vp_beta, vp_dir, vp_pos, vp_nor, vp_uv, vp_dpdu,
                vp_mat), None

    carry = (ro, rd, beta, specular, alive, stored, ld_add,
             vp_beta, vp_dir, vp_pos, vp_nor, vp_uv, vp_dpdu, vp_mat)
    carry, _ = jax.lax.scan(bounce, carry, jnp.arange(static.max_depth))
    (_, _, _, _, _, stored, ld_add,
     vp_beta, vp_dir, vp_pos, vp_nor, vp_uv, vp_dpdu, vp_mat) = carry

    sm = stored[:, None]
    return state.replace(
        ld=state.ld + ld_add,
        beta=jnp.where(sm, vp_beta, state.beta),
        dir=jnp.where(sm, vp_dir, state.dir),
        pos=jnp.where(sm, vp_pos, state.pos),
        nor=jnp.where(sm, vp_nor, state.nor),
        uv=jnp.where(sm, vp_uv, state.uv),
        dpdu=jnp.where(sm, vp_dpdu, state.dpdu),
        mat_idx=jnp.where(stored, vp_mat, state.mat_idx),
        valid=state.valid | stored)


def _hash_cell(cx, cy, cz, hash_size):
    """pbrt-style spatial hash (Hash, pathtracer.cu:2033-2036)."""
    h = (cx.astype(jnp.uint32) * jnp.uint32(73856093)) \
        ^ (cy.astype(jnp.uint32) * jnp.uint32(19349663)) \
        ^ (cz.astype(jnp.uint32) * jnp.uint32(83492791))
    return (h % jnp.uint32(hash_size)).astype(jnp.int32)


def build_grid(state: SppmState, hash_size: int):
    """Device-side replacement for BuildHashTable (pathtracer.cu:2039-2099).

    Returns (sorted_vp [27N], bucket_start [H+1], bounds_min, bounds_max,
    grid_res [3]): each VP splats into <= 27 cells covering its
    radius-box; entries are sorted by cell hash so photons can
    binary-search their bucket.
    """
    n = state.radius.shape[0]
    valid = state.valid
    big = jnp.float32(3.4e38)
    vpos = state.pos
    bmin = jnp.min(jnp.where(valid[:, None], vpos, big), axis=0)
    bmax = jnp.max(jnp.where(valid[:, None], vpos, -big), axis=0)
    any_valid = jnp.any(valid)
    bmin = jnp.where(any_valid, bmin, 0.0)
    bmax = jnp.where(any_valid, bmax, 1.0)
    r_max = jnp.max(state.radius)
    bmin = bmin - r_max
    bmax = bmax + r_max
    diag = bmax - bmin
    max_diag = jnp.max(diag)
    base_res = jnp.floor(max_diag / jnp.maximum(r_max, 1e-30))
    res = jnp.maximum(
        jnp.floor(base_res * diag / jnp.maximum(max_diag, 1e-30)),
        1.0).astype(jnp.int32)

    def to_cell(p):
        pg = (p - bmin) / jnp.where(diag > 0, diag, 1.0)
        return jnp.floor(res.astype(jnp.float32) * pg).astype(jnp.int32)

    c_lo = to_cell(vpos - state.radius[:, None])
    c_hi = to_cell(vpos + state.radius[:, None])
    c_lo = jnp.clip(c_lo, 0, res - 1)
    c_hi = jnp.clip(c_hi, 0, res - 1)

    # 27 candidate cells per VP; entries beyond the box hash to H (inert)
    offs = jnp.stack(jnp.meshgrid(jnp.arange(3), jnp.arange(3),
                                  jnp.arange(3), indexing="ij"),
                     axis=-1).reshape(27, 3)
    cells = c_lo[:, None, :] + offs[None, :, :]          # [N, 27, 3]
    ok = valid[:, None] & jnp.all(cells <= c_hi[:, None, :], axis=-1)
    h = _hash_cell(cells[..., 0], cells[..., 1], cells[..., 2], hash_size)
    h = jnp.where(ok, h, hash_size).reshape(-1)
    vp_ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                              (n, 27)).reshape(-1)
    order = jnp.argsort(h)
    h_sorted = h[order]
    sorted_vp = vp_ids[order]
    bucket_start = jnp.searchsorted(
        h_sorted, jnp.arange(hash_size + 1)).astype(jnp.int32)
    return sorted_vp, bucket_start, bmin, bmax, res


K_CAP = 32  # per-photon, per-bounce VP-candidate cap (see photon_pass)


def photon_pass(scene, static, key, state: SppmState, grid, n_photons,
                hash_size):
    """TracePhoton (pathtracer.cu:2207-2281): returns (phi [N,3], m [N])
    — per-VP flux sum and photon count for the batched progressive
    update.

    Deposit strategy (TPU-native; replaces the reference's per-photon
    linked-list walk, cu:2229-2262): at the reference's default
    initRadius=0.5 (parsescene.cpp:213) the cornell grid has ~150 cells
    and buckets of thousands of entries, so an exact bucket walk is
    10^8 photon-VP pairs per bounce — the round-3 TPU watchdog kill.
    Each photon instead samples min(bucket_len, K_CAP) entries of its
    bucket at a random rotation and weights deposits by bucket_len/K —
    every entry has marginal inclusion probability K/len, so the flux
    and photon-count (m) estimates stay unbiased; once the progressive
    radius shrinks buckets below K_CAP the cap is inactive and the walk
    is exact. Pair work is a dense [k, K_CAP] block per cond-gated
    prefix slice (photons argsorted by bucket length, so bounces where
    few photons deposit skip most slices), with VP attributes fetched
    from two x8-packed side tables (the measured-fast row-gather class)
    and deposits scatter-added into one x8-packed accumulator."""
    sorted_vp, bucket_start, bmin, bmax, res = grid
    n_vp = state.radius.shape[0]
    n = n_photons
    eps = scene.epsilon
    diag = bmax - bmin

    # x8-packed VP side tables, built once per pass:
    # tabA: pos(3) radius valid pad(3) — the distance-test row
    # tabB: bf16 pairs of [nor(3) dpdu(3) dir(3) pad] (5 slots), mat_idx,
    #       uv(2) f32 — the BSDF-eval row (bf16 frame vectors are plenty
    #       for flux deposits already blurred by the kernel radius)
    from gpu_pathtracer_tpu.shade.media import (_pack_bf16_pairs,
                                                _unpack_bf16_pairs)
    tabA = jnp.concatenate(
        [state.pos, state.radius[:, None],
         state.valid.astype(jnp.float32)[:, None],
         jnp.zeros((n_vp, 3), jnp.float32)], axis=1)
    tabB = jnp.concatenate(
        [_pack_bf16_pairs(jnp.concatenate(
            [state.nor, state.dpdu, state.dir,
             jnp.zeros((n_vp, 1), jnp.float32)], axis=1)),
         state.mat_idx.astype(jnp.float32)[:, None], state.uv], axis=1)

    def _dense_deposit(sp, acc8):
        """All (photon, sampled VP entry) pairs for one photon slice."""
        k = sp.shape[0]
        ppos, prd, pbeta = sp[:, 0:3], sp[:, 3:6], sp[:, 6:9]
        start = sp[:, 9].astype(jnp.int32)
        end = sp[:, 10].astype(jnp.int32)
        u_off = sp[:, 11]
        blen = jnp.maximum(end - start, 0)
        sel = jnp.minimum(blen, K_CAP)
        off0 = jnp.minimum((u_off * blen.astype(jnp.float32))
                           .astype(jnp.int32), jnp.maximum(blen - 1, 0))
        kio = jnp.arange(K_CAP, dtype=jnp.int32)[None, :]
        rel = off0[:, None] + kio
        rel = jnp.where(rel >= blen[:, None],
                        rel - jnp.maximum(blen[:, None], 1), rel)
        pair_ok = kio < sel[:, None]                       # [k, K]
        eidx = jnp.clip(start[:, None] + rel, 0,
                        sorted_vp.shape[0] - 1)
        vp = jnp.maximum(jnp.take(sorted_vp,
                                  jnp.where(pair_ok, eidx, 0)), 0)
        flat = vp.reshape(-1)
        a = jnp.take(tabA, flat, axis=0)                   # [k*K, 8]
        pposr = jnp.broadcast_to(ppos[:, None, :],
                                 (k, K_CAP, 3)).reshape(-1, 3)
        d = pposr - a[:, 0:3]
        vrad = a[:, 3]
        near = (dot(d, d) <= vrad * vrad) & (a[:, 4] > 0.0) \
            & pair_ok.reshape(-1)
        b = jnp.take(tabB, jnp.where(near, flat, 0), axis=0)
        unp = _unpack_bf16_pairs(b[:, 0:5])                # [k*K, 10]
        vnor, vdpdu, vdir = unp[:, 0:3], unp[:, 3:6], unp[:, 6:9]
        vuv = b[:, 6:8]
        vmat = bsdf_mod.gather_materials(
            scene, static,
            jnp.where(near, b[:, 5].astype(jnp.int32), 0), vuv)
        prdr = jnp.broadcast_to(prd[:, None, :],
                                (k, K_CAP, 3)).reshape(-1, 3)
        fr, _ = bsdf_mod.eval_bsdf(vmat, vdir, -prdr, vnor, vdpdu,
                                   static.material_types)
        fr_ok = ~is_black(fr) & jnp.all(jnp.isfinite(fr), axis=-1)
        take = near & fr_ok
        w = blen.astype(jnp.float32) \
            / jnp.maximum(sel, 1).astype(jnp.float32)
        wr = jnp.broadcast_to(w[:, None], (k, K_CAP)).reshape(-1)
        pbetar = jnp.broadcast_to(pbeta[:, None, :],
                                  (k, K_CAP, 3)).reshape(-1, 3)
        contrib = jnp.where(take[:, None], fr * pbetar * wr[:, None], 0.0)
        row = jnp.concatenate(
            [contrib, jnp.where(take, wr, 0.0)[:, None],
             jnp.zeros((k * K_CAP, 4), jnp.float32)], axis=1)
        return acc8.at[flat].add(row)

    rng = RngStream(jax.random.fold_in(key, 0))
    u_pick = rng.uniform((n,))
    light_idx, choice_pdf = lights_mod.pick_light(scene, u_pick)
    light_idx = jnp.minimum(light_idx, max(static.n_lights - 1, 0))
    u1, u2, u3 = rng.uniform3((n,))
    u4 = rng.uniform((n,))
    ro, rd, l_nor, radiance, pdf_a, pdf_w = \
        lights_mod.sample_area_light_emission(
            scene, light_idx, u1, u2, u3, u4, eps)
    denom = jnp.maximum(pdf_a * pdf_w * choice_pdf, 1e-30)
    beta = radiance * (jnp.abs(dot(rd, l_nor)) / denom)[:, None]
    alive = jnp.ones(n, bool) & (static.n_lights > 0)

    acc8 = jnp.zeros((n_vp, 8), jnp.float32)  # phi(3) m pad(4): one
    # x8 scatter-add target (x3/x1 scatters are in the slow width class)

    def bounce(carry, bounce_idx):
        ro, rd, beta, alive, acc8 = carry
        rng = RngStream(jax.random.fold_in(key, 100 + bounce_idx))

        hit = traverse.intersect_closest(
            scene, static, ro, rd, eps, jnp.where(alive, jnp.inf, eps))
        alive &= hit.valid

        # ---- deposit into the photon grid (bounces > 0, cu:2229-2262) --
        pg = (hit.pos - bmin) / jnp.where(diag > 0, diag, 1.0)
        cell = jnp.floor(res.astype(jnp.float32) * pg).astype(jnp.int32)
        in_bounds = jnp.all((cell >= 0) & (cell < res), axis=-1)
        depositing = alive & in_bounds & (bounce_idx > 0)
        hcell = _hash_cell(cell[..., 0], cell[..., 1], cell[..., 2],
                           hash_size)
        start = jnp.take(bucket_start, jnp.where(depositing, hcell, 0))
        end = jnp.take(bucket_start, jnp.where(depositing, hcell + 1, 0))
        end = jnp.where(depositing, end, start)

        # Photons argsorted by bucket length (2-operand argsort — wider
        # sorts explode XLA:TPU compile time), then the dense capped
        # deposit runs on cond-gated prefix slices: bounces where few
        # photons deposit (bounce 0, post-RR) skip most of the gathers.
        blen = jnp.maximum(end - start, 0)
        u_off = rng.uniform((n,))
        order = jnp.argsort(-blen)
        packed = jnp.concatenate(
            [hit.pos, rd, beta,
             start.astype(jnp.float32)[:, None],
             end.astype(jnp.float32)[:, None],
             u_off[:, None],
             jnp.zeros((n, 20), jnp.float32)], axis=1)  # pad to 32:
        # row-gather throughput is layout-capricious (x16 slow,
        # x32 fast — see CLAUDE.md)
        nonzero = jnp.sum((blen > 0).astype(jnp.int32))
        sizes = [n // 8, n // 8, n // 4]
        sizes.append(n - sum(sizes))
        s0 = 0
        for size in sizes:
            if size <= 0:
                continue
            sel = jax.lax.dynamic_slice_in_dim(order, s0, size)

            def run(a8, sel=sel):
                return _dense_deposit(jnp.take(packed, sel, axis=0), a8)

            acc8 = jax.lax.cond(nonzero > s0, run, lambda a8: a8, acc8)
            s0 += size

        # ---- scatter onward (Importance mode, cu:2264-2279) ------------
        mat = bsdf_mod.gather_materials(scene, static, hit.mat_idx, hit.uv)
        u1, u2, u3 = rng.uniform3((n,))
        wo, fr, pdf = bsdf_mod.sample_bsdf(
            mat, -rd, hit.nor, hit.dpdu, u1, u2, u3, static.material_types,
            mode=bsdf_mod.IMPORTANCE)
        alive &= pdf != 0.0
        beta = jnp.where(alive[:, None],
                         beta * fr * jnp.abs(dot(hit.nor, wo))[:, None]
                         / jnp.maximum(pdf, 1e-30)[:, None], beta)
        ro = jnp.where(alive[:, None], hit.pos, ro)
        rd = jnp.where(alive[:, None], wo, rd)

        u_rr = rng.uniform((n,))
        illumate = jnp.clip(1.0 - luminance(beta), 0.0, 1.0)
        do_rr = (bounce_idx > 3) & alive
        alive &= ~(do_rr & (u_rr < illumate))
        scale = 1.0 / jnp.maximum(1.0 - illumate, 1e-30)
        beta = jnp.where((do_rr & alive)[:, None], beta * scale[:, None],
                         beta)
        return (ro, rd, beta, alive, acc8), None

    carry = (ro, rd, beta, alive, acc8)
    carry, _ = jax.lax.scan(bounce, carry, jnp.arange(static.max_depth))
    acc8 = carry[4]
    return acc8[:, 0:3], acc8[:, 3]


def density_pass(state: SppmState, phi, m, iteration, n_photons):
    """Batched progressive update + density estimate (TP kernel,
    pathtracer.cu:2330-2348). Returns (state, L [N,3])."""
    has = m > 0.0
    n_new = state.n + SPPM_ALPHA * m
    g = jnp.where(has, n_new / jnp.maximum(state.n + m, 1e-30), 1.0)
    radius = state.radius * jnp.sqrt(g)
    tau = jnp.where(has[:, None],
                    (state.tau + state.beta * phi) * g[:, None], state.tau)

    denom = PI * radius * radius * n_photons * iteration
    indirect = tau / jnp.maximum(denom, 1e-30)[:, None]
    fin = jnp.all(jnp.isfinite(indirect), axis=-1)
    indirect = jnp.where(fin[:, None], indirect, state.ind)
    it = jnp.maximum(iteration.astype(jnp.float32), 1.0)
    L = jnp.where(state.valid[:, None], state.ld / it + indirect, 0.0)
    state = state.replace(radius=radius, tau=tau, n=n_new, ind=indirect)
    return state, L


def render_iteration(scene, static, key, state: SppmState, iteration,
                     pixel_x, pixel_y):
    """One SPPM iteration: eye pass -> grid -> photon pass -> density.
    Returns (state, absolute film [N, 3])."""
    n = pixel_x.shape[0]
    state = eye_pass(scene, static, jax.random.fold_in(key, 0),
                     pixel_x, pixel_y, state, iteration)
    grid = build_grid(state, n)
    phi, m = photon_pass(scene, static, jax.random.fold_in(key, 1),
                         state, grid, static.photons_per_iteration, n)
    return density_pass(state, phi, m, iteration,
                        static.photons_per_iteration)
