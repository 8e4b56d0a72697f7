"""Bidirectional path tracing as a wavefront program.

Re-expression of the reference BDPT (pathtracer.cu:1393-1970). Each lane
owns one camera subpath and one light subpath stored as fixed-capacity SoA
vertex arrays [N, K] in HBM (the CUDA version keeps 67-vertex arrays in
local memory per thread, pathtracer.cu:1944-1945). Subpath generation is a
`lax.scan` over bounces that scatters vertices at per-lane write indices.
The s,t connection double-loop runs as DENSE [N, G] strategy grids
(G = n_verts-1): the strategy index maps to the grid column, so per-item
vertex fetches are contiguous slices of the [N, K] tables, MIS runs
against the un-gathered pdf tables, and only the shadow-ray transmittance
walker sees compacted items (chunked while_loop work-queue) — see the
comment at the grid block for the measured TPU anatomy that forced this
shape. Film splats (the s==1 strategies) use deterministic scatter-adds
instead of atomicAdd (pathtracer.cu:1958-1961).

Semantics matched to the reference:
- vertex forward/reverse area-pdfs via ConvertPdf (pathtracer.cu:1405-1414)
- the four Connect cases t=0 / t=1 / s=1 / general with their temporary
  pdf overrides (pathtracer.cu:1720-1923)
- iterative MIS weight with delta remap (pathtracer.cu:1690-1718)
- no depth-of-field (quirk, pathtracer.cu:1420-1422)
- media vertices: phase-function scattering, interface (matIdx==-1)
  crossings do not consume a bounce (pathtracer.cu:1494-1501)
- infinite lights are not connected (the reference indexes kernel_lights
  directly and never treats idx==n_lights, so neither do we)

Documented deviations:
- Path capacity honors the configured max_depth; the reference ignores its
  maxDepth argument in BDPT and walks to BDPT_MAX_DEPTH=65 relying on
  Russian roulette (pathtracer.cu:1393,1447).
- A vertex is "a medium vertex" iff mat_idx == -1; the reference's general
  Connect case instead tests the vertex's medium pointer
  (pathtracer.cu:1869-1870), which misclassifies surfaces inside a medium.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gpu_pathtracer_tpu.core.rng import RngStream
from gpu_pathtracer_tpu.core.vecmath import dot, is_black, luminance, normalize
from gpu_pathtracer_tpu.geom import traverse
from gpu_pathtracer_tpu.shade import bsdf as bsdf_mod
from gpu_pathtracer_tpu.shade import camera as camera_mod
from gpu_pathtracer_tpu.shade import lights as lights_mod
from gpu_pathtracer_tpu.shade import media as media_mod

INTERFACE_BUDGET = 8

# Trace-time knockout set for the in-jit cost anatomy
# (tools/bench_bdpt_anatomy.py): members of {"tr", "mis", "s1", "t0",
# "t1", "gen", "connect"} disable that term of render_lanes. Only the
# anatomy harness mutates this; production traces see the empty set.
KNOCK: frozenset = frozenset()

# Split strategy columns into [2, 10) + [10, G+2) blocks so the rare
# long-subpath columns run as a separate lane-compacted round. Measured
# perf-neutral on cornell depth 17 (see the driver comment); kept as an
# A/B knob, off by default to hold compile time down.
COLUMN_BLOCKS = False

# Shadow-connection Russian roulette (classic shadow-ray RR, unbiased):
# a connection whose UNOCCLUDED contribution luminance is below
# CONNECT_RR x (round mean over valid connections) is evaluated with
# probability q = lum / (CONNECT_RR * mean) and weighted 1/q — the Tr
# walker (the round's dominant cost) then runs on a smaller compacted
# queue. 0 disables. Read at trace time. Measured (cornell 512^2 depth
# 17, 2026-08-20): 1.0 -> 16.55 -> 14.55 s/iter (+13.7% throughput) at
# +0.27% inter-seed pixel variance (5-seed CPU check) — pure win;
# 0.25 -> +4.9%. Thresholds > 1 unexplored.
CONNECT_RR = 1.0


@struct.dataclass
class Vertices:
    """SoA subpath vertex storage (BdptVertex, pathtracer.cu:1395-1402)."""
    pos: jnp.ndarray       # [N, K, 3]
    nor: jnp.ndarray       # [N, K, 3] zero for medium vertices
    uv: jnp.ndarray        # [N, K, 2]
    dpdu: jnp.ndarray      # [N, K, 3]
    beta: jnp.ndarray      # [N, K, 3]
    fwd: jnp.ndarray       # [N, K] forward area-pdf
    rev: jnp.ndarray       # [N, K] reverse area-pdf
    delta: jnp.ndarray     # [N, K] bool
    mat_idx: jnp.ndarray   # [N, K] i32 (-1 = medium vertex)
    light_idx: jnp.ndarray  # [N, K] i32
    medium: jnp.ndarray    # [N, K] i32 medium the vertex sits in
    count: jnp.ndarray     # [N] i32 number of valid vertices


def _empty_vertices(n, k):
    z3 = jnp.zeros((n, k, 3), jnp.float32)
    z1 = jnp.zeros((n, k), jnp.float32)
    return Vertices(
        pos=z3, nor=z3, uv=jnp.zeros((n, k, 2), jnp.float32), dpdu=z3,
        beta=z3, fwd=z1, rev=z1, delta=jnp.zeros((n, k), bool),
        mat_idx=jnp.full((n, k), -1, jnp.int32),
        light_idx=jnp.full((n, k), -1, jnp.int32),
        medium=jnp.full((n, k), -1, jnp.int32),
        count=jnp.zeros(n, jnp.int32))


def _lane_set(arr, mask, idx, val):
    """arr[lane, idx[lane]] = val[lane] where mask[lane]."""
    n = arr.shape[0]
    lanes = jnp.arange(n)
    idx = jnp.clip(idx, 0, arr.shape[1] - 1)
    cur = arr[lanes, idx]
    if val.ndim > mask.ndim:
        m = mask.reshape(mask.shape + (1,) * (val.ndim - mask.ndim))
    else:
        m = mask
    return arr.at[lanes, idx].set(jnp.where(m, val, cur))


def _lane_get(arr, idx):
    """arr[lane, idx[lane]] (idx clipped into range)."""
    n = arr.shape[0]
    return arr[jnp.arange(n), jnp.clip(idx, 0, arr.shape[1] - 1)]


def _col(arr, i):
    """arr[:, i] for a traced scalar i (clipped)."""
    return jax.lax.dynamic_index_in_dim(
        arr, jnp.clip(i, 0, arr.shape[1] - 1), axis=1, keepdims=False)


def _colv(arr, i):
    """Column pick of a [N, K] table, clipped into range.

    i a python/numpy scalar -> [N, 1] static slice; i a traced scalar
    -> [N, 1] dynamic slice; i a STATIC numpy [1, G] strategy vector
    (the dense-grid column indices) -> [N, G] assembled by trace-time
    static column stacking — zero runtime select/gather ops; i a traced
    vector -> K where-selects (fallback)."""
    k = arr.shape[1]
    if isinstance(i, (int, np.integer)):
        c = min(max(int(i), 0), k - 1)
        return arr[:, c:c + 1]
    if isinstance(i, np.ndarray):
        ic = np.clip(i, 0, k - 1).reshape(-1)
        return jnp.stack([arr[:, int(c)] for c in ic], axis=1)
    i = jnp.clip(i, 0, k - 1)
    if jnp.ndim(i) == 0:
        return jax.lax.dynamic_index_in_dim(arr, i, axis=1,
                                            keepdims=True)
    out = jnp.broadcast_to(arr[:, 0:1], (arr.shape[0], i.shape[-1]))
    for c in range(1, k):
        out = jnp.where(i == c, arr[:, c:c + 1], out)
    return out


def _convert_pdf(pdf, from_pos, to_pos, to_nor):
    """ConvertPdf (pathtracer.cu:1405-1414): solid-angle pdf at `from`
    converted to area measure at `to` (no cosine for medium vertices)."""
    d = from_pos - to_pos
    d2 = jnp.maximum(dot(d, d), 1e-30)
    ret = pdf / d2
    cos = jnp.abs(dot(d / jnp.sqrt(d2)[..., None], to_nor))
    has_nor = dot(to_nor, to_nor) > 0.0
    return jnp.where(has_nor, ret * cos, ret)


def _generate_subpath(scene, static, key, n_verts, ro, rd, beta, forward,
                      med, verts: Vertices, mode):
    """Random-walk extension shared by camera and light subpaths
    (GenerateCameraPath / GenerateLightPath, pathtracer.cu:1415-1690).

    `verts` arrives holding vertex 0 (count == 1); the walk appends up to
    n_verts - 1 more. `forward` is the solid-angle pdf of the first ray.
    """
    n = ro.shape[0]
    eps = scene.epsilon
    alive = jnp.ones(n, bool)
    bounce_ct = jnp.zeros(n, jnp.int32)
    n_steps = (n_verts - 1) + (INTERFACE_BUDGET if static.has_media else 0)

    def step(carry, it):
        verts, ro, rd, beta, forward, med, alive, bounce_ct = carry
        skey = jax.random.fold_in(key, it)
        rng = RngStream(jax.random.fold_in(skey, 0))

        # capacity reached -> the walk is over for this lane
        alive &= verts.count < n_verts

        hit = traverse.intersect_closest(
            scene, static, ro, rd, eps, jnp.where(alive, jnp.inf, eps))
        alive &= hit.valid

        if static.has_media:
            weight, t_med, sampled = media_mod.medium_sample(
                scene, static, med, ro, rd, hit.t,
                jax.random.fold_in(skey, 1), alive)
            beta = jnp.where(alive[:, None], beta * weight, beta)
            alive &= ~is_black(beta)
        else:
            sampled = jnp.zeros(n, bool)
            t_med = hit.t

        prev_idx = verts.count - 1
        prev_pos = _lane_get(verts.pos, prev_idx)
        prev_nor = _lane_get(verts.nor, prev_idx)

        # ---- medium scattering vertex (pathtracer.cu:1603-1630) --------
        in_scatter = alive & sampled
        if static.has_media:
            sample_pos = ro + rd * t_med[:, None]
            pu1, pu2 = rng.uniform2((n,))
            new_dir, ph = media_mod.sample_phase(scene, med, -rd, pu1, pu2)
            zeros3 = jnp.zeros((n, 3), jnp.float32)
            fwd_m = _convert_pdf(forward, prev_pos, sample_pos, zeros3)
            w = verts.count
            verts = verts.replace(
                pos=_lane_set(verts.pos, in_scatter, w, sample_pos),
                nor=_lane_set(verts.nor, in_scatter, w, zeros3),
                beta=_lane_set(verts.beta, in_scatter, w, beta),
                fwd=_lane_set(verts.fwd, in_scatter, w, fwd_m),
                delta=_lane_set(verts.delta, in_scatter, w,
                                jnp.zeros(n, bool)),
                mat_idx=_lane_set(verts.mat_idx, in_scatter, w,
                                  jnp.full(n, -1, jnp.int32)),
                light_idx=_lane_set(verts.light_idx, in_scatter, w,
                                    jnp.full(n, -1, jnp.int32)),
                medium=_lane_set(verts.medium, in_scatter, w, med))
            rev_m = _convert_pdf(ph, sample_pos, prev_pos, prev_nor)
            verts = verts.replace(
                rev=_lane_set(verts.rev, in_scatter, prev_idx, rev_m))
            forward = jnp.where(in_scatter, ph, forward)
            ro = jnp.where(in_scatter[:, None], sample_pos, ro)
            rd = jnp.where(in_scatter[:, None], new_dir, rd)

        # ---- interface crossing: no bounce (pathtracer.cu:1632-1639) ---
        on_surface = alive & ~sampled
        interface = on_surface & (hit.mat_idx == -1)
        going_out = dot(rd, hit.nor) > 0.0
        side_med = jnp.where(going_out, hit.medium_outside,
                             hit.medium_inside)
        med = jnp.where(interface, side_med, med)
        ro = jnp.where(interface[:, None], hit.pos, ro)
        surf = on_surface & ~interface

        # ---- surface vertex (pathtracer.cu:1641-1676) ------------------
        mat = bsdf_mod.gather_materials(scene, static, hit.mat_idx, hit.uv)
        delta = bsdf_mod.is_delta(mat.type)
        fwd_s = _convert_pdf(forward, prev_pos, hit.pos, hit.nor)
        w = verts.count
        verts = verts.replace(
            pos=_lane_set(verts.pos, surf, w, hit.pos),
            nor=_lane_set(verts.nor, surf, w, hit.nor),
            uv=_lane_set(verts.uv, surf, w, hit.uv),
            dpdu=_lane_set(verts.dpdu, surf, w, hit.dpdu),
            beta=_lane_set(verts.beta, surf, w, beta),
            fwd=_lane_set(verts.fwd, surf, w, fwd_s),
            delta=_lane_set(verts.delta, surf, w, delta),
            mat_idx=_lane_set(verts.mat_idx, surf, w, hit.mat_idx),
            light_idx=_lane_set(verts.light_idx, surf, w, hit.light_idx),
            medium=_lane_set(verts.medium, surf, w, med))

        u1, u2, u3 = rng.uniform3((n,))
        wo, fr, pdf = bsdf_mod.sample_bsdf(
            mat, -rd, hit.nor, hit.dpdu, u1, u2, u3, static.material_types,
            mode=mode)
        dead = surf & (is_black(fr) | (pdf <= 0.0))
        alive &= ~dead
        surf_go = surf & ~dead
        beta_next = beta * fr * jnp.abs(dot(wo, hit.nor))[:, None] \
            / jnp.maximum(pdf, 1e-30)[:, None]
        beta = jnp.where(surf_go[:, None], beta_next, beta)
        forward = jnp.where(surf_go, jnp.where(delta, 0.0, pdf), forward)

        # reverse pdf of the previous vertex (pathtracer.cu:1666-1671)
        _, pdf_r = bsdf_mod.eval_bsdf(
            mat, wo, -rd, hit.nor, hit.dpdu, static.material_types)
        rev_s = _convert_pdf(pdf_r, hit.pos, prev_pos, prev_nor)
        verts = verts.replace(
            rev=_lane_set(verts.rev, surf_go, prev_idx, rev_s))

        out_side = jnp.where(dot(wo, hit.nor) > 0.0, hit.medium_outside,
                             hit.medium_inside)
        same_side = dot(-rd, hit.nor) * dot(wo, hit.nor) > 0.0
        med = jnp.where(surf_go, jnp.where(same_side, med, out_side), med)
        ro = jnp.where(surf_go[:, None], hit.pos, ro)
        rd = jnp.where(surf_go[:, None], wo, rd)

        consumed = in_scatter | surf
        verts = verts.replace(
            count=jnp.where(consumed, verts.count + 1, verts.count))
        bounce_ct = jnp.where(consumed | interface,
                              jnp.where(interface, bounce_ct, bounce_ct + 1),
                              bounce_ct)

        # Russian roulette (pathtracer.cu:1679-1686)
        u_rr = rng.uniform((n,))
        rr_pdf = jnp.clip(1.0 - luminance(beta), 0.0, 1.0)
        do_rr = alive & (in_scatter | surf_go) & (bounce_ct > 4)
        alive &= ~(do_rr & (u_rr < rr_pdf))
        scale = 1.0 / jnp.maximum(1.0 - rr_pdf, 1e-30)
        beta = jnp.where((do_rr & alive)[:, None], beta * scale[:, None],
                         beta)

        return (verts, ro, rd, beta, forward, med, alive, bounce_ct), None

    carry = (verts, ro, rd, beta, forward, med, alive, bounce_ct)
    carry, _ = jax.lax.scan(step, carry, jnp.arange(n_steps))
    return carry[0]


def _camera_subpath(scene, static, key, pixel_x, pixel_y, n_verts):
    """GenerateCameraPath (pathtracer.cu:1415-1553). No DoF (quirk)."""
    n = pixel_x.shape[0]
    rng = RngStream(jax.random.fold_in(key, 0))
    ox = rng.uniform((n,)) - 0.5
    oy = rng.uniform((n,)) - 0.5
    ro, rd = camera_mod.generate_primary_ray(
        scene.camera, pixel_x.astype(jnp.float32) + ox,
        pixel_y.astype(jnp.float32) + oy,
        jnp.zeros((n, 2), jnp.float32), static.environment_camera)

    verts = _empty_vertices(n, n_verts)
    cam_pos = jnp.broadcast_to(scene.camera.position, (n, 3))
    cam_nor = jnp.broadcast_to(-scene.camera.w, (n, 3))
    med0 = jnp.full(n, static.camera_medium, jnp.int32)
    t = jnp.ones(n, bool)
    verts = verts.replace(
        pos=_lane_set(verts.pos, t, verts.count, cam_pos),
        nor=_lane_set(verts.nor, t, verts.count, cam_nor),
        beta=_lane_set(verts.beta, t, verts.count,
                       jnp.ones((n, 3), jnp.float32)),
        fwd=_lane_set(verts.fwd, t, verts.count, jnp.ones(n, jnp.float32)),
        medium=_lane_set(verts.medium, t, verts.count, med0),
        count=verts.count + 1)

    _, forward = camera_mod.pdf_camera(scene.camera, rd)
    beta = jnp.ones((n, 3), jnp.float32)
    return _generate_subpath(
        scene, static, jax.random.fold_in(key, 1), n_verts, ro, rd, beta,
        forward, med0, verts, bsdf_mod.RADIANCE)


def _light_subpath(scene, static, key, n, n_verts):
    """GenerateLightPath (pathtracer.cu:1553-1690)."""
    rng = RngStream(jax.random.fold_in(key, 0))
    eps = scene.epsilon
    u_pick = rng.uniform((n,))
    light_idx, choice_pdf = lights_mod.pick_light(scene, u_pick)
    light_idx = jnp.minimum(light_idx, max(static.n_lights - 1, 0))
    u1, u2, u3 = rng.uniform3((n,))
    u4 = rng.uniform((n,))
    ro, rd, l_nor, radiance, pdf_a, pdf_w = \
        lights_mod.sample_area_light_emission(
            scene, light_idx, u1, u2, u3, u4, eps)
    med0 = jnp.take(scene.l_medium, light_idx, axis=0) \
        if static.has_media else jnp.full(n, -1, jnp.int32)

    verts = _empty_vertices(n, n_verts)
    t = jnp.ones(n, bool)
    verts = verts.replace(
        pos=_lane_set(verts.pos, t, verts.count, ro),
        nor=_lane_set(verts.nor, t, verts.count, l_nor),
        beta=_lane_set(verts.beta, t, verts.count, radiance),
        fwd=_lane_set(verts.fwd, t, verts.count, pdf_a * choice_pdf),
        light_idx=_lane_set(verts.light_idx, t, verts.count, light_idx),
        medium=_lane_set(verts.medium, t, verts.count, med0),
        count=verts.count + 1)

    denom = jnp.maximum(pdf_a * pdf_w * choice_pdf, 1e-30)
    beta = radiance * (jnp.abs(dot(rd, l_nor)) / denom)[:, None]
    return _generate_subpath(
        scene, static, jax.random.fold_in(key, 1), n_verts, ro, rd, beta,
        pdf_w, med0, verts, bsdf_mod.IMPORTANCE)


def _remap(x):
    """Delta pdfs are stored as 0; MIS remaps them to 1
    (pathtracer.cu:1695-1697)."""
    return jnp.where(x == 0.0, 1.0, x)


def _mis_tables(v: Vertices, lo):
    """Override-free MIS suffix tables for one subpath side, computed
    ONCE per iteration (they do not depend on the connection round).

    The iterative MIS loop (pathtracer.cu:1690-1718) computes
        sum = SUM_{i=lo..end} (PROD_{j=i..end} r_j) ok_i,
        r_j = remap(rev_j) / remap(fwd_j),
        ok_i = ~delta_i & ~delta_{max(i-1, lo-? i-1)}  (i==0: own delta)
    where only j = end and end-1 carry per-connection override revs.
    Factor the standard part as suffix sums over the table columns:
        A[m] = SUM_{i=lo..m} (PROD_{j=i..m} r_j) ok_i
             = r_m * (ok_m + A[m-1])
    — K steps of [N]-wide math. A connection round then reconstructs
        sum = r_end * (ok_end + r_end1 * (ok_end1 + A[end-2]))
    with O(1) item-grid ops: the K^2 column-select loop (measured
    4.7 s/iter of the dense BDPT at 512^2 depth 17) disappears.
    Returns (ok [N, K] float 0/1, A [N, K])."""
    r = _remap(v.rev) / _remap(v.fwd)
    delta = v.delta
    dprev = jnp.concatenate([delta[:, :1], delta[:, :-1]], axis=1)
    ok = (~delta & ~dprev).astype(jnp.float32)
    if lo == 1:
        ok = ok.at[:, 0].set(0.0)
    acc = jnp.zeros(r.shape[0], jnp.float32)
    cols = []
    for m_ in range(r.shape[1]):
        acc = r[:, m_] * (ok[:, m_] + acc)
        cols.append(acc)
    return ok, jnp.stack(cols, axis=1)


def _ge(i, lo):
    """i >= lo for python/numpy/traced index forms."""
    if isinstance(i, (int, np.integer)):
        return i >= lo
    return i >= lo          # numpy [1, G] -> numpy bool; traced -> jnp


def _mis_weight(cam_fwd, cam_ok, cam_A, light_fwd, light_ok, light_A,
                s, t, c1_rev, c2_rev, l1_rev, l2_rev, l0_fwd):
    """MIS weight (pathtracer.cu:1690-1718) from the factored suffix
    tables (_mis_tables) plus the round's override pdfs: c1/c2 replace
    cam rev at s-1/s-2, l1/l2 light rev at t-1/t-2, l0_fwd light
    fwd[0] when t == 1 (NaN = no override; every NaN slot is masked by
    an index guard below exactly where the iterative loop's i-tests
    masked it). s/t are python ints, STATIC numpy [1, G] columns, or
    traced scalars; overrides are [N, G]. Returns [N, G]."""
    def pick(arr, i, lo):
        return jnp.where(jnp.asarray(_ge(i, lo)), _colv(arr, i), 0.0)

    # camera side: terms exist for i in [1, s-1]
    r_e = jnp.where(jnp.asarray(_ge(s - 1, 1)),
                    _remap(c1_rev) / _remap(_colv(cam_fwd, s - 1)), 0.0)
    r_e1 = jnp.where(jnp.asarray(_ge(s - 2, 1)),
                     _remap(c2_rev) / _remap(_colv(cam_fwd, s - 2)), 0.0)
    sum_w = r_e * (pick(cam_ok, s - 1, 1)
                   + r_e1 * (pick(cam_ok, s - 2, 1)
                             + pick(cam_A, s - 3, 1)))

    # light side: terms exist for i in [0, t-1]
    f_e = _colv(light_fwd, t - 1)
    f_e = jnp.where(jnp.asarray(t == 1), l0_fwd, f_e)
    r_le = jnp.where(jnp.asarray(_ge(t - 1, 0)),
                     _remap(l1_rev) / _remap(f_e), 0.0)
    r_le1 = jnp.where(jnp.asarray(_ge(t - 2, 0)),
                      _remap(l2_rev) / _remap(_colv(light_fwd, t - 2)),
                      0.0)
    sum_w = sum_w + r_le * (pick(light_ok, t - 1, 0)
                            + r_le1 * (pick(light_ok, t - 2, 0)
                                       + pick(light_A, t - 3, 0)))
    w = 1.0 / (1.0 + sum_w)
    return jnp.where(jnp.asarray(s + t == 2), jnp.ones_like(w), w)


# Tr work-queue chunk count: valid connections are compacted to a
# prefix and the transmittance walker runs on fixed-size chunks of
# mm/TR_CHUNKS inside a while_loop — ONE compiled Tr body per case,
# ceil(valid/C) executions. 16 puts the chunk near the proven 262k
# tracking width at 512^2 depth 17 (mm = 4.4M).
TR_CHUNKS = 16


def render_lanes(scene, static, key, pixel_x, pixel_y, lane_mask):
    """One BDPT sample per lane. Returns (li [N,3], splat film [W*H,3]).

    li holds the s>=2 strategies for the lane's own pixel; the film holds
    the s==1 light-tracing splats (Bdpt kernel, pathtracer.cu:1933-1970).
    """
    n = pixel_x.shape[0]
    n_verts = static.max_depth + 1
    eps = scene.epsilon
    cam_v = _camera_subpath(scene, static, jax.random.fold_in(key, 0),
                            pixel_x, pixel_y, n_verts)
    light_v = _light_subpath(scene, static, jax.random.fold_in(key, 1),
                             n, n_verts)
    if static.n_lights == 0:
        light_v = light_v.replace(count=jnp.zeros(n, jnp.int32))

    li = jnp.zeros((n, 3), jnp.float32)
    film = jnp.zeros((static.width * static.height, 3), jnp.float32)
    cam = scene.camera

    # ---- dense [N, G] strategy grids ------------------------------------
    # In-jit anatomy of the per-(s,t)-round form (2026-08-20, cornell
    # 512^2 depth 17): a round costs ~24 ms whether it runs 262k lanes
    # or a 4k compacted prefix — rounds are FIXED-OP-COUNT bound, so 340
    # rounds cost ~20 s no matter how small the math gets, and per-item
    # compaction gathers (measured 0.035 spp/s) only add byte-bound
    # row-gather traffic on top. The fix exploits that one strategy
    # index maps to the grid COLUMN: in a round batched over g, the
    # per-item vertex index t-1 = g+1 is STATIC PER COLUMN, so vertex
    # fetches are contiguous [:, 1:1+G] slices of the [N, K] tables
    # (full HBM bandwidth, zero gathers), MIS runs in [N, G] shape
    # against the un-gathered [N, K] pdf tables (_colv selects), and
    # only the transmittance walker sees compacted items (narrow w8
    # row gathers of the actual connections, chunked while_loop).
    #   gen: one round per s (t = column)  -> n_verts-1 rounds
    #   t0 / t1 / s1: ONE round each (s or t = column)
    # 340 rounds / 306 Tr calls collapse to 20 rounds / ~20-30 Tr
    # chunk executions with the same arithmetic work.
    G = n_verts - 1
    # override-free MIS suffix tables, once per iteration (round-
    # independent; see _mis_tables)
    cam_ok, cam_A = _mis_tables(cam_v, 1)
    light_ok, light_A = _mis_tables(light_v, 0)

    def _vslice(v: Vertices, lo, gw=None):
        """Vertex records at column g+lo for every (lane, g) item:
        contiguous slices of the [Nr, K(,c)] tables, flattened
        [Nr*gw, c]. Works on the full wavefront and on lane-compacted
        sub-Vertices alike (Nr from the input shape)."""
        gw = G if gw is None else gw
        lo = max(lo, 0)
        sl = slice(lo, lo + gw)
        mr = v.pos.shape[0] * gw
        return dict(
            pos=v.pos[:, sl].reshape(mr, 3),
            nor=v.nor[:, sl].reshape(mr, 3),
            uv=v.uv[:, sl].reshape(mr, 2),
            dpdu=v.dpdu[:, sl].reshape(mr, 3),
            beta=v.beta[:, sl].reshape(mr, 3),
            mat_idx=v.mat_idx[:, sl].reshape(mr),
            light_idx=v.light_idx[:, sl].reshape(mr),
            med=v.medium[:, sl].reshape(mr),
            delta=v.delta[:, sl].reshape(mr))

    def _vat(v: Vertices, i, gw=None):
        """Vertex records at one traced scalar column i, broadcast to
        the item grid (dynamic slice + broadcast — still no gathers)."""
        nr = v.pos.shape[0]
        gw = G if gw is None else gw

        def b(x):
            x = _col(x, i)                          # [Nr(,c)]
            return jnp.broadcast_to(
                x[:, None], (nr, gw) + x.shape[1:]).reshape(
                    (nr * gw,) + x.shape[1:])
        return dict(pos=b(v.pos), nor=b(v.nor), uv=b(v.uv),
                    dpdu=b(v.dpdu), beta=b(v.beta),
                    mat_idx=b(v.mat_idx), light_idx=b(v.light_idx),
                    med=b(v.medium), delta=b(v.delta))

    mis6_full = (cam_v.fwd, cam_ok, cam_A, light_v.fwd, light_ok, light_A)

    def dense_round(case, p, s, t, c1, c2, l1, l2, valid2, carry,
                    lane_ids=None, mis6=None):
        """One batched connection round, specialized to a STATIC case
        ('t0' | 't1' | 's1' | 'gen'), over a dense [Nr, G] item grid.

        s/t: python int or [1, G] strategy columns. c1/c2 (camera side,
        at s-1/s-2) and l1/l2 (light side, t-1/t-2) are flat [Nr*G, c]
        record dicts built by _vslice/_vat. All case math runs
        full-width flat [Nr*G] (same arithmetic the 17 separate rounds
        did); masked items compute garbage that is discarded. The
        per-round rng key is p; draws are per-item so strategies stay
        independent (estimator equivalent to the per-(s,t) rounds, not
        bit-identical — goldens regenerated).

        Nr defaults to the full wavefront (lane_ids = arange(n)); the
        LANE-COMPACTED gen rounds (see gen_body) pass the compacted
        prefix's lane ids and row-gathered MIS tables instead — the
        round body is identical, only narrower."""
        li, film = carry
        n_r, G_r = valid2.shape
        valid = valid2.reshape(-1)
        m = n_r * G_r
        if lane_ids is None:
            lane_ids = jnp.arange(n, dtype=jnp.int32)
        item_lane = jnp.repeat(lane_ids, G_r, total_repeat_length=m)
        if mis6 is None:
            mis6 = mis6_full
        rng = RngStream(jax.random.fold_in(key, 5000 + p))
        nanf = jnp.full(m, jnp.nan, jnp.float32)

        # flat-broadcast strategy indices where case math needs them
        if case in ("t0", "t1", "gen"):
            c1p, c1n = c1["pos"], c1["nor"]
            c2p, c2n = c2["pos"], c2["nor"]
            c1_beta = c1["beta"]
            c1_mat_idx = c1["mat_idx"]
            c1_light = c1["light_idx"]
            c1_uv = c1["uv"]
            c1_dpdu = c1["dpdu"]
            c1_med = c1["med"]
            c1_delta = c1["delta"]
            c1_is_med = c1_mat_idx == -1
            in_c1 = normalize(c2p - c1p)   # toward the camera side
        if case in ("s1", "gen"):
            l1p, l1n = l1["pos"], l1["nor"]
            l2p, l2n = l2["pos"], l2["nor"]
            l1_beta = l1["beta"]
            l1_mat_idx = l1["mat_idx"]
            l1_uv = l1["uv"]
            l1_dpdu = l1["dpdu"]
            l1_med = l1["med"]
            l1_delta = l1["delta"]
            l1_is_med = l1_mat_idx == -1
            l1_mat = bsdf_mod.gather_materials(
                scene, static, l1_mat_idx, l1_uv)
            in_l1 = normalize(l2p - l1p)   # toward the light side
        if case in ("t1", "gen"):
            c1_mat = bsdf_mod.gather_materials(
                scene, static, c1_mat_idx, c1_uv)

        def surf_or_phase(is_med, med_idx, mat, nor, dpdu, w_in, w_out):
            """fr and forward pdf at a vertex: BSDF or phase
            (pathtracer.cu:1775-1786, 1829-1836, 1888-1898)."""
            ph = media_mod.phase(scene, med_idx, w_in, w_out) \
                if static.has_media else jnp.zeros(m, jnp.float32)
            fr_s, pdf_s = bsdf_mod.eval_bsdf(
                mat, w_in, w_out, nor, dpdu, static.material_types)
            fr = jnp.where(is_med[:, None], ph[:, None], fr_s)
            pdf = jnp.where(is_med, ph, pdf_s)
            return fr, pdf

        if case == "t0":
            # ==== case t == 0: camera path hit a light (cu:1722-1749) ====
            dir0 = in_c1
            le0 = lights_mod.area_light_le(scene, c1_light, c1n, dir0)
            L0 = c1_beta * le0
            choice0 = lights_mod.light_choice_pdf(
                scene, jnp.maximum(c1_light, 0))
            pdfA0, pdfW0 = lights_mod.area_light_pdf(
                scene, jnp.maximum(c1_light, 0), dir0, c1n)
            case_valid = valid & (c1_light >= 0) & ~is_black(L0)
            Lpre = L0
            c1_rev = pdfA0 * choice0
            c2_rev = _convert_pdf(pdfW0, c1p, c2p, c2n)
            l1_rev = l2_rev = l0_fwd = nanf

        if case == "t1":
            # ==== case t == 1: NEE from the camera path (cu:1750-1809) ===
            u_pick = rng.uniform((m,))
            pick_idx, choice1 = lights_mod.pick_light(scene, u_pick)
            pick_idx = jnp.minimum(pick_idx, max(static.n_lights - 1, 0))
            lu1, lu2 = rng.uniform2((m,))
            rad1, _, sd1, st1, lnor1, lpdf1 = lights_mod.sample_area_light(
                scene, pick_idx, c1p, lu1, lu2, eps)
            light_pos1 = c1p + sd1 * (st1 + eps)[:, None]
            fr1, next_pdf1 = surf_or_phase(
                c1_is_med, c1_med, c1_mat, c1n, c1_dpdu, in_c1, sd1)
            G1 = jnp.where(c1_is_med, 1.0, jnp.abs(dot(c1n, sd1)))
            L1pre = c1_beta * fr1 * rad1 * \
                (G1 / jnp.maximum(lpdf1 * choice1, 1e-30))[:, None]
            pdfA1, pdfW1 = lights_mod.area_light_pdf(
                scene, pick_idx, sd1, lnor1)
            _, rev_pdf1 = surf_or_phase(
                c1_is_med, c1_med, c1_mat, c1n, c1_dpdu, sd1, in_c1)
            case_valid = valid & ~is_black(rad1) & (lpdf1 > 0.0) \
                & ~(~c1_is_med & c1_delta) & ~is_black(L1pre)
            Lpre = L1pre
            l0_fwd = pdfA1 * choice1
            l1_rev = _convert_pdf(next_pdf1, c1p, light_pos1, lnor1)
            c1_rev = _convert_pdf(pdfW1, light_pos1, c1p, c1n)
            c2_rev = _convert_pdf(rev_pdf1, c1p, c2p, c2n)
            l2_rev = nanf
            sh_o, sh_d, sh_t, sh_med = c1p, sd1, st1, c1_med

        if case == "s1":
            # ==== case s == 1: splat to the camera (cu:1810-1857) ========
            _, sd2, st2, we2, cpdf2, rx2, ry2 = camera_mod.sample_camera(
                cam, l1p, eps)
            fr2, next_pdf2 = surf_or_phase(
                l1_is_med, l1_med, l1_mat, l1n, l1_dpdu, in_l1, sd2)
            cos2 = jnp.where(l1_is_med, 1.0, jnp.abs(dot(sd2, l1n)))
            L2pre = l1_beta * fr2 * \
                (we2 * cos2 / jnp.maximum(cpdf2, 1e-30))[:, None]
            _, cam_pdfw2 = camera_mod.pdf_camera(cam, -sd2)
            _, rev_pdf2 = surf_or_phase(
                l1_is_med, l1_med, l1_mat, l1n, l1_dpdu, sd2, in_l1)
            cam_pos = jnp.broadcast_to(cam.position, (m, 3))
            case_valid = valid & (cpdf2 != 0.0) \
                & ~(~l1_is_med & l1_delta) & ~is_black(L2pre)
            Lpre = L2pre
            l1_rev = _convert_pdf(cam_pdfw2, cam_pos, l1p, l1n)
            l2_rev = _convert_pdf(rev_pdf2, l1p, l2p, l2n)
            c1_rev = c2_rev = l0_fwd = nanf
            sh_o, sh_d, sh_t, sh_med = l1p, sd2, st2, l1_med

        if case == "gen":
            # ==== general case (cu:1858-1927) ============================
            conn = c1p - l1p
            d2g = jnp.maximum(dot(conn, conn), 1e-30)
            l1_to_c1 = conn / jnp.sqrt(d2g)[:, None]
            c1_to_l1 = -l1_to_c1
            fr_c1, pdf_to_l1 = surf_or_phase(
                c1_is_med, c1_med, c1_mat, c1n, c1_dpdu, in_c1, c1_to_l1)
            fr_l1, pdf_to_c1 = surf_or_phase(
                l1_is_med, l1_med, l1_mat, l1n, l1_dpdu, in_l1, l1_to_c1)
            cos_l = jnp.where(l1_is_med, 1.0, jnp.abs(dot(l1_to_c1, l1n)))
            cos_c = jnp.where(c1_is_med, 1.0, jnp.abs(dot(c1_to_l1, c1n)))
            G3 = cos_l * cos_c / d2g
            L3pre = c1_beta * fr_c1 * fr_l1 * l1_beta * G3[:, None]
            _, pdf_to_l2 = surf_or_phase(
                l1_is_med, l1_med, l1_mat, l1n, l1_dpdu, l1_to_c1, in_l1)
            _, pdf_to_c2 = surf_or_phase(
                c1_is_med, c1_med, c1_mat, c1n, c1_dpdu, c1_to_l1, in_c1)
            case_valid = valid & ~(~c1_is_med & c1_delta) \
                & ~(~l1_is_med & l1_delta) & ~is_black(L3pre)
            Lpre = L3pre
            c1_rev = _convert_pdf(pdf_to_c1, l1p, c1p, c1n)
            l1_rev = _convert_pdf(pdf_to_l1, c1p, l1p, l1n)
            l2_rev = _convert_pdf(pdf_to_l2, l1p, l2p, l2n)
            c2_rev = _convert_pdf(pdf_to_c2, c1p, c2p, c2n)
            l0_fwd = nanf
            sh_o, sh_d, sh_med = c1p, c1_to_l1, c1_med
            sh_t = jnp.sqrt(d2g) - eps

        # ---- contribution + MIS (pre-Tr: mis is independent of tr; the
        # shadow-ray transmittance multiplies in below) -------------------
        if "mis" in KNOCK:
            mis = jnp.full(m, 0.5, jnp.float32)
        else:
            mis = _mis_weight(
                *mis6, s, t,
                c1_rev.reshape(n_r, G_r), c2_rev.reshape(n_r, G_r),
                l1_rev.reshape(n_r, G_r), l2_rev.reshape(n_r, G_r),
                l0_fwd.reshape(n_r, G_r)).reshape(m)
        L = Lpre * mis[:, None]

        ok = case_valid & jnp.all(jnp.isfinite(L), axis=-1) & ~is_black(L)
        L = jnp.where(ok[:, None], L, 0.0)

        # s==1 -> splat at the sampled raster; else the item's own lane
        # (cu:1952-1967). A lane appears once per strategy g in the
        # grid, so the li accumulation must combine duplicates
        # (reshape-sum full-width; scatter-add in the Tr chunks).
        if case == "s1":
            idx = jnp.where(ok, rx2 + ry2 * static.width, 0)
        else:
            idx = item_lane

        if case == "t0" or "tr" in KNOCK:
            # no shadow ray: t0 connects along an existing path segment,
            # so its tr was the original's constant 1 (a no-op multiply)
            if case == "s1":
                film = film.at[idx].add(L)
            else:
                # no unique_indices: compacted lane_ids may repeat past
                # the active prefix (their L rows are zeroed)
                li = li.at[lane_ids].add(L.reshape(n_r, G_r, 3).sum(axis=1))
            return li, film

        if CONNECT_RR > 0.0:
            # shadow-connection RR: thin the Tr queue of negligible
            # contributions (see CONNECT_RR). Threshold scale = this
            # round's mean valid-connection luminance.
            lum = luminance(L)
            cnt_ok = jnp.maximum(jnp.sum(ok.astype(jnp.float32)), 1.0)
            mean_lum = jnp.sum(jnp.where(ok, lum, 0.0)) / cnt_ok
            q = jnp.clip(lum / jnp.maximum(CONNECT_RR * mean_lum, 1e-30),
                         0.0, 1.0)
            u_rr = RngStream(
                jax.random.fold_in(key, 6000 + p)).uniform((m,))
            keep = u_rr < q
            ok = ok & keep
            L = jnp.where(ok[:, None], L / jnp.maximum(q, 1e-30)[:, None],
                          0.0)

        # ---- chunked compacted Tr work-queue + scatter ------------------
        # Valid connections are a small fraction of the grid (gen mean
        # ~6%): compact them to a prefix and run the transmittance
        # walker + the final scatter on fixed-size chunks in a
        # while_loop — ONE compiled Tr body per case, ceil(cnt/C)
        # executions. The gathered payload is two w8 rows per item
        # (w8 is a measured-fast gather width; CLAUDE.md).
        packA = jnp.concatenate([
            sh_o, sh_d, jnp.where(ok, sh_t, 0.0)[:, None],
            sh_med.astype(jnp.float32)[:, None]], axis=1)     # [m, 8]
        packB = jnp.concatenate([
            L, jnp.zeros((m, 5), jnp.float32)], axis=1)       # [m, 8]
        idx_i32 = idx.astype(jnp.int32)  # kept integral: f32 packing
        # would silently corrupt indices >= 2^24 (ADVICE r4)
        src, cnt = media_mod._compact_partition(ok)
        C = max(min(m, 4096), m // TR_CHUNKS)
        n_chunks = -(-m // C)
        src_pad = jnp.concatenate(
            [src, jnp.zeros(n_chunks * C - m, jnp.int32)])

        def chunk(state):
            ch, li, film = state
            sel = jax.lax.dynamic_slice(src_pad, (ch * C,), (C,))
            A = jnp.take(packA, sel, axis=0)
            B = jnp.take(packB, sel, axis=0)
            act = ch * C + jnp.arange(C, dtype=jnp.int32) < cnt
            tr = media_mod.transmittance(
                scene, static, A[:, 7].astype(jnp.int32), A[:, 0:3],
                A[:, 3:6], jnp.where(act, A[:, 6], 0.0),
                jax.random.fold_in(key, 9000 + 32 * p + ch), act)
            Lc = jnp.where(act[:, None], B[:, 0:3] * tr, 0.0)
            idx_c = jnp.take(idx_i32, sel)
            if case == "s1":
                film = film.at[idx_c].add(Lc)
            else:
                li = li.at[idx_c].add(Lc)
            return ch + 1, li, film

        _, li, film = jax.lax.while_loop(
            lambda st: st[0] * C < cnt, chunk, (jnp.int32(0), li, film))
        return li, film

    # ---- the batched rounds: column blocks x lane-compaction ladder -----
    # Measured occupancy (cornell depth 17, r5): subpaths RR-terminate at
    # p50 length 5-6, so (a) P(cam_count >= s) drops below 0.08 from
    # s = 7 on — most gen rounds run nearly empty — and (b) strategy
    # columns t/s >= 10 are valid for < 4% of lanes, yet the dense
    # [N, G=17] grid pays all 17 columns' math every round. Two
    # orthogonal cuts with the SAME round body:
    # - column BLOCKS: columns [2, 10) always run; [10, G+2) run as a
    #   separate narrow round whose lanes (subpath length >= 10) are
    #   rare enough to lane-compact;
    # - lane-compaction LADDER: partition the block's active lanes to a
    #   prefix and run the round at n/64 or n/8 width (row-gathered
    #   sub-Vertices + MIS tables, scatter by lane id), falling back to
    #   the dense full-width trace when occupancy is high (zero overhead
    #   where compaction can't win).
    carry = (li, film)
    skip_all = "connect" in KNOCK
    cc = cam_v.count
    lc = light_v.count
    sz64, sz8 = max(n // 64, 1), max(n // 8, 1)
    # Column SPLIT is a measured NO-OP (2026-08-20 r5: 16.67 vs 16.60
    # s/iter with blocks [2,10)+[10,G+2) at depth 17) — the rounds are
    # not column-math-bound — while it ~2.5x'd XLA compile time (12 vs
    # 6 round traces). Single block by default; flip COLUMN_BLOCKS for
    # the experiment.
    blocks = ([(2, 8), (10, G - 8)] if COLUMN_BLOCKS and G > 10
              else [(2, G)])

    def round_block(case, p, s_arg, blk_lo, gw, comp_sizes, carry):
        g2b = (np.arange(gw, dtype=np.int32) + blk_lo)[None, :]
        g2bj = jnp.asarray(g2b)
        if case == "t0":
            act = lane_mask & (blk_lo <= cc)
        elif case == "t1":
            act = lane_mask & (1 <= lc) & (blk_lo <= cc)
        elif case == "s1":
            act = lane_mask & (blk_lo <= lc)
        else:
            act = lane_mask & (s_arg <= cc) & (blk_lo <= lc)

        def build(cam_s, light_s, pre2_s, lane_ids, mis6, c):
            if case == "gen":
                return dense_round(
                    case, p, s_arg, g2b,
                    _vat(cam_s, s_arg - 1, gw), _vat(cam_s, s_arg - 2, gw),
                    _vslice(light_s, blk_lo - 1, gw),
                    _vslice(light_s, blk_lo - 2, gw),
                    pre2_s, c, lane_ids=lane_ids, mis6=mis6)
            if case == "s1":
                return dense_round(
                    case, p, 1, g2b, None, None,
                    _vslice(light_s, blk_lo - 1, gw),
                    _vslice(light_s, blk_lo - 2, gw),
                    pre2_s, c, lane_ids=lane_ids, mis6=mis6)
            return dense_round(
                case, p, g2b, 0 if case == "t0" else 1,
                _vslice(cam_s, blk_lo - 1, gw),
                _vslice(cam_s, blk_lo - 2, gw), None, None,
                pre2_s, c, lane_ids=lane_ids, mis6=mis6)

        def run_dense(c):
            col = cc if case in ("t0", "t1") else lc
            pre2 = act[:, None] & (g2b <= col[:, None])
            return build(cam_v, light_v, pre2, None, None, c)

        if not comp_sizes:
            return jax.lax.cond(jnp.any(act), run_dense,
                                lambda c: c, carry)

        src, cnt_l = media_mod._compact_partition(act)

        def compacted(size):
            def run(c):
                sel = src[:size]
                take = lambda a: jnp.take(a, sel, axis=0)
                cam_s = jax.tree_util.tree_map(take, cam_v)
                light_s = jax.tree_util.tree_map(take, light_v)
                mis6 = (cam_s.fwd, take(cam_ok), take(cam_A),
                        light_s.fwd, take(light_ok), take(light_A))
                lane_act = jnp.arange(size) < cnt_l
                col_s = cam_s.count if case in ("t0", "t1") \
                    else light_s.count
                pre2_s = lane_act[:, None] & (g2bj <= col_s[:, None])
                return build(cam_s, light_s, pre2_s, sel, mis6, c)
            return run

        def run_sized(c):
            body = run_dense
            for size in reversed(comp_sizes):
                body = (lambda sz_, nxt: lambda c2: jax.lax.cond(
                    cnt_l <= sz_, compacted(sz_), nxt, c2))(size, body)
            return body(c)

        return jax.lax.cond(cnt_l > 0, run_sized, lambda c: c, carry)

    if not (skip_all or "s1" in KNOCK):
        for bi, (lo, gw) in enumerate(blocks):
            carry = round_block("s1", 1 + 20 * bi, 1, lo, gw,
                                [] if bi == 0 else [sz8], carry)
    if n_verts >= 2 and not skip_all:
        if "t0" not in KNOCK:
            carry = round_block("t0", 2, None, 2, G, [], carry)
        if "t1" not in KNOCK:
            for bi, (lo, gw) in enumerate(blocks):
                carry = round_block("t1", 3 + 20 * bi, None, lo, gw,
                                    [] if bi == 0 else [sz8], carry)
        if "gen" not in KNOCK:
            def gen_body(i, carry):
                s = i + 2
                for bi, (lo, gw) in enumerate(blocks):
                    carry = round_block(
                        "gen", 4 + i + 40 * bi, s, lo, gw,
                        [sz64, sz8] if bi == 0 else [sz8], carry)
                return carry
            carry = jax.lax.fori_loop(0, n_verts - 1, gen_body, carry)
    li, film = carry

    bad = jnp.any(~jnp.isfinite(li), axis=-1)
    li = jnp.where(bad[:, None], 0.0, li)
    return li, film
