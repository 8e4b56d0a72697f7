"""Flatten a HostScene + BVH into device-resident SoA arrays.

The TPU analog of the reference's BeginRender upload (pathtracer.cu:
2568-2695): everything the kernels need becomes a flat jnp array inside a
single `DeviceScene` pytree that can be passed through `jit` / `shard_map`.
Scene buffers are read-only and replicated across devices; primitives are
stored leaf-contiguously in BVH order so traversal reads are linear.

Anything that must be a *static* compile-time property (integrator type,
presence of env light, geometry-type mix, resolution) lives in
`StaticConfig`, which is hashable and passed as a static jit argument.
"""

from __future__ import annotations

from dataclasses import dataclass

import os

import numpy as np
import jax.numpy as jnp
from flax import struct

from gpu_pathtracer_tpu.geom.bvh import FlatBVH, load_or_build_bvh
from gpu_pathtracer_tpu.scene.model import (
    GeometryType, HostScene, IntegratorType, MediumType,
)

LUMA64 = np.array([0.212671, 0.715160, 0.072169])


@struct.dataclass
class DeviceCamera:
    """Device camera record (camera.h:8-46, precomputed film constants)."""
    position: jnp.ndarray  # [3]
    u: jnp.ndarray         # [3]
    v: jnp.ndarray         # [3]
    w: jnp.ndarray         # [3]
    resolution: jnp.ndarray  # [2] (x, y)
    distance: jnp.ndarray  # scalar
    half_w: jnp.ndarray    # scalar: film half-width at `distance`
    half_h: jnp.ndarray    # scalar
    pixel2screen: jnp.ndarray  # [2]
    ratio: jnp.ndarray     # focalDistance / distance
    area: jnp.ndarray      # 4*half_w*half_h
    aperture: jnp.ndarray  # scalar
    focal: jnp.ndarray     # scalar


@struct.dataclass
class DeviceScene:
    # BVH (geom/bvh.py layout)
    node_bbox_min: jnp.ndarray   # [N, 3]
    node_bbox_max: jnp.ndarray   # [N, 3]
    node_second_child: jnp.ndarray  # [N] i32 (-1 for leaves)
    node_start: jnp.ndarray      # [N] i32
    node_end: jnp.ndarray        # [N] i32 (inclusive)

    # primitives, leaf-contiguous BVH order
    prim_type: jnp.ndarray       # [P] i32 (GeometryType)
    v0: jnp.ndarray              # [P, 3] tri v0 | line p0 | sphere center
    v1: jnp.ndarray              # [P, 3] tri v1 | line p1
    v2: jnp.ndarray              # [P, 3] tri v2
    n0: jnp.ndarray              # [P, 3]
    n1: jnp.ndarray              # [P, 3]
    n2: jnp.ndarray              # [P, 3]
    uv0: jnp.ndarray             # [P, 2]
    uv1: jnp.ndarray             # [P, 2]
    uv2: jnp.ndarray             # [P, 2]
    dpdv_unit: jnp.ndarray       # [P, 3] precomputed shading-frame column
    radius0: jnp.ndarray         # [P] sphere radius | line width0
    radius1: jnp.ndarray         # [P] line width1
    mat_idx: jnp.ndarray         # [P] i32
    light_idx: jnp.ndarray       # [P] i32
    bssrdf_idx: jnp.ndarray      # [P] i32
    medium_inside: jnp.ndarray   # [P] i32
    medium_outside: jnp.ndarray  # [P] i32

    # materials
    m_type: jnp.ndarray          # [M] i32
    m_alpha_u: jnp.ndarray       # [M]
    m_alpha_v: jnp.ndarray       # [M]
    m_inside_ior: jnp.ndarray    # [M]
    m_outside_ior: jnp.ndarray   # [M]
    m_k: jnp.ndarray             # [M, 3]
    m_eta: jnp.ndarray           # [M, 3]
    m_diffuse: jnp.ndarray       # [M, 3]
    m_specular: jnp.ndarray      # [M, 3]
    m_tex_idx: jnp.ndarray       # [M] i32 (-1 = constant diffuse)

    # textures: one flat uint8 buffer + per-texture (offset, w, h)
    tex_data: jnp.ndarray        # [T, 3] u8, linear space
    tex_offset: jnp.ndarray      # [Nt] i32
    tex_w: jnp.ndarray           # [Nt] i32
    tex_h: jnp.ndarray           # [Nt] i32
    tex_corners: jnp.ndarray     # [T, 32] f32 corner-packed (texfetch)
    m_avg_texel: jnp.ndarray     # [M, 3] mean texel (fused stand-in)

    # area lights (emissive triangles, area.h:7-42)
    l_v0: jnp.ndarray            # [L, 3]
    l_v1: jnp.ndarray            # [L, 3]
    l_v2: jnp.ndarray            # [L, 3]
    l_n0: jnp.ndarray            # [L, 3]
    l_n1: jnp.ndarray            # [L, 3]
    l_n2: jnp.ndarray            # [L, 3]
    l_radiance: jnp.ndarray      # [L, 3]
    l_medium: jnp.ndarray        # [L] i32
    light_cdf: jnp.ndarray       # [L + 2] f32 normalized CDF (scene.h:64-82)

    # infinite environment light (infinite.h)
    env_data: jnp.ndarray        # [He, We, 3] f32 ([1,1,3] dummy if absent)
    env_u: jnp.ndarray           # [3]
    env_v: jnp.ndarray           # [3]
    env_w: jnp.ndarray           # [3]
    world_center: jnp.ndarray    # [3] scene bounding-sphere center
    world_radius: jnp.ndarray    # scalar

    # media
    med_type: jnp.ndarray        # [K] i32
    med_g: jnp.ndarray           # [K]
    med_sigma_a: jnp.ndarray     # [K, 3]
    med_sigma_s: jnp.ndarray     # [K, 3]
    med_sigma_t: jnp.ndarray     # [K, 3]
    med_density: jnp.ndarray     # [K, Dz, Dy, Dx] f32 (padded)
    # x-adjacent pairs (d[x], d[x+1]) so trilinear taps need 4 gathers
    # instead of 8 (the tracking loops' inner cost)
    med_density_pairs: jnp.ndarray  # [K, Dz, Dy, Dx, 2] f32
    # all 8 trilinear corners packed per cell (1-cell zero border), so one
    # row gather serves a whole tap — the batched tracking estimators'
    # innermost memory op. bf16-PAIR-packed: carrier c holds corner 2c in
    # its high 16 bits and corner 2c+1 in the low 16 (mantissa TRUNCATED,
    # i.e. rounded toward zero, so the decoded density never exceeds the
    # supervoxel majorants computed from the f32 grid). Width 4 instead
    # of 8 because the TPU row gather is BYTE-bound above width 4
    # (tools/bench_density_gather.py: 6.15 ms vs 15.25 ms per 1M rows) and
    # this gather is ~90% of a transmittance call (README knockout).
    # [K, Dz+1, Dy+1, Dx+1, 4] f32 carriers
    med_density_oct4: jnp.ndarray
    # u8-quantized oct grid (flatten._pack_u8_oct): 8 corners as bytes in
    # 2 INT32 carriers + per-medium scale — HALVES the gathered bytes
    # again vs the bf16 pairs (int32: float carriers would hit XLA's
    # sNaN->qNaN gather canonicalization).
    # [K, Dz+1, Dy+1, Dx+1, 2] i32 / [K] f32
    med_density_oct2: jnp.ndarray
    med_u8_scale: jnp.ndarray
    # supervoxel majorant grid (SV^3 cells, dilated by one fine cell for
    # the trilinear support), oct-packed like med_density_oct so a 2x2x2
    # neighborhood max is one row fetch. [K, SV+1, SV+1, SV+1, 8]
    med_sv_oct: jnp.ndarray
    # row-max of med_sv_oct flattened: the segment majorant as ONE small
    # table entry, fetched via ops/small_gather. [K*(SV+1)^3]
    med_sv_max: jnp.ndarray
    med_n: jnp.ndarray           # [K, 3] i32 (nx, ny, nz)
    med_p0: jnp.ndarray          # [K, 3]
    med_p1: jnp.ndarray          # [K, 3]
    med_inv_max_density: jnp.ndarray  # [K]
    med_eval_tr_type: jnp.ndarray     # [K] i32

    # bssrdfs
    b_sigma_a: jnp.ndarray       # [B, 3]
    b_sigma_sp: jnp.ndarray      # [B, 3]
    b_eta: jnp.ndarray           # [B]
    b_g: jnp.ndarray             # [B]

    # dense-intersection prim table (geom/dense_tpu.py Pallas kernel):
    # [Pp, 16] rows: v0(3) a(3) b(3) type r0 r1 prim_idx pad(3);
    # a/b = e1/e2 for tris, p1/- for lines; type -1 pads to sublane mult
    dense_prims: jnp.ndarray

    # block-culling table (geom/dense_tpu.py blocked kernel): bbox of each
    # 64-prim run of the BVH-leaf-ordered prim array. [NB, 8]:
    # min(3) max(3) pad(2)
    block_bbox: jnp.ndarray

    # packet-traversal table (geom/packet.py, built by geom/bvh8.py):
    # unified BVH8 rows [n8 + n_leaf_rows, 128]. Node row: 8 child slots
    # of [bbox_min(3) bbox_max(3) meta pad]; meta>0 node row, meta<0 leaf
    # row -meta. Leaf row: 8 prim slots of the dense_prims record layout
    # with col 13 = valid.
    bvh8_table: jnp.ndarray
    # bf16-packed node rows (4 nodes/row, bvh8.pack_nodes4) — the
    # VMEM-resident node scratch of the STREAMED TPU walk; ~1/8 the
    # bytes of the unified node rows so ~1M-prim node sets fit VMEM
    bvh8_nodes4: jnp.ndarray
    # instanced traversal (geom/tlas.py): [n_inst, 16] rows of
    # [world->blas 3x4 xform (12), blas root row, global slot base, pad].
    # [1, 16] zeros when the scene is not instanced.
    bvh8_aux: jnp.ndarray

    # packed attribute tables for MXU one-hot gathers (ops/gather.py):
    # prim_attrs [P, 40]: v0 v1 v2 | n0 n1 n2 | uv0 uv1 uv2 | dpdv |
    #   radius0 radius1 | type mat light bssrdf med_in med_out | pad
    prim_attrs: jnp.ndarray
    # compact shading-attribute table for the fused megakernel
    # (integrators/pt_fused.py), row-aligned with dense_prims:
    # [Pp, 16]: n0(3) n1(3) n2(3) dpdv(3) mat light type pad
    fused_attrs: jnp.ndarray
    # mat_attrs [M, 24]: type aU aV iIOR oIOR | k | eta | diffuse |
    #   specular | tex_idx | pad
    mat_attrs: jnp.ndarray
    # light_attrs [L, 24]: v0 v1 v2 | n0 n1 n2 | radiance | medium | pad
    light_attrs: jnp.ndarray

    camera: DeviceCamera
    epsilon: jnp.ndarray         # scalar ray offset (pathtracer.cu:38)


@dataclass(frozen=True)
class StaticConfig:
    """Hashable compile-time scene facts (static jit args)."""
    width: int
    height: int
    integrator: IntegratorType
    max_depth: int
    max_dist: float
    init_radius: float
    photons_per_iteration: int
    vpl_bias: float
    n_lights: int
    has_infinite: bool
    has_triangles: bool
    has_spheres: bool
    has_lines: bool
    has_textures: bool
    textured_types: tuple  # material types that carry a texture (the
    #                        fused kernel's textured mode is exact only
    #                        when these are all LAMBERTIAN — pt_fused)
    has_media: bool
    has_hetero: bool
    has_bssrdf: bool
    has_aniso: bool
    filmic: bool
    environment_camera: bool
    camera_medium: int
    med_iter_max: int
    track_k: int  # candidate cap for the batched free-flight estimators
    n_primitives: int
    n_nodes: int
    bvh8_n8: int    # node-row count of the unified BVH8 table
    bvh8_rows: int  # total rows (nodes + leaves + dummy)
    material_types: tuple  # sorted tuple of MaterialType ints present
    # instanced traversal (geom/tlas.py): 0/0 when not instanced
    bvh8_tlas_rows: int = 0   # TLAS node rows at the front of the table
    bvh8_n_inst: int = 0      # instance count (0 = flat scene)


def _tri_dpdv(pos: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """Per-triangle dpdv column of the shading frame (mesh.h:69-91).

    When the uv determinant is degenerate the reference falls back to
    MakeCoordinate on the geometric normal and uses its `w` output.
    """
    e1 = pos[:, 1] - pos[:, 0]
    e2 = pos[:, 2] - pos[:, 0]
    duv1 = uv[:, 1] - uv[:, 0]
    duv2 = uv[:, 2] - uv[:, 0]
    det = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    ok = np.abs(det) >= 1e-8
    inv = 1.0 / np.where(ok, det, 1.0)
    dpdv = (-duv2[:, 0:1] * e1 + duv1[:, 0:1] * e2) * inv[:, None]

    nn = np.cross(e1, e2)
    nn /= np.maximum(np.linalg.norm(nn, axis=-1, keepdims=True), 1e-30)
    # MakeCoordinate w-branch (wrap.h:6-16)
    use_x = np.abs(nn[:, 0]) > np.abs(nn[:, 1])
    inv_x = 1.0 / np.sqrt(nn[:, 0] ** 2 + nn[:, 2] ** 2 + 1e-30)
    wx = np.stack([nn[:, 2] * inv_x, np.zeros_like(inv_x),
                   -nn[:, 0] * inv_x], -1)
    inv_y = 1.0 / np.sqrt(nn[:, 1] ** 2 + nn[:, 2] ** 2 + 1e-30)
    wy = np.stack([np.zeros_like(inv_y), nn[:, 2] * inv_y,
                   -nn[:, 1] * inv_y], -1)
    w = np.where(use_x[:, None], wx, wy)

    out = np.where(ok[:, None], dpdv, w)
    ln = np.linalg.norm(out, axis=-1, keepdims=True)
    return (out / np.maximum(ln, 1e-30)).astype(np.float32)


def _oct_pack(med_density: np.ndarray) -> np.ndarray:
    """[K,Dz,Dy,Dx] -> [K,Dz+1,Dy+1,Dx+1,8]: the 8 trilinear corner values
    of every cell, with a zero border so edge taps read 0."""
    K, Dz, Dy, Dx = med_density.shape
    P = np.zeros((K, Dz + 2, Dy + 2, Dx + 2), np.float32)
    P[:, 1:-1, 1:-1, 1:-1] = med_density
    oct_ = np.empty((K, Dz + 1, Dy + 1, Dx + 1, 8), np.float32)
    c = 0
    for oz in (0, 1):
        for oy in (0, 1):
            for ox in (0, 1):
                oct_[..., c] = P[:, oz:oz + Dz + 1, oy:oy + Dy + 1,
                                 ox:ox + Dx + 1]
                c += 1
    return oct_


def _pack_u8_oct(oct_: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[K,...,8] f32 -> ([K,...,2] f32 carrying 8 u8 bytes, scale [K]).

    Per-medium linear quantization q = floor(d / scale), scale =
    grid_max/255, decode d' = q*scale. floor rounds DOWN (in float64,
    so the float rounding cannot tip it up): d' <= d everywhere, and the
    supervoxel majorants (computed from the f32 grid) stay valid bounds
    for the quantized field, exactly like the bf16-pair truncation.
    Absolute error <= grid_max/255 — optically that bounds the
    per-unit-length optical-depth error at 0.4% of the peak extinction.

    Carriers are INT32, not f32: a byte pattern with an all-ones
    exponent field is a float NaN, and XLA's gather canonicalizes
    sNaN -> qNaN (sets mantissa bit 22), silently corrupting byte 2.
    Integer rows gather bit-exactly at the same byte width.
    """
    K = oct_.shape[0]
    gmax = oct_.reshape(K, -1).max(axis=1).astype(np.float64)
    scale = np.where(gmax > 0, gmax / 255.0, 1.0)
    q = np.floor(oct_.astype(np.float64)
                 / scale.reshape(K, 1, 1, 1, 1)).astype(np.uint32)
    q = np.minimum(q, 255)
    lo = q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16) | (q[..., 3] << 24)
    hi = q[..., 4] | (q[..., 5] << 8) | (q[..., 6] << 16) | (q[..., 7] << 24)
    packed = np.stack([lo, hi], axis=-1).view(np.int32)
    return packed, scale.astype(np.float32)


def _pack_bf16_pairs(oct_: np.ndarray) -> np.ndarray:
    """[..., 8] f32 -> [..., 4] f32 carriers: value 2c TRUNCATED to bf16
    in the high 16 bits of carrier c, value 2c+1 in the low 16. Mantissa
    truncation rounds non-negative densities toward zero, so the decoded
    value never exceeds the f32 it came from — the supervoxel majorants
    (computed from the f32 grid) stay valid bounds and the null-collision
    weights in shade/media.py stay non-negative."""
    u = np.ascontiguousarray(oct_, np.float32).view(np.uint32)
    hi = u[..., 0::2] & np.uint32(0xFFFF0000)
    lo = u[..., 1::2] >> np.uint32(16)
    return (hi | lo).view(np.float32)


SV = 24  # supervoxel grid resolution per axis. Tightness matters: on the
# cornell smoke grid the mean 2x2x2-dilated segment majorant is 0.42 at
# SV=8 vs 0.19 at SV=24 (true mean density 0.046) — tracking candidate
# counts, and with them the dominant density-gather volume, scale with it.


def _sv_res(n_media: int) -> int:
    """Largest supervoxel resolution whose oct-packed majorant table fits
    the pallas small-table lookup (ops/small_gather.py MAX_GROUPS*128
    entries across all media). media.NSEG = ceil(sqrt(3)*SV_max) remains
    a valid segment count for any smaller resolution."""
    cap = 256 * 128
    sv = SV
    while n_media * (sv + 1) ** 3 > cap and sv > 2:
        sv -= 1
    return sv


def _sv_majorants(med_density: np.ndarray, med_n: np.ndarray) -> np.ndarray:
    """[K,Dz,Dy,Dx] -> [K,SV,SV,SV] local majorants: max density over each
    supervoxel's region dilated by one fine cell (trilinear support)."""
    K = med_density.shape[0]
    SV = _sv_res(K)
    out = np.zeros((K, SV, SV, SV), np.float32)
    for k in range(K):
        nx, ny, nz = int(med_n[k][0]), int(med_n[k][1]), int(med_n[k][2])
        if nx * ny * nz <= 1:
            continue
        d = med_density[k, :nz, :ny, :nx]
        zs = np.linspace(0, nz, SV + 1)
        ys = np.linspace(0, ny, SV + 1)
        xs = np.linspace(0, nx, SV + 1)
        for iz in range(SV):
            z0, z1 = int(zs[iz]) - 1, int(np.ceil(zs[iz + 1])) + 1
            for iy in range(SV):
                y0, y1 = int(ys[iy]) - 1, int(np.ceil(ys[iy + 1])) + 1
                for ix in range(SV):
                    x0 = int(xs[ix]) - 1
                    x1 = int(np.ceil(xs[ix + 1])) + 1
                    r = d[max(z0, 0):z1, max(y0, 0):y1, max(x0, 0):x1]
                    out[k, iz, iy, ix] = r.max() if r.size else 0.0
    return out


def _prim_bboxes(scene: HostScene):
    """Per-primitive AABBs for the BVH build."""
    n = len(scene.primitives)
    bmin = np.empty((n, 3), np.float32)
    bmax = np.empty((n, 3), np.float32)
    for i, p in enumerate(scene.primitives):
        if p.type == GeometryType.TRIANGLE:
            tri = scene.tri_positions[p.tri_index]
            bmin[i] = tri.min(axis=0)
            bmax[i] = tri.max(axis=0)
        elif p.type == GeometryType.SPHERE:
            bmin[i] = p.center - p.radius
            bmax[i] = p.center + p.radius
        else:  # LINE (line.h:15-25)
            w = max(p.width0, p.width1)
            lo = np.minimum(p.p0, p.p1) - w
            hi = np.maximum(p.p0, p.p1) + w
            bmin[i] = lo
            bmax[i] = hi
    return bmin, bmax


def flatten_scene(scene: HostScene, cache: bool = True
                  ) -> tuple[DeviceScene, StaticConfig]:
    bmin, bmax = _prim_bboxes(scene)
    # Instanced (TLAS/BLAS) traversal for repeated meshes (geom/tlas.py):
    # only the Pallas packet kernel reads the instanced table, so the
    # plan activates on TPU (or under the test override). When active,
    # the flat all-prims binary BVH is replaced by a 1-leaf stand-in —
    # its prim_order carries the (instance, blas-local) slot layout the
    # instanced kernel's `base + local` pid math assumes.
    import jax as _jax

    from gpu_pathtracer_tpu.geom import tlas as tlas_mod
    plan = None
    if (_jax.default_backend() == "tpu"
            or os.environ.get("PTPU_FORCE_INSTANCING")):
        plan = tlas_mod.plan_instances(scene, bmin, bmax, cache=cache)
    if plan is None:
        bvh: FlatBVH = load_or_build_bvh(bmin, bmax, cache=cache)
        order = bvh.prim_order
    else:
        order = plan.order
        wmin = bmin.min(0)
        wmax = bmax.max(0)
        bvh = FlatBVH(
            bbox_min=wmin[None].astype(np.float32),
            bbox_max=wmax[None].astype(np.float32),
            is_leaf=np.ones(1, bool),
            second_child=np.full(1, -1, np.int32),
            start=np.zeros(1, np.int32),
            end=np.asarray([order.shape[0] - 1], np.int32),
            prim_order=order)
    P = order.shape[0]

    prim_type = np.zeros(P, np.int32)
    v0 = np.zeros((P, 3), np.float32)
    v1 = np.zeros((P, 3), np.float32)
    v2 = np.zeros((P, 3), np.float32)
    n0 = np.zeros((P, 3), np.float32)
    n1 = np.zeros((P, 3), np.float32)
    n2 = np.zeros((P, 3), np.float32)
    uv0 = np.zeros((P, 2), np.float32)
    uv1 = np.zeros((P, 2), np.float32)
    uv2 = np.zeros((P, 2), np.float32)
    radius0 = np.zeros(P, np.float32)
    radius1 = np.zeros(P, np.float32)
    mat_idx = np.full(P, -1, np.int32)
    light_idx = np.full(P, -1, np.int32)
    bssrdf_idx = np.full(P, -1, np.int32)
    medium_inside = np.full(P, -1, np.int32)
    medium_outside = np.full(P, -1, np.int32)

    tri_rows = []
    tri_slots = []
    for slot, pi in enumerate(order):
        p = scene.primitives[pi]
        prim_type[slot] = int(p.type)
        mat_idx[slot] = p.matIdx
        light_idx[slot] = p.lightIdx
        bssrdf_idx[slot] = p.bssrdfIdx
        medium_inside[slot] = p.mediumInside
        medium_outside[slot] = p.mediumOutside
        if p.type == GeometryType.TRIANGLE:
            tri_rows.append(p.tri_index)
            tri_slots.append(slot)
        elif p.type == GeometryType.SPHERE:
            v0[slot] = p.center
            radius0[slot] = p.radius
        else:
            v0[slot] = p.p0
            v1[slot] = p.p1
            radius0[slot] = p.width0
            radius1[slot] = p.width1

    dpdv = np.zeros((P, 3), np.float32)
    if tri_rows:
        tr = np.asarray(tri_rows)
        ts = np.asarray(tri_slots)
        pos = scene.tri_positions[tr]
        nor = scene.tri_normals[tr]
        uvs = scene.tri_uvs[tr]
        v0[ts], v1[ts], v2[ts] = pos[:, 0], pos[:, 1], pos[:, 2]
        n0[ts], n1[ts], n2[ts] = nor[:, 0], nor[:, 1], nor[:, 2]
        uv0[ts], uv1[ts], uv2[ts] = uvs[:, 0], uvs[:, 1], uvs[:, 2]
        dpdv[ts] = _tri_dpdv(pos, uvs)

    # ---- materials --------------------------------------------------------
    M = max(len(scene.materials), 1)
    m_type = np.zeros(M, np.int32)
    m_alpha_u = np.full(M, 0.01, np.float32)
    m_alpha_v = np.full(M, 0.01, np.float32)
    m_inside = np.ones(M, np.float32)
    m_outside = np.ones(M, np.float32)
    m_k = np.zeros((M, 3), np.float32)
    m_eta = np.zeros((M, 3), np.float32)
    m_diffuse = np.ones((M, 3), np.float32)
    m_specular = np.ones((M, 3), np.float32)
    m_tex = np.full(M, -1, np.int32)
    for i, m in enumerate(scene.materials):
        m_type[i] = int(m.type)
        m_alpha_u[i] = m.alphaU
        m_alpha_v[i] = m.alphaV
        m_inside[i] = m.insideIOR
        m_outside[i] = m.outsideIOR
        m_k[i] = m.k
        m_eta[i] = m.eta
        m_diffuse[i] = m.diffuse
        m_specular[i] = m.specular
        m_tex[i] = m.textureIdx

    # ---- textures ---------------------------------------------------------
    if scene.textures:
        tex_offset = []
        tex_w = []
        tex_h = []
        chunks = []
        off = 0
        for t in scene.textures:
            tex_offset.append(off)
            tex_w.append(t.width)
            tex_h.append(t.height)
            chunks.append(t.data.reshape(-1, 3))
            off += t.width * t.height
        tex_data = np.concatenate(chunks, axis=0)
        tex_offset = np.asarray(tex_offset, np.int32)
        tex_w = np.asarray(tex_w, np.int32)
        tex_h = np.asarray(tex_h, np.int32)
    else:
        tex_data = np.zeros((1, 3), np.uint8)
        tex_offset = np.zeros(1, np.int32)
        tex_w = np.ones(1, np.int32)
        tex_h = np.ones(1, np.int32)

    # corner-packed atlas for the TPU bilinear fetch (ops/texfetch.py):
    # row i carries the linear-space rgb of texel i AND its +x/+y/+xy
    # wrap+clamped neighbors (texture.py::_texel semantics baked in), so
    # one bilinear lookup is ONE row gather instead of 12 element
    # gathers. Width 32 = the measured fast row-gather class on v5e
    # (x16 is 10x slower — CLAUDE.md); 4x storage, 128 B/texel.
    tex_corners = np.zeros((tex_data.shape[0], 32), np.float32)
    lin = tex_data.astype(np.float32) / 255.0
    pos = 0
    for ti in range(len(tex_w)):
        w, h = int(tex_w[ti]), int(tex_h[ti])
        img = lin[pos:pos + w * h].reshape(h, w, 3)
        xp = (np.arange(w) + 1) % w   # the reference's mod-then-clamp
        yp = (np.arange(h) + 1) % h   # rule wraps x+1 == w to texel 0
        corners = np.concatenate([
            img, img[:, xp], img[yp], img[yp][:, xp]], axis=-1)
        tex_corners[pos:pos + w * h, :12] = corners.reshape(-1, 12)
        pos += w * h

    # per-material mean texel (linear): the fused megakernel's stand-in
    # diffuse for textured materials — the XLA post-pass multiplies by
    # texel/mean per bounce (integrators/pt_fused.py textured mode)
    m_avg_texel = m_diffuse.copy()
    for i in range(M):
        if m_tex[i] >= 0:
            o = int(tex_offset[m_tex[i]])
            cnt = int(tex_w[m_tex[i]]) * int(tex_h[m_tex[i]])
            m_avg_texel[i] = np.maximum(lin[o:o + cnt].mean(0), 1e-4)

    # ---- lights -----------------------------------------------------------
    L = max(len(scene.lights), 1)
    l_v0 = np.zeros((L, 3), np.float32)
    l_v1 = np.zeros((L, 3), np.float32)
    l_v2 = np.zeros((L, 3), np.float32)
    l_n0 = np.zeros((L, 3), np.float32)
    l_n1 = np.zeros((L, 3), np.float32)
    l_n2 = np.zeros((L, 3), np.float32)
    l_rad = np.zeros((L, 3), np.float32)
    l_med = np.full(L, -1, np.int32)
    for i, lt in enumerate(scene.lights):
        tri = scene.tri_positions[lt.tri_index]
        nor = scene.tri_normals[lt.tri_index]
        l_v0[i], l_v1[i], l_v2[i] = tri
        l_n0[i], l_n1[i], l_n2[i] = nor
        l_rad[i] = lt.radiance
        l_med[i] = lt.medium

    # world bounding sphere from the BVH root box (bbox.h:98-101)
    rb_min, rb_max = bvh.root_box
    center = 0.5 * (rb_min + rb_max)
    radius = float(np.linalg.norm(rb_max - center))

    # light-pick CDF (scene.h:64-82); infinite power uses env texel 0
    # (infinite.h:43-45 quirk: GetPower() reads data[0]).
    powers = []
    for i, lt in enumerate(scene.lights):
        e1 = l_v1[i] - l_v0[i]
        e2 = l_v2[i] - l_v0[i]
        area = 0.5 * np.linalg.norm(np.cross(e1, e2))
        powers.append(float(LUMA64 @ (lt.radiance * area * np.pi)))
    if scene.infinite is not None:
        p_inf = 4.0 * np.pi * radius * radius * scene.infinite.data[0, 0]
        powers.append(float(LUMA64 @ p_inf))
    cdf = np.zeros(L + 2, np.float64)
    if powers:
        cs = np.cumsum(powers)
        total = cs[-1] if cs[-1] > 0 else 1.0
        cdf[1:1 + len(powers)] = cs / total
        cdf[1 + len(powers):] = 1.0

    # ---- environment map --------------------------------------------------
    if scene.infinite is not None:
        env_data = scene.infinite.data
        env_u = scene.infinite.u
        env_v = scene.infinite.v
        env_w = scene.infinite.w
    else:
        env_data = np.zeros((1, 1, 3), np.float32)
        env_u = np.array([1, 0, 0], np.float32)
        env_v = np.array([0, 1, 0], np.float32)
        env_w = np.array([0, 0, 1], np.float32)

    # ---- media ------------------------------------------------------------
    K = max(len(scene.mediums), 1)
    med_type = np.zeros(K, np.int32)
    med_g = np.zeros(K, np.float32)
    med_sa = np.zeros((K, 3), np.float32)
    med_ss = np.zeros((K, 3), np.float32)
    med_n = np.ones((K, 3), np.int32)
    med_p0 = np.zeros((K, 3), np.float32)
    med_p1 = np.ones((K, 3), np.float32)
    med_imd = np.ones(K, np.float32)
    med_ett = np.ones(K, np.int32)
    dz = dy = dx = 1
    for m in scene.mediums:
        if m.type == MediumType.HETEROGENEOUS:
            dz = max(dz, m.nz)
            dy = max(dy, m.ny)
            dx = max(dx, m.nx)
    med_density = np.zeros((K, dz, dy, dx), np.float32)
    iter_max = 1000
    track_k = 8
    for i, m in enumerate(scene.mediums):
        med_type[i] = int(m.type)
        med_g[i] = m.g
        med_sa[i] = m.sigmaA
        med_ss[i] = m.sigmaS
        med_ett[i] = m.evalTransmittanceType
        iter_max = max(iter_max, m.iterMax)
        if m.type == MediumType.HETEROGENEOUS:
            med_n[i] = (m.nx, m.ny, m.nz)
            med_p0[i] = m.p0
            med_p1[i] = m.p1
            med_imd[i] = m.inv_max_density
            med_density[i, :m.nz, :m.ny, :m.nx] = m.density
            # Poisson candidate cap: mean majorant collisions over the
            # box diagonal + 4 sigma (truncation bias ~ Poisson tail)
            sig = float(LUMA64 @ (m.sigmaA + m.sigmaS))
            lam = sig * (1.0 / max(m.inv_max_density, 1e-30)) \
                * float(np.linalg.norm(m.p1 - m.p0))
            track_k = max(track_k, int(min(
                lam + 4.0 * np.sqrt(max(lam, 1.0)) + 4.0, 256)))

    # ---- bssrdfs ----------------------------------------------------------
    B = max(len(scene.bssrdfs), 1)
    b_sa = np.ones((B, 3), np.float32)
    b_sp = np.ones((B, 3), np.float32)
    b_eta = np.full(B, 1.5, np.float32)
    b_g = np.zeros(B, np.float32)
    for i, b in enumerate(scene.bssrdfs):
        b_sa[i] = b.sigmaA
        b_sp[i] = b.sigmaSP
        b_eta[i] = b.eta
        b_g[i] = b.g

    # ---- camera (camera.h:31-46, distance=0.1 per main.cpp:270) -----------
    cam = scene.camera
    half_fov = 0.5 * cam.fov
    half_h = np.tan(np.deg2rad(half_fov)) * cam.distance
    half_w = half_h * scene.width / scene.height
    device_camera = DeviceCamera(
        position=jnp.asarray(cam.position),
        u=jnp.asarray(cam.u), v=jnp.asarray(cam.v), w=jnp.asarray(cam.w),
        resolution=jnp.asarray([scene.width, scene.height], jnp.float32),
        distance=jnp.float32(cam.distance),
        half_w=jnp.float32(half_w), half_h=jnp.float32(half_h),
        pixel2screen=jnp.asarray(
            [2.0 * half_w / scene.width, 2.0 * half_h / scene.height],
            jnp.float32),
        ratio=jnp.float32(cam.focalDistance / cam.distance),
        area=jnp.float32(4.0 * half_w * half_h),
        aperture=jnp.float32(cam.apertureRadius),
        focal=jnp.float32(cam.focalDistance),
    )

    # dense-intersection table (type -1 pad rows never match). Dense-
    # regime scenes pad to sublane groups; larger scenes pad to a whole
    # number of 64-prim culling blocks so the blocked kernels' inner
    # loops never read past the table.
    from gpu_pathtracer_tpu.geom.dense import DENSE_MAX
    Pp = (P + 7) // 8 * 8 if P <= DENSE_MAX else (P + 63) // 64 * 64
    dense_prims = np.zeros((Pp, 16), np.float32)
    dense_prims[P:, 9] = -1.0
    is_tri_col = (prim_type == int(GeometryType.TRIANGLE))[:, None]
    dense_prims[:P, 0:3] = v0
    dense_prims[:P, 3:6] = np.where(is_tri_col, v1 - v0, v1)
    dense_prims[:P, 6:9] = np.where(is_tri_col, v2 - v0, 0.0)
    dense_prims[:P, 9] = prim_type
    dense_prims[:P, 10] = radius0
    dense_prims[:P, 11] = radius1
    dense_prims[:P, 12] = np.arange(P)

    # block-culling bbox table: prims are BVH-leaf-ordered, so 64-prim
    # runs are spatially local and their bounds are tight
    BLOCK = 64
    pb_min = np.where(
        np.arange(Pp)[:, None] < P,
        np.concatenate([bmin[order], np.zeros((Pp - P, 3), np.float32)]),
        np.inf)
    pb_max = np.where(
        np.arange(Pp)[:, None] < P,
        np.concatenate([bmax[order], np.zeros((Pp - P, 3), np.float32)]),
        -np.inf)
    nb = (Pp + BLOCK - 1) // BLOCK
    pad_rows = nb * BLOCK - Pp
    pb_min = np.concatenate(
        [pb_min, np.full((pad_rows, 3), np.inf, np.float32)])
    pb_max = np.concatenate(
        [pb_max, np.full((pad_rows, 3), -np.inf, np.float32)])
    block_bbox = np.zeros((nb, 8), np.float32)
    block_bbox[:, 0:3] = pb_min.reshape(nb, BLOCK, 3).min(axis=1)
    block_bbox[:, 3:6] = pb_max.reshape(nb, BLOCK, 3).max(axis=1)

    # packet-traversal table: unified BVH8 node/leaf rows (geom/bvh8.py).
    # Only the packet regime (P > DENSE_MAX after the blocked cap) walks
    # it, but mid-size scenes keep one for the CPU fallback path.
    from gpu_pathtracer_tpu.geom import bvh8 as bvh8_mod
    if plan is None:
        bvh8_table, bvh8_n8 = bvh8_mod.build_bvh8(bvh, dense_prims[:P])
        bvh8_aux = np.zeros((1, tlas_mod.AUX_COLS), np.float32)
        bvh8_tlas_rows = 0
        bvh8_n_inst = 0
    else:
        bvh8_table, bvh8_n8, bvh8_aux, bvh8_tlas_rows = \
            tlas_mod.build_instanced_table(plan, dense_prims[:P],
                                           bmin, bmax)
        bvh8_n_inst = plan.n_inst
        # plan_instances size-checked the table against the resident cap
        # (the instanced kernel is resident-only)
    bvh8_nodes4 = bvh8_mod.pack_nodes4(bvh8_table, bvh8_n8)

    # packed attribute tables (see DeviceScene docstring for layout)
    prim_attrs = np.zeros((P, 40), np.float32)
    prim_attrs[:, 0:3] = v0
    prim_attrs[:, 3:6] = v1
    prim_attrs[:, 6:9] = v2
    prim_attrs[:, 9:12] = n0
    prim_attrs[:, 12:15] = n1
    prim_attrs[:, 15:18] = n2
    prim_attrs[:, 18:20] = uv0
    prim_attrs[:, 20:22] = uv1
    prim_attrs[:, 22:24] = uv2
    prim_attrs[:, 24:27] = dpdv
    prim_attrs[:, 27] = radius0
    prim_attrs[:, 28] = radius1
    prim_attrs[:, 29] = prim_type
    prim_attrs[:, 30] = mat_idx
    prim_attrs[:, 31] = light_idx
    prim_attrs[:, 32] = bssrdf_idx
    prim_attrs[:, 33] = medium_inside
    prim_attrs[:, 34] = medium_outside

    fused_attrs = np.zeros((Pp, 16), np.float32)
    fused_attrs[:P, 0:3] = n0
    fused_attrs[:P, 3:6] = n1
    fused_attrs[:P, 6:9] = n2
    fused_attrs[:P, 9:12] = dpdv
    fused_attrs[:P, 12] = mat_idx
    fused_attrs[:P, 13] = light_idx
    fused_attrs[:P, 14] = prim_type
    fused_attrs[P:, 12:14] = -1.0

    mat_attrs = np.zeros((M, 24), np.float32)
    mat_attrs[:, 0] = m_type
    mat_attrs[:, 1] = m_alpha_u
    mat_attrs[:, 2] = m_alpha_v
    mat_attrs[:, 3] = m_inside
    mat_attrs[:, 4] = m_outside
    mat_attrs[:, 5:8] = m_k
    mat_attrs[:, 8:11] = m_eta
    mat_attrs[:, 11:14] = m_diffuse
    mat_attrs[:, 14:17] = m_specular
    mat_attrs[:, 17] = m_tex

    light_attrs = np.zeros((L, 24), np.float32)
    light_attrs[:, 0:3] = l_v0
    light_attrs[:, 3:6] = l_v1
    light_attrs[:, 6:9] = l_v2
    light_attrs[:, 9:12] = l_n0
    light_attrs[:, 12:15] = l_n1
    light_attrs[:, 15:18] = l_n2
    light_attrs[:, 18:21] = l_rad
    light_attrs[:, 21] = l_med
    # fused-kernel extras: triangle area (col 22) and light-pick
    # probability cdf[i+1]-cdf[i] (col 23), so the megakernel decodes
    # them with the same per-light select loop as the geometry
    light_attrs[:, 22] = 0.5 * np.linalg.norm(
        np.cross(l_v1 - l_v0, l_v2 - l_v0), axis=-1)
    light_attrs[:, 23] = (cdf[1:L + 1] - cdf[0:L]).astype(np.float32)

    oct2, u8_scale = _pack_u8_oct(_oct_pack(med_density))

    dev = DeviceScene(
        node_bbox_min=jnp.asarray(bvh.bbox_min),
        node_bbox_max=jnp.asarray(bvh.bbox_max),
        node_second_child=jnp.asarray(bvh.second_child),
        node_start=jnp.asarray(bvh.start),
        node_end=jnp.asarray(bvh.end),
        prim_type=jnp.asarray(prim_type),
        v0=jnp.asarray(v0), v1=jnp.asarray(v1), v2=jnp.asarray(v2),
        n0=jnp.asarray(n0), n1=jnp.asarray(n1), n2=jnp.asarray(n2),
        uv0=jnp.asarray(uv0), uv1=jnp.asarray(uv1), uv2=jnp.asarray(uv2),
        dpdv_unit=jnp.asarray(dpdv),
        radius0=jnp.asarray(radius0), radius1=jnp.asarray(radius1),
        mat_idx=jnp.asarray(mat_idx), light_idx=jnp.asarray(light_idx),
        bssrdf_idx=jnp.asarray(bssrdf_idx),
        medium_inside=jnp.asarray(medium_inside),
        medium_outside=jnp.asarray(medium_outside),
        m_type=jnp.asarray(m_type),
        m_alpha_u=jnp.asarray(m_alpha_u), m_alpha_v=jnp.asarray(m_alpha_v),
        m_inside_ior=jnp.asarray(m_inside),
        m_outside_ior=jnp.asarray(m_outside),
        m_k=jnp.asarray(m_k), m_eta=jnp.asarray(m_eta),
        m_diffuse=jnp.asarray(m_diffuse), m_specular=jnp.asarray(m_specular),
        m_tex_idx=jnp.asarray(m_tex),
        tex_data=jnp.asarray(tex_data), tex_offset=jnp.asarray(tex_offset),
        tex_w=jnp.asarray(tex_w), tex_h=jnp.asarray(tex_h),
        tex_corners=jnp.asarray(tex_corners),
        m_avg_texel=jnp.asarray(m_avg_texel),
        l_v0=jnp.asarray(l_v0), l_v1=jnp.asarray(l_v1),
        l_v2=jnp.asarray(l_v2),
        l_n0=jnp.asarray(l_n0), l_n1=jnp.asarray(l_n1),
        l_n2=jnp.asarray(l_n2),
        l_radiance=jnp.asarray(l_rad), l_medium=jnp.asarray(l_med),
        light_cdf=jnp.asarray(cdf, jnp.float32),
        env_data=jnp.asarray(env_data),
        env_u=jnp.asarray(env_u), env_v=jnp.asarray(env_v),
        env_w=jnp.asarray(env_w),
        world_center=jnp.asarray(center),
        world_radius=jnp.float32(radius),
        med_type=jnp.asarray(med_type), med_g=jnp.asarray(med_g),
        med_sigma_a=jnp.asarray(med_sa), med_sigma_s=jnp.asarray(med_ss),
        med_sigma_t=jnp.asarray(med_sa + med_ss),
        med_density=jnp.asarray(med_density),
        med_density_oct4=jnp.asarray(_pack_bf16_pairs(
            _oct_pack(med_density))),
        med_density_oct2=jnp.asarray(oct2),
        med_u8_scale=jnp.asarray(u8_scale),
        med_sv_oct=jnp.asarray(_oct_pack(_sv_majorants(
            med_density, med_n))),
        med_sv_max=jnp.asarray(_oct_pack(_sv_majorants(
            med_density, med_n)).max(axis=-1).reshape(-1)),
        med_density_pairs=jnp.asarray(np.stack(
            [med_density,
             np.concatenate([med_density[..., 1:],
                             np.zeros_like(med_density[..., :1])], axis=-1)],
            axis=-1)),
        med_n=jnp.asarray(med_n),
        med_p0=jnp.asarray(med_p0), med_p1=jnp.asarray(med_p1),
        med_inv_max_density=jnp.asarray(med_imd),
        med_eval_tr_type=jnp.asarray(med_ett),
        b_sigma_a=jnp.asarray(b_sa), b_sigma_sp=jnp.asarray(b_sp),
        b_eta=jnp.asarray(b_eta), b_g=jnp.asarray(b_g),
        dense_prims=jnp.asarray(dense_prims),
        block_bbox=jnp.asarray(block_bbox),
        bvh8_table=jnp.asarray(bvh8_table),
        bvh8_nodes4=jnp.asarray(bvh8_nodes4),
        bvh8_aux=jnp.asarray(bvh8_aux),
        prim_attrs=jnp.asarray(prim_attrs),
        fused_attrs=jnp.asarray(fused_attrs),
        mat_attrs=jnp.asarray(mat_attrs),
        light_attrs=jnp.asarray(light_attrs),
        camera=device_camera,
        epsilon=jnp.float32(scene.epsilon),
    )

    static = StaticConfig(
        width=scene.width,
        height=scene.height,
        integrator=scene.integrator.type,
        max_depth=scene.integrator.maxDepth,
        max_dist=scene.integrator.maxDist,
        init_radius=scene.integrator.initRadius,
        photons_per_iteration=scene.integrator.photonsPerIteration,
        vpl_bias=scene.integrator.vplBias,
        n_lights=len(scene.lights),
        has_infinite=scene.infinite is not None,
        has_triangles=bool((prim_type == int(GeometryType.TRIANGLE)).any()),
        has_spheres=bool((prim_type == int(GeometryType.SPHERE)).any()),
        has_lines=bool((prim_type == int(GeometryType.LINE)).any()),
        has_textures=bool(scene.textures),
        textured_types=tuple(sorted({int(m.type) for m in scene.materials
                                     if m.textureIdx >= 0})),
        has_media=bool(scene.mediums),
        has_hetero=any(m.type == MediumType.HETEROGENEOUS
                       for m in scene.mediums),
        has_bssrdf=bool(scene.bssrdfs) and bool((bssrdf_idx >= 0).any()),
        has_aniso=any(m.alphaU != m.alphaV for m in scene.materials),
        filmic=scene.camera.filmic,
        environment_camera=scene.camera.environment,
        camera_medium=scene.camera.medium,
        med_iter_max=iter_max,
        track_k=track_k,
        n_primitives=P,
        n_nodes=bvh.n_nodes,
        bvh8_n8=bvh8_n8,
        bvh8_rows=int(bvh8_table.shape[0]),
        bvh8_tlas_rows=bvh8_tlas_rows,
        bvh8_n_inst=bvh8_n_inst,
        material_types=tuple(sorted({int(m.type) for m in scene.materials})),
    )
    return dev, static
