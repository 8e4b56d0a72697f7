"""Host-side bucketed-SAH BVH build + DFS flatten.

Re-implements the reference builder (bvh.cpp:16-173): top-down, 12-bucket
SAH over all 3 axes, DFS-flattened layout where a node's first child is at
`index + 1` and the second child at `second_child_offset`, with primitives
reordered leaf-contiguously.

Deviation from the reference (documented, deliberate): the reference turns
degenerate-extent or unsplittable nodes into arbitrarily large leaves
(bvh.cpp:43, 110). On TPU the traversal unrolls the leaf-primitive loop to a
static MAX_LEAF, so this builder *always* bounds leaves at LEAF_SIZE by
falling back to a median split. That keeps wavefront traversal shapes static
and is strictly better for a vector machine.

The build runs in numpy with an explicit stack (no recursion limits); a C++
fast path (native/bvh_builder.cpp, loaded via ctypes) takes over for large
scenes when available. Results are cached to an npz keyed by a content hash
— the TPU analog of bvh.cache (bvh.cpp:189-218) that, unlike the reference,
invalidates automatically when the scene changes.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import numpy as np

LEAF_SIZE = 4
N_BUCKETS = 12


@dataclass
class FlatBVH:
    """SoA flattened BVH, ready for device upload.

    `second_child[i]` is the DFS index of node i's right child (-1 for
    leaves); the left child is always `i + 1`. `start/end` are inclusive
    primitive ranges for leaves (like LinearBVHNode, bvh.h:7-25).
    `prim_order` maps leaf-contiguous slots -> original primitive indices.
    """
    bbox_min: np.ndarray     # [N, 3] f32
    bbox_max: np.ndarray     # [N, 3] f32
    is_leaf: np.ndarray      # [N] bool
    second_child: np.ndarray  # [N] i32
    start: np.ndarray        # [N] i32
    end: np.ndarray          # [N] i32
    prim_order: np.ndarray   # [P] i32

    @property
    def n_nodes(self) -> int:
        return self.bbox_min.shape[0]

    @property
    def root_box(self) -> tuple[np.ndarray, np.ndarray]:
        return self.bbox_min[0], self.bbox_max[0]


def build_bvh(prim_bbox_min: np.ndarray, prim_bbox_max: np.ndarray,
              use_native: bool = True) -> FlatBVH:
    """Build from per-primitive AABBs [P, 3] (f32)."""
    if use_native:
        try:
            from gpu_pathtracer_tpu.geom import bvh_native
            return bvh_native.build_bvh_native(prim_bbox_min, prim_bbox_max)
        except Exception:
            pass
    return _build_bvh_numpy(prim_bbox_min, prim_bbox_max)


def _build_bvh_numpy(prim_bbox_min: np.ndarray,
                     prim_bbox_max: np.ndarray) -> FlatBVH:
    p_min = np.asarray(prim_bbox_min, np.float64)
    p_max = np.asarray(prim_bbox_max, np.float64)
    centers = 0.5 * (p_min + p_max)
    n = p_min.shape[0]
    if n == 0:
        raise ValueError("cannot build BVH over zero primitives")

    bbox_min: list[np.ndarray] = []
    bbox_max: list[np.ndarray] = []
    is_leaf: list[bool] = []
    second_child: list[int] = []
    start: list[int] = []
    end: list[int] = []
    prim_order: list[int] = []

    # DFS with explicit stack; each entry: (prim-ids, parent-slot or -1)
    root_ids = np.arange(n)
    stack: list[tuple[np.ndarray, int]] = [(root_ids, -1)]

    while stack:
        ids, parent = stack.pop()
        node_idx = len(bbox_min)
        if parent >= 0:
            second_child[parent] = node_idx

        nb_min = p_min[ids].min(axis=0)
        nb_max = p_max[ids].max(axis=0)
        bbox_min.append(nb_min)
        bbox_max.append(nb_max)

        if ids.shape[0] <= LEAF_SIZE:
            is_leaf.append(True)
            second_child.append(-1)
            start.append(len(prim_order))
            prim_order.extend(ids.tolist())
            end.append(len(prim_order) - 1)
            continue

        left_ids, right_ids = _split(ids, p_min, p_max, centers,
                                     nb_min, nb_max)
        is_leaf.append(False)
        second_child.append(-1)  # patched when the right child materializes
        start.append(0)
        end.append(-1)
        # DFS order: left child must be emitted next -> push right first
        stack.append((right_ids, node_idx))
        stack.append((left_ids, -1))

    return FlatBVH(
        bbox_min=np.asarray(bbox_min, np.float32),
        bbox_max=np.asarray(bbox_max, np.float32),
        is_leaf=np.asarray(is_leaf, bool),
        second_child=np.asarray(second_child, np.int32),
        start=np.asarray(start, np.int32),
        end=np.asarray(end, np.int32),
        prim_order=np.asarray(prim_order, np.int32),
    )


def _split(ids, p_min, p_max, centers, nb_min, nb_max):
    """Bucketed SAH over 3 axes (bvh.cpp:53-141); median fallback."""
    count = ids.shape[0]
    extent = nb_max - nb_min
    c = centers[ids]

    best_cost = count * _surface_area(nb_min, nb_max)
    best_axis, best_bucket = -1, -1
    best_mask = None

    for axis in range(3):
        if extent[axis] < 1e-4:
            continue  # degenerate axis: bucket index would blow up
        t = (c[:, axis] - nb_min[axis]) / extent[axis]
        bucket = np.minimum((t * N_BUCKETS).astype(np.int64), N_BUCKETS - 1)

        # per-bucket counts and bounds
        counts = np.bincount(bucket, minlength=N_BUCKETS)
        b_min = np.full((N_BUCKETS, 3), np.inf)
        b_max = np.full((N_BUCKETS, 3), -np.inf)
        for d in range(3):
            np.minimum.at(b_min[:, d], bucket, p_min[ids, d])
            np.maximum.at(b_max[:, d], bucket, p_max[ids, d])

        # prefix/suffix sweep
        lc = np.cumsum(counts)[:-1]                    # counts left of split j
        rc = count - lc
        l_min = np.minimum.accumulate(b_min, axis=0)[:-1]
        l_max = np.maximum.accumulate(b_max, axis=0)[:-1]
        r_min = np.minimum.accumulate(b_min[::-1], axis=0)[::-1][1:]
        r_max = np.maximum.accumulate(b_max[::-1], axis=0)[::-1][1:]

        sa_l = np.where(lc > 0, _surface_area(l_min, l_max), 0.0)
        sa_r = np.where(rc > 0, _surface_area(r_min, r_max), 0.0)
        cost = sa_l * lc + sa_r * rc
        j = int(np.argmin(cost))
        if cost[j] < best_cost and lc[j] > 0 and rc[j] > 0:
            best_cost = cost[j]
            best_axis = axis
            best_bucket = j + 1
            best_mask = bucket < best_bucket

    if best_axis >= 0:
        return ids[best_mask], ids[~best_mask]

    # SAH found nothing (or box degenerate): median split on the widest
    # center spread so leaves stay bounded (deviation, see module docstring).
    spread = c.max(axis=0) - c.min(axis=0)
    axis = int(np.argmax(spread))
    order = np.argsort(c[:, axis], kind="stable")
    half = count // 2
    return ids[order[:half]], ids[order[half:]]


def _surface_area(b_min, b_max):
    d = np.maximum(b_max - b_min, 0.0)
    if d.ndim == 1:
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                  + d[..., 2] * d[..., 0])


# ---------------------------------------------------------------------------
# Disk cache (TPU analog of bvh.cache, but content-addressed)
# ---------------------------------------------------------------------------

def _cache_dir() -> str:
    d = os.environ.get(
        "GPT_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gpu_pathtracer_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def load_or_build_bvh(prim_bbox_min: np.ndarray, prim_bbox_max: np.ndarray,
                      cache: bool = True) -> FlatBVH:
    if not cache:
        return build_bvh(prim_bbox_min, prim_bbox_max)
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(prim_bbox_min, np.float32).tobytes())
    h.update(np.ascontiguousarray(prim_bbox_max, np.float32).tobytes())
    path = os.path.join(_cache_dir(), f"bvh_{h.hexdigest()[:24]}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return FlatBVH(**{k: z[k] for k in z.files})
    bvh = build_bvh(prim_bbox_min, prim_bbox_max)
    np.savez_compressed(
        path, bbox_min=bvh.bbox_min, bbox_max=bvh.bbox_max,
        is_leaf=bvh.is_leaf, second_child=bvh.second_child,
        start=bvh.start, end=bvh.end, prim_order=bvh.prim_order)
    return bvh
