"""Collapse the binary SAH BVH into an 8-wide BVH for packet traversal.

Why 8-wide on TPU: the packet walk's per-step cost is dominated by the
serialized latency of the XLA ops in the `while_loop` body (measured
~80-150 us/step on v5e regardless of gather width — row gathers are
~1.5-2 us at ANY width from 8 to 128 floats). Fewer, fatter steps win:
one 128-float row gather per step delivers either 8 child boxes (inner
node) or 8 full primitive records (leaf run), cutting step count ~4x vs
the binary walk (reference bvh.h:7-25 stores binary nodes; the CUDA
per-thread stack walk it feeds, pathtracer.cu:214-296, has no TPU
analog).

Layout — one unified table [n8 + n_leaf_rows, 128] f32:
- node row k (k < n8): 8 child slots at cols c*8 .. c*8+7:
  [bbox_min(3), bbox_max(3), meta, 0]. meta > 0: child is node row
  `meta`; meta < 0: child is leaf row `-meta`; empty slots have
  inverted bboxes (never hit) and meta 0.
- leaf row: 8 primitive slots of 16 floats (same record layout as
  dense_prims: v0(3) a(3) b(3) type r0 r1 prim_idx valid pad(2)).

Because the binary builder emits prims leaf-contiguously in DFS order,
every binary SUBTREE covers a contiguous primitive range; any subtree
with <= 8 prims therefore flattens into a single leaf row, giving
well-filled runs instead of padding 4-prim binary leaves.
"""

from __future__ import annotations

import numpy as np

from gpu_pathtracer_tpu.geom.bvh import FlatBVH

MAX_LEAF_RUN = 8
ROW_W = 128


def _subtree_ranges(bvh: FlatBVH):
    """Per-node inclusive primitive range [rs, re] via bottom-up fixpoint
    (each sweep propagates one tree level; vectorized in numpy)."""
    n = bvh.n_nodes
    is_leaf = bvh.is_leaf
    sc = np.maximum(bvh.second_child, 0)
    rs = np.where(is_leaf, bvh.start, -1).astype(np.int64)
    re = np.where(is_leaf, bvh.end, -1).astype(np.int64)
    left = np.minimum(np.arange(n) + 1, n - 1)
    for _ in range(10000):
        undone_s = rs < 0
        undone_e = re < 0
        if not (undone_s.any() or undone_e.any()):
            break
        cand_s = rs[left]
        upd = undone_s & ~is_leaf & (cand_s >= 0)
        rs[upd] = cand_s[upd]
        cand_e = re[sc]
        upd = undone_e & ~is_leaf & (cand_e >= 0)
        re[upd] = cand_e[upd]
    else:
        raise RuntimeError("BVH deeper than 10000 levels?")
    return rs, re


def _node_areas(bvh: FlatBVH) -> np.ndarray:
    d = np.maximum(bvh.bbox_max - bvh.bbox_min, 0.0)
    return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]


def _levels(bvh: FlatBVH) -> list[np.ndarray]:
    """Node ids grouped by depth (children of a depth-d node are exactly
    depth d+1 in the DFS-flattened binary tree)."""
    is_leaf = bvh.is_leaf
    sc = bvh.second_child.astype(np.int64)
    levels = []
    frontier = np.array([0], np.int64)
    while frontier.size:
        levels.append(frontier)
        internal = frontier[~is_leaf[frontier]]
        frontier = np.concatenate([internal + 1, sc[internal]])
    return levels


def _collapse(bvh: FlatBVH):
    """SAH-optimal 8-wide collapse of the binary BVH (dynamic program in
    the style of Ylitie et al. 2017, "Efficient Incoherent Ray Traversal
    on GPUs Through Compressed Wide BVHs" §3 — public technique).

    The packet walk's measured cost per iteration is FLAT (~1.3-1.5 us
    for every pop-width/packet-width tried — sync/scalar-bound, see
    geom/packet_tpu.py), and each iteration retires a fixed number of
    node+leaf rows, so the right objective for the collapse is the
    EXPECTED NUMBER OF ROWS a random ray visits = sum over emitted rows
    of surfaceArea(row) / surfaceArea(root). The DP minimizes exactly
    that: cost[b][i] = cheapest realization of binary subtree b as a
    forest of <= i wide-table roots (each root costs its own area when
    popped), with cost[b][1] the "b becomes one wide node / leaf row"
    case. Replaces the previous structural BFS collapse (expand the
    child with the most primitives), which ignored areas entirely —
    on the dragon BVH (66469 binary nodes): expected rows/ray 14.21 ->
    13.14 (area-weighted) and node rows 5117 -> 3663 (-28%, = more
    VMEM headroom for the resident walk), identical leaf rows.

    Returns (node_children, node_row, leaf_of, leaf_runs): per 8-wide
    node the list of binary child ids, binary id -> node row / leaf row
    maps, and per leaf row its (start, count) primitive run.
    """
    rs, re = _subtree_ranges(bvh)
    counts = re - rs + 1
    is_leaf = bvh.is_leaf
    sc = bvh.second_child.astype(np.int64)
    # a subtree with <= 8 prims always flattens to ONE leaf row (the
    # binary builder's DFS order makes its primitive range contiguous)
    small = is_leaf | (counts <= MAX_LEAF_RUN)
    area = _node_areas(bvh)
    n = bvh.n_nodes

    INF = np.inf
    cost = np.full((n, 9), INF)
    kbest = np.zeros((n, 9), np.int8)   # dist argmin per slot count j
    carry = np.zeros((n, 9), bool)      # cost[b,i] came from cost[b,i-1]

    for lev in reversed(_levels(bvh)):
        sm = lev[small[lev]]
        if sm.size:
            cost[sm, 1:] = area[sm, None]   # one leaf row, however many slots
        it = lev[~small[lev]]
        if it.size == 0:
            continue
        lc = it + 1
        rc = sc[it]
        dist = np.full((it.size, 9), INF)
        for j in range(2, 9):
            for k in range(1, j):
                v = cost[lc, k] + cost[rc, j - k]
                better = v < dist[:, j]
                dist[better, j] = v[better]
                kbest[it[better], j] = k
        cost[it, 1] = area[it] + dist[:, 8]   # b pops as one wide node row
        for i in range(2, 9):
            c_carry = cost[it, i - 1] <= dist[:, i]
            carry[it, i] = c_carry
            cost[it, i] = np.where(c_carry, cost[it, i - 1], dist[:, i])

    def roots(b: int, i: int) -> list[int]:
        """Binary ids realizing subtree b as <= i wide-table roots."""
        out: list[int] = []
        stack = [(b, i)]
        while stack:
            b2, i2 = stack.pop()
            if small[b2] or i2 == 1:
                out.append(b2)
                continue
            if carry[b2, i2]:
                stack.append((b2, i2 - 1))
                continue
            k = int(kbest[b2, i2])
            stack.append((int(sc[b2]), i2 - k))   # right popped second
            stack.append((b2 + 1, k))             # left popped first
        return out

    from collections import deque
    node_children: list[list[int]] = []
    node_row: dict[int, int] = {}
    queue = deque()
    if small[0]:
        # whole tree fits one leaf run: emit a root node with one child
        node_children.append([0])
        node_row[0] = 0
    else:
        queue.append(0)
    while queue:
        b = queue.popleft()
        node_row[b] = len(node_children)
        k = int(kbest[b, 8])
        children = roots(b + 1, k) + roots(int(sc[b]), 8 - k)
        node_children.append(children)
        for c in children:
            if not small[c]:
                queue.append(c)

    # leaf rows: one per small child, in encounter order
    leaf_of: dict[int, int] = {}
    leaf_runs: list[tuple[int, int]] = []
    for children in node_children:
        for c in children:
            if small[c] and c not in leaf_of:
                leaf_of[c] = len(leaf_runs)
                leaf_runs.append((int(rs[c]), int(counts[c])))
    return node_children, node_row, leaf_of, leaf_runs


def count_rows(bvh: FlatBVH) -> tuple[int, int]:
    """(node rows, leaf rows) the collapse of `bvh` will emit — lets
    geom/tlas.py size an instanced table before committing to it."""
    node_children, _, _, leaf_runs = _collapse(bvh)
    return len(node_children), len(leaf_runs)


def build_bvh8(bvh: FlatBVH, prim_records: np.ndarray):
    """Returns (table, n8): the unified table [n8 + n_leaf_rows + 1, 128]
    f32 and the node-row count n8 (rows [0, n8) are node rows, the rest
    leaf rows + trailing dummy). n8 lets the TPU walk split the table
    into a VMEM-resident node part and an HBM-streamed leaf part when
    the whole table exceeds VMEM.

    prim_records: [P, 16] leaf-ordered records (flatten's dense layout).
    """
    node_children, node_row, leaf_of, leaf_runs = _collapse(bvh)
    rs, re = _subtree_ranges(bvh)
    counts = re - rs + 1
    is_leaf = bvh.is_leaf

    def small(b):
        return is_leaf[b] or counts[b] <= MAX_LEAF_RUN

    n8 = len(node_children)

    # +1: trailing all-zero DUMMY row — the Pallas walk kernel processes
    # a fixed number of node+leaf rows per iteration and substitutes this
    # row when a stack is empty (meta 0 => no pushes, valid 0 => no hits)
    table = np.zeros((n8 + len(leaf_runs) + 1, ROW_W), np.float32)
    nview = table[:n8].reshape(n8, 16, 8)  # 16 slots of 8; use first 8
    # empty child slots: inverted boxes so the slab test never passes
    nview[:, :8, 0:3] = np.inf
    nview[:, :8, 3:6] = -np.inf
    for k, children in enumerate(node_children):
        for ci, c in enumerate(children):
            nview[k, ci, 0:3] = bvh.bbox_min[c]
            nview[k, ci, 3:6] = bvh.bbox_max[c]
            if small(c):
                nview[k, ci, 6] = -(n8 + leaf_of[c])
            else:
                nview[k, ci, 6] = node_row[c]

    if leaf_runs:
        starts = np.asarray([s for s, _ in leaf_runs], np.int64)
        cnts = np.asarray([c for _, c in leaf_runs], np.int64)
        lview = table[n8:-1].reshape(len(leaf_runs), 8, 16)
        for slot in range(MAX_LEAF_RUN):
            sel = cnts > slot
            rows = np.nonzero(sel)[0]
            recs = prim_records[starts[sel] + slot]
            lview[rows, slot, :] = recs
            lview[rows, slot, 13] = 1.0  # valid flag
    return table, n8


def _bf16_directed(x: np.ndarray, up: bool) -> np.ndarray:
    """Round f32 -> bf16 (returned as f32) toward +inf (up) or -inf.

    Conservative box rounding: a bf16 box must CONTAIN the f32 box, so
    mins round down and maxs round up — the slab test may then pass
    spuriously (visiting an extra node) but can never miss a hit.
    """
    import ml_dtypes

    b16 = x.astype(ml_dtypes.bfloat16)
    b = b16.astype(np.float32)
    u = b16.view(np.uint16)
    wrong = (b < x) if up else (b > x)
    sign = (u & 0x8000) != 0
    # next representable bf16 away from the wrong side (monotone bit
    # ordering: +vals ascend with bits, -vals descend)
    if up:
        nxt = np.where(sign, u - 1, u + 1).astype(np.uint16)
        nxt = np.where(u == 0x8000, np.uint16(0x0001), nxt)  # -0 -> +eps
    else:
        nxt = np.where(sign, u + 1, u - 1).astype(np.uint16)
        nxt = np.where(u == 0x0000, np.uint16(0x8001), nxt)  # +0 -> -eps
    out = np.where(wrong, nxt, u).astype(np.uint16)
    return out.view(ml_dtypes.bfloat16).astype(np.float32)


def pack_nodes4(table: np.ndarray, n8: int) -> np.ndarray:
    """Pack the node rows into a quarter-size bf16 table for the
    STREAMED TPU walk's VMEM-resident node scratch: 4 nodes per row.

    Node k -> row k>>2, quarter q = k&3; child c occupies lanes
    q*32 + c*4 + {0: x0x1, 1: y0y1, 2: z0z1, 3: meta}. Each box pair
    packs two directed-rounded bf16s into one f32 bit-carrier
    (min in the high half, max in the low half); meta stays exact f32
    (node/leaf row ids < 2^24). A trailing all-zero row is the dummy
    (meta 0 => no pushes regardless of the box bits).
    """
    nodes = table[:n8].reshape(n8, 16, 8)[:, :8, :]  # [n8, child, field]
    lo = np.stack([_bf16_directed(nodes[..., i], up=False)
                   for i in range(3)], -1)          # mins, down
    hi = np.stack([_bf16_directed(nodes[..., 3 + i], up=True)
                   for i in range(3)], -1)          # maxs, up
    import ml_dtypes
    lo16 = lo.astype(ml_dtypes.bfloat16).view(np.uint16).astype(np.uint32)
    hi16 = hi.astype(ml_dtypes.bfloat16).view(np.uint16).astype(np.uint32)
    pair = (lo16 << 16) | hi16                      # [n8, 8, 3] uint32
    pr = (n8 + 3) // 4
    out = np.zeros((pr + 1, ROW_W), np.float32)
    quad = np.zeros((pr * 4, 8, 4), np.float32)
    quad[:n8, :, 0:3] = pair.view(np.float32)
    quad[:n8, :, 3] = nodes[..., 6]                 # meta
    out[:pr] = quad.reshape(pr, 4 * 8 * 4)
    return out
