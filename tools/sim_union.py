"""Traversal-redundancy simulator (CPU, numpy).

Measures, on the real dragon BVH8 table, how big the per-packet UNION
subtree is (node rows + leaf rows) as a function of packet width and
ray ordering. The Pallas packet walk's cost is proportional to that
union, so this bounds what per-row stacks / Morton ordering can buy
BEFORE writing kernel code.

    JAX_PLATFORMS=cpu python tools/sim_union.py
"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def morton2(x, y, bits=10):
    m = np.zeros_like(x, dtype=np.int64)
    for b in range(bits):
        m |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
    return m


def main():
    jax.config.update("jax_platforms", "cpu")
    from gpu_pathtracer_tpu.scene.parse import load_scene
    from gpu_pathtracer_tpu.scene.flatten import flatten_scene
    from gpu_pathtracer_tpu.integrators.common import primary_rays
    from gpu_pathtracer_tpu.core.rng import RngStream, iteration_key

    size = 512
    host = load_scene(os.path.join(os.path.dirname(__file__), "..",
                                   "scenes", "dragon", "scene.json"))
    host.width = host.height = size
    dev, static = flatten_scene(host)
    tab = np.asarray(dev.bvh8_table)
    n8 = static.bvh8_n8
    n = size * size
    ids = np.arange(n)
    px = (ids % size).astype(np.int32)
    py = (ids // size).astype(np.int32)

    rng = RngStream(iteration_key(0, 0))
    ro, rd = primary_rays(dev, static, rng,
                          jax.numpy.asarray(px), jax.numpy.asarray(py))
    ro = np.asarray(ro, np.float64)
    rd = np.asarray(rd, np.float64)

    nodes = tab[:n8].reshape(n8, 16, 8)[:, :8, :]   # [n8, child, field]
    bxmin = nodes[..., 0:3]
    bxmax = nodes[..., 3:6]
    meta = nodes[..., 6].astype(np.int64)           # >0 node, <0 -leafrow
    leaf = tab[n8:].reshape(-1, 8, 16)              # [rows, slot, field]

    inv = 1.0 / np.where(np.abs(rd) > 1e-20, rd,
                         np.where(rd >= 0, 1e-20, -1e-20))

    def slab(node_row, rays):
        """[R, 8] (tn, hit) of one node row vs ray subset indices."""
        o = ro[rays][:, None, :]
        iv = inv[rays][:, None, :]
        t1 = (bxmin[node_row][None] - o) * iv
        t2 = (bxmax[node_row][None] - o) * iv
        tn = np.minimum(t1, t2).max(-1)
        tf = np.maximum(t1, t2).min(-1)
        hit = (tf > 1e-5) & (tn <= tf)
        return tn, hit

    def leaf_t(leaf_row, rays):
        """Closest tri t of one leaf row vs ray subset (inf if none)."""
        rec = leaf[leaf_row]
        v0 = rec[:, 0:3][None]; a = rec[:, 3:6][None]; b = rec[:, 6:9][None]
        valid = rec[:, 13][None] > 0
        o = ro[rays][:, None, :]; d = rd[rays][:, None, :]
        s1 = np.cross(d, b)                          # pvec (standard MT)
        div = (s1 * a).sum(-1)
        ok = np.abs(div) >= 1e-8
        invd = 1.0 / np.where(ok, div, 1.0)
        s = o - v0
        b1 = (s * s1).sum(-1) * invd
        s2 = np.cross(s, a)
        b2 = (d * s2).sum(-1) * invd
        tt = (b * s2).sum(-1) * invd
        ok &= (b1 >= 0) & (b1 <= 1) & (b2 >= 0) & (b1 + b2 <= 1) \
            & (tt >= 1e-3) & valid
        tt = np.where(ok, tt, np.inf)
        return tt.min(-1)

    # ---- pass 1: exact t_final per ray (masked BFS walk, best_t pruned,
    # chunked over rays) ----
    t_final = np.full(n, np.inf)
    CH = 8192
    for c0 in range(0, n, CH):
        rays = np.arange(c0, min(c0 + CH, n))
        best = np.full(len(rays), np.inf)
        stack = [(0, np.ones(len(rays), bool))]
        while stack:
            nr, m = stack.pop()
            sub = np.nonzero(m)[0]
            tn, hit = slab(nr, rays[sub])
            for c in range(8):
                mt = meta[nr, c]
                if mt == 0:
                    continue
                h = hit[:, c] & (tn[:, c] <= best[sub])
                if not h.any():
                    continue
                if mt > 0:
                    mm = np.zeros(len(rays), bool)
                    mm[sub[h]] = True
                    stack.append((int(mt), mm))
                else:
                    lt = leaf_t(int(-mt) - n8, rays[sub[h]])
                    best[sub[h]] = np.minimum(best[sub[h]], lt)
        t_final[rays] = best

    hitrate = np.isfinite(t_final).mean()
    print(f"n8={n8} leaf_rows={leaf.shape[0]} hit-rate={hitrate:.3f}")

    # ---- pass 2: optimal visit set per ray: nodes whose slab tn <=
    # t_final; leaves likewise (counted as leaf rows) ----
    # Walk once for ALL rays with masks (top-down), count per ray and
    # record per-node ray masks compactly per packet grouping.
    orders = {
        "rowmajor": np.arange(n),
        "morton": np.argsort(morton2(px.astype(np.int64),
                                     py.astype(np.int64))),
    }
    for W in (128, 1024):
        for oname, perm in orders.items():
            lane_of = np.empty(n, np.int64)   # ray id -> packet id
            lane_of[perm] = np.arange(n)
            pk = lane_of // W
            npk = n // W
            U = np.zeros(npk, np.int64)       # union node rows / packet
            L = np.zeros(npk, np.int64)       # union leaf rows / packet
            pervisit = np.zeros(n, np.int64)  # per-ray optimal node visits
            perleaf = np.zeros(n, np.int64)
            stack = [(0, np.ones(n, bool))]
            while stack:
                nr, m = stack.pop()
                sub = np.nonzero(m)[0]
                np.add.at(U, np.unique(pk[sub]), 1)
                pervisit[sub] += 1
                tn, hit = slab(nr, sub)
                ok = hit & (tn <= t_final[sub, None] + 1e-9)
                for c in range(8):
                    mt = meta[nr, c]
                    if mt == 0 or not ok[:, c].any():
                        continue
                    s2 = sub[ok[:, c]]
                    if mt > 0:
                        mm = np.zeros(n, bool)
                        mm[s2] = True
                        stack.append((int(mt), mm))
                    else:
                        np.add.at(L, np.unique(pk[s2]), 1)
                        perleaf[s2] += 1
            # current kernel: 2 nodes + 2 leaves per iter over the union
            it_cur = np.maximum((U + 1) // 2, (L + 1) // 2)
            # per-row scheme: W=128 walks grouped 8-per-block
            print(f"W={W:5d} {oname:9s}: U mean {U.mean():7.1f} "
                  f"L mean {L.mean():7.1f}  iters(2+2) {it_cur.mean():7.1f}"
                  f"  perray nodes {pervisit.mean():5.1f} "
                  f"leaves {perleaf.mean():5.1f}")
            if W == 128:
                g = npk // 8 * 8
                mx = np.maximum(U, L)[:g].reshape(-1, 8).max(1)
                print(f"            per-row blocks(8x128): iters(1+1/row) "
                      f"{mx.mean():7.1f}")


if __name__ == "__main__":
    main()
