"""Instrumented packet-walk simulator: WHERE do iterations go?

Extends tools/sim_walk.py's exact-policy emulation with per-walk stats
that map 1:1 onto the Pallas kernel's cost model:

    cycles/iter ~= nn*NODE_ROW + nl*LEAF_ROW + OVERHEAD

- real vs DUMMY pops per stack (dummy rows burn full row-test cost);
- PRUNABLE pops: node rows whose push-time entry distance exceeds the
  packet-max best_t at pop time (a cheap scalar compare could skip the
  row test entirely);
- pop-width (nn, nl) and packet-width scaling, per ray regime.

    JAX_PLATFORMS=cpu python tools/sim_walk_stats.py
"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sim_walk import Tree, load, sort_key, morton2


def walk_stats(tree, ro, rd, nn=2, nl=2, prune=False):
    """Near-first policy walk with counters. Returns dict of stats."""
    W = ro.shape[0]
    inv = 1.0 / np.where(np.abs(rd) > 1e-20, rd,
                         np.where(rd >= 0, 1e-20, -1e-20))
    best = np.full(W, np.inf)
    nstack, lstack = [(0, -np.inf)], []   # (row, push-time packet-min tn)
    s = dict(iters=0, node_real=0, node_dummy=0, leaf_real=0,
             leaf_dummy=0, node_prunable=0, leaf_tests=0)
    while nstack or lstack:
        s["iters"] += 1
        bmax = best.max()
        pops_n = []
        for _ in range(nn):
            if nstack:
                nr, dpush = nstack.pop()
                if dpush > bmax:
                    s["node_prunable"] += 1
                    if prune:
                        continue   # skipped for free (scalar compare)
                pops_n.append(nr)
                s["node_real"] += 1
            else:
                s["node_dummy"] += 1
        pops_l = []
        for _ in range(nl):
            if lstack:
                pops_l.append(lstack.pop())
                s["leaf_real"] += 1
            else:
                s["leaf_dummy"] += 1
        pushes = []
        for nr in pops_n:
            tn, hit = tree.slab(nr, ro, inv, best)
            for c in range(8):
                mt = tree.meta[nr, c]
                if mt != 0 and hit[:, c].any():
                    pushes.append((tn[hit[:, c], c].min(), int(mt)))
        pushes.sort(key=lambda x: -x[0])
        for d, mt in pushes:
            if mt > 0:
                nstack.append((mt, d))
            else:
                lstack.append(-mt - tree.n8)
        for lr in pops_l:
            best = np.minimum(best, tree.leaf_t(lr, ro, rd))
            s["leaf_tests"] += 1
    return s, best


# cost model fitted from CLAUDE.md's 59ms/262k-ray walk at W=1024,
# nn=nl=2, 186 it/packet: ~1165 cyc/iter = 2*NODE + 2*LEAF + OVH with
# vector row costs scaling in packet rows (W/128).
NODE_ROW_PER_RAYROW, LEAF_ROW_PER_RAYROW, OVH = 16, 45, 190


def run_set(tree, ro, rd, label, W=1024, nn=2, nl=2, prune=False,
            sample=48):
    n = ro.shape[0]
    npk = n // W
    sel = np.linspace(0, npk - 1, min(sample, npk)).astype(int)
    tot = None
    for p in sel:
        st, _ = walk_stats(tree, ro[p * W:(p + 1) * W],
                           rd[p * W:(p + 1) * W], nn=nn, nl=nl,
                           prune=prune)
        tot = st if tot is None else {k: tot[k] + st[k] for k in st}
    m = {k: v / len(sel) for k, v in tot.items()}
    rows = W // 128
    node_rows = m["node_real"] if prune else m["iters"] * nn
    cyc = (node_rows * NODE_ROW_PER_RAYROW * rows
           + m["iters"] * nl * LEAF_ROW_PER_RAYROW * rows
           + m["iters"] * OVH)
    print(f"  {label:22s} W={W:5d} nn={nn} nl={nl} prune={int(prune)}: "
          f"{m['iters']:7.1f} it  node r/d/p {m['node_real']:6.1f}/"
          f"{m['node_dummy']:6.1f}/{m['node_prunable']:6.1f}  "
          f"leaf r/d {m['leaf_real']:6.1f}/{m['leaf_dummy']:6.1f}  "
          f"~{cyc / W:6.1f} cyc/ray", flush=True)
    return m


def main():
    tab, n8, ro, rd, wc, wr = load()
    tree = Tree(tab, n8)
    n = ro.shape[0]

    # bounce rays from primary hits (as sim_walk does)
    print("computing primary hits...", flush=True)
    import sim_walk as sw
    t_fin = np.full(n, np.inf)
    CH = 16384
    for c0 in range(0, n, CH):
        _, t_fin[c0:c0 + CH] = sw.walk_packet(
            tree, ro[c0:c0 + CH], rd[c0:c0 + CH], order="near", nn=4, nl=4)
    hit = np.isfinite(t_fin)
    rs = np.random.RandomState(7)
    hp = ro[hit] + rd[hit] * t_fin[hit][:, None] * 0.999
    bd = rs.normal(size=(hit.sum(), 3))
    bd /= np.linalg.norm(bd, axis=-1, keepdims=True)
    k = sort_key(hp, bd, wc, wr)
    p = np.argsort(k, kind="stable")
    bro, brd = hp[p], bd[p]
    m = bro.shape[0] // 4096 * 4096
    bro, brd = bro[:m], brd[:m]

    pm = np.argsort(morton2((np.arange(n) % 512).astype(np.int64),
                            (np.arange(n) // 512).astype(np.int64)))
    pro, prd = ro[pm], rd[pm]

    import itertools
    cfgs = [(W, nn, nl) for W in (128, 256, 512, 1024)
            for nn, nl in ((1, 1), (1, 2), (2, 2), (3, 2), (2, 3), (3, 3),
                           (4, 4))]
    for label, (a, b) in (("primary morton2d", (pro, prd)),
                          ("bounce sortkey", (bro, brd))):
        print(f"== {label}")
        for W, nn, nl in cfgs:
            run_set(tree, a, b, label, W=W, nn=nn, nl=nl)


if __name__ == "__main__":
    main()
