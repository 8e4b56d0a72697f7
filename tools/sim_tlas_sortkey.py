"""Sort-key sweep for INSTANCED bounce rays (sim, exact walk policy).

The instance-major walk runs at flat per-iteration cost; the remaining
forest-vs-dragon gap is packet-union inflation — bounce packets span
~6 instances (tools/sim_tlas.py). The production _sort_key uses a
4-bit/axis origin morton: at forest scale one cell spans whole dragons,
so packets mix rays from several instances. This sweeps morton
resolution and octant-vs-origin key priority.

    JAX_PLATFORMS=cpu python tools/sim_tlas_sortkey.py
"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PTPU_FORCE_INSTANCING", "1")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sim_tlas import ITree, load, walk_packet_instmajor


def key_oct_morton(ro, rd, c, r, bits):
    q = np.clip(((ro - c) / (2.0 * r) + 0.5) * (2 ** bits - 1e-3), 0.0,
                2 ** bits - 1).astype(np.int64)
    m = np.zeros(ro.shape[0], np.int64)
    for b in range(bits):
        for a in range(3):
            m |= ((q[:, a] >> b) & 1) << (3 * b + a)
    octant = ((rd[:, 0] > 0).astype(np.int64)
              | ((rd[:, 1] > 0).astype(np.int64) << 1)
              | ((rd[:, 2] > 0).astype(np.int64) << 2))
    return (octant << (3 * bits)) | m, m, octant


def run(tree, ro, rd, label, W=256, sample=24):
    n = ro.shape[0]
    npk = n // W
    sel = np.linspace(0, npk - 1, min(sample, npk)).astype(int)
    tot = None
    for p in sel:
        st, _ = walk_packet_instmajor(
            tree, ro[p * W:(p + 1) * W], rd[p * W:(p + 1) * W])
        tot = st if tot is None else {k: tot[k] + st[k] for k in st}
    m = {k: v / len(sel) for k, v in tot.items()}
    print(f"  {label:28s}: {m['iters']:7.1f} it  node {m['node_pops']:6.1f}"
          f"  leaf {m['leaf_pops']:6.1f}  switches {m['switches']:4.1f}",
          flush=True)
    return m["iters"]


def main():
    tab, n8, aux, tlas_rows, n_inst, ro, rd, wc, wr = load()
    tree = ITree(tab, n8, aux, tlas_rows, n_inst)
    n = ro.shape[0]

    # bounce set: hit points + random directions (same recipe as
    # sim_tlas.py bounce sortkey)
    from sim_tlas import walk_packet
    t_fin = np.full(n, np.inf)
    CH = 4096
    for c0 in range(0, n, CH * 4):
        _, t, _ = walk_packet(tree, ro[c0:c0 + CH], rd[c0:c0 + CH])
        t_fin[c0:c0 + CH] = t
    hit = np.isfinite(t_fin)
    rs = np.random.RandomState(7)
    hp = ro[hit] + rd[hit] * t_fin[hit][:, None] * 0.999
    bd = rs.normal(size=(hit.sum(), 3))
    bd /= np.linalg.norm(bd, axis=-1, keepdims=True)

    for bits in (4, 6, 8):
        k, m, octant = key_oct_morton(hp, bd, wc, wr, bits)
        p = np.argsort(k, kind="stable")
        mm = p.shape[0] // 4096 * 4096
        run(tree, hp[p][:mm], bd[p][:mm], f"octant<<|morton{bits}")
        # origin-major: morton first, octant as tiebreak
        k2 = (m << 3) | octant
        p2 = np.argsort(k2, kind="stable")
        run(tree, hp[p2][:mm], bd[p2][:mm], f"morton{bits}|<<octant")


if __name__ == "__main__":
    main()
