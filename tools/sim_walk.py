"""Exact-policy traversal simulator (CPU, numpy).

Emulates the Pallas packet walk's ACTUAL pop/push policy (LIFO dual
stacks, 2 node rows + 2 leaf rows per iteration, pruning against the
best_t AT POP TIME) and candidate policies, on the real dragon BVH8
table, so iteration counts — the kernel's cost model — can be compared
BEFORE writing kernel code. Ray sets cover the coherent (primary) and
incoherent (diffuse bounce) regimes, in raster order and sorted by the
wavefront coherence key (integrators/pt.py::_sort_key).

    JAX_PLATFORMS=cpu python tools/sim_walk.py
"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def load():
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
    return (tab, n8, np.asarray(ro, np.float64), np.asarray(rd, np.float64),
            np.asarray(dev.world_center), float(dev.world_radius))


class Tree:
    def __init__(self, tab, n8):
        nodes = tab[:n8].reshape(n8, 16, 8)[:, :8, :]
        self.bxmin = nodes[..., 0:3]
        self.bxmax = nodes[..., 3:6]
        self.meta = nodes[..., 6].astype(np.int64)
        self.leaf = tab[n8:].reshape(-1, 8, 16)
        self.n8 = n8

    def slab(self, nr, ro, inv, best):
        o = ro[:, None, :]
        iv = inv[:, None, :]
        t1 = (self.bxmin[nr][None] - o) * iv
        t2 = (self.bxmax[nr][None] - o) * iv
        tn = np.minimum(t1, t2).max(-1)
        tf = np.maximum(t1, t2).min(-1)
        hit = (tf > 1e-5) & (tn <= tf) & (tn <= best[:, None])
        return tn, hit

    def leaf_t(self, lr, ro, rd):
        rec = self.leaf[lr]
        v0 = rec[:, 0:3][None]; a = rec[:, 3:6][None]; b = rec[:, 6:9][None]
        valid = rec[:, 13][None] > 0
        o = ro[:, None, :]; d = rd[:, None, :]
        s1 = np.cross(d, b)
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
        return np.where(ok, tt, np.inf).min(-1)


def walk_packet(tree, ro, rd, order="slot", nn=2, nl=2):
    """One packet through the kernel's policy. Returns (iters, best_t).

    order: 'slot' = push in child-slot order (current kernel);
           'near' = push far-to-near by packet-min tn (nearest popped
           first — approximate front-to-back DFS)."""
    W = ro.shape[0]
    inv = 1.0 / np.where(np.abs(rd) > 1e-20, rd,
                         np.where(rd >= 0, 1e-20, -1e-20))
    best = np.full(W, np.inf)
    nstack, lstack = [0], []
    iters = 0
    while nstack or lstack:
        iters += 1
        pops_n = [nstack.pop() for _ in range(min(nn, len(nstack)))]
        pops_l = [lstack.pop() for _ in range(min(nl, len(lstack)))]
        pushes = []
        for nr in pops_n:
            tn, hit = tree.slab(nr, ro, inv, best)
            for c in range(8):
                mt = tree.meta[nr, c]
                if mt != 0 and hit[:, c].any():
                    pushes.append((tn[hit[:, c], c].min(), int(mt)))
        if order == "near":
            pushes.sort(key=lambda x: -x[0])
        for _, mt in pushes:
            (nstack if mt > 0 else lstack).append(
                mt if mt > 0 else -mt - tree.n8)
        for lr in pops_l:
            best = np.minimum(best, tree.leaf_t(lr, ro, rd))
    return iters, best


def morton2(x, y, bits=10):
    m = np.zeros_like(x, dtype=np.int64)
    for b in range(bits):
        m |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
    return m


def sort_key(ro, rd, c, r):
    """integrators/pt.py::_sort_key — octant<<12 | 4-bit/axis morton."""
    q = np.clip(((ro - c) / (2.0 * r) + 0.5) * 15.999, 0.0,
                15.0).astype(np.int64)
    m = np.zeros(ro.shape[0], np.int64)
    for b in range(4):
        for a in range(3):
            m |= ((q[:, a] >> b) & 1) << (3 * b + a)
    octant = ((rd[:, 0] > 0).astype(np.int64)
              | ((rd[:, 1] > 0).astype(np.int64) << 1)
              | ((rd[:, 2] > 0).astype(np.int64) << 2))
    return (octant << 12) | m


def run_set(tree, ro, rd, label, W=1024, policies=("slot", "near")):
    n = ro.shape[0]
    npk = n // W
    SAMPLE = 64                            # sample packets for speed
    sel = np.linspace(0, npk - 1, SAMPLE).astype(int)
    for pol in policies:
        tot = 0
        for p in sel:
            it, _ = walk_packet(tree, ro[p * W:(p + 1) * W],
                                rd[p * W:(p + 1) * W], order=pol)
            tot += it
        print(f"  {label:26s} W={W:5d} {pol:5s}: "
              f"{tot / len(sel):7.1f} iters/packet "
              f"({tot / len(sel) * npk:8.0f} total est)", flush=True)


def main():
    tab, n8, ro, rd, wc, wr = load()
    tree = Tree(tab, n8)
    n = ro.shape[0]

    # exact hits for bounce-ray generation
    print("computing primary hits...", flush=True)
    t_fin = np.full(n, np.inf)
    CH = 16384
    for c0 in range(0, n, CH):
        _, t_fin[c0:c0 + CH] = walk_packet(
            tree, ro[c0:c0 + CH], rd[c0:c0 + CH], order="near",
            nn=4, nl=4)
    hit = np.isfinite(t_fin)
    print(f"hit-rate {hit.mean():.3f}")

    rs = np.random.RandomState(7)
    hp = ro[hit] + rd[hit] * t_fin[hit][:, None] * 0.999
    bd = rs.normal(size=(hit.sum(), 3))
    bd /= np.linalg.norm(bd, axis=-1, keepdims=True)
    m = hit.sum() // 1024 * 1024
    bro, brd = hp[:m], bd[:m]

    print("== primary, raster order (current kernel behavior)")
    run_set(tree, ro, rd, "primary raster")
    k = sort_key(ro, rd, wc, wr)
    p = np.argsort(k, kind="stable")
    run_set(tree, ro[p], rd[p], "primary sortkey")
    pm = np.argsort(morton2((np.arange(n) % 512).astype(np.int64),
                            (np.arange(n) // 512).astype(np.int64)))
    run_set(tree, ro[pm], rd[pm], "primary morton2d")

    print("== diffuse bounce rays (the incoherent regime)")
    run_set(tree, bro, brd, "bounce raster")
    k = sort_key(bro, brd, wc, wr)
    p = np.argsort(k, kind="stable")
    run_set(tree, bro[p], brd[p], "bounce sortkey")
    # finer origin morton (6 bits/axis), direction octant secondary
    q = np.clip(((bro - wc) / (2.0 * wr) + 0.5) * 63.999, 0, 63).astype(np.int64)
    m6 = np.zeros(m, np.int64)
    for b in range(6):
        for a in range(3):
            m6 |= ((q[:, a] >> b) & 1) << (3 * b + a)
    octant = ((brd[:, 0] > 0).astype(np.int64)
              | ((brd[:, 1] > 0).astype(np.int64) << 1)
              | ((brd[:, 2] > 0).astype(np.int64) << 2))
    p = np.argsort((m6 << 3) | octant, kind="stable")
    run_set(tree, bro[p], brd[p], "bounce morton6+oct")
    p = np.argsort((octant << 18) | m6, kind="stable")
    run_set(tree, bro[p], brd[p], "bounce oct+morton6")


if __name__ == "__main__":
    main()
