"""Exact-policy simulator for the INSTANCED (TLAS/BLAS) packet walk.

Extends tools/sim_walk.py to the instanced table layout (geom/tlas.py):
stack entries are (row, inst); TLAS rows (< tlas_rows) push instance
entries -(i+1) -> (blas_root_of(i), i); BLAS rows inherit the popped
entry's instance; rays are tested in the instance's frame (aux xform).

Answers the round-3 verdict's question: WHERE does the forest's 13x
per-ray cost go — iteration-count inflation (packet unions spanning
many instances) or per-iteration kernel cost?

    JAX_PLATFORMS=cpu python tools/sim_tlas.py
"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PTPU_FORCE_INSTANCING", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from sim_walk import sort_key, morton2


def load(scene_rel="dragon_forest"):
    jax.config.update("jax_platforms", "cpu")
    from gpu_pathtracer_tpu.scene.parse import load_scene
    from gpu_pathtracer_tpu.scene.flatten import flatten_scene
    from gpu_pathtracer_tpu.integrators.common import primary_rays
    from gpu_pathtracer_tpu.core.rng import RngStream, iteration_key

    size = 512
    host = load_scene(os.path.join(os.path.dirname(__file__), "..",
                                   "scenes", scene_rel, "scene.json"))
    host.width = host.height = size
    dev, static = flatten_scene(host)
    n = size * size
    ids = np.arange(n)
    px = (ids % size).astype(np.int32)
    py = (ids // size).astype(np.int32)
    rng = RngStream(iteration_key(0, 0))
    ro, rd = primary_rays(dev, static, rng,
                          jax.numpy.asarray(px), jax.numpy.asarray(py))
    return (np.asarray(dev.bvh8_table), static.bvh8_n8,
            np.asarray(dev.bvh8_aux), static.bvh8_tlas_rows,
            static.bvh8_n_inst,
            np.asarray(ro, np.float64), np.asarray(rd, np.float64),
            np.asarray(dev.world_center), float(dev.world_radius))


class ITree:
    def __init__(self, tab, n8, aux, tlas_rows, n_inst):
        nodes = tab[:n8].reshape(n8, 16, 8)[:, :8, :]
        self.bxmin = nodes[..., 0:3].astype(np.float64)
        self.bxmax = nodes[..., 3:6].astype(np.float64)
        self.meta = nodes[..., 6].astype(np.int64)
        self.leaf = tab[n8:].astype(np.float64).reshape(-1, 8, 16)
        self.n8 = n8
        self.tlas_rows = tlas_rows
        self.n_inst = n_inst
        self.xf = aux[:, 0:12].astype(np.float64).reshape(-1, 3, 4)
        self.root = aux[:, 12].astype(np.int64)
        self.base = aux[:, 13].astype(np.int64)

    def inst_bounds(self):
        """World AABB per instance from the TLAS rows' instance slots."""
        ib_min = np.full((self.n_inst, 3), np.inf)
        ib_max = np.full((self.n_inst, 3), -np.inf)
        # TLAS rows live at rows [0, tlas_rows); instance slots have
        # negative meta -(i+1)
        for k in range(self.tlas_rows):
            for c in range(8):
                mt = self.meta[k, c]
                if mt < 0:
                    i = -mt - 1
                    ib_min[i] = self.bxmin[k, c]
                    ib_max[i] = self.bxmax[k, c]
        return ib_min, ib_max

    def xform_rays(self, ro, rd):
        """[n_inst, W, 3] transformed origins/dirs (t world-invariant)."""
        ros, rds = [], []
        for i in range(self.n_inst):
            m = self.xf[i]
            ros.append(ro @ m[:, :3].T + m[:, 3])
            rds.append(rd @ m[:, :3].T)
        return np.stack(ros), np.stack(rds)

    def slab(self, nr, inst, xro, xinv, best):
        o = xro[inst][:, None, :]
        iv = xinv[inst][:, None, :]
        t1 = (self.bxmin[nr][None] - o) * iv
        t2 = (self.bxmax[nr][None] - o) * iv
        tn = np.minimum(t1, t2).max(-1)
        tf = np.maximum(t1, t2).min(-1)
        hit = (tf > 1e-5) & (tn <= tf) & (tn <= best[:, None])
        return tn, hit

    def leaf_t(self, lr, inst, xro, xrd):
        rec = self.leaf[lr]
        v0 = rec[:, 0:3][None]; a = rec[:, 3:6][None]; b = rec[:, 6:9][None]
        valid = rec[:, 13][None] > 0
        o = xro[inst][:, None, :]; d = xrd[inst][:, None, :]
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


def walk_packet_instmajor(tree, ro, rd, nn=4, nl=4):
    """Instance-major policy: test all instance world boxes once, pop
    instances near-first, walk each instance's BLAS to completion with
    the flat-walk body, and skip whole instances whose packet-min entry
    distance exceeds the packet-max best_t at pop time.

    Iteration model: each instance switch costs `switch_cost` iterations
    (ray transform + stack reset ~ one row-test round); inner iterations
    cost the FLAT body (that's the kernel-engineering win)."""
    W = ro.shape[0]
    xro, xrd = tree.xform_rays(ro, rd)
    xinv = 1.0 / np.where(np.abs(xrd) > 1e-20, xrd,
                          np.where(xrd >= 0, 1e-20, -1e-20))
    best = np.full(W, np.inf)
    s = dict(iters=0, node_pops=0, leaf_pops=0, switches=0, pruned=0)

    # instance boxes in WORLD space: slab test per instance
    ib_min, ib_max = tree.inst_bounds()
    inv_w = 1.0 / np.where(np.abs(rd) > 1e-20, rd,
                           np.where(rd >= 0, 1e-20, -1e-20))
    ent = []
    for i in range(tree.n_inst):
        t1 = (ib_min[i][None] - ro) * inv_w
        t2 = (ib_max[i][None] - ro) * inv_w
        tn = np.minimum(t1, t2).max(-1)
        tf = np.maximum(t1, t2).min(-1)
        hit = (tf > 1e-5) & (tn <= tf)
        if hit.any():
            ent.append((tn[hit].min(), i))
    ent.sort()   # near first

    for d_ent, i in ent:
        if d_ent > best.max():
            s["pruned"] += 1
            continue
        s["switches"] += 1
        nstack, lstack = [int(tree.root[i])], []
        while nstack or lstack:
            s["iters"] += 1
            pops_n = [nstack.pop() for _ in range(min(nn, len(nstack)))]
            pops_l = [lstack.pop() for _ in range(min(nl, len(lstack)))]
            pushes = []
            for nr in pops_n:
                s["node_pops"] += 1
                tn, hit = tree.slab(nr, i, xro, xinv, best)
                for c in range(8):
                    mt = tree.meta[nr, c]
                    if mt != 0 and hit[:, c].any():
                        pushes.append((tn[hit[:, c], c].min(), int(mt)))
            pushes.sort(key=lambda x: -x[0])
            for _, mt in pushes:
                (nstack if mt > 0 else lstack).append(
                    mt if mt > 0 else -mt - tree.n8)
            for lr in pops_l:
                s["leaf_pops"] += 1
                best = np.minimum(best, tree.leaf_t(lr, i, xro, xrd))
    return s, best


def walk_packet(tree, ro, rd, nn=4, nl=4):
    """Instanced near-first walk, kernel policy. Returns (stats, best)."""
    W = ro.shape[0]
    xro, xrd = tree.xform_rays(ro, rd)
    xinv = 1.0 / np.where(np.abs(xrd) > 1e-20, xrd,
                          np.where(xrd >= 0, 1e-20, -1e-20))
    best = np.full(W, np.inf)
    nstack = [(0, 0)]      # (row, inst); root rides instance 0
    lstack = []
    s = dict(iters=0, node_pops=0, leaf_pops=0, tlas_pops=0,
             inst_pushes=0)
    inst_rows = np.zeros(tree.n_inst, np.int64)   # node rows per instance
    while nstack or lstack:
        s["iters"] += 1
        pops_n = [nstack.pop() for _ in range(min(nn, len(nstack)))]
        pops_l = [lstack.pop() for _ in range(min(nl, len(lstack)))]
        pushes = []
        for nr, inst in pops_n:
            s["node_pops"] += 1
            is_tlas = nr < tree.tlas_rows
            if is_tlas:
                s["tlas_pops"] += 1
            else:
                inst_rows[inst] += 1
            tn, hit = tree.slab(nr, inst, xro, xinv, best)
            for c in range(8):
                mt = tree.meta[nr, c]
                if mt != 0 and hit[:, c].any():
                    d = tn[hit[:, c], c].min()
                    if is_tlas and mt < 0:
                        im = -mt - 1
                        s["inst_pushes"] += 1
                        pushes.append((d, int(tree.root[im]), int(im), True))
                    else:
                        pushes.append((d, int(mt), inst, mt > 0))
        pushes.sort(key=lambda x: -x[0])
        for d, mt, inst, is_node in pushes:
            if is_node:
                nstack.append((mt, inst))
            else:
                lstack.append((-mt - tree.n8, inst))
        for lr, inst in pops_l:
            s["leaf_pops"] += 1
            t = tree.leaf_t(lr, inst, xro, xrd)
            best = np.minimum(best, t)
    s["inst_touched"] = int((inst_rows > 0).sum())
    s["max_inst_rows"] = int(inst_rows.max())
    return s, best, inst_rows


def run_set(tree, ro, rd, label, W=256, nn=4, nl=4, sample=32):
    n = ro.shape[0]
    npk = n // W
    sel = np.linspace(0, npk - 1, min(sample, npk)).astype(int)
    tot = None
    tot_im = None
    irows = np.zeros(tree.n_inst, np.int64)
    for p in sel:
        st, _, ir = walk_packet(tree, ro[p * W:(p + 1) * W],
                                rd[p * W:(p + 1) * W], nn=nn, nl=nl)
        irows += ir
        tot = st if tot is None else {k: tot[k] + st[k] for k in st}
        st2, _ = walk_packet_instmajor(
            tree, ro[p * W:(p + 1) * W], rd[p * W:(p + 1) * W],
            nn=nn, nl=nl)
        tot_im = st2 if tot_im is None else \
            {k: tot_im[k] + st2[k] for k in st2}
    m = {k: v / len(sel) for k, v in tot.items()}
    mi = {k: v / len(sel) for k, v in tot_im.items()}
    print(f"  {label:22s} W={W:5d} nn={nn} nl={nl}: "
          f"{m['iters']:7.1f} it  node {m['node_pops']:6.1f} "
          f"(tlas {m['tlas_pops']:5.1f})  leaf {m['leaf_pops']:6.1f}  "
          f"inst touched {m['inst_touched']:4.1f} "
          f"max-rows/inst {m['max_inst_rows']:6.1f}", flush=True)
    print(f"    rows/instance: {(irows / len(sel)).round(1)}", flush=True)
    print(f"    INSTANCE-MAJOR: {mi['iters']:7.1f} it  "
          f"node {mi['node_pops']:6.1f}  leaf {mi['leaf_pops']:6.1f}  "
          f"switches {mi['switches']:4.1f}  pruned {mi['pruned']:4.1f}",
          flush=True)
    return m


def main():
    tab, n8, aux, tlas_rows, n_inst, ro, rd, wc, wr = load()
    tree = ITree(tab, n8, aux, tlas_rows, n_inst)
    n = ro.shape[0]
    print(f"forest: rows={tab.shape[0]} n8={n8} tlas={tlas_rows} "
          f"inst={n_inst}")
    print(f"  roots={tree.root} bases={tree.base}")

    print("computing primary hits (sampled)...", flush=True)
    t_fin = np.full(n, np.inf)
    CH = 4096
    for c0 in range(0, n, CH * 4):       # sample every 4th chunk
        _, t, _ = walk_packet(tree, ro[c0:c0 + CH], rd[c0:c0 + CH])
        t_fin[c0:c0 + CH] = t
    hit = np.isfinite(t_fin)
    print(f"hit-rate (sampled) {hit.mean():.3f}")

    pm = np.argsort(morton2((np.arange(n) % 512).astype(np.int64),
                            (np.arange(n) // 512).astype(np.int64)))
    print("== primary morton2d")
    run_set(tree, ro[pm], rd[pm], "primary morton2d")

    rs = np.random.RandomState(7)
    hp = ro[hit] + rd[hit] * t_fin[hit][:, None] * 0.999
    bd = rs.normal(size=(hit.sum(), 3))
    bd /= np.linalg.norm(bd, axis=-1, keepdims=True)
    k = sort_key(hp, bd, wc, wr)
    p = np.argsort(k, kind="stable")
    bro, brd = hp[p], bd[p]
    m = bro.shape[0] // 4096 * 4096
    bro, brd = bro[:m], brd[:m]
    print("== bounce sortkey")
    run_set(tree, bro, brd, "bounce sortkey")

    # the EXACT 'random sortkey' set of tools/bench_walkcost.py, so a
    # TPU time / sim-iteration division yields the per-iteration cost
    rs = np.random.RandomState(7)
    rro = rs.uniform(-0.9, 0.9, (n, 3)) + np.array([0.0, 1.0, 0.0])
    rrd = rs.normal(size=(n, 3))
    rrd /= np.linalg.norm(rrd, axis=-1, keepdims=True)
    p = np.argsort(sort_key(rro, rrd, wc, wr), kind="stable")
    print("== random sortkey (bench_walkcost set)")
    run_set(tree, rro[p], rrd[p], "random sortkey")


if __name__ == "__main__":
    main()
