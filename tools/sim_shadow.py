"""Shadow-ray (NEE any-hit) walk simulator — sizes verdict r3 #7a.

PT depth 5 on dragon issues ~1 NEE shadow ray per bounce per alive
lane; if their walks cost what bounce closest-hit walks cost, NEE is
~half the traversal budget. But shadow rays are structurally special:
every ray points at the SAME area light (tight direction cone), their
origins are the bounce hit points (already coherence-sorted by the
wavefront), and the query is ANY-HIT with a max-t — a lane retires at
its FIRST accepted hit and the packet retires when all lanes are done.

This sim runs the kernel's exact pop/push policy (near-first, nn=2
nl=2 like tools/sim_walk.py) in an any-hit variant and reports
iters/packet for shadow rays vs the same-origin diffuse bounce rays,
under raster / sortkey / origin-morton orders.

    JAX_PLATFORMS=cpu python tools/sim_shadow.py
"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from sim_walk import Tree, load, morton2, sort_key, walk_packet


def walk_packet_anyhit(tree, ro, rd, tmax, order="near", nn=2, nl=2):
    """Any-hit walk: prune against the packet's max remaining tmax of
    UNDONE lanes; a leaf hit below a lane's tmax retires the lane; all
    lanes done retires the packet."""
    W = ro.shape[0]
    inv = 1.0 / np.where(np.abs(rd) > 1e-20, rd,
                         np.where(rd >= 0, 1e-20, -1e-20))
    done = ~np.isfinite(tmax) | (tmax <= 0)
    best = np.where(done, -np.inf, tmax)
    nstack, lstack = [0], []
    iters = 0
    while (nstack or lstack) and not done.all():
        iters += 1
        pops_n = [nstack.pop() for _ in range(min(nn, len(nstack)))]
        pops_l = [lstack.pop() for _ in range(min(nl, len(lstack)))]
        pushes = []
        for nr in pops_n:
            tn, hit = tree.slab(nr, ro, inv, np.where(done, -np.inf, best))
            hit &= ~done[:, None]
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
            t = tree.leaf_t(lr, ro, rd)
            done |= ~done & (t < best)
    return iters, done


def run_set_any(tree, ro, rd, tmax, label, W=1024):
    n = ro.shape[0]
    npk = n // W
    sel = np.linspace(0, npk - 1, 64).astype(int)
    tot = occ = 0
    for p in sel:
        sl = slice(p * W, (p + 1) * W)
        it, done = walk_packet_anyhit(tree, ro[sl], rd[sl], tmax[sl])
        tot += it
        occ += done.mean()
    print(f"  {label:26s} W={W:5d} anyhit: {tot / len(sel):7.1f} "
          f"iters/packet (occl {occ / len(sel):.2f})", flush=True)


def main():
    tab, n8, ro, rd, wc, wr = load()
    tree = Tree(tab, n8)
    n = ro.shape[0]

    print("computing primary hits...", flush=True)
    t_fin = np.full(n, np.inf)
    CH = 16384
    for c0 in range(0, n, CH):
        _, t_fin[c0:c0 + CH] = walk_packet(
            tree, ro[c0:c0 + CH], rd[c0:c0 + CH], order="near",
            nn=4, nl=4)
    hit = np.isfinite(t_fin)

    # shadow rays toward the scene light from every primary hit point,
    # via the real sampler on the flattened scene
    from gpu_pathtracer_tpu.scene.parse import load_scene
    from gpu_pathtracer_tpu.scene.flatten import flatten_scene
    from gpu_pathtracer_tpu.shade import lights as lights_mod
    import jax.numpy as jnp
    host = load_scene(os.path.join(os.path.dirname(__file__), "..",
                                   "scenes", "dragon", "scene.json"))
    host.width = host.height = 512
    dev, static = flatten_scene(host)
    hp = (ro[hit] + rd[hit] * t_fin[hit][:, None] * 0.999).astype(np.float32)
    m = hp.shape[0] // 1024 * 1024
    hp = hp[:m]
    rs = np.random.RandomState(11)
    u1 = jnp.asarray(rs.uniform(size=m).astype(np.float32))
    u2 = jnp.asarray(rs.uniform(size=m).astype(np.float32))
    idx = jnp.zeros(m, jnp.int32)
    _, _, sd, st, _, pdf = lights_mod.sample_area_light(
        dev, idx, jnp.asarray(hp), u1, u2, 1e-4)
    sd = np.asarray(sd, np.float64)
    st = np.asarray(st, np.float64)

    bd = rs.normal(size=(m, 3))
    bd /= np.linalg.norm(bd, axis=-1, keepdims=True)
    inf_t = np.full(m, np.inf)

    print(f"== shadow rays toward the light ({m} rays)")
    run_set_any(tree, hp, sd, st, "shadow raster")
    k = sort_key(hp, sd, wc, wr)
    p = np.argsort(k, kind="stable")
    run_set_any(tree, hp[p], sd[p], st[p], "shadow sortkey")
    q = np.clip(((hp - wc) / (2.0 * wr) + 0.5) * 63.999, 0, 63).astype(np.int64)
    m6 = np.zeros(m, np.int64)
    for b in range(6):
        for a in range(3):
            m6 |= ((q[:, a] >> b) & 1) << (3 * b + a)
    p = np.argsort(m6, kind="stable")
    run_set_any(tree, hp[p], sd[p], st[p], "shadow origin-morton6")

    print("== same origins, diffuse dirs, closest-hit (bounce baseline)")
    from sim_walk import run_set
    run_set(tree, hp, bd, "bounce raster", policies=("near",))
    k = sort_key(hp, bd, wc, wr)
    p = np.argsort(k, kind="stable")
    run_set(tree, hp[p], bd[p], "bounce sortkey", policies=("near",))

    print("== same shadow rays walked CLOSEST-HIT (what any-hit saves)")
    run_set(tree, hp[p], sd[p], "shadow sortkey closest",
            policies=("near",))


if __name__ == "__main__":
    main()
