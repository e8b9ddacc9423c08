"""Simulate two-phase binned-subtree traversal on oracle ray data.

Answers, WITHOUT building the kernel: if rays are re-binned into
per-subtree packets (subtrees = BVH cut at <= CUT tris), what happens
to the per-lane work vs the classic whole-tree packet kernel?

Method: numpy lock-step traversal collects each ray's true visited
cluster list; then
  classic : per-packet (2048 rays, coherence-sorted) UNION of clusters
            -> measured per-lane drains (validates against the TPU
            stats counter: teapot bounce ~2148 clusters/packet)
  binned  : pairs (ray, subtree) -> stable-sort by subtree -> packets
            of 2048 -> per-packet union of clusters WITHIN the subtree
            + subtree-local pops; per-ray cost = sum over its pairs'
            packets.

Usage: python scripts/sim_cut_binning.py [scene] [n_rays] [set]
Runs on CPU (forces jax cpu; only numpy math anyway).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def collect_ray_clusters(bvh, o, d, tmax, cap=96):
    """Lock-step numpy traversal: per-ray visited clusters (true need,
    with ordered near-first descent + t culling via closest-hit t)."""
    from tracerboy_tpu.trace import intersect  # noqa: F401  (parity dep)

    W = bvh.children.shape[0]
    N = o.shape[0]
    ch = np.asarray(bvh.children)
    lo = np.asarray(bvh.bounds_lo)
    hi = np.asarray(bvh.bounds_hi)

    inv = 1.0 / np.where(np.abs(d) < 1e-12, np.where(d < 0, -1e-12, 1e-12), d)

    stack = np.zeros((N, 64), np.int32)
    sp = np.ones((N,), np.int32)
    visited = np.full((N, cap), -1, np.int32)
    vcount = np.zeros((N,), np.int32)
    t_best = tmax.copy()

    # For t culling we need hits; use exact triangle test per cluster?
    # Too slow — approximate the cull with box t_near only (slightly
    # overestimates need; conservative for the classic/binned RATIO).
    live = sp > 0
    it = 0
    while live.any() and it < 20000:
        it += 1
        idx = np.where(live)[0]
        node = stack[idx, sp[idx] - 1]
        sp[idx] -= 1
        c = ch[node]                       # (n, 8)
        l = lo[node]
        h = hi[node]
        oo = o[idx][:, None, :]
        t0 = (l - oo) * inv[idx][:, None, :]
        t1 = (h - oo) * inv[idx][:, None, :]
        tn = np.minimum(t0, t1).max(axis=2)
        tf = np.maximum(t0, t1).min(axis=2)
        hit = (tf >= np.maximum(tn, 0.0)) & (tn < t_best[idx][:, None]) \
            & (c != np.int32(2**31 - 1))
        is_leaf = hit & (c < 0)
        is_inner = hit & (c >= 0)
        # record leaves
        for k in range(8):
            m = is_leaf[:, k]
            if not m.any():
                continue
            rows = idx[m]
            cl = -c[m, k] - 1
            pos = np.minimum(vcount[rows], cap - 1)
            visited[rows, pos] = cl
            vcount[rows] += 1
        # push inner
        for k in range(8):
            m = is_inner[:, k]
            if not m.any():
                continue
            rows = idx[m]
            p = np.minimum(sp[rows], 63)
            stack[rows, p] = c[m, k]
            sp[rows] = p + 1
        live = sp > 0
    return visited, vcount


def build_cut_map(bvh, cut_tris):
    """cluster -> subtree id, plus per-subtree internal-node count."""
    ch = np.asarray(bvh.children)
    W = ch.shape[0]
    # subtree tri counts (bottom-up, iterative post-order)
    count = np.zeros((W,), np.int64)
    order = []
    stack = [0]
    seen = np.zeros((W,), bool)
    while stack:
        n = stack.pop()
        order.append(n)
        for k in range(8):
            c = ch[n, k]
            if 0 <= c < 2**31 - 1 and not seen[c]:
                seen[c] = True
                stack.append(c)
    for n in reversed(order):
        t = 0
        for k in range(8):
            c = ch[n, k]
            if c == 2**31 - 1:
                continue
            t += 8 if c < 0 else count[c]
        count[n] = t

    n_clusters = int((-ch[ch < 0] - 1).max()) + 1 if (ch < 0).any() else 0
    cl2sub = np.full((n_clusters,), -1, np.int32)
    sub_nodes = []            # internal-node count per subtree
    sub_tris = []
    S = 0

    def mark(root, sid):
        nodes = 0
        st = [root]
        while st:
            n = st.pop()
            if n < 0:
                cl2sub[-n - 1] = sid
                continue
            nodes += 1
            for k in range(8):
                c = ch[n, k]
                if c != 2**31 - 1:
                    st.append(c)
        return nodes

    st = [0]
    while st:
        n = st.pop()
        for k in range(8):
            c = ch[n, k]
            if c == 2**31 - 1:
                continue
            sz = 8 if c < 0 else count[c]
            if c < 0 or sz <= cut_tris:
                nodes = mark(c, S)
                sub_nodes.append(nodes)
                sub_tris.append(sz)
                S += 1
            else:
                st.append(c)
    return cl2sub, np.array(sub_nodes), np.array(sub_tris), S


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "teapot"
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 640 * 360
    set_name = sys.argv[3] if len(sys.argv) > 3 else "bounce"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from scripts.bench_traverse import SCENES, coherence_sort, make_ray_sets
    from tracerboy_tpu.scene.compile import load_scene
    from tracerboy_tpu.trace.pallas_traverse import pack_scene_for_pallas

    t0 = time.time()
    cs = load_scene(SCENES[scene], film_size=(64, 64))
    packed, bvh = pack_scene_for_pallas(cs.tri_v0, cs.tri_v1, cs.tri_v2)
    print(f"[{time.time()-t0:.0f}s] {scene}: {cs.tri_v0.shape[0]} tris, "
          f"{bvh.children.shape[0]} nodes")

    rng = np.random.default_rng(7)
    sets = make_ray_sets(cs, n_rays, rng)
    o, d, tm = sets[set_name]
    lo = np.asarray(cs.tri_v0).min(0)
    hi = np.asarray(cs.tri_v0).max(0)
    perm = coherence_sort(o, d, lo, hi, "oct-org", tm=tm)
    o, d, tm = o[perm], d[perm], tm[perm]

    visited, vcount = collect_ray_clusters(bvh, o, d, tm)
    print(f"[{time.time()-t0:.0f}s] per-ray clusters: mean "
          f"{vcount.mean():.1f} p95 {np.percentile(vcount, 95):.0f} "
          f"max {vcount.max()} (cap hits: {(vcount >= 96).sum()})")

    P = 2048
    N = o.shape[0]
    npk = (N + P - 1) // P

    # classic: per-packet union of clusters
    tot_union = 0
    for p in range(npk):
        vs = visited[p * P:(p + 1) * P]
        u = np.unique(vs[vs >= 0])
        tot_union += len(u)
    per_lane_classic = tot_union / npk * 8  # tri tests per lane
    print(f"classic: clusters/packet {tot_union/npk:.0f} -> per-lane tri "
          f"tests {per_lane_classic:.0f}")

    need = vcount.mean() * 8
    for cut in (512, 1024, 2048, 4096):
        cl2sub, sub_nodes, sub_tris, S = build_cut_map(bvh, cut)
        sub = np.where(visited >= 0, cl2sub[np.clip(visited, 0, None)], -1)
        # pairs: unique (ray, subtree)
        ray_ids = np.repeat(np.arange(N), visited.shape[1])
        flat_sub = sub.reshape(-1)
        m = flat_sub >= 0
        pr = np.unique(np.stack([ray_ids[m], flat_sub[m]], 1), axis=0)
        emits = np.bincount(pr[:, 0], minlength=N)
        # stable sort pairs by subtree (ray order preserved = morton)
        order2 = np.argsort(pr[:, 1], kind="stable")
        ps = pr[order2]
        # packets per subtree (padded)
        tests = 0
        lanes = 0
        pops = 0
        for s in np.unique(ps[:, 1]):
            rows = ps[ps[:, 1] == s, 0]
            for q in range(0, len(rows), P):
                grp = rows[q:q + P]
                vs = visited[grp]
                svs = vs[(vs >= 0)]
                svs = svs[cl2sub[svs] == s]
                u = len(np.unique(svs))
                tests += u * 8
                pops += sub_nodes[s] if s < len(sub_nodes) else 0
                lanes += 1
        # per-ray paid = sum over its pairs of their packet cost ->
        # approximate with mean packet cost x mean emits
        per_lane_binned = tests / max(lanes, 1)
        per_ray_paid = per_lane_binned * emits.mean()
        print(f"CUT={cut:5d}: S={S:5d} pairs/ray {emits.mean():.2f} "
              f"K-p99 {np.percentile(emits, 99):.0f} "
              f"packets {lanes} union/packet {tests/max(lanes,1)/8:.0f} "
              f"per-ray paid {per_ray_paid:.0f} (+pops {pops/max(lanes,1):.0f}/pkt) "
              f"vs classic {per_lane_classic:.0f} vs need {need:.0f} "
              f"-> win {per_lane_classic/max(per_ray_paid,1e-9):.1f}x")


if __name__ == "__main__":
    main()
