"""Pallas packet traversal v2: straight-line stack machine, ordered pushes.

Second-generation replacement for the reference's software traversal
(D3D12RaytracingFallback/src/TraverseFunction.hlsli:537-784). Same packed
scene format as pallas_traverse.py (one 128-lane row per wide node /
8-triangle cluster), rebuilt around what round-1 hardware profiling showed
actually costs time on TPU:

- **No vector state in loop carries.** v1 threaded (t_best, tri, u, v)
  through `lax.cond` branches per child — 8 conditional vector-state
  copies per node. v2 keeps all per-ray state in VMEM scratch refs and
  carries only three scalars (stack ptr, queue head/tail) through the
  while loop; conditionals mutate refs in place.
- **Explicit (8, 128) ray registers.** Every per-ray array is shaped to
  the native VPU tile instead of a flat (1024,) vector, so each op is one
  full-width vector instruction.
- **Branch-free pushes.** `stack[sp] = cid; sp += wanted` — unconditional
  store + conditional increment replaces per-child `lax.cond`s.
- **Leaf cluster queue.** Internal-node math never mixes with triangle
  math: leaf hits enqueue cluster ids into a 16-slot ring; the queue
  drains in straight-line batches of Q=8 clusters (64 triangle tests,
  fully unrolled). In the HBM-streaming variant the cluster row DMA
  *starts at enqueue time* — by drain time the row has usually landed,
  which is the double-buffering the round-1 streaming attempt lacked.
- **Ordered traversal.** Children are pushed far-to-near (scalar sorting
  network on per-child min-t), so near subtrees pop first and t_best
  culling prunes the far ones — the near-child-first ordering of the
  reference's stack machine (TraverseFunction.hlsli:537-660).
- **Dedicated any-hit kernel** for shadow waves: no best-hit bookkeeping,
  occlusion mask only, whole-packet early exit once every lane is
  occluded (the reference's ACCEPT_AND_END_SEARCH path, AnyHit.hlsl).

Correctness oracle: brute_force_closest / v1 kernel in interpret mode
(tests/test_pallas2.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tracerboy_tpu.accel.bvh import INVALID

PACKET = 2048           # rays per packet: one (16, 128) VPU block.
                        # A/B on teapot full waves: 1024 -> 2048 is
                        # 1.48x on primary waves and 1.23x on 6-bounce
                        # waves (per-ray redundancy = units(P)/P and
                        # node-visit unions grow sublinearly with P for
                        # coherent rays); 4096 regresses bounce waves.
SUB, LANES = 16, 128
PACKETS_PER_BLOCK = 8   # packets per kernel program (launch amortization)
STACK_DEPTH = 96
LEAF = 8                # triangles per cluster row
QUEUE_RING = 16         # leaf queue slots (power of two)
DRAIN_BATCH = 8         # clusters intersected per drain
BIG = 1e30

# 8-element sorting network (Batcher), 19 comparators.
_SORT_NET = [
    (0, 1), (2, 3), (4, 5), (6, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6), (0, 4), (3, 7),
    (1, 5), (2, 6), (1, 4), (3, 6),
    (2, 4), (3, 5), (3, 4),
]


def _sort_children_far_first(tmins, cids, wants):
    """Scalar sorting network: order 8 (tmin, cid, want) triples by
    descending tmin so the stack (LIFO) pops near children first."""
    t = list(tmins)
    c = list(cids)
    w = list(wants)
    for i, j in _SORT_NET:
        swap = t[i] < t[j]  # descending
        ti, tj = t[i], t[j]
        t[i] = jnp.where(swap, tj, ti)
        t[j] = jnp.where(swap, ti, tj)
        ci, cj = c[i], c[j]
        c[i] = jnp.where(swap, cj, ci)
        c[j] = jnp.where(swap, ci, cj)
        wi, wj = w[i], w[j]
        w[i] = jnp.where(swap, wj, wi)
        w[j] = jnp.where(swap, wi, wj)
    return t, c, w


def _node_children(rowf, row, ox, oy, oz, inv_x, inv_y, inv_z, t_cap):
    """Slab-test the 8 children of one wide node against the packet.

    rowf/row: (1, 128) f32/i32 views of the node row. t_cap: (8, 128)
    per-ray upper bound. Returns ([tmin]*8 scalars, [cid]*8 scalars,
    [want]*8 scalar bools).
    """
    tmins, cids, wants = [], [], []
    for c in range(8):
        lo_x = rowf[0, c]
        lo_y = rowf[0, 8 + c]
        lo_z = rowf[0, 16 + c]
        hi_x = rowf[0, 24 + c]
        hi_y = rowf[0, 32 + c]
        hi_z = rowf[0, 40 + c]
        t0x = (lo_x - ox) * inv_x
        t1x = (hi_x - ox) * inv_x
        t0y = (lo_y - oy) * inv_y
        t1y = (hi_y - oy) * inv_y
        t0z = (lo_z - oz) * inv_z
        t1z = (hi_z - oz) * inv_z
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        hit = (t_far >= jnp.maximum(t_near, 0.0)) & (t_near < t_cap)
        tmin = jnp.min(jnp.where(hit, t_near, jnp.float32(BIG)))
        cid = row[0, 48 + c]
        tmins.append(tmin)
        cids.append(cid)
        wants.append((cid != INVALID) & (tmin < jnp.float32(BIG)))
    return tmins, cids, wants


def _packet_intervals(ox, oy, oz, dx, dy, dz, live):
    """Per-packet conservative interval state for the interval node
    phase: origin box, direction-reciprocal intervals (infinite on
    octant-impure axes), and the (1, 128) plane-pattern vectors used by
    `_node_children_interval`.

    All reductions mask dead lanes. Runs once per packet (~30 small
    ops); the per-pop node test drops from ~144 full-packet vector ops
    to ~12 (1, 128) ops + the existing push bookkeeping.
    """
    big = jnp.float32(BIG)

    def rng_of(v):
        return (jnp.min(jnp.where(live, v, big)),
                jnp.max(jnp.where(live, v, -big)))

    o_lo = []
    o_hi = []
    iv_lo = []
    iv_hi = []
    for ov, dv in ((ox, dx), (oy, dy), (oz, dz)):
        lo, hi = rng_of(ov)
        o_lo.append(lo)
        o_hi.append(hi)
        d_lo, d_hi = rng_of(dv)
        pure = (d_lo > 0.0) | (d_hi < 0.0)
        safe = lambda v: jnp.where(jnp.abs(v) < 1e-12,
                                   jnp.where(v < 0, -1e-12, 1e-12), v)
        a = 1.0 / safe(d_lo)
        b = 1.0 / safe(d_hi)
        iv_lo.append(jnp.where(pure, jnp.minimum(a, b), -big))
        iv_hi.append(jnp.where(pure, jnp.maximum(a, b), big))

    # c = -o*inv interval per axis (correlation ignored: conservative).
    c_lo, c_hi = [], []
    for a in range(3):
        prods = [(-o_lo[a]) * iv_lo[a], (-o_lo[a]) * iv_hi[a],
                 (-o_hi[a]) * iv_lo[a], (-o_hi[a]) * iv_hi[a]]
        c_lo.append(jnp.minimum(jnp.minimum(prods[0], prods[1]),
                                jnp.minimum(prods[2], prods[3])))
        c_hi.append(jnp.maximum(jnp.maximum(prods[0], prods[1]),
                                jnp.maximum(prods[2], prods[3])))

    # (1, 128) pattern vectors: lane a*8+c (and 24 + a*8+c) carries
    # axis a's scalar — matching the node-row bounds layout
    # [lox*8 | loy*8 | loz*8 | hix*8 | hiy*8 | hiz*8].
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    axis = (lane % 24) // 8

    def pattern(vals):
        return jnp.where(axis == 0, vals[0],
                         jnp.where(axis == 1, vals[1], vals[2]))

    return dict(
        iv_lo=pattern(iv_lo), iv_hi=pattern(iv_hi),
        c_lo=pattern(c_lo), c_hi=pattern(c_hi),
    )


def _node_children_interval(rowf, row, itv, t_hi):
    """Conservative interval (frustum) test of one wide node's 8
    children against the whole packet — scalar/row work only.

    Replaces the per-ray slab test whose per-ray results were only ever
    reduced to (any-hit, min-t) per child: a child survives iff SOME ray
    could hit it (max_a min_r t_near <= min_a max_r t_far bounds the
    per-ray slab test conservatively). Exactness is preserved by the
    per-ray drain tests; slack only costs extra drains. t_hi: scalar
    upper bound on live rays' current best t."""
    tp1 = rowf * itv["iv_lo"]
    tp2 = rowf * itv["iv_hi"]
    tmin_p = jnp.minimum(tp1, tp2) + itv["c_lo"]   # (1, 128)
    tmax_p = jnp.maximum(tp1, tp2) + itv["c_hi"]
    near = jnp.minimum(tmin_p[:, 0:24], tmin_p[:, 24:48])   # (1, 24)
    far = jnp.maximum(tmax_p[:, 0:24], tmax_p[:, 24:48])
    t_near = jnp.maximum(
        jnp.maximum(near[:, 0:8], near[:, 8:16]), near[:, 16:24]
    )                                                        # (1, 8)
    t_far = jnp.minimum(
        jnp.minimum(far[:, 0:8], far[:, 8:16]), far[:, 16:24]
    )
    # i32 mask: Mosaic only extracts 32-bit scalars from vectors.
    hit_v = ((t_far >= jnp.maximum(t_near, 0.0)) & (t_near < t_hi)
             ).astype(jnp.int32)

    tmins, cids, wants = [], [], []
    for c in range(8):
        cid = row[0, 48 + c]
        tmins.append(t_near[0, c])
        cids.append(cid)
        wants.append((hit_v[0, c] != 0) & (cid != INVALID))
    return tmins, cids, wants


def _tri_tests(trow, ox, oy, oz, dx, dy, dz):
    """Baldwin-Weber test for the 8 triangles of one cluster row against
    the packet (trow holds 12 precomputed floats per triangle:
    [n|-d],[g1|h1],[g2|h2], built by pack_bvh). ~36 VPU ops per triangle
    vs Moller-Trumbore's ~58 — the drain phase is ~70% of kernel time.
    Returns lists of (tt, uu, vv, ok_geom) per triangle; caller applies
    the t-window and bookkeeping."""
    out = []
    for k in range(LEAF):
        b = k * 12
        nx, ny, nz, nd = (trow[0, b], trow[0, b + 1], trow[0, b + 2],
                          trow[0, b + 3])
        g1x, g1y, g1z, g1w = (trow[0, b + 4], trow[0, b + 5],
                              trow[0, b + 6], trow[0, b + 7])
        g2x, g2y, g2z, g2w = (trow[0, b + 8], trow[0, b + 9],
                              trow[0, b + 10], trow[0, b + 11])
        A = nx * ox + ny * oy + nz * oz + nd
        B = nx * dx + ny * dy + nz * dz
        inv_b = jnp.where(jnp.abs(B) > 1e-12, 1.0 / B, 0.0)
        tt = -A * inv_b
        co = g1x * ox + g1y * oy + g1z * oz + g1w
        cd = g1x * dx + g1y * dy + g1z * dz
        uu = co + tt * cd
        eo = g2x * ox + g2y * oy + g2z * oz + g2w
        ed = g2x * dx + g2y * dy + g2z * dz
        vv = eo + tt * ed
        # Conservative containment band: a point exactly on a shared
        # edge/vertex must hit at least one of the adjacent triangles.
        # Independent per-triangle rounding can push both barycentric
        # tests outward (~1 ulp ~ 1e-7); the 1e-5 band turns potential
        # cracks into harmless double-acceptance (closest-hit keeps the
        # nearer one). The exact Woop/Benthin/Wald test remains the
        # oracle (trace/intersect.ray_triangle_watertight); edge-crack
        # and vertex-fan tests run against THIS kernel in
        # tests/test_accel.py::TestWatertightProduction.
        ok = (
            (jnp.abs(B) > 1e-12)
            & (uu >= -1e-5) & (vv >= -1e-5) & (uu + vv <= 1.0 + 1e-5)
            & (tt > 1e-5)
        )
        out.append((tt, uu, vv, ok))
    return out


def _make_kernel(any_hit: bool, tris_in_hbm: bool, stats: bool = False,
                 order: bool = True, pops_per_iter: int = 1,
                 sub: int = SUB, interval: bool = False,
                 with_roots: bool = False):
    """Build the packet-traversal kernel body.

    order: push children far-to-near (t-ordered stack).
    pops_per_iter: nodes popped per while iteration, branch-free — when
    the stack underflows, the synthesized dummy node (index = real node
    count, appended by the wrapper: inverted bounds, INVALID children)
    flows through the same straight-line math and produces nothing.
    with_roots: an extra (n_packets, 1) i32 SMEM input follows the tris
    table; each packet starts traversal at ITS root (node id >= 0, or a
    leaf cluster encoded -cluster-1) instead of node 0 — the phase-2
    half of the binned-subtree path (trace/cut.py).
    """
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    RINGM = QUEUE_RING - 1

    def kernel(o_ref, d_ref, tmax_ref, nodes_ref, tris_ref,
               *rest):
        roots_ref = None
        if with_roots:
            roots_ref = rest[0]
            rest = rest[1:]
        stats_out = None
        if stats:
            stats_out = rest[0]
            rest = rest[1:]
        if any_hit:
            (occ_out,) = rest[:1]
            scratch = rest[1:]
        else:
            t_out, tri_out, u_out, v_out = rest[:4]
            scratch = rest[4:]
        if tris_in_hbm:
            if any_hit:
                stack_ref, queue_ref, occ_ref, ring_ref, sems = scratch
            else:
                (stack_ref, queue_ref, tb_ref, tri_ref, uu_ref, vv_ref,
                 ring_ref, sems) = scratch
        else:
            ring_ref = sems = None
            if any_hit:
                stack_ref, queue_ref, occ_ref = scratch
            else:
                (stack_ref, queue_ref, tb_ref, tri_ref, uu_ref,
                 vv_ref) = scratch

        n_clusters = tris_ref.shape[0]

        def one_packet(pp, _):
            ox = o_ref[pp, 0]
            oy = o_ref[pp, 1]
            oz = o_ref[pp, 2]
            dx = d_ref[pp, 0]
            dy = d_ref[pp, 1]
            dz = d_ref[pp, 2]
            eps = jnp.float32(1e-12)
            fix = lambda v: jnp.where(jnp.abs(v) < eps,
                                      jnp.where(v < 0, -eps, eps), v)
            inv_x = 1.0 / fix(dx)
            inv_y = 1.0 / fix(dy)
            inv_z = 1.0 / fix(dz)
            tmax = tmax_ref[pp]

            # Per-packet state init.
            stack_ref[0] = 0
            if with_roots:
                root = roots_ref[pp, 0]
                root_is_node = root >= 0
                stack_ref[0] = jnp.maximum(root, 0)
            if any_hit:
                occ_ref[...] = jnp.zeros((sub, LANES), jnp.float32)
            else:
                tb_ref[...] = tmax
                tri_ref[...] = jnp.full((sub, LANES), -1, jnp.int32)
                uu_ref[...] = jnp.zeros((sub, LANES), jnp.float32)
                vv_ref[...] = jnp.zeros((sub, LANES), jnp.float32)

            if interval:
                itv = _packet_intervals(ox, oy, oz, dx, dy, dz,
                                        tmax > 0.0)

            def start_cluster_dma(cluster, slot):
                return pltpu.make_async_copy(
                    tris_ref.at[pl.ds(cluster, 1), :],
                    ring_ref.at[pl.ds(slot, 1), :],
                    sems.at[slot],
                )

            fbits = lambda w: lax.bitcast_convert_type(w, jnp.float32)

            dummy_idx = nodes_ref.shape[0] - 1

            def node_phase(sp, head, tail, t_hi):
                # Branch-free pop: stack underflow reads the dummy node,
                # whose inverted bounds and INVALID children are inert.
                have = sp > 0
                node = jnp.where(
                    have, stack_ref[jnp.maximum(sp - 1, 0)], dummy_idx
                )
                sp = sp - jnp.where(have, 1, 0)
                row = nodes_ref[pl.ds(node, 1), :]
                rowf = fbits(row)
                if interval:
                    tmins, cids, wants = _node_children_interval(
                        rowf, row, itv, t_hi
                    )
                else:
                    if any_hit:
                        # Occluded lanes stop driving traversal.
                        t_cap = jnp.where(occ_ref[...] > 0.0,
                                          jnp.float32(-BIG), tmax)
                    else:
                        t_cap = tb_ref[...]
                    tmins, cids, wants = _node_children(
                        rowf, row, ox, oy, oz, inv_x, inv_y, inv_z, t_cap
                    )
                if order and not any_hit:
                    tmins, cids, wants = _sort_children_far_first(
                        tmins, cids, wants
                    )
                for c in range(8):
                    cid = cids[c]
                    want = wants[c]
                    is_leaf = cid < 0
                    # Branch-free push: unconditional store, conditional
                    # bump. Unbumped slots are overwritten or dead.
                    w_int = jnp.where(want & ~is_leaf, 1, 0)
                    stack_ref[jnp.minimum(sp, STACK_DEPTH - 1)] = cid
                    sp = sp + w_int
                    cluster = -cid - 1
                    slot = tail & RINGM
                    queue_ref[slot] = cluster
                    q_int = jnp.where(want & is_leaf, 1, 0)
                    if tris_in_hbm:
                        @pl.when((want & is_leaf))
                        def _():
                            start_cluster_dma(cluster, slot).start()
                    tail = tail + q_int
                return sp, head, tail, t_hi

            def drain_phase(sp, head, tail, t_hi):
                count = jnp.minimum(tail - head, DRAIN_BATCH)
                if any_hit:
                    occ = occ_ref[...]
                else:
                    tb = tb_ref[...]
                    tribest = tri_ref[...]
                    ub = uu_ref[...]
                    vb = vv_ref[...]
                for k in range(DRAIN_BATCH):
                    valid = k < count
                    slot = (head + k) & RINGM
                    cluster = queue_ref[slot]
                    if tris_in_hbm:
                        @pl.when(valid)
                        def _():
                            start_cluster_dma(cluster, slot).wait()
                        trow = ring_ref[pl.ds(slot, 1), :]
                    else:
                        safe = jnp.clip(cluster, 0, n_clusters - 1)
                        trow = tris_ref[pl.ds(safe, 1), :]
                    tests = _tri_tests(trow, ox, oy, oz, dx, dy, dz)
                    if any_hit:
                        for k2 in range(LEAF):
                            tt, _, _, okg = tests[k2]
                            ok = okg & (tt < tmax) & valid
                            occ = jnp.where(ok, jnp.float32(1.0), occ)
                    else:
                        for k2 in range(LEAF):
                            tt, uu, vv, okg = tests[k2]
                            ok = okg & (tt < tb) & valid
                            tri_id = cluster * LEAF + k2
                            tb = jnp.where(ok, tt, tb)
                            tribest = jnp.where(ok, tri_id, tribest)
                            ub = jnp.where(ok, uu, ub)
                            vb = jnp.where(ok, vv, vb)
                if any_hit:
                    occ_ref[...] = occ
                    if interval:
                        # Tighten the packet t-bound: once every lane is
                        # occluded t_hi drops below 0 and traversal ends.
                        t_hi = jnp.max(
                            jnp.where(occ > 0.0, jnp.float32(-BIG), tmax)
                        )
                else:
                    tb_ref[...] = tb
                    tri_ref[...] = tribest
                    uu_ref[...] = ub
                    vv_ref[...] = vb
                    if interval:
                        t_hi = jnp.minimum(t_hi, jnp.max(tb))
                return sp, head + count, tail, t_hi

            def cond(state):
                sp, head, tail, pops, t_hi = state
                return (sp > 0) | (tail > head)

            def body(state):
                sp, head, tail, pops, t_hi = state
                for _ in range(pops_per_iter):
                    pops = pops + jnp.where(sp > 0, 1, 0)
                    sp, head, tail, t_hi = node_phase(sp, head, tail, t_hi)
                    do_drain = (tail - head >= DRAIN_BATCH) | (
                        (sp == 0) & (tail > head)
                    )
                    sp, head, tail, t_hi = lax.cond(
                        do_drain, drain_phase,
                        lambda s, h, t, th: (s, h, t, th),
                        sp, head, tail, t_hi,
                    )
                return sp, head, tail, pops, t_hi

            # All-dead packets must not traverse: with no live lane the
            # bound is -BIG and the root's children all fail
            # `t_near < t_hi`.
            t_hi0 = jnp.max(jnp.where(tmax > 0.0, tmax, jnp.float32(-BIG)))
            sp0 = jnp.int32(1)
            tail0 = jnp.int32(0)
            if with_roots:
                # Leaf-cluster roots skip the stack entirely: enqueue
                # the cluster and let the drain handle it.
                sp0 = jnp.where(root_is_node, 1, 0)
                cl0 = -jnp.minimum(root, -1) - 1
                queue_ref[0] = cl0
                tail0 = jnp.where(root_is_node, 0, 1)
                if tris_in_hbm:
                    @pl.when(~root_is_node)
                    def _():
                        start_cluster_dma(cl0, 0).start()
            _, clusters_done, _, pops, _ = lax.while_loop(
                cond, body,
                (sp0, jnp.int32(0), tail0, jnp.int32(0),
                 t_hi0),
            )
            if stats:
                stats_out[pp, 0:1, :] = jnp.full(
                    (1, LANES), pops.astype(jnp.float32)
                )
                stats_out[pp, 1:2, :] = jnp.full(
                    (1, LANES), clusters_done.astype(jnp.float32)
                )

            if any_hit:
                occ_out[pp] = occ_ref[...]
            else:
                tb = tb_ref[...]
                tri = tri_ref[...]
                t_out[pp] = jnp.where(tri < 0, jnp.float32(BIG), tb)
                tri_out[pp] = tri
                u_out[pp] = uu_ref[...]
                v_out[pp] = vv_ref[...]
            return 0

        jax.lax.fori_loop(0, o_ref.shape[0], one_packet, 0)

    return kernel


def _make_emit_kernel(K: int, overflow_id: int, sub: int = SUB):
    """Phase-1 kernel of the binned-subtree path (trace/cut.py): packet
    traversal over the cut TOP table. Negative child ids are EMITS
    (cut-subtree indices), not leaves — each ray appends up to K of
    them to its slot list; past K the last slot degrades to
    overflow_id (the whole-tree root), keeping the ray correct at the
    cost of a full classic traversal for it in phase 2.

    No drains, no queue, no child ordering (nothing tightens t), so a
    pop is just the 8-child slab test + pushes + (rarely) the K-select
    append, gated on a scalar."""
    import jax.lax as lax
    from jax.experimental import pallas as pl

    def kernel(o_ref, d_ref, tmax_ref, nodes_ref, ids_out, stack_ref,
               cnt_ref):
        # ids_out rows are (packet-within-block * K + slot): a 3D
        # (PPB*K, sub, LANES) block — dynamic leading index only, the
        # same access shape as the classic kernel's outputs (4D blocks
        # with a dynamic packet index faulted on hardware).
        fbits = lambda w: lax.bitcast_convert_type(w, jnp.float32)
        dummy_idx = nodes_ref.shape[0] - 1

        def one_packet(pp, _):
            ox = o_ref[pp, 0]
            oy = o_ref[pp, 1]
            oz = o_ref[pp, 2]
            dx = d_ref[pp, 0]
            dy = d_ref[pp, 1]
            dz = d_ref[pp, 2]
            eps = jnp.float32(1e-12)
            fix = lambda v: jnp.where(jnp.abs(v) < eps,
                                      jnp.where(v < 0, -eps, eps), v)
            inv_x = 1.0 / fix(dx)
            inv_y = 1.0 / fix(dy)
            inv_z = 1.0 / fix(dz)
            tmax = tmax_ref[pp]
            # Dead lanes must never emit: a zero cap fails t_near < cap
            # unless t_near < 0 (origin inside the box), so force the
            # cap negative for them.
            t_cap = jnp.where(tmax > 0.0, tmax, jnp.float32(-BIG))

            for s in range(K):
                ids_out[pp * K + s] = jnp.full((sub, LANES), -1,
                                               jnp.int32)
            cnt_ref[...] = jnp.zeros((sub, LANES), jnp.int32)

            def body(sp):
                have = sp > 0
                # reuse slot 0 of ids as stack? no — SMEM stack scratch
                node = jnp.where(
                    have, stack_ref[jnp.maximum(sp - 1, 0)], dummy_idx
                )
                sp = sp - jnp.where(have, 1, 0)
                row = nodes_ref[pl.ds(node, 1), :]
                rowf = fbits(row)
                for c in range(8):
                    lo_x = rowf[0, c]
                    lo_y = rowf[0, 8 + c]
                    lo_z = rowf[0, 16 + c]
                    hi_x = rowf[0, 24 + c]
                    hi_y = rowf[0, 32 + c]
                    hi_z = rowf[0, 40 + c]
                    t0x = (lo_x - ox) * inv_x
                    t1x = (hi_x - ox) * inv_x
                    t0y = (lo_y - oy) * inv_y
                    t1y = (hi_y - oy) * inv_y
                    t0z = (lo_z - oz) * inv_z
                    t1z = (hi_z - oz) * inv_z
                    t_near = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0x, t1x),
                                    jnp.minimum(t0y, t1y)),
                        jnp.minimum(t0z, t1z),
                    )
                    t_far = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.maximum(t0z, t1z),
                    )
                    hit = (t_far >= jnp.maximum(t_near, 0.0)) \
                        & (t_near < t_cap)
                    cid = row[0, 48 + c]
                    any_hit = jnp.max(
                        jnp.where(hit, 1, 0)
                    ) > 0
                    want = any_hit & (cid != INVALID)
                    is_emit = cid < 0
                    # Branch-free push for internal children.
                    stack_ref[jnp.minimum(sp, STACK_DEPTH - 1)] = cid
                    sp = sp + jnp.where(want & ~is_emit, 1, 0)

                    # Branch-free K-slot append (a pl.when region per
                    # child cost ~19 us/pop in control-flow overhead;
                    # the unpredicated selects are ~0.4 us).
                    m = hit & (cid < 0) & (cid != INVALID)
                    emit_id = -cid - 1
                    cnt = cnt_ref[...]
                    for s in range(K - 1):
                        ids_out[pp * K + s] = jnp.where(
                            m & (cnt == s), emit_id,
                            ids_out[pp * K + s],
                        )
                    last = m & (cnt >= K - 1)
                    ids_out[pp * K + K - 1] = jnp.where(
                        last,
                        jnp.where(cnt == K - 1, emit_id,
                                  jnp.int32(overflow_id)),
                        ids_out[pp * K + K - 1],
                    )
                    cnt_ref[...] = cnt + m.astype(jnp.int32)
                return sp

            any_live = jnp.max(jnp.where(tmax > 0.0, 1, 0)) > 0
            stack_ref[0] = 0
            lax.while_loop(
                lambda sp: sp > 0, body,
                jnp.where(any_live, 1, 0),
            )
            return 0

        jax.lax.fori_loop(0, o_ref.shape[0], one_packet, 0)

    return kernel


@partial(jax.jit, static_argnames=("n_cuts", "K", "interpret", "sub"))
def emit_packets2(orig, direc, t_max, top_nodes, n_cuts: int, K: int = 6,
                  interpret: bool = False, sub: int = SUB):
    """Phase 1 of binned-subtree traversal: per-ray cut-subtree lists.

    top_nodes: the patched (W, 128) i32 table from trace.cut.build_cut.
    Returns (N, K) i32: cut indices in [0, n_cuts), n_cuts for
    overflow-degraded rays (traverse the whole tree), -1 for empty
    slots."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    packet = sub * LANES
    ppb = max(1, (PACKET * PACKETS_PER_BLOCK) // packet)
    orig, direc, t_max, N, Np = _pad_rays(orig, direc, t_max, packet * ppb)
    n_packets = Np // packet
    n_blocks = n_packets // ppb
    PPB = ppb
    o_t, d_t, tm = _reshape_in(orig, direc, t_max, n_packets, sub)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((PPB, 3, sub, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PPB, 3, sub, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PPB, sub, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # top nodes
        ],
        out_specs=[
            pl.BlockSpec((PPB * K, sub, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((sub, LANES), jnp.int32),     # emit count
        ],
    )

    (ids,) = pl.pallas_call(
        _make_emit_kernel(K=K, overflow_id=n_cuts, sub=sub),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_packets * K, sub, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(o_t, d_t, tm, _with_dummy(top_nodes))

    # (n_packets*K, sub, LANES) -> (Np, K) in ray order.
    ids = jnp.moveaxis(ids.reshape(n_packets, K, sub, LANES), 1, 3)
    return ids.reshape(Np, K)[:N]


def _dummy_node_row():
    """Inert wide-node row: inverted bounds, INVALID children (the
    branch-free stack-underflow target)."""
    row = np.zeros((1, 128), np.int32)
    bounds = np.concatenate(
        [np.full((8, 3), BIG, np.float32),
         np.full((8, 3), -BIG, np.float32)], axis=1,
    )  # (8, 6)
    row[0, :48] = bounds.T.reshape(48).view(np.int32)
    row[0, 48:56] = INVALID
    return row


def _with_dummy(nodes):
    return jnp.concatenate([nodes, jnp.asarray(_dummy_node_row())], axis=0)


def _reshape_in(orig, direc, t_max, n_packets, sub=SUB):
    o_t = orig.T.reshape(3, n_packets, sub, LANES).swapaxes(0, 1)
    d_t = direc.T.reshape(3, n_packets, sub, LANES).swapaxes(0, 1)
    tm = t_max.reshape(n_packets, sub, LANES)
    return o_t, d_t, tm


def _pad_rays(orig, direc, t_max, block_rays):
    N = orig.shape[0]
    pad = (-N) % block_rays
    if pad:
        orig = jnp.concatenate([orig, jnp.zeros((pad, 3), orig.dtype)])
        direc = jnp.concatenate([direc, jnp.ones((pad, 3), direc.dtype)])
        t_max = jnp.concatenate(
            [t_max, jnp.zeros((pad,), t_max.dtype)]  # dead rays
        )
    return orig, direc, t_max, N, N + pad


@partial(jax.jit, static_argnames=("interpret", "tris_in_hbm", "stats",
                                   "order", "pops_per_iter", "sub",
                                   "interval"))
def traverse_packets2(orig, direc, t_max, packed, interpret: bool = False,
                      tris_in_hbm: bool = False, stats: bool = False,
                      order: bool = True, pops_per_iter: int = 1,
                      sub: int = SUB, interval: bool = False,
                      packet_roots=None):
    """Closest-hit packet traversal (v2 kernel).

    Same contract as pallas_traverse.traverse_packets: returns
    (t, tri_packed, u, v); remap tri ids through packed["tri_map"].
    stats=True appends a per-packet counter image: lane [p,0,:] = while
    iterations with a node pop, [p,1,:] = leaf clusters intersected.
    packet_roots: optional (n_packets,) i32 — per-packet traversal
    root (node id >= 0 or leaf -cluster-1) for the binned-subtree
    phase 2 (trace/cut.py); ray count must already be padded to whole
    packets by the caller.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    packet = sub * LANES
    ppb = max(1, (PACKET * PACKETS_PER_BLOCK) // packet)
    orig, direc, t_max, N, Np = _pad_rays(orig, direc, t_max, packet * ppb)
    n_packets = Np // packet
    n_blocks = n_packets // ppb
    PPB = ppb
    o_t, d_t, tm = _reshape_in(orig, direc, t_max, n_packets, sub)
    with_roots = packet_roots is not None
    if with_roots:
        nr = packet_roots.shape[0]
        assert nr * packet >= N, (nr, packet, N)
        roots2 = jnp.zeros((n_packets, 1), jnp.int32)
        roots2 = roots2.at[:nr, 0].set(packet_roots.astype(jnp.int32))

    scratch = [
        pltpu.SMEM((STACK_DEPTH,), jnp.int32),
        pltpu.SMEM((QUEUE_RING,), jnp.int32),
        pltpu.VMEM((sub, LANES), jnp.float32),   # t_best
        pltpu.VMEM((sub, LANES), jnp.int32),     # tri_best
        pltpu.VMEM((sub, LANES), jnp.float32),   # u
        pltpu.VMEM((sub, LANES), jnp.float32),   # v
    ]
    if tris_in_hbm:
        scratch += [
            pltpu.VMEM((QUEUE_RING, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((QUEUE_RING,)),
        ]

    in_specs = [
        pl.BlockSpec((PPB, 3, sub, LANES), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((PPB, 3, sub, LANES), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((PPB, sub, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # nodes
        pl.BlockSpec(
            memory_space=pl.ANY if tris_in_hbm else pltpu.VMEM
        ),                                       # tris
    ]
    if with_roots:
        in_specs.append(pl.BlockSpec((PPB, 1), lambda i: (i, 0),
                                     memory_space=pltpu.SMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((PPB, sub, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4 + int(stats))
        ],
        scratch_shapes=scratch,
    )

    args = [o_t, d_t, tm, _with_dummy(packed["nodes"]), packed["tris_bw"]]
    if with_roots:
        args.append(roots2)
    out = pl.pallas_call(
        _make_kernel(any_hit=False, tris_in_hbm=tris_in_hbm, stats=stats,
                     order=order, pops_per_iter=pops_per_iter, sub=sub,
                     interval=interval, with_roots=with_roots),
        grid_spec=grid_spec,
        # Large node tables (vw-van: 21 MB) exceed the default 16 MB
        # scoped-vmem budget; raise it (v5e VMEM is 128 MB).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((n_packets, sub, LANES), jnp.float32)]
            * int(stats)
        ) + [
            jax.ShapeDtypeStruct((n_packets, sub, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_packets, sub, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_packets, sub, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_packets, sub, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    if stats:
        st, t, tri, u, v = out
    else:
        t, tri, u, v = out

    res = (
        t.reshape(Np)[:N], tri.reshape(Np)[:N],
        u.reshape(Np)[:N], v.reshape(Np)[:N],
    )
    if stats:
        return res + (st[:, :2, 0],)  # (n_packets, 2): pops, clusters
    return res


@partial(jax.jit, static_argnames=("interpret", "tris_in_hbm",
                                   "pops_per_iter", "sub", "interval"))
def anyhit_packets2(orig, direc, t_max, packed, interpret: bool = False,
                    tris_in_hbm: bool = False, pops_per_iter: int = 1,
                    sub: int = SUB, interval: bool = False,
                    packet_roots=None):
    """Occlusion-only packet traversal: True where any triangle lies in
    (0, t_max). Early-exits bookkeeping the closest-hit kernel pays for;
    shadow waves are ~half of all traced rays. packet_roots: see
    traverse_packets2."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    packet = sub * LANES
    ppb = max(1, (PACKET * PACKETS_PER_BLOCK) // packet)
    orig, direc, t_max, N, Np = _pad_rays(orig, direc, t_max, packet * ppb)
    n_packets = Np // packet
    n_blocks = n_packets // ppb
    PPB = ppb
    o_t, d_t, tm = _reshape_in(orig, direc, t_max, n_packets, sub)
    with_roots = packet_roots is not None
    if with_roots:
        nr = packet_roots.shape[0]
        assert nr * packet >= N, (nr, packet, N)
        roots2 = jnp.zeros((n_packets, 1), jnp.int32)
        roots2 = roots2.at[:nr, 0].set(packet_roots.astype(jnp.int32))

    scratch = [
        pltpu.SMEM((STACK_DEPTH,), jnp.int32),
        pltpu.SMEM((QUEUE_RING,), jnp.int32),
        pltpu.VMEM((sub, LANES), jnp.float32),   # occluded mask
    ]
    if tris_in_hbm:
        scratch += [
            pltpu.VMEM((QUEUE_RING, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((QUEUE_RING,)),
        ]

    in_specs = [
        pl.BlockSpec((PPB, 3, sub, LANES), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((PPB, 3, sub, LANES), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((PPB, sub, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(
            memory_space=pl.ANY if tris_in_hbm else pltpu.VMEM
        ),
    ]
    if with_roots:
        in_specs.append(pl.BlockSpec((PPB, 1), lambda i: (i, 0),
                                     memory_space=pltpu.SMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((PPB, sub, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )

    args = [o_t, d_t, tm, _with_dummy(packed["nodes"]), packed["tris_bw"]]
    if with_roots:
        args.append(roots2)
    (occ,) = pl.pallas_call(
        _make_kernel(any_hit=True, tris_in_hbm=tris_in_hbm,
                     pops_per_iter=pops_per_iter, sub=sub,
                     interval=interval, with_roots=with_roots),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_packets, sub, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(*args)

    return occ.reshape(Np)[:N] > 0.0
