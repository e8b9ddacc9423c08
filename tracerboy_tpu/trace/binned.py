"""Binned (stream-compaction) traversal: the round-3 incoherent-ray backend.

The packet kernel (pallas_traverse2.py) shares one node stream across a
2048-ray packet, so incoherent bounce waves pay the measured ~34x
divergence tax (ARCHITECTURE.md) and bottom out around ~1 Mrays/s. This
backend removes the union cost by inverting the loop: rays are SORTED BY
the clusters they need, and each 128-triangle cluster is tested against
dense, perfectly-occupied tiles of exactly the rays that asked for it —
the TPU-native analog of ray-stream binning / queue-based wavefront
traversal. The reference's corresponding hot loop is the software
traversal stack machine
(D3D12RaytracingFallback/src/TraverseFunction.hlsli:537-784); this module
replaces its *scheduling*, not its math contract (closest hit in
(0, t_max), barycentrics out).

Measured design inputs (scripts/bench_binned*.py, cluster_stats, v5e):
- a bounce ray must test ~10 clusters on average (p90 ~20) before the
  nearest-hit is provable — mostly origin-adjacent boxes with entry-t
  ~ 0, which ANY conservative traversal visits;
- payload-carrying lax.sort moves ~1M rows x 10 planes in ~2 ms;
- the dense tile kernel (one (3C,4)x(4,P) MXU dot + fused VMEM epilogue)
  runs at 89-108 Gpairs/s — 18x the VPU broadcast rate and 6x the XLA
  batched-dot form (whose (T,P,3C) intermediates round-trip HBM);
- per-ray top-k via lax.top_k / row-sort is unusable (76 ms at
  (245k, 1024)); the K-nearest set is instead maintained in per-lane
  registers during a coarse packet walk.

Pipeline per wave (one jit):
 1. SELECT  — Pallas packet walk over a coarse BVH whose leaves are
    128-tri clusters; each ray keeps its K nearest clusters in per-lane
    registers plus the min entry-t of anything dropped.
 2. EXPAND + SORT — K pairs per ray, ONE lax.sort by cluster id.
 3. DENSE   — tile kernel: 256 pairs vs their <= D cluster segments.
 4. COMBINE — one sort by original ray index (doubles as the final
    unsort), (N, K) min-reduce.
 5. FALLBACK — rays whose K-nearest set was insufficient (dropped a
    cluster nearer than their best hit) re-enter the v2 packet kernel
    with everyone else dead; dead-lane compaction keeps that cheap.

Triangle ids are PACKED (pk) ids — the packet kernel's id space — so
both backends share pk_attr_rows and no remap gather exists anywhere.

Intersection math is Baldwin-Weber (precomputed world-to-barycentric
rows; Baldwin & Weber, JCGT 2016): per cluster a (3C, 4) table
[n|-d ; g1|h1 ; g2|h2] turns the test into two tiny MXU dots plus ~12
VPU ops per ray-triangle pair.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tracerboy_tpu.accel.bvh import INVALID, build_bvh

CLUSTER = 128          # triangles per cluster (= 16 packet-kernel rows)
KSEL = 16              # nearest clusters tracked/tested per ray
TILE_P = 256           # pair rows per dense tile
DSEG = 8               # max cluster segments handled per tile (pl.when
                       # skips absent segments, so extra slots are cheap)
SUB, LANES = 16, 128
PACKET = SUB * LANES   # selection kernel packet (2048 rays)
SEL_PPB = 8            # selection packets per grid step
STACK_DEPTH = 64
BIG = 1e30

# 8-element sorting network (Batcher), as in pallas_traverse2.
_SORT_NET = [
    (0, 1), (2, 3), (4, 5), (6, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6), (0, 4), (3, 7),
    (1, 5), (2, 6), (1, 4), (3, 6),
    (2, 4), (3, 5), (3, 4),
]


# ---------------------------------------------------------------------------
# Packing


def _bw_rows(v0, v1, v2):
    """Baldwin-Weber rows for (T, 3) triangle vertices.

    Returns (T, 3, 4): [n | -d], [g1 | h1], [g2 | h2] with
    n = e1 x e2, d = n.v0, g1 = (e2 x n)/n.n, g2 = (n x e1)/n.n, so that
    t = -(n.o - d)/(n.dir), u = g1.P + h1, v = g2.P + h2 at P = o + t d.
    Degenerate triangles (n ~ 0) get all-zero rows: B = 0 and A = 0
    give t = 0, rejected by the t > eps window.
    """
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)
    nn = (n * n).sum(axis=1)
    good = nn > 1e-24
    inv = np.where(good, 1.0 / np.maximum(nn, 1e-24), 0.0)[:, None]
    g1 = np.cross(e2, n) * inv
    g2 = np.cross(n, e1) * inv
    d = (n * v0).sum(axis=1)
    h1 = -(g1 * v0).sum(axis=1)
    h2 = -(g2 * v0).sum(axis=1)
    n = np.where(good[:, None], n, 0.0)
    d = np.where(good, d, 0.0)
    return np.stack(
        [
            np.concatenate([n, -d[:, None]], axis=1),
            np.concatenate([g1, h1[:, None]], axis=1),
            np.concatenate([g2, h2[:, None]], axis=1),
        ],
        axis=1,
    ).astype(np.float32)


def pack_scene_binned(pk_tris, num_pk_rows: int | None = None) -> dict:
    """Build the binned-traversal tables from the packet kernel's packed
    triangle rows, sharing its triangle id space.

    pk_tris: (Cpk, 128) f32 rows of 8 triangles each (x 9 floats).

    Returns dict(
      bn_nodes (W, 128) i32 — coarse wide-BVH over clusters; leaf child
                              c encodes cluster -c-1 (coarse order),
      bn_mot   (n_cl, 3*CLUSTER, 4) f32 — Baldwin-Weber rows,
      bn_base  (n_cl + 1,) i32 — packed tri id base per cluster,
    )
    """
    rows = np.asarray(pk_tris, np.float32)
    if num_pk_rows is not None:
        rows = rows[:num_pk_rows]
    Cpk = rows.shape[0]
    per = CLUSTER // 8                       # pk rows per cluster
    n_cl = (Cpk + per - 1) // per
    pad_rows = n_cl * per - Cpk
    if pad_rows:
        rows = np.concatenate(
            [rows, np.zeros((pad_rows, 128), np.float32)], axis=0
        )
    tri = rows[:, : 8 * 9].reshape(-1, 9)      # (n_cl*CLUSTER, 9) pk order
    v0, v1, v2 = tri[:, 0:3], tri[:, 3:6], tri[:, 6:9]

    # Chunk AABBs (pk-order chunks of CLUSTER tris); degenerate padding
    # triangles (zero area) are excluded from the bounds.
    area = np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    ok = (area > 0)[:, None]
    lo3 = np.where(ok, np.minimum(np.minimum(v0, v1), v2), BIG)
    hi3 = np.where(ok, np.maximum(np.maximum(v0, v1), v2), -BIG)
    lo = lo3.reshape(n_cl, CLUSTER, 3).min(axis=1)
    hi = hi3.reshape(n_cl, CLUSTER, 3).max(axis=1)
    empty = (hi < lo).any(axis=1)
    ctr = np.where(empty[:, None], 0.0, (lo + hi) * 0.5)
    lo = np.where(empty[:, None], np.float32(BIG), lo)
    hi = np.where(empty[:, None], np.float32(-BIG), hi)

    # Coarse 8-wide BVH over cluster boxes: (lo, hi, centroid) as the
    # three "vertices" — their min/max is exactly the box.
    bvh = build_bvh(lo, hi, ctr, leaf_size=1)
    corder = np.asarray(bvh.tri_order)[: len(lo)]  # coarse id -> chunk

    W = bvh.num_nodes
    blo = np.asarray(bvh.bounds_lo)
    bhi = np.asarray(bvh.bounds_hi)
    ch = np.asarray(bvh.children).astype(np.int32)
    valid = ch != INVALID
    blo = np.where(valid[..., None], blo, np.float32(BIG))
    bhi = np.where(valid[..., None], bhi, np.float32(-BIG))
    nrows = np.zeros((W, 128), np.int32)
    bounds = np.concatenate([blo, bhi], axis=2)
    nrows[:, :48] = (
        bounds.transpose(0, 2, 1).reshape(W, 48).astype(np.float32)
        .view(np.int32)
    )
    nrows[:, 48:56] = ch

    bw = _bw_rows(v0, v1, v2).reshape(n_cl, CLUSTER, 3, 4)[corder]
    mot = bw.transpose(0, 2, 1, 3).reshape(n_cl, 3 * CLUSTER, 4)
    base = np.concatenate(
        [corder.astype(np.int32) * CLUSTER, np.full(1, -1, np.int32)]
    )

    return dict(
        bn_nodes=jnp.asarray(nrows),
        bn_mot=jnp.asarray(np.ascontiguousarray(mot)),
        bn_base=jnp.asarray(base),
    )


# ---------------------------------------------------------------------------
# Selection kernel: K nearest clusters per ray


def _dummy_node_row():
    row = np.zeros((1, 128), np.int32)
    bounds = np.concatenate(
        [np.full((8, 3), BIG, np.float32),
         np.full((8, 3), -BIG, np.float32)], axis=1,
    )
    row[0, :48] = bounds.T.reshape(48).view(np.int32)
    row[0, 48:56] = INVALID
    return row


def _make_select_kernel(K: int):
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(o_ref, d_ref, tmax_ref, tlo_ref, nodes_ref,
               out_t_ref, out_c_ref, out_drop_ref,
               stack_ref, slot_t_ref, slot_c_ref, worst_ref, drop_ref):
        dummy_idx = nodes_ref.shape[0] - 1
        fbits = lambda w: lax.bitcast_convert_type(w, jnp.float32)

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
            tlo = tlo_ref[pp]

            stack_ref[0] = 0
            slot_t_ref[...] = jnp.full((K * SUB, LANES), jnp.float32(BIG))
            slot_c_ref[...] = jnp.full((K * SUB, LANES), -1, jnp.int32)
            worst_ref[...] = jnp.full((SUB, LANES), jnp.float32(BIG))
            drop_ref[...] = jnp.full((SUB, LANES), jnp.float32(BIG))

            def body(sp):
                have = sp > 0
                node = jnp.where(
                    have, stack_ref[jnp.maximum(sp - 1, 0)], dummy_idx
                )
                sp = sp - jnp.where(have, 1, 0)
                row = nodes_ref[pl.ds(node, 1), :]
                rowf = fbits(row)
                cap = jnp.minimum(tmax, worst_ref[...])
                tmins, cids, wants = [], [], []
                leaf_data = []
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
                    t_near = jnp.maximum(t_near, 0.0)
                    hit = (t_far >= t_near) & (t_near < cap)
                    cid = row[0, 48 + c]
                    is_leaf = cid < 0
                    # Windowed re-selection (t_lo > 0): leaf clusters
                    # whose entry-t was already covered by an earlier
                    # phase are skipped; internal nodes still descend
                    # (a child's t_near can exceed its parent's).
                    leaf_hit = hit & (t_near >= tlo)
                    tmin = jnp.min(jnp.where(hit, t_near, jnp.float32(BIG)))
                    want = (cid != INVALID) & (tmin < jnp.float32(BIG))
                    tmins.append(tmin)
                    cids.append(cid)
                    wants.append(want & ~is_leaf)
                    leaf_want = (
                        is_leaf & (cid != INVALID)
                        & jnp.any(leaf_hit)
                    )
                    leaf_data.append((cid, leaf_want, leaf_hit, t_near))

                # Leaf children: insert into each lane's K-nearest set
                # (replace the worst slot; track the min dropped t).
                for cid, leaf_want, hit, t_near in leaf_data:
                    @pl.when(leaf_want)
                    def _():
                        cluster = -cid - 1
                        want_lane = hit
                        wm = slot_t_ref[0:SUB]
                        am = jnp.zeros((SUB, LANES), jnp.int32)
                        for j in range(1, K):
                            sj = slot_t_ref[j * SUB:(j + 1) * SUB]
                            b = sj > wm
                            wm = jnp.where(b, sj, wm)
                            am = jnp.where(b, j, am)
                        repl = want_lane & (t_near < wm)
                        for j in range(K):
                            sel = repl & (am == j)
                            sl = slice(j * SUB, (j + 1) * SUB)
                            slot_t_ref[sl] = jnp.where(
                                sel, t_near, slot_t_ref[sl]
                            )
                            slot_c_ref[sl] = jnp.where(
                                sel, cluster, slot_c_ref[sl]
                            )
                        drop_ref[...] = jnp.minimum(
                            drop_ref[...],
                            jnp.where(
                                repl, wm,
                                jnp.where(want_lane, t_near,
                                          jnp.float32(BIG)),
                            ),
                        )
                        nw = slot_t_ref[0:SUB]
                        for j in range(1, K):
                            nw = jnp.maximum(
                                nw, slot_t_ref[j * SUB:(j + 1) * SUB]
                            )
                        worst_ref[...] = nw

                # Internal children: ordered far-to-near pushes.
                t = list(tmins)
                c2 = list(cids)
                w2 = list(wants)
                for a, b in _SORT_NET:
                    swap = t[a] < t[b]
                    ta, tb = t[a], t[b]
                    t[a] = jnp.where(swap, tb, ta)
                    t[b] = jnp.where(swap, ta, tb)
                    ca, cb = c2[a], c2[b]
                    c2[a] = jnp.where(swap, cb, ca)
                    c2[b] = jnp.where(swap, ca, cb)
                    wa, wb = w2[a], w2[b]
                    w2[a] = jnp.where(swap, wb, wa)
                    w2[b] = jnp.where(swap, wa, wb)
                for c in range(8):
                    stack_ref[jnp.minimum(sp, STACK_DEPTH - 1)] = c2[c]
                    sp = sp + jnp.where(w2[c], 1, 0)
                return sp

            lax.while_loop(lambda sp: sp > 0, body, jnp.int32(1))

            out_t_ref[pp] = slot_t_ref[...]
            out_c_ref[pp] = slot_c_ref[...]
            out_drop_ref[pp] = drop_ref[...]
            return 0

        lax.fori_loop(0, o_ref.shape[0], one_packet, 0)

    return kernel


@partial(jax.jit, static_argnames=("interpret", "K"))
def select_clusters(o_t, d_t, tm, tlo, nodes, K: int = KSEL,
                    interpret: bool = False):
    """Per-ray K-nearest-cluster selection.

    o_t/d_t: (n_packets, 3, SUB, LANES); tm/tlo: (n_packets, SUB,
    LANES). Clusters with entry-t < tlo are skipped (windowed
    re-selection for later phases; pass zeros for the first).
    Returns (slot_t, slot_c, dropped_min):
      slot_t (n_packets, K*SUB, LANES) f32 entry-t (BIG = empty),
      slot_c same-shape i32 cluster ids (-1 = empty),
      dropped_min (n_packets, SUB, LANES) f32 min entry-t of clusters
      that overflowed the K-nearest set (BIG = none dropped).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_packets = o_t.shape[0]
    nodes_d = jnp.concatenate(
        [nodes, jnp.asarray(_dummy_node_row())], axis=0
    )
    ppb = SEL_PPB if n_packets % SEL_PPB == 0 else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_packets // ppb,),
        in_specs=[
            pl.BlockSpec((ppb, 3, SUB, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ppb, 3, SUB, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ppb, SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ppb, SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),    # nodes
        ],
        out_specs=[
            pl.BlockSpec((ppb, K * SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ppb, K * SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ppb, SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((K * SUB, LANES), jnp.float32),
            pltpu.VMEM((K * SUB, LANES), jnp.int32),
            pltpu.VMEM((SUB, LANES), jnp.float32),
            pltpu.VMEM((SUB, LANES), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_select_kernel(K),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_packets, K * SUB, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_packets, K * SUB, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_packets, SUB, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(o_t, d_t, tm, tlo, nodes_d)


# ---------------------------------------------------------------------------
# Dense pair-test kernel


def _make_dense_kernel(C: int, P: int, D: int):
    import jax.lax as lax
    from jax.experimental import pallas as pl

    def kernel(cstart_ref, seg_start_ref, rank_base_ref, rank_cluster_ref,
               rays_ref, *rest):
        mot_refs = rest[:D]
        out_ref = rest[D]
        tb_ref, ib_ref, ub_ref, vb_ref, cov_ref = rest[D + 1:]
        i = pl.program_id(0)
        fbits = lambda w: lax.bitcast_convert_type(w, jnp.float32)
        ibits = lambda w: lax.bitcast_convert_type(w, jnp.int32)

        ox = rays_ref[0:1]                        # (1, P)
        oy = rays_ref[1:2]
        oz = rays_ref[2:3]
        dxr = rays_ref[3:4]
        dyr = rays_ref[4:5]
        dzr = rays_ref[5:6]
        cap = rays_ref[6:7]
        lane_rank = ibits(rays_ref[7:8])          # (1, P) i32

        lhs_o = jnp.concatenate(
            [ox, oy, oz, jnp.ones((1, P), jnp.float32)], axis=0
        )                                         # (4, P)
        lhs_d = jnp.concatenate(
            [dxr, dyr, dzr, jnp.zeros((1, P), jnp.float32)], axis=0
        )

        tb_ref[...] = jnp.full((1, P), jnp.float32(BIG))
        ib_ref[...] = jnp.full((1, P), -1, jnp.int32)
        ub_ref[...] = jnp.zeros((1, P), jnp.float32)
        vb_ref[...] = jnp.zeros((1, P), jnp.float32)
        cov_ref[...] = jnp.zeros((1, P), jnp.float32)

        n_segs = seg_start_ref.shape[0] - 1
        row0 = i * P
        for j in range(D):
            rank = jnp.minimum(cstart_ref[i] + j, n_segs - 1)
            s0 = seg_start_ref[rank]
            s1 = seg_start_ref[rank + 1]
            in_tile = (
                (cstart_ref[i] + j < n_segs)
                & (s0 < row0 + P) & (s1 > row0)
            )
            match = lane_rank == rank
            # A matched lane is HANDLED even for the dummy run (no
            # geometry): cov distinguishes "tested or dummy" from
            # "tile spanned more than D runs" (those rays fall back).
            @pl.when(in_tile)
            def _():
                cov_ref[...] = jnp.where(match, 1.0, cov_ref[...])

            do_test = in_tile & (rank_base_ref[rank] >= 0)

            @pl.when(do_test)
            def _():
                mot = mot_refs[j][0]              # (3C, 4)
                # HIGHEST precision: Mosaic's default f32 matmul runs
                # bf16 passes on the MXU — its ~1e-2 relative error
                # misclassified barycentric containment for 50%+ of
                # real-scene rays (measured on teapot bounce waves).
                # The K=4 contraction makes the extra passes ~free.
                O = jax.lax.dot_general(
                    mot, lhs_o, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )                                 # (3C, P)
                Dd = jax.lax.dot_general(
                    mot, lhs_d, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                A, B = O[:C], Dd[:C]
                Co, Cd = O[C:2 * C], Dd[C:2 * C]
                Eo, Ed = O[2 * C:], Dd[2 * C:]
                t = -A / jnp.where(
                    jnp.abs(B) < 1e-12, jnp.float32(1e-12), B
                )
                u = Co + t * Cd
                v = Eo + t * Ed
                # Same conservative containment band as the packet
                # kernel's drain: shared-edge points hit BOTH adjacent
                # triangles rather than neither (no cracks).
                ok = (
                    (t > 1e-5) & (u >= -1e-5) & (v >= -1e-5)
                    & (u + v <= 1.0 + 1e-5) & (jnp.abs(B) >= 1e-12)
                    & match & (t < cap)
                )
                tm = jnp.where(ok, t, jnp.float32(BIG))
                tmin = jnp.min(tm, axis=0, keepdims=True)   # (1, P)
                rows = jax.lax.broadcasted_iota(jnp.int32, (C, P), 0)
                rmin = jnp.min(
                    jnp.where(tm <= tmin, rows, jnp.int32(C)), axis=0,
                    keepdims=True,
                )
                sel = (rows == rmin) & ok
                usel = jnp.sum(jnp.where(sel, u, 0.0), axis=0,
                               keepdims=True)
                vsel = jnp.sum(jnp.where(sel, v, 0.0), axis=0,
                               keepdims=True)
                better = tmin < tb_ref[...]
                ib_ref[...] = jnp.where(
                    better & (rmin < C), rank_base_ref[rank] + rmin,
                    ib_ref[...],
                )
                ub_ref[...] = jnp.where(better, usel, ub_ref[...])
                vb_ref[...] = jnp.where(better, vsel, vb_ref[...])
                tb_ref[...] = jnp.where(better, tmin, tb_ref[...])

        out_ref[0:1] = tb_ref[...]
        out_ref[1:2] = fbits(ib_ref[...])
        out_ref[2:3] = ub_ref[...]
        out_ref[3:4] = vb_ref[...]
        out_ref[4:5] = cov_ref[...]
        out_ref[5:8] = jnp.zeros((3, P), jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=("interpret", "n_cl"))
def dense_pairs(rays8, cstart, seg_start, rank_base, rank_cluster, mot,
                n_cl: int, interpret: bool = False):
    """Test every pair row against its cluster.

    rays8: (8, M) f32 planes [ox oy oz dx dy dz cap rank(bits)], M a
    multiple of TILE_P, sorted so equal ranks are contiguous.
    cstart (n_tiles,), seg_start (n_segs+1,), rank_base / rank_cluster
    (n_segs+1,): segment tables (rank = dense index over the sorted
    key runs; rank_base < 0 marks the dummy run).
    Returns (8, M) f32 [t, tri(bits), u, v, 0...].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = rays8.shape[1]
    P, C, D = TILE_P, CLUSTER, DSEG
    n_tiles = M // P
    mot_d = jnp.concatenate(
        [mot, jnp.zeros((1, 3 * C, 4), jnp.float32)], axis=0
    )

    def mot_spec(j):
        def index_map(i, cstart, seg_start, rank_base, rank_cluster):
            n_segs = seg_start.shape[0] - 1
            rank = jnp.minimum(cstart[i] + j, n_segs - 1)
            return (jnp.clip(rank_cluster[rank], 0, n_cl), 0, 0)

        return pl.BlockSpec((1, 3 * C, 4), index_map,
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (8, P),
                lambda i, cstart, seg_start, rank_base, rank_cluster:
                (0, i),
                memory_space=pltpu.VMEM),
        ] + [mot_spec(j) for j in range(D)],
        out_specs=[
            pl.BlockSpec(
                (8, P),
                lambda i, cstart, seg_start, rank_base, rank_cluster:
                (0, i),
                memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),   # tb
            pltpu.VMEM((1, P), jnp.int32),     # ib
            pltpu.VMEM((1, P), jnp.float32),   # ub
            pltpu.VMEM((1, P), jnp.float32),   # vb
            pltpu.VMEM((1, P), jnp.float32),   # covered
        ],
    )
    (out,) = pl.pallas_call(
        _make_dense_kernel(C, P, D),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
        out_shape=[jax.ShapeDtypeStruct((8, M), jnp.float32)],
        interpret=interpret,
    )(cstart, seg_start, rank_base, rank_cluster, rays8, *([mot_d] * D))
    return out


# ---------------------------------------------------------------------------
# Orchestrator


def binned_closest(scene, origin, direction, t_max,
                   interpret: bool = False, use_fallback: bool = True):
    """Closest-hit over the binned backend.

    origin/direction (N, 3), t_max (N,). Returns (t, tri, u, v) with
    PACKED (pk) triangle ids — the packet-kernel id space (miss:
    t = BIG, tri = -1).
    """
    from tracerboy_tpu.trace.pallas_traverse2 import traverse_packets2
    from tracerboy_tpu.trace.wavefront import _coherence_sort

    nodes = scene["bn_nodes"]
    mot = scene["bn_mot"]
    base = scene["bn_base"]
    n_cl = int(mot.shape[0])
    K = KSEL

    N0 = origin.shape[0]
    # --- coherence sort + pad to the selection packet size --------------
    key0 = _coherence_sort(
        origin, direction, scene["world_lo"], scene["world_hi"],
        t_max=t_max,
    )
    idx = jnp.arange(N0, dtype=jnp.int32)
    (_, sox, soy, soz, sdx, sdy, sdz, stm, sidx) = jax.lax.sort(
        (key0, origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2], t_max, idx),
        num_keys=1,
    )
    pad = (-N0) % PACKET
    if pad:
        zf = jnp.zeros((pad,), jnp.float32)
        sox = jnp.concatenate([sox, zf])
        soy = jnp.concatenate([soy, zf])
        soz = jnp.concatenate([soz, zf])
        sdx = jnp.concatenate([sdx, zf + 1.0])
        sdy = jnp.concatenate([sdy, zf])
        sdz = jnp.concatenate([sdz, zf])
        stm = jnp.concatenate([stm, zf])     # dead padding
        sidx = jnp.concatenate([sidx, jnp.full((pad,), N0, jnp.int32)])
    N = N0 + pad
    n_packets = N // PACKET

    # --- selection ------------------------------------------------------
    o_t = jnp.stack([sox, soy, soz], 0).reshape(
        3, n_packets, SUB, LANES).swapaxes(0, 1)
    d_t = jnp.stack([sdx, sdy, sdz], 0).reshape(
        3, n_packets, SUB, LANES).swapaxes(0, 1)
    tm_t = stm.reshape(n_packets, SUB, LANES)
    _, slot_c, dropped = select_clusters(
        o_t, d_t, tm_t, jnp.zeros_like(tm_t), nodes, K=K,
        interpret=interpret,
    )
    slots_c = [
        slot_c[:, k * SUB:(k + 1) * SUB, :].reshape(N) for k in range(K)
    ]
    dropped = dropped.reshape(N)

    # --- expand pairs + sort by cluster, in 8-slot chunks ---------------
    # A single K=16 expansion makes a 3.9M-row sort at 245k rays, whose
    # working set spills past VMEM and costs 26.5 ms (measured); two
    # 8-slot chunks keep each sort under ~2M rows (~5 ms each).
    KCHUNK = 8
    tb = jnp.full((N,), jnp.float32(BIG))
    ib = jnp.full((N,), -1, jnp.int32)
    ub = jnp.zeros((N,), jnp.float32)
    vb = jnp.zeros((N,), jnp.float32)
    uncov = jnp.zeros((N,), bool)
    for c0 in range(0, K, KCHUNK):
        chunk = slots_c[c0:c0 + KCHUNK]
        KC = len(chunk)

        def rep(x):
            return jnp.concatenate([x] * KC)

        pair_key = jnp.concatenate([
            jnp.where(c >= 0, c, n_cl).astype(jnp.uint32) for c in chunk
        ])
        M = N * KC
        pair_planes = (
            rep(sox), rep(soy), rep(soz), rep(sdx), rep(sdy), rep(sdz),
            rep(stm), rep(sidx),
        )
        out = jax.lax.sort((pair_key,) + pair_planes, num_keys=1)
        pkey = out[0].astype(jnp.int32)
        (pox, poy, poz, pdx, pdy, pdz, ptm, psidx) = out[1:]

        # segment tables: rank = dense run index over the sorted keys
        changed = jnp.concatenate(
            [jnp.ones((1,), jnp.int32),
             (pkey[1:] != pkey[:-1]).astype(jnp.int32)]
        )
        rank = jnp.cumsum(changed) - 1
        probes = jnp.arange(n_cl + 2, dtype=jnp.int32)
        seg_start = jnp.searchsorted(rank, probes).astype(jnp.int32)
        rank_cluster = pkey[jnp.clip(seg_start[:-1], 0, M - 1)]
        rank_base = jnp.where(
            rank_cluster < n_cl, base[jnp.clip(rank_cluster, 0, n_cl)],
            -1,
        )
        cstart = rank[:: TILE_P]

        rays8 = jnp.stack([
            pox, poy, poz, pdx, pdy, pdz, ptm,
            jax.lax.bitcast_convert_type(rank, jnp.float32),
        ], axis=0)
        res = dense_pairs(
            rays8, cstart, seg_start, rank_base, rank_cluster, mot,
            n_cl=n_cl, interpret=interpret,
        )
        t_p = res[0]
        i_p = jax.lax.bitcast_convert_type(res[1], jnp.int32)

        # combine: sort by original ray index (also the unsort)
        _, t_s, i_s, u_s, v_s, cov_s = jax.lax.sort(
            (psidx, t_p, i_p, res[2], res[3], res[4]), num_keys=1
        )
        t_k = t_s.reshape(N, KC)     # rows: pairs of original ray n
        i_k = i_s.reshape(N, KC)
        u_k = u_s.reshape(N, KC)
        v_k = v_s.reshape(N, KC)
        t_c = jnp.min(t_k, axis=1)
        kmin = jnp.argmin(t_k, axis=1)
        i_c = jnp.take_along_axis(i_k, kmin[:, None], axis=1)[:, 0]
        u_c = jnp.take_along_axis(u_k, kmin[:, None], axis=1)[:, 0]
        v_c = jnp.take_along_axis(v_k, kmin[:, None], axis=1)[:, 0]
        better = t_c < tb
        tb = jnp.where(better, t_c, tb)
        ib = jnp.where(better, i_c, ib)
        ub = jnp.where(better, u_c, ub)
        vb = jnp.where(better, v_c, vb)
        # any pair left uncovered (its tile spanned > DSEG runs)
        # poisons the ray: it must take the fallback.
        uncov = uncov | (jnp.min(cov_s.reshape(N, KC), axis=1) < 0.5)

    ib = jnp.where(tb < jnp.float32(BIG), ib, -1)
    tb = tb[:N0]
    ib = ib[:N0]
    ub = ub[:N0]
    vb = vb[:N0]
    uncov = uncov[:N0]

    # dropped_min back to original order (carried through a small sort)
    _, drop_o = jax.lax.sort((sidx, dropped), num_keys=1)
    drop_o = drop_o[:N0]

    # --- fallback for rays whose K-nearest set was insufficient ---------
    if use_fallback:
        unresolved = ((tb > drop_o) | uncov) & (t_max > 0.0)
        fb_tmax = jnp.where(unresolved, jnp.minimum(t_max, tb), 0.0)
        packed = dict(nodes=scene["pk_nodes"],
                      tris_bw=scene["pk_tris_bw"])
        table_bytes = (packed["tris_bw"].shape[0]
                       + packed["nodes"].shape[0]) * 512
        key_fb = _coherence_sort(
            origin, direction, scene["world_lo"], scene["world_hi"],
            t_max=fb_tmax,
        )
        fidx = jnp.arange(N0, dtype=jnp.int32)
        (_, fox, foy, foz, fdx, fdy, fdz, ftm, ffi) = jax.lax.sort(
            (key_fb, origin[:, 0], origin[:, 1], origin[:, 2],
             direction[:, 0], direction[:, 1], direction[:, 2],
             fb_tmax, fidx),
            num_keys=1,
        )
        t2, tri2, u2, v2 = traverse_packets2(
            jnp.stack([fox, foy, foz], 1), jnp.stack([fdx, fdy, fdz], 1),
            ftm, packed, tris_in_hbm=table_bytes > 88 * 2**20,
            interpret=interpret,
        )
        _, t2, tri2, u2, v2 = jax.lax.sort(
            (ffi, t2[:N0], tri2[:N0], u2[:N0], v2[:N0]), num_keys=1
        )
        closer = (tri2 >= 0) & (t2 < tb)
        tb = jnp.where(closer, t2, tb)
        ib = jnp.where(closer, tri2, ib)
        ub = jnp.where(closer, u2, ub)
        vb = jnp.where(closer, v2, vb)

    tb = jnp.where(ib >= 0, tb, jnp.float32(BIG))
    return tb, ib, ub, vb
