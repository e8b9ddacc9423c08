"""Binned (stream-compaction) traversal: the round-3 incoherent-ray backend.

The packet kernel (pallas_traverse2.py) shares one node stream across a
2048-ray packet, so incoherent bounce waves pay the measured ~34x
divergence tax (ARCHITECTURE.md) and bottom out at ~0.7 Mrays/s. This
backend removes the union cost entirely by inverting the loop: instead of
rays walking the tree, rays are SORTED BY the cluster they need next, and
each 128-triangle cluster is tested against a dense, perfectly-occupied
tile of the rays that asked for it — the TPU-native analog of ray-stream
binning / queue-based wavefront traversal. The reference's corresponding
hot loop is the software traversal stack machine
(D3D12RaytracingFallback/src/TraverseFunction.hlsli:537-784); this module
replaces its *scheduling*, not its math contract (closest hit in
(0, t_max), barycentrics out).

Pipeline per wave (all device-side, one jit):
 1. SELECT  — a Pallas packet walk over a coarse BVH whose leaves are
    128-triangle clusters. Each ray keeps its K nearest clusters
    (entry-t ordered) in per-lane registers, plus the min entry-t of
    anything it had to drop.
 2. ROUNDS  — R rounds of: pick each ray's nearest untested cluster,
    lax.sort the whole ray state by that cluster id (payload-carrying
    sort: ~1.2 ms for 262k rows x 30 planes, measured), then run the
    dense-tile kernel: each 256-ray tile is tested against the <=D
    cluster segments it spans via one (3C,4)x(4,P) MXU dot + fused
    VMEM epilogue (measured 89-108 Gpairs/s — 18x the VPU brute rate,
    6x the XLA batched-dot form, which round-trips its (T,P,3C)
    intermediates through HBM).
    A ray is RESOLVED when its best hit is nearer than every untested
    cluster's entry t — per-cluster-granularity early termination.
 3. FALLBACK — rays still unresolved after R rounds (needed > R
    clusters, or > K overlaps dropped) re-enter the v2 packet kernel
    with everyone else dead; dead-lane compaction makes that cheap.

Triangle ids are in PACKED (pk) order — the same id space as the packet
kernel — so both backends share pk_attr_rows and no remap gather exists
anywhere on the hot path.

Intersection math is Baldwin-Weber (precomputed world-to-barycentric
rows; JCGT 2016): per cluster a (3C, 4) table [n|-d ; g1|h1 ; g2|h2]
turns the whole test into two tiny MXU dots plus ~12 VPU ops/pair.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tracerboy_tpu.accel.bvh import INVALID, build_bvh

CLUSTER = 128          # triangles per cluster (= 16 packet-kernel rows)
KSEL = 8               # nearest clusters tracked per ray
ROUNDS = 4             # cluster-test rounds before the packet fallback
TILE_P = 256           # rays per dense tile
DSEG = 4               # max cluster segments handled per tile
SUB, LANES = 16, 128
PACKET = SUB * LANES   # selection kernel packet
SEL_PPB = 8            # selection packets per grid step
STACK_DEPTH = 64
BIG = 1e30

# 8-element descending sorting network (Batcher), as in pallas_traverse2.
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
    n = e1 x e2, d = n.v0, g1 = (e2 x n)/n.n, g2 = (n x e1)/n.n.
    t = -(n.o - d)/(n.dir); u = g1.P + h1; v = g2.P + h2 at P = o + t d.
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
    rows = np.stack(
        [
            np.concatenate([n, -d[:, None]], axis=1),
            np.concatenate([g1, h1[:, None]], axis=1),
            np.concatenate([g2, h2[:, None]], axis=1),
        ],
        axis=1,
    ).astype(np.float32)
    return rows


def pack_scene_binned(pk_tris, num_pk_rows: int | None = None) -> dict:
    """Build the binned-traversal tables from the packet kernel's packed
    triangle rows, sharing its triangle id space.

    pk_tris: (Cpk, 128) f32 rows of 8 triangles each (x 9 floats).

    Returns dict(
      bn_nodes   (W, 128) i32  — coarse wide-BVH over clusters; leaf
                                 child c encodes cluster -c-1,
      bn_mot     (n_cl, 3*CLUSTER, 4) f32 — Baldwin-Weber rows, cluster-
                                 local triangle order,
      bn_base    (n_cl + 1,) i32 — packed tri id base per cluster,
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

    # Chunk AABBs (pk-order chunks of CLUSTER tris). Degenerate padding
    # triangles are all-zero; exclude them from bounds via the area test.
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

    # Coarse 8-wide BVH over cluster boxes: feed (lo, hi, centroid) as
    # the three "vertices" — their min/max is exactly the box.
    bvh = build_bvh(lo, hi, ctr, leaf_size=1)
    corder = np.asarray(bvh.tri_order)[: bvh.num_clusters]  # coarse->chunk

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

    # MOT in coarse cluster order; triangle base table maps cluster ->
    # packed tri id range start.
    bw = _bw_rows(v0, v1, v2)                  # (n_cl*CLUSTER, 3, 4)
    bw = bw.reshape(n_cl, CLUSTER, 3, 4)[corder]
    mot = bw.transpose(0, 2, 1, 3).reshape(n_cl, 3 * CLUSTER, 4)
    base = np.concatenate(
        [corder.astype(np.int32) * CLUSTER, np.zeros(1, np.int32)]
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

    def kernel(o_ref, d_ref, tmax_ref, nodes_ref,
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
                    tmin = jnp.min(jnp.where(hit, t_near, jnp.float32(BIG)))
                    want = (cid != INVALID) & (tmin < jnp.float32(BIG))
                    tmins.append(tmin)
                    cids.append(cid)
                    wants.append(want & ~is_leaf)
                    leaf_data.append((cid, is_leaf & want, hit, t_near))

                # Leaf children: insert into each lane's K-nearest set.
                for cid, leaf_want, hit, t_near in leaf_data:
                    @pl.when(leaf_want)
                    def _():
                        cluster = -cid - 1
                        want_lane = hit
                        # argmax over the K slots (current worst)
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


@partial(jax.jit, static_argnames=("interpret",))
def select_clusters(o_t, d_t, tm, nodes, interpret: bool = False):
    """Per-ray K-nearest-cluster selection.

    o_t/d_t: (n_packets, 3, SUB, LANES); tm: (n_packets, SUB, LANES).
    Returns (slot_t, slot_c, dropped_min):
      slot_t (n_packets, K*SUB, LANES) f32 entry-t (BIG = empty slot),
      slot_c same-shaped i32 cluster ids (-1 = empty),
      dropped_min (n_packets, SUB, LANES) f32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_packets = o_t.shape[0]
    K = KSEL
    nodes_d = jnp.concatenate(
        [nodes, jnp.asarray(_dummy_node_row())], axis=0
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(max(n_packets // SEL_PPB, 1),),
        in_specs=[
            pl.BlockSpec((SEL_PPB, 3, SUB, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEL_PPB, 3, SUB, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEL_PPB, SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),    # nodes
        ],
        out_specs=[
            pl.BlockSpec((SEL_PPB, K * SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEL_PPB, K * SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEL_PPB, SUB, LANES), lambda i: (i, 0, 0),
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
    )(o_t, d_t, tm, nodes_d)


# ---------------------------------------------------------------------------
# Dense round kernel


def _make_round_kernel(C: int, P: int, D: int):
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(cstart_ref, seg_start_ref, rank_base_ref, rays_ref,
               *rest):
        mot_refs = rest[:D]
        out_ref = rest[D]
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

        tb = jnp.full((1, P), jnp.float32(BIG))
        ib = jnp.full((1, P), -1, jnp.int32)
        ub = jnp.zeros((1, P), jnp.float32)
        vb = jnp.zeros((1, P), jnp.float32)

        n_segs = seg_start_ref.shape[0] - 1
        row0 = i * P
        for j in range(D):
            rank = jnp.minimum(cstart_ref[i] + j, n_segs - 1)
            s0 = seg_start_ref[rank]
            s1 = seg_start_ref[rank + 1]
            valid = (
                (cstart_ref[i] + j < n_segs)
                & (s0 < row0 + P) & (s1 > row0)
                & (rank_base_ref[rank] >= 0)
            )
            mot = mot_refs[j][0]                  # (3C, 4)
            O = jax.lax.dot_general(
                mot, lhs_o, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                     # (3C, P)
            Dd = jax.lax.dot_general(
                mot, lhs_d, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            A, B = O[:C], Dd[:C]
            Co, Cd = O[C:2 * C], Dd[C:2 * C]
            Eo, Ed = O[2 * C:], Dd[2 * C:]
            t = -A / jnp.where(jnp.abs(B) < 1e-12, jnp.float32(1e-12), B)
            u = Co + t * Cd
            v = Eo + t * Ed
            ok = (
                (t > 1e-5) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (jnp.abs(B) >= 1e-12)
                & (lane_rank == rank) & (t < cap) & valid
            )
            tm = jnp.where(ok, t, jnp.float32(BIG))
            tmin = jnp.min(tm, axis=0, keepdims=True)       # (1, P)
            rows = jax.lax.broadcasted_iota(jnp.int32, (C, P), 0)
            rmin = jnp.min(
                jnp.where(tm <= tmin, rows, jnp.int32(C)), axis=0,
                keepdims=True,
            )
            sel = (rows == rmin) & ok
            usel = jnp.sum(jnp.where(sel, u, 0.0), axis=0, keepdims=True)
            vsel = jnp.sum(jnp.where(sel, v, 0.0), axis=0, keepdims=True)
            better = tmin < tb
            tb = jnp.where(better, tmin, tb)
            ib = jnp.where(
                better & (rmin < C), rank_base_ref[rank] + rmin, ib
            )
            ub = jnp.where(better, usel, ub)
            vb = jnp.where(better, vsel, vb)

        out_ref[0:1] = tb
        out_ref[1:2] = fbits(ib)
        out_ref[2:3] = ub
        out_ref[3:4] = vb
        out_ref[4:8] = jnp.zeros((4, P), jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=("interpret", "n_cl"))
def dense_round(rays8, cstart, seg_start, rank_base, rank_cluster, mot,
                n_cl: int, interpret: bool = False):
    """One binned test round.

    rays8: (8, N) f32 planes [ox oy oz dx dy dz cap rank(bits)], N a
    multiple of TILE_P, sorted so that equal ranks are contiguous.
    cstart: (n_tiles,) i32 first segment rank per tile.
    seg_start: (n_segs + 1,) i32 row offsets per rank.
    rank_base: (n_segs + 1,) i32 packed-tri base id per rank (< 0 for
    the dummy rank).
    rank_cluster: (n_segs + 1,) i32 cluster id per rank (for MOT DMA).
    Returns (8, N) f32 [t, tri(bits), u, v, 0...].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = rays8.shape[1]
    P, C, D = TILE_P, CLUSTER, DSEG
    n_tiles = N // P
    # Append a dummy all-zero cluster for clamped DMA indices.
    mot_d = jnp.concatenate(
        [mot, jnp.zeros((1, 3 * C, 4), jnp.float32)], axis=0
    )
    ncl_d = n_cl

    def mot_spec(j):
        def index_map(i, cstart, seg_start, rank_base, rank_cluster):
            n_segs = seg_start.shape[0] - 1
            rank = jnp.minimum(cstart[i] + j, n_segs - 1)
            return (jnp.clip(rank_cluster[rank], 0, ncl_d), 0, 0)

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
        scratch_shapes=[],
    )
    (out,) = pl.pallas_call(
        _make_round_kernel(C, P, D),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
        out_shape=[jax.ShapeDtypeStruct((8, N), jnp.float32)],
        interpret=interpret,
    )(cstart, seg_start, rank_base, rank_cluster, rays8, *([mot_d] * D))
    return out


# ---------------------------------------------------------------------------
# Orchestrator


def _coherence_key(o, d, world_lo, world_hi):
    from tracerboy_tpu.trace.wavefront import _coherence_sort

    return _coherence_sort(o, d, world_lo, world_hi)


def binned_closest(scene, origin, direction, t_max,
                   interpret: bool = False, rounds: int = ROUNDS,
                   use_fallback: bool = True):
    """Closest-hit over the binned backend.

    origin/direction (N, 3), t_max (N,). Returns (t, tri, u, v) in
    PACKED (pk) triangle ids — the packet-kernel id space (miss:
    t = BIG, tri = -1).
    """
    from tracerboy_tpu.trace.pallas_traverse2 import traverse_packets2

    nodes = scene["bn_nodes"]
    mot = scene["bn_mot"]
    base = scene["bn_base"]
    n_cl = int(mot.shape[0])
    K = KSEL

    N0 = origin.shape[0]
    # --- coherence sort + pad to the selection packet granularity -------
    key0 = _coherence_key(
        origin, direction, scene["world_lo"], scene["world_hi"]
    )
    idx = jnp.arange(N0, dtype=jnp.int32)
    (_, sox, soy, soz, sdx, sdy, sdz, stm, sidx) = jax.lax.sort(
        (key0, origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2], t_max, idx),
        num_keys=1,
    )
    pad = (-N0) % (PACKET * SEL_PPB)
    if pad:
        zf = jnp.zeros((pad,), jnp.float32)
        sox = jnp.concatenate([sox, zf])
        soy = jnp.concatenate([soy, zf])
        soz = jnp.concatenate([soz, zf])
        sdx = jnp.concatenate([sdx, zf + 1.0])
        sdy = jnp.concatenate([sdy, zf])
        sdz = jnp.concatenate([sdz, zf])
        stm = jnp.concatenate([stm, zf])
    N = N0 + pad
    n_packets = N // PACKET

    # --- selection ------------------------------------------------------
    o_t = jnp.stack([sox, soy, soz], 0).reshape(
        3, n_packets, SUB, LANES).swapaxes(0, 1)
    d_t = jnp.stack([sdx, sdy, sdz], 0).reshape(
        3, n_packets, SUB, LANES).swapaxes(0, 1)
    tm_t = stm.reshape(n_packets, SUB, LANES)
    slot_t, slot_c, dropped = select_clusters(
        o_t, d_t, tm_t, nodes, interpret=interpret
    )
    slots_t = [
        slot_t[:, k * SUB:(k + 1) * SUB, :].reshape(N) for k in range(K)
    ]
    slots_c = [
        slot_c[:, k * SUB:(k + 1) * SUB, :].reshape(N) for k in range(K)
    ]
    dropped = dropped.reshape(N)

    # --- rounds ---------------------------------------------------------
    st = dict(
        o=(sox, soy, soz), d=(sdx, sdy, sdz), tmax=stm,
        tb=jnp.full((N,), jnp.float32(BIG)),
        ib=jnp.full((N,), -1, jnp.int32),
        ub=jnp.zeros((N,), jnp.float32),
        vb=jnp.zeros((N,), jnp.float32),
        st=slots_t, sc=slots_c, drop=dropped, sidx_pad=jnp.concatenate(
            [sidx, jnp.full((pad,), N0, jnp.int32)]) if pad else sidx,
    )

    for _ in range(rounds):
        # pick each ray's nearest untested cluster
        nt = st["st"][0]
        nc = st["sc"][0]
        nk = jnp.zeros((N,), jnp.int32)
        for j in range(1, K):
            b = st["st"][j] < nt
            nt = jnp.where(b, st["st"][j], nt)
            nc = jnp.where(b, st["sc"][j], nc)
            nk = jnp.where(b, j, nk)
        active = (nc >= 0) & (nt < jnp.float32(BIG)) & (st["tb"] > nt)
        # consume the chosen slot
        st["st"] = [
            jnp.where(active & (nk == j), jnp.float32(BIG), st["st"][j])
            for j in range(K)
        ]
        key = jnp.where(active, nc, n_cl).astype(jnp.uint32)

        carry = (
            key,
            *st["o"], *st["d"], st["tmax"], st["tb"],
            st["ib"], st["ub"], st["vb"],
            *st["st"], *st["sc"], st["drop"], st["sidx_pad"],
        )
        out = jax.lax.sort(carry, num_keys=1)
        key_s = out[0]
        (sox2, soy2, soz2, sdx2, sdy2, sdz2, tmax2, tb2, ib2, ub2,
         vb2) = out[1:12]
        st = dict(
            o=(sox2, soy2, soz2), d=(sdx2, sdy2, sdz2), tmax=tmax2,
            tb=tb2, ib=ib2, ub=ub2, vb=vb2,
            st=list(out[12:12 + K]), sc=list(out[12 + K:12 + 2 * K]),
            drop=out[12 + 2 * K], sidx_pad=out[13 + 2 * K],
        )

        # segment tables from the sorted keys
        ki = key_s.astype(jnp.int32)
        changed = jnp.concatenate(
            [jnp.ones((1,), jnp.int32),
             (ki[1:] != ki[:-1]).astype(jnp.int32)]
        )
        rank = jnp.cumsum(changed) - 1                     # (N,)
        probes = jnp.arange(n_cl + 2, dtype=jnp.int32)
        seg_start = jnp.searchsorted(rank, probes).astype(jnp.int32)
        seg_start = seg_start[: n_cl + 2]
        rank_cluster = ki[jnp.clip(seg_start[:-1], 0, N - 1)]
        rank_base = jnp.where(
            rank_cluster < n_cl,
            base[jnp.clip(rank_cluster, 0, n_cl)], -1,
        )
        cstart = rank[:: TILE_P]

        cap = jnp.minimum(tmax2, tb2)
        rays8 = jnp.stack([
            sox2, soy2, soz2, sdx2, sdy2, sdz2, cap,
            jax.lax.bitcast_convert_type(rank, jnp.float32),
        ], axis=0)
        res = dense_round(
            rays8, cstart, seg_start, rank_base, rank_cluster, mot,
            n_cl=n_cl, interpret=interpret,
        )
        t_r = res[0]
        i_r = jax.lax.bitcast_convert_type(res[1], jnp.int32)
        better = (i_r >= 0) & (t_r < st["tb"])
        st["tb"] = jnp.where(better, t_r, st["tb"])
        st["ib"] = jnp.where(better, i_r, st["ib"])
        st["ub"] = jnp.where(better, res[2], st["ub"])
        st["vb"] = jnp.where(better, res[3], st["vb"])

    # --- resolution + fallback -----------------------------------------
    untested = st["drop"]
    for j in range(K):
        untested = jnp.minimum(untested, st["st"][j])
    done = (st["tb"] <= untested) | (untested >= jnp.float32(BIG))

    sox, soy, soz = st["o"]
    sdx, sdy, sdz = st["d"]
    if use_fallback:
        fb_tmax = jnp.where(
            done, 0.0, jnp.minimum(st["tmax"], st["tb"])
        )
        o_rows = jnp.stack([sox, soy, soz], axis=1)
        d_rows = jnp.stack([sdx, sdy, sdz], axis=1)
        # re-sort so dead (resolved) rays collapse into dead packets
        key_fb = _coherence_key(
            o_rows, d_rows, scene["world_lo"], scene["world_hi"]
        ) | ((fb_tmax <= 0.0).astype(jnp.uint32) << 27)
        fidx = jnp.arange(N, dtype=jnp.int32)
        (_, fox, foy, foz, fdx, fdy, fdz, ftm, ffi) = jax.lax.sort(
            (key_fb, sox, soy, soz, sdx, sdy, sdz, fb_tmax, fidx),
            num_keys=1,
        )
        packed = dict(nodes=scene["pk_nodes"], tris=scene["pk_tris"])
        table_bytes = (packed["tris"].shape[0]
                       + packed["nodes"].shape[0]) * 512
        t2, tri2, u2, v2 = traverse_packets2(
            jnp.stack([fox, foy, foz], 1), jnp.stack([fdx, fdy, fdz], 1),
            ftm, packed, tris_in_hbm=table_bytes > 88 * 2**20,
            interpret=interpret,
        )
        _, t2, tri2, u2, v2 = jax.lax.sort(
            (ffi, t2[:N], tri2[:N], u2[:N], v2[:N]), num_keys=1
        )
        closer = (tri2 >= 0) & (t2 < st["tb"])
        st["tb"] = jnp.where(closer, t2, st["tb"])
        st["ib"] = jnp.where(closer, tri2, st["ib"])
        st["ub"] = jnp.where(closer, u2, st["ub"])
        st["vb"] = jnp.where(closer, v2, st["vb"])

    # --- unsort to caller order ----------------------------------------
    tb = jnp.where(st["ib"] >= 0, st["tb"], jnp.float32(BIG))
    _, t_f, tri_f, u_f, v_f = jax.lax.sort(
        (st["sidx_pad"], tb, st["ib"], st["ub"], st["vb"]), num_keys=1
    )
    return t_f[:N0], tri_f[:N0], u_f[:N0], v_f[:N0]
