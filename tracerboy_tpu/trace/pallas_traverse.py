"""Pallas packet traversal: coherent ray packets over a VMEM-resident BVH.

The speed-of-light TPU replacement for the reference's software traversal
(D3D12RaytracingFallback TraverseFunction.hlsli:537-784). Design points,
all driven by the TPU execution model (/opt/skills/guides/pallas_guide.md):

- **Packets, not lanes**: a packet of P=1024 rays shares ONE traversal
  stack (SMEM). Each step fetches one wide node and slab-tests its 8
  children against all P rays as dense scalar-broadcast VPU math — no
  per-lane gathers (the TPU-killer of the lock-step jnp traversal). A
  subtree is entered iff any packet ray wants it; per-ray t_best keeps
  final hits exact.
- **One record per 128-lane row**: nodes are (W, 128) i32 rows (child
  bounds as f32 bits in lanes 0..47, child ids in 48..55); triangle
  clusters are (C, 128) f32 rows of 8 triangles x 9 floats. A row fetch
  is `ref[pl.ds(idx, 1), :]` — the only dynamic index in the kernel;
  every intra-row offset is static, which is what Mosaic can lower.
- **VMEM residency**: nodes + clusters stay in VMEM; scenes up to
  ~150k triangles fit (~10 MB). Larger scenes fall back to the jnp
  traversal until the HBM-streaming variant lands.
- Packet coherence comes from the caller: primary/shadow waves are
  coherent by construction; bounce waves are sorted by direction octant
  + origin morton (wavefront ray sorting) before packeting.

The Pallas BVH is built separately with leaf_size=8 (so a cluster row is
72 floats); the kernel returns packed triangle ids which the caller
remaps to scene order via the `tri_map` table.

Correctness oracles in tests: brute_force_closest and traverse_wide
(interpret mode on CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tracerboy_tpu.accel.bvh import WideBVH, INVALID

PACKET = 1024          # rays per packet (8 sublanes x 128 lanes)
PACKETS_PER_BLOCK = 16  # packets traversed per kernel program; amortizes
                        # the ~0.1 ms per-program launch cost measured on
                        # v5e (tiny-scene floor was launch-bound)
STACK_DEPTH = 96
LEAF = 8               # triangles per cluster row (8 x 9 = 72 floats)
BIG = 1e30


# ----------------------------------------------------------------------------
# Host-side packing


def pack_scene_for_pallas(tri_v0, tri_v1, tri_v2, num_tris: int | None = None):
    """Build the Pallas traversal structure over raw (scene-order) tris.

    Returns dict(nodes (W, 128) i32, tris (C, 128) f32,
    tri_map (C*LEAF,) i32 mapping packed tri id -> input tri index).
    """
    from tracerboy_tpu.accel.native import build_bvh_auto

    v0 = np.asarray(tri_v0, np.float32)
    v1 = np.asarray(tri_v1, np.float32)
    v2 = np.asarray(tri_v2, np.float32)
    if num_tris is not None:  # drop padding duplicates
        v0, v1, v2 = v0[:num_tris], v1[:num_tris], v2[:num_tris]
    bvh = build_bvh_auto(v0, v1, v2, leaf_size=LEAF)
    return pack_bvh(bvh, v0, v1, v2), bvh


def pack_bvh(bvh: WideBVH, tri_v0, tri_v1, tri_v2):
    """Pack a WideBVH (leaf_size == LEAF) + original-order triangles."""
    assert bvh.leaf_size == LEAF, "pallas packing requires leaf_size 8"
    W = bvh.num_nodes
    lo = np.asarray(bvh.bounds_lo)   # (W, 8, 3)
    hi = np.asarray(bvh.bounds_hi)
    ch = np.asarray(bvh.children).astype(np.int32)

    valid = ch != INVALID
    # Empty slots get inverted boxes that can never hit.
    lo = np.where(valid[..., None], lo, np.float32(BIG))
    hi = np.where(valid[..., None], hi, np.float32(-BIG))

    rows = np.zeros((W, 128), np.int32)
    bounds = np.concatenate([lo, hi], axis=2)  # (W, 8, 6): lo xyz, hi xyz
    rows[:, :48] = (
        bounds.transpose(0, 2, 1).reshape(W, 48).astype(np.float32)
        .view(np.int32)
    )
    # lanes layout: [lox*8 | loy*8 | loz*8 | hix*8 | hiy*8 | hiz*8]
    rows[:, 48:56] = ch

    order = np.asarray(bvh.tri_order)          # (C*LEAF,)
    C = bvh.num_clusters
    w0 = np.asarray(tri_v0)[order]
    w1 = np.asarray(tri_v1)[order]
    w2 = np.asarray(tri_v2)[order]
    tri = np.concatenate([w0, w1, w2], axis=1).astype(np.float32)
    tri_rows = np.zeros((C, 128), np.float32)
    tri_rows[:, : LEAF * 9] = tri.reshape(C, LEAF * 9)

    # Baldwin-Weber rows for the v2 kernels' drain phase: 12 floats per
    # triangle ([n|-d],[g1|h1],[g2|h2]; see trace/binned._bw_rows) — the
    # precomputed-transform test costs ~36 VPU ops vs Moller-Trumbore's
    # ~58 in the packet drain, which is ~70% of kernel time.
    from tracerboy_tpu.trace.binned import _bw_rows

    bw = _bw_rows(
        w0.astype(np.float64), w1.astype(np.float64),
        w2.astype(np.float64),
    )                                           # (C*LEAF, 3, 4)
    bw_rows = np.zeros((C, 128), np.float32)
    bw_rows[:, : LEAF * 12] = bw.reshape(C, LEAF * 12)

    return dict(
        nodes=jnp.asarray(rows),
        tris=jnp.asarray(tri_rows),
        tris_bw=jnp.asarray(bw_rows),
        tri_map=jnp.asarray(order.astype(np.int32)),
    )


# ----------------------------------------------------------------------------
# Kernel


def _traverse_kernel(o_ref, d_ref, tmax_ref, nodes_ref, tris_ref,
                     t_out, tri_out, u_out, v_out, stack_ref,
                     tri_scratch=None, tri_sem=None):
    """Traverse PACKETS_PER_BLOCK packets sequentially in one program.

    When tri_scratch/tri_sem are provided, `tris_ref` lives in HBM and
    leaf cluster rows are DMA'd on demand (the large-scene variant —
    700k-tri scenes whose cluster table exceeds VMEM).
    """
    import jax.lax as lax
    from jax.experimental import pallas as pl

    def one_packet(pp, _):
        _traverse_one(pp, o_ref, d_ref, tmax_ref, nodes_ref, tris_ref,
                      t_out, tri_out, u_out, v_out, stack_ref,
                      tri_scratch, tri_sem)
        return 0

    jax.lax.fori_loop(0, o_ref.shape[0], one_packet, 0)


def _traverse_one(pp, o_ref, d_ref, tmax_ref, nodes_ref, tris_ref,
                  t_out, tri_out, u_out, v_out, stack_ref,
                  tri_scratch=None, tri_sem=None):
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ox = o_ref[pp, 0, :]
    oy = o_ref[pp, 1, :]
    oz = o_ref[pp, 2, :]
    dx = d_ref[pp, 0, :]
    dy = d_ref[pp, 1, :]
    dz = d_ref[pp, 2, :]
    eps = jnp.float32(1e-12)
    fix = lambda v: jnp.where(jnp.abs(v) < eps,
                              jnp.where(v < 0, -eps, eps), v)
    inv_x = 1.0 / fix(dx)
    inv_y = 1.0 / fix(dy)
    inv_z = 1.0 / fix(dz)

    t_best0 = tmax_ref[pp, 0, :]
    stack_ref[0] = 0

    fbits = lambda w: lax.bitcast_convert_type(w, jnp.float32)

    def cond(state):
        sp, *_ = state
        return sp > 0

    def body(state):
        sp, t_best, tri_best, u_best, v_best = state
        node = stack_ref[sp - 1]
        sp = sp - 1

        row = nodes_ref[pl.ds(node, 1), :]      # (1, 128) i32
        # Bitcast the whole row vector once (scalar tpu.bitcast is not
        # lowerable); bounds read from the f32 view, ids from the i32 one.
        rowf = fbits(row)

        def child_test(c):
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
            hit = (t_far >= jnp.maximum(t_near, 0.0)) & (t_near < t_best)
            return jnp.any(hit)

        def leaf_tris(cluster, carry):
            t_best, tri_best, u_best, v_best = carry
            if tri_scratch is not None:
                # Stream the cluster row from HBM.
                dma = pltpu.make_async_copy(
                    tris_ref.at[pl.ds(cluster, 1), :], tri_scratch, tri_sem
                )
                dma.start()
                dma.wait()
                trow = tri_scratch[:, :]
            else:
                trow = tris_ref[pl.ds(cluster, 1), :]   # (1, 128) f32
            for k in range(LEAF):
                b = k * 9
                v0x, v0y, v0z = trow[0, b], trow[0, b + 1], trow[0, b + 2]
                v1x, v1y, v1z = trow[0, b + 3], trow[0, b + 4], trow[0, b + 5]
                v2x, v2y, v2z = trow[0, b + 6], trow[0, b + 7], trow[0, b + 8]
                e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
                e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
                tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
                uu = (tvx * px + tvy * py + tvz * pz) * inv_det
                qx = tvy * e1z - tvz * e1y
                qy = tvz * e1x - tvx * e1z
                qz = tvx * e1y - tvy * e1x
                vv = (dx * qx + dy * qy + dz * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = (
                    (jnp.abs(det) > 1e-9)
                    & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                    & (tt > 1e-5) & (tt < t_best)
                )
                tri_id = cluster * LEAF + k
                t_best = jnp.where(ok, tt, t_best)
                tri_best = jnp.where(ok, tri_id, tri_best)
                u_best = jnp.where(ok, uu, u_best)
                v_best = jnp.where(ok, vv, v_best)
            return t_best, tri_best, u_best, v_best

        carry = (t_best, tri_best, u_best, v_best)
        for c in range(8):  # static unroll over the 8 wide slots
            cid = row[0, 48 + c]
            wanted = (cid != INVALID) & child_test(c)

            def do_leaf(carry, cid=cid):
                return leaf_tris(-cid - 1, carry)

            def skip(carry):
                return carry

            carry = lax.cond(wanted & (cid < 0), do_leaf, skip, carry)

            def do_push(sp, cid=cid):
                stack_ref[sp] = cid
                return sp + 1

            sp = lax.cond(
                wanted & (cid >= 0) & (sp < STACK_DEPTH),
                do_push, lambda s: s, sp,
            )

        t_best, tri_best, u_best, v_best = carry
        return sp, t_best, tri_best, u_best, v_best

    P = ox.shape[0]
    sp, t_best, tri_best, u_best, v_best = jax.lax.while_loop(
        cond, body,
        (
            jnp.int32(1),
            t_best0,
            jnp.full((P,), -1, jnp.int32),
            jnp.zeros((P,), jnp.float32),
            jnp.zeros((P,), jnp.float32),
        ),
    )
    t_out[pp, 0, :] = jnp.where(tri_best < 0, jnp.float32(BIG), t_best)
    tri_out[pp, 0, :] = tri_best
    u_out[pp, 0, :] = u_best
    v_out[pp, 0, :] = v_best


@partial(jax.jit, static_argnames=("interpret", "tris_in_hbm"))
def traverse_packets(orig, direc, t_max, packed, interpret: bool = False,
                     tris_in_hbm: bool = False):
    """Closest-hit packet traversal.

    orig/direc: (N, 3), N a multiple of PACKET (caller sorts + pads into
    coherent packets). Returns (t, tri_packed, u, v); map tri ids through
    packed["tri_map"] for scene order. tris_in_hbm streams leaf cluster
    rows by DMA instead of keeping the whole table in VMEM (scenes whose
    cluster table exceeds ~10 MB, e.g. vw-van's 700k triangles).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = orig.shape[0]
    BLOCK_RAYS = PACKET * PACKETS_PER_BLOCK
    pad = (-N) % BLOCK_RAYS
    if pad:
        zeros = jnp.zeros((pad, 3), orig.dtype)
        orig = jnp.concatenate([orig, zeros])
        direc = jnp.concatenate(
            [direc, jnp.ones((pad, 3), direc.dtype)]
        )
        t_max = jnp.concatenate(
            [t_max, jnp.zeros((pad,), t_max.dtype)]  # dead rays
        )
    Np = N + pad
    n_packets = Np // PACKET
    n_blocks = n_packets // PACKETS_PER_BLOCK
    PPB = PACKETS_PER_BLOCK

    o_t = orig.T.reshape(3, n_packets, PACKET).swapaxes(0, 1)
    d_t = direc.T.reshape(3, n_packets, PACKET).swapaxes(0, 1)
    tm = t_max.reshape(n_packets, 1, PACKET)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((PPB, 3, PACKET), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PPB, 3, PACKET), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PPB, 1, PACKET), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # nodes
            pl.BlockSpec(
                memory_space=pltpu.ANY if tris_in_hbm else pltpu.VMEM
            ),                                       # tris
        ],
        out_specs=[
            pl.BlockSpec((PPB, 1, PACKET), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PPB, 1, PACKET), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PPB, 1, PACKET), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PPB, 1, PACKET), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=(
            [pltpu.SMEM((STACK_DEPTH,), jnp.int32)]
            + ([pltpu.VMEM((1, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(())] if tris_in_hbm else [])
        ),
    )

    t, tri, u, v = pl.pallas_call(
        _traverse_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_packets, 1, PACKET), jnp.float32),
            jax.ShapeDtypeStruct((n_packets, 1, PACKET), jnp.int32),
            jax.ShapeDtypeStruct((n_packets, 1, PACKET), jnp.float32),
            jax.ShapeDtypeStruct((n_packets, 1, PACKET), jnp.float32),
        ],
        interpret=interpret,
    )(o_t, d_t, tm, packed["nodes"], packed["tris"])

    return (
        t.reshape(Np)[:N], tri.reshape(Np)[:N],
        u.reshape(Np)[:N], v.reshape(Np)[:N],
    )
