"""Pallas packet traversal: coherent ray packets over a quantized wide BVH.

The speed-of-light TPU replacement for the reference's software traversal
(D3D12RaytracingFallback TraverseFunction.hlsli:537-784). Key design
points, all driven by the TPU execution model (see
/opt/skills/guides/pallas_guide.md):

- **Packets, not lanes**: a whole packet of P rays shares ONE traversal
  stack (in SMEM). Each step fetches one wide node and slab-tests its 8
  children against all P rays as dense (8, P) VPU math — no per-lane
  gathers, the TPU-killer of the lock-step jnp traversal. A subtree is
  entered iff any ray in the packet wants it; per-ray t_best masks keep
  the final hits exact.
- **Quantized 128-byte node records**: each wide node stores its parent
  box (f32 lo + extent/255 scale) and the 8 child boxes as uint8
  lo/hi quantized against it (conservative floor/ceil), plus 8 child
  ids — 32 i32 words. Four nodes pack into one 128-lane VMEM row, so a
  node fetch is a single aligned row read with zero lane-padding waste
  (a naive (W, 48) f32 layout pads every node to 512 bytes).
- **VMEM residency**: nodes and triangle clusters both live in VMEM
  (scenes up to ~100k tris; larger scenes stream clusters from HBM in a
  later variant). Triangles pack 3 clusters (of 4 tris x 9 floats = 36
  values) per 128-lane row.
- Packet coherence comes from the caller: primary/shadow waves are
  coherent by construction; bounce waves are sorted by direction octant
  + origin morton before packeting (wavefront ray sorting).

Correctness reference: traverse_wide (trace/traverse.py) and
brute_force_closest are the oracles in tests (interpret mode on CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tracerboy_tpu.accel.bvh import WideBVH, INVALID

PACKET = 1024          # rays per packet (8 sublanes x 128 lanes)
STACK_DEPTH = 64
WORDS_PER_NODE = 32    # 128 bytes
NODES_PER_ROW = 4      # 4 nodes per 128-lane i32 row
CLUSTERS_PER_ROW = 3   # 3 x 36 floats per 128-lane f32 row
BIG = 1e30  # plain float: jnp scalars would be captured consts in the kernel


# ----------------------------------------------------------------------------
# Host-side packing


def pack_bvh(bvh: WideBVH, tri_v0, tri_v1, tri_v2):
    """Pack a WideBVH + morton-ordered triangles for the Pallas kernel.

    Returns dict(nodes (Wr, 128) int32, tris (Cr, 128) float32,
    num_nodes, num_clusters).
    """
    W = bvh.num_nodes
    lo = np.asarray(bvh.bounds_lo)   # (W, 8, 3)
    hi = np.asarray(bvh.bounds_hi)
    ch = np.asarray(bvh.children)    # (W, 8)

    valid = ch != INVALID
    # Parent box = union of valid children.
    plo = np.where(valid[..., None], lo, np.inf).min(axis=1)      # (W, 3)
    phi = np.where(valid[..., None], hi, -np.inf).max(axis=1)
    empty = ~valid.any(axis=1)
    plo[empty] = 0.0
    phi[empty] = 1.0
    extent = np.maximum(phi - plo, 1e-12)
    scale = (extent / 255.0).astype(np.float32)

    lo_safe = np.where(valid[..., None], lo, plo[:, None, :])
    hi_safe = np.where(valid[..., None], hi, plo[:, None, :])
    qlo = np.floor((lo_safe - plo[:, None, :]) / scale[:, None, :])
    qhi = np.ceil((hi_safe - plo[:, None, :]) / scale[:, None, :])
    qlo = np.clip(np.where(valid[..., None], qlo, 255), 0, 255).astype(np.uint8)
    qhi = np.clip(np.where(valid[..., None], qhi, 0), 0, 255).astype(np.uint8)
    # Empty slots: qlo=255 > qhi=0 -> inverted box, never hits.

    words = np.zeros((W, WORDS_PER_NODE), np.uint32)
    words[:, 0:3] = plo.astype(np.float32).view(np.uint32)
    words[:, 3:6] = scale.view(np.uint32)
    # 48 quantized bytes: per child c, bytes [qlo xyz, qhi xyz] at
    # offset c*6; packed little-endian into words 6..17.
    qbytes = np.zeros((W, 48), np.uint8)
    for c in range(8):
        qbytes[:, c * 6 + 0 : c * 6 + 3] = qlo[:, c]
        qbytes[:, c * 6 + 3 : c * 6 + 6] = qhi[:, c]
    words[:, 6:18] = qbytes.reshape(W, 12, 4).view(np.uint32)[..., 0]
    words[:, 18:26] = ch.astype(np.int32).view(np.uint32)

    Wr = -(-W // NODES_PER_ROW)
    node_rows = np.zeros((Wr * NODES_PER_ROW, WORDS_PER_NODE), np.uint32)
    node_rows[:W] = words
    node_rows = node_rows.reshape(Wr, NODES_PER_ROW * WORDS_PER_NODE)

    # Triangle clusters: (C, 36) f32, 3 clusters per 128-lane row.
    order = bvh.tri_order
    C = bvh.num_clusters
    K = bvh.leaf_size
    assert K * 9 == 36, "pallas packing assumes leaf_size 4"
    tri = np.concatenate(
        [np.asarray(tri_v0)[order], np.asarray(tri_v1)[order],
         np.asarray(tri_v2)[order]], axis=1,
    )  # (C*K, 9) with columns [v0, v1, v2]
    tri = tri.reshape(C, K * 9).astype(np.float32)
    Cr = -(-C // CLUSTERS_PER_ROW)
    tri_rows = np.zeros((Cr, 128), np.float32)
    flat = np.zeros((Cr * CLUSTERS_PER_ROW, 36), np.float32)
    flat[:C] = tri
    tri_rows[:, : CLUSTERS_PER_ROW * 36] = flat.reshape(Cr, CLUSTERS_PER_ROW * 36)

    return dict(
        nodes=jnp.asarray(node_rows.view(np.int32)),
        tris=jnp.asarray(tri_rows),
        num_nodes=W,
        num_clusters=C,
    )


# ----------------------------------------------------------------------------
# Kernel


def _traverse_kernel(
    o_ref,       # (3, P) f32 packet ray origins
    d_ref,       # (3, P) f32 directions
    tmax_ref,    # (1, P) f32
    nodes_ref,   # (Wr, 128) i32 (VMEM)
    tris_ref,    # (Cr, 128) f32 (VMEM)
    t_out,       # (1, P) f32
    tri_out,     # (1, P) i32
    u_out,       # (1, P) f32
    v_out,       # (1, P) f32
    stack_ref,   # (STACK_DEPTH,) i32 SMEM scratch
    *,
    any_hit: bool,
):
    P = o_ref.shape[-1]
    ox = o_ref[0, 0, :]
    oy = o_ref[0, 1, :]
    oz = o_ref[0, 2, :]
    dx = d_ref[0, 0, :]
    dy = d_ref[0, 1, :]
    dz = d_ref[0, 2, :]
    eps = jnp.float32(1e-12)
    sign = lambda v: jnp.where(v < 0, -eps, eps)
    inv_x = 1.0 / jnp.where(jnp.abs(dx) < eps, sign(dx), dx)
    inv_y = 1.0 / jnp.where(jnp.abs(dy) < eps, sign(dy), dy)
    inv_z = 1.0 / jnp.where(jnp.abs(dz) < eps, sign(dz), dz)

    t_best0 = tmax_ref[0, 0, :]
    stack_ref[0] = 0

    def cond(state):
        sp, *_ = state
        return sp > 0

    def body(state):
        sp, t_best, tri_best, u_best, v_best = state
        node = stack_ref[sp - 1]
        sp = sp - 1

        row = nodes_ref[node // NODES_PER_ROW, :]            # (128,) i32
        base = (node % NODES_PER_ROW) * WORDS_PER_NODE

        def word(i):
            return jax.lax.dynamic_index_in_dim(
                row, base + i, keepdims=False
            )

        fbits = lambda w: jax.lax.bitcast_convert_type(w, jnp.float32)
        plo_x, plo_y, plo_z = fbits(word(0)), fbits(word(1)), fbits(word(2))
        sc_x, sc_y, sc_z = fbits(word(3)), fbits(word(4)), fbits(word(5))

        # Dequantize the 48 child-bound bytes from words 6..17.
        qwords = jax.lax.dynamic_slice(row, (base + 6,), (12,))
        qw = qwords.astype(jnp.uint32)
        b0 = (qw & 255).astype(jnp.float32)
        b1 = ((qw >> 8) & 255).astype(jnp.float32)
        b2 = ((qw >> 16) & 255).astype(jnp.float32)
        b3 = ((qw >> 24) & 255).astype(jnp.float32)
        qb = jnp.stack([b0, b1, b2, b3], axis=1).reshape(48)  # bytes in order
        q = qb.reshape(8, 6)  # per child: lo xyz, hi xyz

        child_ids = jax.lax.dynamic_slice(row, (base + 18,), (8,))

        lo_x = plo_x + q[:, 0] * sc_x   # (8,)
        lo_y = plo_y + q[:, 1] * sc_y
        lo_z = plo_z + q[:, 2] * sc_z
        hi_x = plo_x + q[:, 3] * sc_x
        hi_y = plo_y + q[:, 4] * sc_y
        hi_z = plo_z + q[:, 5] * sc_z

        # Slab test: (8, P)
        def slab(lo_c, hi_c, o_c, inv_c):
            t0 = (lo_c[:, None] - o_c[None, :]) * inv_c[None, :]
            t1 = (hi_c[:, None] - o_c[None, :]) * inv_c[None, :]
            return jnp.minimum(t0, t1), jnp.maximum(t0, t1)
        n_x, f_x = slab(lo_x, hi_x, ox, inv_x)
        n_y, f_y = slab(lo_y, hi_y, oy, inv_y)
        n_z, f_z = slab(lo_z, hi_z, oz, inv_z)
        t_near = jnp.maximum(jnp.maximum(n_x, n_y), n_z)
        t_far = jnp.minimum(jnp.minimum(f_x, f_y), f_z)
        hit = (t_far >= jnp.maximum(t_near, 0.0)) & (
            t_near < t_best[None, :]
        )
        any_ray = jnp.any(hit, axis=1)                      # (8,)

        is_leaf = child_ids < 0
        is_inner = (child_ids >= 0) & (child_ids != INVALID)

        # --- leaves: test clusters of 4 tris against all rays ----------
        def leaf_one(c, carry):
            t_best, tri_best, u_best, v_best = carry
            cid = child_ids[c]
            process = (cid < 0) & any_ray[c]

            def do(carry):
                t_best, tri_best, u_best, v_best = carry
                cluster = -cid - 1
                trow = tris_ref[cluster // CLUSTERS_PER_ROW, :]
                tb = (cluster % CLUSTERS_PER_ROW) * 36
                tri36 = jax.lax.dynamic_slice(trow, (tb,), (36,))
                tri9 = tri36.reshape(4, 9)
                for k in range(4):
                    v0x, v0y, v0z = tri9[k, 0], tri9[k, 1], tri9[k, 2]
                    v1x, v1y, v1z = tri9[k, 3], tri9[k, 4], tri9[k, 5]
                    v2x, v2y, v2z = tri9[k, 6], tri9[k, 7], tri9[k, 8]
                    e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
                    e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
                    # pvec = d x e2 (vector over P)
                    px = dy * e2z - dz * e2y
                    py = dz * e2x - dx * e2z
                    pz = dx * e2y - dy * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    inv_det = jnp.where(
                        jnp.abs(det) > 1e-9, 1.0 / det, 0.0
                    )
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
                    tri_id = cluster * 4 + k
                    t_best = jnp.where(ok, tt, t_best)
                    tri_best = jnp.where(ok, tri_id, tri_best)
                    u_best = jnp.where(ok, uu, u_best)
                    v_best = jnp.where(ok, vv, v_best)
                return t_best, tri_best, u_best, v_best

            return jax.lax.cond(process, do, lambda c: c,
                                (t_best, tri_best, u_best, v_best))

        t_best, tri_best, u_best, v_best = jax.lax.fori_loop(
            0, 8, leaf_one, (t_best, tri_best, u_best, v_best)
        )

        # --- push wanted inner children --------------------------------
        def push_one(c, sp):
            want = is_inner[c] & any_ray[c]

            def do(sp):
                stack_ref[sp] = child_ids[c]
                return sp + 1

            return jax.lax.cond(
                want & (sp < STACK_DEPTH), do, lambda s: s, sp
            )

        sp = jax.lax.fori_loop(0, 8, push_one, sp)
        return sp, t_best, tri_best, u_best, v_best

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
    t_out[0, 0, :] = jnp.where(tri_best < 0, BIG, t_best)
    tri_out[0, 0, :] = tri_best
    u_out[0, 0, :] = u_best
    v_out[0, 0, :] = v_best


@partial(jax.jit, static_argnames=("interpret",))
def traverse_packets(orig, direc, t_max, packed, interpret: bool = False):
    """Closest-hit packet traversal.

    orig/direc: (N, 3) with N a multiple of PACKET — the caller sorts and
    pads rays into coherent packets. packed: output of pack_bvh.
    Returns (t, tri_idx, u, v) like traverse_wide.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = orig.shape[0]
    assert N % PACKET == 0, "ray count must be a multiple of PACKET"
    n_packets = N // PACKET

    o_t = orig.T.reshape(3, n_packets, PACKET).swapaxes(0, 1)  # (np, 3, P)
    d_t = direc.T.reshape(3, n_packets, PACKET).swapaxes(0, 1)
    tm = t_max.reshape(n_packets, 1, PACKET)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_packets,),
        in_specs=[
            pl.BlockSpec((1, 3, PACKET), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, PACKET), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PACKET), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # nodes
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tris
        ],
        out_specs=[
            pl.BlockSpec((1, 1, PACKET), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PACKET), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PACKET), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PACKET), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
    )

    def kernel(o_ref, d_ref, tm_ref, nodes_ref, tris_ref,
               t_ref, tri_ref, u_ref, v_ref, stack_ref):
        _traverse_kernel(
            o_ref, d_ref, tm_ref, nodes_ref, tris_ref,
            t_ref, tri_ref, u_ref, v_ref, stack_ref,
            any_hit=False,
        )

    t, tri, u, v = pl.pallas_call(
        kernel,
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
        t.reshape(N), tri.reshape(N), u.reshape(N), v.reshape(N),
    )
