"""Two-level (TLAS/BLAS) instanced traversal.

The reference builds one BLAS per instanced object and a TLAS whose
leaves carry per-instance transforms; traversal transforms the ray into
object space at BLAS entry (TracerBoy.cpp:1305-1410 + 2031-2116;
D3D12RaytracingFallback/src/TraverseFunction.hlsli:677-784). The
round-1/2 compiler flattened instances instead — correct, but memory and
build time scaled with instance count.

TPU-first redesign — no per-ray TLAS stack machine. Instance counts are
small (hundreds..thousands), so the TLAS level is a DENSE problem:

 1. CULL    — slab-test all rays against all instance AABBs as one
    (N, I) broadcasted VPU computation (an I<=4096 dense matrix beats
    any pointer walk on this hardware).
 2. SELECT  — each ray keeps its KI nearest instances (entry-t ordered,
    iterated masked argmin over the dense matrix), in R rounds of KI
    with per-round resolution (best hit nearer than every untested
    instance), covering R*KI instances per ray.
 3. BLAS    — per unique OBJECT (a static python loop over a handful of
    objects), the (ray, instance) pairs of that object are transformed
    into object space (world->object affine; the direction stays
    UNNORMALIZED so the object-space t equals the world-space t) and
    traverse the object's packed BVH through the v2 packet kernel —
    one dispatch per object per round, dense with exactly the rays
    that want it.
 4. COMBINE — min-t across rounds/objects per ray.

Returned triangle ids live in a per-object id space offset by the
object's base into the concatenated instanced attribute table
(inst_attr_rows), appended after the flat scene's pk_attr_rows by the
scene compiler.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

BIG = 1e30
KI = 4          # instances tested per round per ray
ROUNDS = 3      # rounds (covers KI*ROUNDS overlapped instances per ray)


def pack_instanced(objects, instances, convert_mesh, pack_object):
    """Build TLAS/BLAS tables.

    objects: dict name -> list of object-space triangle soups
      (v0, v1, v2, attr_rows) via convert_mesh(shape) (positions in
      OBJECT space).
    instances: list of (object_name, transform 4x4 world<-object).
    pack_object: callable (v0, v1, v2) -> packed dict (pack_scene_for_
      pallas).

    Returns (tables dict, attr_rows_concat np array).
    """
    names = sorted({n for n, _ in instances if n in objects})
    obj_packed = {}
    attr_chunks = []
    obj_base = {}
    base = 0
    for n in names:
        v0, v1, v2, attrs = objects[n]
        pk, _ = pack_object(v0, v1, v2)
        order = np.asarray(pk["tri_map"])
        attrs_pk = attrs[np.clip(order, 0, attrs.shape[0] - 1)]
        obj_packed[n] = pk
        obj_base[n] = base
        attr_chunks.append(attrs_pk)
        base += order.shape[0]

    inst_obj = []
    inst_inv = []      # (I, 12) world->object affine rows
    inst_lo = []
    inst_hi = []
    for n, M in instances:
        if n not in obj_packed:
            continue
        v0, v1, v2, _ = objects[n]
        inv = np.linalg.inv(M)
        inst_obj.append(names.index(n))
        inst_inv.append(inv[:3, :4].reshape(12).astype(np.float32))
        # world AABB: transform the object AABB's 8 corners
        lo = np.minimum(np.minimum(v0, v1), v2).min(0)
        hi = np.maximum(np.maximum(v0, v1), v2).max(0)
        corners = np.array([
            [x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
            for z in (lo[2], hi[2])
        ])
        wc = corners @ M[:3, :3].T + M[:3, 3]
        inst_lo.append(wc.min(0).astype(np.float32))
        inst_hi.append(wc.max(0).astype(np.float32))

    tables = dict(
        inst_obj=jnp.asarray(np.asarray(inst_obj, np.int32)),
        inst_inv=jnp.asarray(np.stack(inst_inv)),
        inst_lo=jnp.asarray(np.stack(inst_lo)),
        inst_hi=jnp.asarray(np.stack(inst_hi)),
    )
    meta = dict(
        obj_names=names,
        obj_packed=obj_packed,
        obj_base=obj_base,
    )
    return tables, meta, (np.concatenate(attr_chunks)
                          if attr_chunks else np.zeros((0, 19), np.float32))


def _slab(o, d, lo, hi):
    """(N, I) entry-t of rays vs instance boxes; BIG where missed."""
    eps = 1e-12
    invd = 1.0 / jnp.where(jnp.abs(d) < eps, jnp.where(d < 0, -eps, eps), d)
    t0 = (lo[None, :, :] - o[:, None, :]) * invd[:, None, :]
    t1 = (hi[None, :, :] - o[:, None, :]) * invd[:, None, :]
    tn = jnp.maximum(jnp.minimum(t0, t1).max(-1), 0.0)
    tf = jnp.maximum(t0, t1).min(-1)
    return jnp.where(tf >= tn, tn, jnp.float32(BIG))


def instanced_closest(scene, origin, direction, t_max,
                      interpret: bool = False):
    """Closest hit against the instanced geometry only.

    scene needs: inst_obj (I,), inst_inv (I, 12), inst_lo/hi (I, 3),
    inst_objs = static list of per-object packed dicts (nodes, tris_bw)
    and per-object attr base offsets.
    Returns (t, tri, u, v, inst); tri indexes the concatenated
    instanced attribute table (the per-object base offsets already
    include the flat scene's pk_attr_rows length); inst is the hit
    instance id (-1 = none), used by shading to rotate object-space
    normals/tangents into world space.
    """
    from tracerboy_tpu.trace.pallas_traverse2 import (
        PACKET,
        PACKETS_PER_BLOCK,
        traverse_packets2,
    )

    N = origin.shape[0]
    n_obj = len(scene["inst_objs"])
    I = scene["inst_lo"].shape[0]
    K_eff = min(KI * ROUNDS, I)

    # Entry-t-ordered candidate instances per ray, selected UPFRONT with
    # a chunked slab + top-k: only (CHUNK, I) is ever live, and the
    # rounds below carry (N, K_eff) — a merged 2.6M-lane wave against
    # 240 instances would otherwise hold multi-GB (N, I) temps across
    # the round loop (the masked-argmin form OOMed there).
    CHUNK = 32768  # _slab holds 2x(CHUNK, I, 3) f32 temps (~190 MB @ I=240)
    padN = (-N) % CHUNK
    if padN:
        o_p = jnp.concatenate([origin, jnp.zeros((padN, 3), jnp.float32)])
        d_p = jnp.concatenate(
            [direction, jnp.ones((padN, 3), jnp.float32)]
        )
        tm_p = jnp.concatenate([t_max, jnp.zeros((padN,), jnp.float32)])
    else:
        o_p, d_p, tm_p = origin, direction, t_max
    n_ch = o_p.shape[0] // CHUNK

    def chunk_fn(args):
        o_c, d_c, tm_c = args
        tn = _slab(o_c, d_c, scene["inst_lo"], scene["inst_hi"])
        tn = jnp.where(tm_c[:, None] > 0.0, tn, jnp.float32(BIG))
        neg, idx = jax.lax.top_k(-tn, K_eff)
        return -neg, idx.astype(jnp.int32)

    if n_ch > 1:
        t_all, i_all = jax.lax.map(chunk_fn, (
            o_p.reshape(n_ch, CHUNK, 3), d_p.reshape(n_ch, CHUNK, 3),
            tm_p.reshape(n_ch, CHUNK),
        ))
        t_all = t_all.reshape(-1, K_eff)[:N]
        i_all = i_all.reshape(-1, K_eff)[:N]
    else:
        t_all, i_all = chunk_fn((o_p, d_p, tm_p))
        t_all, i_all = t_all[:N], i_all[:N]

    tb = jnp.full((N,), jnp.float32(BIG))
    ib = jnp.full((N,), -1, jnp.int32)
    ub = jnp.zeros((N,), jnp.float32)
    vb = jnp.zeros((N,), jnp.float32)
    nb = jnp.full((N,), -1, jnp.int32)     # hit instance id

    for rr in range(ROUNDS):
        cols = [c for c in range(rr * KI, (rr + 1) * KI) if c < K_eff]
        if not cols:
            break
        t_ks = [t_all[:, c] for c in cols]
        i_ks = [i_all[:, c] for c in cols]

        kk = len(cols)
        # one (kk*N)-ray dispatch per object per round
        t_p = jnp.concatenate(t_ks)                     # (kk*N,)
        i_p = jnp.concatenate(i_ks)
        cap = jnp.minimum(t_max, tb)
        cap_p = jnp.concatenate([cap] * kk)
        active = (t_p < cap_p) & (t_p < jnp.float32(BIG))
        inst = jnp.where(active, i_p, 0)
        o_rep = jnp.concatenate([origin] * kk)
        d_rep = jnp.concatenate([direction] * kk)
        inv = scene["inst_inv"][inst]                   # (KI*N, 12)
        o_l = jnp.stack([
            inv[:, 0] * o_rep[:, 0] + inv[:, 1] * o_rep[:, 1]
            + inv[:, 2] * o_rep[:, 2] + inv[:, 3],
            inv[:, 4] * o_rep[:, 0] + inv[:, 5] * o_rep[:, 1]
            + inv[:, 6] * o_rep[:, 2] + inv[:, 7],
            inv[:, 8] * o_rep[:, 0] + inv[:, 9] * o_rep[:, 1]
            + inv[:, 10] * o_rep[:, 2] + inv[:, 11],
        ], axis=1)
        d_l = jnp.stack([
            inv[:, 0] * d_rep[:, 0] + inv[:, 1] * d_rep[:, 1]
            + inv[:, 2] * d_rep[:, 2],
            inv[:, 4] * d_rep[:, 0] + inv[:, 5] * d_rep[:, 1]
            + inv[:, 6] * d_rep[:, 2],
            inv[:, 8] * d_rep[:, 0] + inv[:, 9] * d_rep[:, 1]
            + inv[:, 10] * d_rep[:, 2],
        ], axis=1)                        # unnormalized: t_obj == t_world
        obj_of = scene["inst_obj"][inst]
        for oi in range(n_obj):
            obj = scene["inst_objs"][oi]
            tm_o = jnp.where(active & (obj_of == oi), cap_p, 0.0)
            t2, tri2, u2, v2 = traverse_packets2(
                o_l, d_l, tm_o, obj["packed"],
                interpret=interpret,
            )
            M = kk * N
            t2 = t2[:M].reshape(kk, N)
            tri2 = tri2[:M].reshape(kk, N)
            u2 = u2[:M].reshape(kk, N)
            v2 = v2[:M].reshape(kk, N)
            for k in range(kk):
                hit2 = (tri2[k] >= 0) & (t2[k] < tb)
                tb = jnp.where(hit2, t2[k], tb)
                ib = jnp.where(hit2, tri2[k] + obj["base"], ib)
                ub = jnp.where(hit2, u2[k], ub)
                vb = jnp.where(hit2, v2[k], vb)
                nb = jnp.where(hit2, i_ks[k], nb)

    return tb, ib, ub, vb, nb
