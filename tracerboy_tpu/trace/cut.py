"""Two-phase binned-subtree ("cut") traversal — host-side structures.

The whole-tree packet kernel pays the UNION of every cluster any of its
2048 rays needs: measured 196x the per-ray need on teapot bounce waves
(scripts/bench_traverse --stats). Re-binning rays into per-subtree
packets bounds that union by the subtree size: simulation
(scripts/sim_cut_binning.py) shows 62x fewer per-lane triangle tests at
a 512-tri cut with only ~3 (ray, subtree) pairs per ray.

Pipeline (trace/pallas_traverse2.py holds the kernels):
  1. emit_packets2: packet traversal over the TOP of the tree (this
     module's patched node table, where every child whose subtree is
     <= cut_tris is replaced by an emit id). Each ray collects up to K
     subtree ids; overflow degrades that ray to the whole-tree root
     (correct, just slower for that ray).
  2. XLA glue (traverse_binned2): stable-sort the (ray, subtree) pairs
     by subtree, pad each subtree's span to packet multiples, gather
     ray data into slots.
  3. traverse_packets2/anyhit_packets2 with per-packet roots: identical
     stack machine, but each packet starts at its subtree root.
  4. Per-ray combine: min over the ray's pair results (closest-hit) or
     OR (any-hit).

The reference has no analog — a SIMT GPU pays divergence, not unions
(TraverseFunction.hlsli:537-784 is per-thread). This is the TPU-native
answer: sorting is cheap, so reshape the WORK to fit the vector unit.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from tracerboy_tpu.accel.bvh import INVALID


def subtree_tri_counts(children: np.ndarray, leaf_size: int) -> np.ndarray:
    """(W,) padded-triangle count under each node (leaves count as
    leaf_size; padding slack is irrelevant for cut selection)."""
    W = children.shape[0]
    count = np.zeros((W,), np.int64)
    order: list[int] = []
    stack = [0]
    seen = np.zeros((W,), bool)
    seen[0] = True
    while stack:
        n = stack.pop()
        order.append(n)
        for c in children[n]:
            if 0 <= c < INVALID and not seen[c]:
                seen[c] = True
                stack.append(int(c))
    for n in reversed(order):
        t = 0
        for c in children[n]:
            if c == INVALID:
                continue
            t += leaf_size if c < 0 else int(count[c])
        count[n] = t
    return count


def build_cut(packed_nodes: np.ndarray, children: np.ndarray,
              leaf_size: int, cut_tris: int = 512):
    """Build the phase-1 top table + phase-2 roots.

    packed_nodes: (W, 128) i32 rows from pack_bvh (no dummy row).
    children: (W, 8) i32 WideBVH child encoding.

    Returns dict:
      top_nodes (W, 128) i32 — copy of packed_nodes with each child
        slot whose subtree is <= cut_tris replaced by -(cut_idx)-1
        (phase 1 treats negative ids as EMITS; it never drains).
      roots (S+1,) i32 — cut_idx -> original child encoding (node id
        >= 0 or leaf -cluster-1 < 0); entry S is the whole-tree root 0
        (the overflow degradation target).
      n_cuts = S.
    """
    ch = np.asarray(children)
    counts = subtree_tri_counts(ch, leaf_size)
    top = np.array(packed_nodes, copy=True)

    roots: list[int] = []
    # Walk top-down; only nodes that stay ABOVE the cut are visited.
    stack = [0]
    visited = np.zeros(ch.shape[0], bool)
    visited[0] = True
    while stack:
        n = stack.pop()
        for k in range(8):
            c = int(ch[n, k])
            if c == INVALID:
                continue
            size = leaf_size if c < 0 else int(counts[c])
            if c < 0 or size <= cut_tris:
                top[n, 48 + k] = -len(roots) - 1
                roots.append(c)
            elif not visited[c]:
                visited[c] = True
                stack.append(c)
    roots.append(0)  # overflow: degrade to the whole tree
    return dict(
        top_nodes=top.astype(np.int32),
        roots=np.asarray(roots, np.int32),
        n_cuts=len(roots) - 1,
    )


# ----------------------------------------------------------------------------
# Device-side orchestration (jit-able; shapes static given N, S, K)

BIG = 1e30


def _bin_pairs(ids, S: int, P: int):
    """Sort (ray, subtree) pairs by subtree and pack each subtree's
    span into whole packets of P lanes — scatter-free (TPU scatters
    serialize; everything here is sorts + gathers).

    ids: (N, K) i32 from emit_packets2 (-1 empty, S overflow).
    Returns (ray_slot (TOT,), slot_of_pair (N*K,) in SORTED-pair order,
    pair_valid (N*K,) sorted order, spos (N*K,) original pair index per
    sorted pair, pk_seg (TOT/P,) packet -> segment id)."""
    import jax.numpy as jnp
    from jax import lax

    N, K = ids.shape
    NK = N * K
    TOT = ((NK + (S + 1) * P) // P + 1) * P

    key = jnp.where(ids >= 0, ids, S + 1).astype(jnp.int32).reshape(NK)
    ray = (jnp.arange(NK, dtype=jnp.int32) // K)
    pos = jnp.arange(NK, dtype=jnp.int32)
    sk, sray, spos = lax.sort((key, ray, pos), num_keys=1, is_stable=True)

    starts = jnp.searchsorted(sk, jnp.arange(S + 2, dtype=jnp.int32)
                              ).astype(jnp.int32)          # (S+2,)
    counts = starts[1:] - starts[:-1]                       # (S+1,)
    padded = ((counts + P - 1) // P) * P
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)]
    )[:-1].astype(jnp.int32)                                # (S+1,)

    # pair (sorted order j) -> slot, by per-segment rank.
    j = jnp.arange(NK, dtype=jnp.int32)
    seg = jnp.clip(sk, 0, S)
    valid = sk <= S
    slot = jnp.where(valid, base[seg] + (j - starts[seg]), TOT - 1)

    # slot -> ray, built by GATHER: slot q sits at offset
    # q - base[seg(q)] inside its segment, i.e. sorted pair index
    # starts[seg] + offset when within the segment's real count.
    ends = (jnp.cumsum(padded) // P).astype(jnp.int32)      # (S+1,)
    pk_seg = jnp.clip(jnp.searchsorted(
        ends, jnp.arange(TOT // P, dtype=jnp.int32), side="right"
    ).astype(jnp.int32), 0, S)
    s_q = jnp.repeat(pk_seg, P)                             # (TOT,)
    q = jnp.arange(TOT, dtype=jnp.int32)
    off = q - base[s_q]
    jj = starts[s_q] + off
    in_seg = (off >= 0) & (off < counts[s_q])
    ray_slot = jnp.where(
        in_seg, sray[jnp.clip(jj, 0, NK - 1)], jnp.int32(-1)
    )
    return ray_slot, slot, valid, spos, pk_seg


def _slot_rays(orig, direc, t_max, ray_slot):
    import jax.numpy as jnp

    safe = jnp.maximum(ray_slot, 0)
    live = ray_slot >= 0
    # Dead (padding) slots get far-away origins so origin-inside-box
    # t_near < 0 can never sneak past their zero t_max.
    o_s = jnp.where(live[:, None], orig[safe], jnp.float32(BIG))
    d_s = jnp.where(live[:, None], direc[safe], 1.0)
    t_s = jnp.where(live, t_max[safe], 0.0)
    return o_s, d_s, t_s


def traverse_binned2(orig, direc, t_max, packed, K: int = 6,
                     interpret: bool = False, tris_in_hbm: bool = False,
                     sub: int | None = None):
    """Closest-hit via the two-phase binned-subtree pipeline.

    Same contract as traverse_packets2 (t, tri_packed, u, v). Requires
    packed["cut_top"], packed["cut_roots"] (see build_cut)."""
    import jax.numpy as jnp

    from tracerboy_tpu.trace.pallas_traverse2 import (
        PACKET,
        SUB,
        emit_packets2,
        traverse_packets2,
    )

    sub = SUB if sub is None else sub
    P = sub * 128
    S = int(packed["cut_roots"].shape[0]) - 1
    N = orig.shape[0]

    ids = emit_packets2(orig, direc, t_max, packed["cut_top"],
                        n_cuts=S, K=K, interpret=interpret, sub=sub)
    ray_slot, slot, valid, spos, pk_seg = _bin_pairs(ids, S, P)
    o_s, d_s, t_s = _slot_rays(orig, direc, t_max, ray_slot)
    pk_root = packed["cut_roots"][pk_seg]

    t2, tri2, u2, v2 = traverse_packets2(
        o_s, d_s, t_s, packed, interpret=interpret,
        tris_in_hbm=tris_in_hbm, sub=sub, packet_roots=pk_root,
    )

    from jax import lax

    # Per-sorted-pair results -> original pair order via a payload
    # sort on the saved position (scatter-free unsort).
    r_t = jnp.where(valid, t2[slot], jnp.float32(BIG))
    r_tri = jnp.where(valid, tri2[slot], jnp.int32(-1))
    r_u = jnp.where(valid, u2[slot], 0.0)
    r_v = jnp.where(valid, v2[slot], 0.0)
    _, t_p, tri_p, u_p, v_p = lax.sort(
        (spos, r_t, r_tri, r_u, r_v), num_keys=1
    )
    t_p = t_p.reshape(N, K)
    tri_p = tri_p.reshape(N, K)
    u_p = u_p.reshape(N, K)
    v_p = v_p.reshape(N, K)

    k_best = jnp.argmin(t_p, axis=1)
    rows = jnp.arange(N)
    t = t_p[rows, k_best]
    tri = tri_p[rows, k_best]
    t = jnp.where(tri < 0, jnp.float32(BIG), t)
    return t, tri, u_p[rows, k_best], v_p[rows, k_best]


def anyhit_binned2(orig, direc, t_max, packed, K: int = 6,
                   interpret: bool = False, tris_in_hbm: bool = False,
                   sub: int | None = None):
    """Occlusion mask via the binned-subtree pipeline."""
    import jax.numpy as jnp

    from tracerboy_tpu.trace.pallas_traverse2 import (
        SUB,
        anyhit_packets2,
        emit_packets2,
    )

    sub = SUB if sub is None else sub
    P = sub * 128
    S = int(packed["cut_roots"].shape[0]) - 1
    N = orig.shape[0]

    ids = emit_packets2(orig, direc, t_max, packed["cut_top"],
                        n_cuts=S, K=K, interpret=interpret, sub=sub)
    ray_slot, slot, valid, spos, pk_seg = _bin_pairs(ids, S, P)
    o_s, d_s, t_s = _slot_rays(orig, direc, t_max, ray_slot)
    pk_root = packed["cut_roots"][pk_seg]

    occ = anyhit_packets2(
        o_s, d_s, t_s, packed, interpret=interpret,
        tris_in_hbm=tris_in_hbm, sub=sub, packet_roots=pk_root,
    )

    from jax import lax

    r_occ = jnp.where(valid, occ[slot], False).astype(jnp.int32)
    _, occ_p = lax.sort((spos, r_occ), num_keys=1)
    return occ_p.reshape(N, K).max(axis=1) > 0
