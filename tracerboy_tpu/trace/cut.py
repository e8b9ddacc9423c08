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


def _bin_pairs_sorted(ids, orig, direc, t_max, S: int, P: int):
    """Pack (ray, subtree) pairs into per-subtree whole packets of P
    lanes, carrying the ray data as SORT PAYLOAD — no big gathers and
    no scatters (both serialize on TPU; payload-carrying lax.sort is
    the fast primitive, the same trick as the wavefront's coherence
    sort).

    Two sorts: a 1-plane key sort for per-subtree counts, then one
    payload sort of the real pairs + a broadcast-built pad block whose
    keys interleave each segment's padding right after its reals
    (key2 = 2*seg for reals, 2*seg+1 for the pads the segment needs,
    2*(S+1) for excess pads and empty slots — dead tail).

    Returns (o_s (TOT,3), d_s, t_s, spos (TOT,), pk_seg (TOT/P,)):
    slot-ordered phase-2 inputs, the original pair index per slot
    (NK for pads), and packet -> segment ids."""
    import jax.numpy as jnp
    from jax import lax

    N, K = ids.shape
    NK = N * K
    # Extra dead rows round TOT up to whole packets.
    PAD = (S + 1) * P + ((-NK) % P)
    TOT = NK + PAD

    key = jnp.where(ids >= 0, ids, S + 1).astype(jnp.int32).reshape(NK)
    sk = lax.sort(key)
    starts = jnp.searchsorted(sk, jnp.arange(S + 2, dtype=jnp.int32)
                              ).astype(jnp.int32)           # (S+2,)
    counts = starts[1:] - starts[:-1]                        # (S+1,)
    padded = ((counts + P - 1) // P) * P
    need_pad = padded - counts                               # (S+1,) < P

    # Pad block, all small-array broadcasts: entry (s, i) pads segment
    # s when i < need_pad[s], else goes to the dead tail.
    i_grid = jnp.arange(P, dtype=jnp.int32)[None, :]         # (1, P)
    s_grid = jnp.arange(S + 1, dtype=jnp.int32)[:, None]     # (S+1, 1)
    pad_key = jnp.where(
        i_grid < need_pad[:, None], 2 * s_grid + 1,
        jnp.int32(2 * (S + 1)),
    ).reshape((S + 1) * P)
    pad_key = jnp.concatenate([
        pad_key,
        jnp.full(((-NK) % P,), 2 * (S + 1), jnp.int32),
    ])

    # Real pairs: empty slots (key S+1) become dead-tail entries.
    live = key <= S
    key2 = jnp.where(live, 2 * key, 2 * (S + 1)).astype(jnp.int32)
    pos = jnp.arange(NK, dtype=jnp.int32)

    # K-replicate the ray data (jnp.repeat = broadcast+reshape, not a
    # gather — per-row gathers of N-tables run ~100x slower).
    o_r = tuple(jnp.repeat(orig[:, c], K) for c in range(3))
    d_r = tuple(jnp.repeat(direc[:, c], K) for c in range(3))
    t_r = jnp.where(live, jnp.repeat(t_max, K), 0.0)

    big = jnp.float32(BIG)
    zpad = jnp.zeros((PAD,), jnp.float32)
    keys_all = jnp.concatenate([key2, pad_key])
    planes = [
        jnp.concatenate([jnp.where(live, o_r[0], big), zpad + big]),
        jnp.concatenate([jnp.where(live, o_r[1], big), zpad + big]),
        jnp.concatenate([jnp.where(live, o_r[2], big), zpad + big]),
        jnp.concatenate([d_r[0], zpad + 1.0]),
        jnp.concatenate([d_r[1], zpad]),
        jnp.concatenate([d_r[2], zpad]),
        jnp.concatenate([t_r, zpad]),
        jnp.concatenate([pos, jnp.full((PAD,), NK, jnp.int32)]),
    ]
    sorted_all = lax.sort((keys_all, *planes), num_keys=1,
                          is_stable=True)
    _, sox, soy, soz, sdx, sdy, sdz, st, spos = sorted_all

    o_s = jnp.stack([sox, soy, soz], axis=1)
    d_s = jnp.stack([sdx, sdy, sdz], axis=1)

    ends = (jnp.cumsum(padded) // P).astype(jnp.int32)       # (S+1,)
    pk_seg = jnp.clip(jnp.searchsorted(
        ends, jnp.arange(TOT // P, dtype=jnp.int32), side="right"
    ).astype(jnp.int32), 0, S)
    return o_s, d_s, st, spos, pk_seg


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
    o_s, d_s, t_s, spos, pk_seg = _bin_pairs_sorted(
        ids, orig, direc, t_max, S, P
    )
    pk_root = packed["cut_roots"][pk_seg]

    t2, tri2, u2, v2 = traverse_packets2(
        o_s, d_s, t_s, packed, interpret=interpret,
        tris_in_hbm=tris_in_hbm, sub=sub, packet_roots=pk_root,
    )

    from jax import lax

    # Slot-order results -> original pair order via a payload sort on
    # the carried pair index (pads carry NK -> tail, sliced off).
    NK = N * K
    _, t_p, tri_p, u_p, v_p = lax.sort(
        (spos, t2, tri2, u2, v2), num_keys=1
    )
    t_p = t_p[:NK].reshape(N, K)
    tri_p = tri_p[:NK].reshape(N, K)
    u_p = u_p[:NK].reshape(N, K)
    v_p = v_p[:NK].reshape(N, K)
    # Empty pair slots were dead rays in phase 2 -> tri -1, t BIG.
    t_p = jnp.where(tri_p < 0, jnp.float32(BIG), t_p)

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
    o_s, d_s, t_s, spos, pk_seg = _bin_pairs_sorted(
        ids, orig, direc, t_max, S, P
    )
    pk_root = packed["cut_roots"][pk_seg]

    occ = anyhit_packets2(
        o_s, d_s, t_s, packed, interpret=interpret,
        tris_in_hbm=tris_in_hbm, sub=sub, packet_roots=pk_root,
    )

    from jax import lax

    _, occ_p = lax.sort((spos, occ.astype(jnp.int32)), num_keys=1)
    return occ_p[: N * K].reshape(N, K).max(axis=1) > 0
