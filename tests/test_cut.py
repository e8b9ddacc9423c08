"""Binned-subtree ("cut") traversal parity vs the whole-tree kernel.

The cut pipeline (trace/cut.py) re-bins rays into per-subtree packets:
phase-1 emit over the tree top, XLA pair sort/pack, phase-2 per-root
traversal, per-ray min/OR combine. It must be EXACTLY equivalent to
traverse_packets2/anyhit_packets2 (same Baldwin-Weber drains, same
packed ids) — simulation says it removes a measured 196x union tax
(scripts/sim_cut_binning.py, scripts/bench_traverse --stats)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tracerboy_tpu.trace.cut import (
    anyhit_binned2,
    build_cut,
    subtree_tri_counts,
    traverse_binned2,
)
from tracerboy_tpu.trace.pallas_traverse import pack_scene_for_pallas
from tracerboy_tpu.trace.pallas_traverse2 import (
    anyhit_packets2,
    emit_packets2,
    traverse_packets2,
)

SUB = 8  # smaller packets keep interpret-mode runtime sane


def make_scene(n_tris=4096, seed=3):
    rng = np.random.default_rng(seed)
    c = rng.random((n_tris, 3), np.float32) * 20.0
    e1 = rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.4
    e2 = rng.normal(size=(n_tris, 3)).astype(np.float32) * 0.4
    return c, c + e1, c + e2


def make_rays(n=2048, seed=5):
    rng = np.random.default_rng(seed)
    o = rng.random((n, 3), np.float32) * 20.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tm = np.full((n,), 1e30, np.float32)
    tm[:: 7] = 0.0  # dead lanes interleaved
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm)


@pytest.fixture(scope="module")
def packed_cut():
    v0, v1, v2 = make_scene()
    pk, bvh = pack_scene_for_pallas(v0, v1, v2)
    cut = build_cut(np.asarray(pk["nodes"]), np.asarray(bvh.children),
                    bvh.leaf_size, cut_tris=512)
    pk = dict(pk)
    pk["cut_top"] = jnp.asarray(cut["top_nodes"])
    pk["cut_roots"] = jnp.asarray(cut["roots"])
    return pk, bvh, cut


class TestCutBuild:
    def test_counts_and_cover(self, packed_cut):
        pk, bvh, cut = packed_cut
        counts = subtree_tri_counts(np.asarray(bvh.children),
                                    bvh.leaf_size)
        assert counts[0] == bvh.num_clusters * bvh.leaf_size
        # every cut subtree is within budget; union covers all clusters
        roots = cut["roots"][:-1]
        covered = set()
        ch = np.asarray(bvh.children)
        for r in roots:
            stack = [int(r)]
            while stack:
                n = stack.pop()
                if n < 0:
                    covered.add(-n - 1)
                    continue
                assert counts[n] <= 512
                for c in ch[n]:
                    if c != np.int32(2**31 - 1):
                        stack.append(int(c))
        assert covered == set(range(bvh.num_clusters))
        assert cut["roots"][-1] == 0

    def test_emit_covers_need(self, packed_cut):
        """Every subtree a ray truly needs must appear in its emit
        list (or the ray must be overflow-degraded)."""
        pk, bvh, cut = packed_cut
        o, d, tm = make_rays(1024)
        S = cut["n_cuts"]
        ids = np.asarray(emit_packets2(
            o, d, tm, pk["cut_top"], n_cuts=S, K=6, interpret=True,
            sub=SUB,
        ))
        # oracle: classic traversal hit -> the subtree holding the hit
        # cluster must be in the ray's list
        t, tri, u, v = traverse_packets2(o, d, tm, pk, interpret=True,
                                         sub=SUB)
        tri = np.asarray(tri)
        # cluster -> subtree map
        ch = np.asarray(bvh.children)
        cl2sub = np.full((bvh.num_clusters,), -1, np.int32)
        for s, r in enumerate(cut["roots"][:-1]):
            stack = [int(r)]
            while stack:
                n = stack.pop()
                if n < 0:
                    cl2sub[-n - 1] = s
                    continue
                for c in ch[n]:
                    if c != np.int32(2**31 - 1):
                        stack.append(int(c))
        hit = tri >= 0
        subs = cl2sub[np.clip(tri // bvh.leaf_size, 0, None)]
        for i in np.where(hit)[0]:
            lst = set(ids[i])
            assert subs[i] in lst or S in lst, (i, subs[i], ids[i])

    def test_dead_rays_emit_nothing(self, packed_cut):
        pk, bvh, cut = packed_cut
        o, d, tm = make_rays(512)
        tm = tm * 0.0
        ids = np.asarray(emit_packets2(
            o, d, tm, pk["cut_top"], n_cuts=cut["n_cuts"], K=6,
            interpret=True, sub=SUB,
        ))
        assert (ids == -1).all()


class TestCutParity:
    def test_closest_hit_matches_classic(self, packed_cut):
        pk, _, _ = packed_cut
        o, d, tm = make_rays(2048)
        t0, tri0, u0, v0 = traverse_packets2(o, d, tm, pk,
                                             interpret=True, sub=SUB)
        t1, tri1, u1, v1 = traverse_binned2(o, d, tm, pk,
                                            interpret=True, sub=SUB)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t0),
                                   rtol=1e-5, atol=1e-5)
        # ties on exactly-equal t may pick either triangle; require the
        # same t and same-hitness
        assert ((np.asarray(tri1) >= 0) == (np.asarray(tri0) >= 0)).all()
        same = np.asarray(tri1) == np.asarray(tri0)
        assert same.mean() > 0.99
        np.testing.assert_allclose(np.asarray(u1)[same],
                                   np.asarray(u0)[same], atol=1e-4)
        np.testing.assert_allclose(np.asarray(v1)[same],
                                   np.asarray(v0)[same], atol=1e-4)

    def test_anyhit_matches_classic(self, packed_cut):
        pk, _, _ = packed_cut
        o, d, tm = make_rays(2048, seed=11)
        tm = jnp.where(tm > 0, 3.0, 0.0)  # finite caps: mixed occlusion
        a0 = np.asarray(anyhit_packets2(o, d, tm, pk, interpret=True,
                                        sub=SUB))
        a1 = np.asarray(anyhit_binned2(o, d, tm, pk, interpret=True,
                                       sub=SUB))
        np.testing.assert_array_equal(a1, a0)

    def test_small_k_overflow_still_correct(self, packed_cut):
        """K=2 forces frequent overflow->whole-tree degradation; results
        must stay exact."""
        pk, _, _ = packed_cut
        o, d, tm = make_rays(1024, seed=13)
        t0, tri0, _, _ = traverse_packets2(o, d, tm, pk, interpret=True,
                                           sub=SUB)
        t1, tri1, _, _ = traverse_binned2(o, d, tm, pk, K=2,
                                          interpret=True, sub=SUB)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t0),
                                   rtol=1e-5, atol=1e-5)
        assert ((np.asarray(tri1) >= 0) == (np.asarray(tri0) >= 0)).all()
