"""Pallas packet-traversal kernel tests (interpret mode on CPU).

The CPU-vs-kernel parity strategy SURVEY.md section 4 prescribes: every
Pallas kernel is validated against its jnp reference implementation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tracerboy_tpu.accel.native import build_bvh_auto
from tracerboy_tpu.trace.intersect import brute_force_closest
from tracerboy_tpu.trace.pallas_traverse import (
    PACKET,
    pack_bvh,
    traverse_packets,
)


def make_scene(rng, n, spread=10.0, size=0.4):
    base = (rng.random((n, 3)) - 0.5).astype(np.float32) * spread
    v1 = base + rng.normal(size=(n, 3)).astype(np.float32) * size
    v2 = base + rng.normal(size=(n, 3)).astype(np.float32) * size
    return base, v1.astype(np.float32), v2.astype(np.float32)


def make_rays(rng, n_rays, toward=8.0, spread=30.0):
    o = ((rng.random((n_rays, 3)) - 0.5) * spread).astype(np.float32)
    tgt = ((rng.random((n_rays, 3)) - 0.5) * toward).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d.astype(np.float32)


@pytest.mark.parametrize("n_tris", [37, 2000])
def test_packet_matches_brute_force(rng, n_tris):
    v0, v1, v2 = make_scene(rng, n_tris)
    bvh = build_bvh_auto(v0, v1, v2, leaf_size=4)
    packed = pack_bvh(bvh, v0, v1, v2)
    o, d = make_rays(rng, PACKET)
    t, tri, u, v = traverse_packets(
        jnp.asarray(o), jnp.asarray(d),
        jnp.full((PACKET,), 1e30, np.float32), packed, interpret=True,
    )
    t_ref, _, _, _ = brute_force_closest(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
    )
    t = np.asarray(t)
    t_ref = np.asarray(t_ref)
    hit = np.asarray(tri) >= 0
    hit_ref = t_ref < 1e29
    np.testing.assert_array_equal(hit, hit_ref)
    np.testing.assert_allclose(t[hit], t_ref[hit], rtol=1e-4)


def test_packet_respects_tmax(rng):
    v0, v1, v2 = make_scene(rng, 500)
    bvh = build_bvh_auto(v0, v1, v2, leaf_size=4)
    packed = pack_bvh(bvh, v0, v1, v2)
    o, d = make_rays(rng, PACKET)
    t_full, tri_full, _, _ = traverse_packets(
        jnp.asarray(o), jnp.asarray(d),
        jnp.full((PACKET,), 1e30, np.float32), packed, interpret=True,
    )
    cap = 10.0
    t_cap, tri_cap, _, _ = traverse_packets(
        jnp.asarray(o), jnp.asarray(d),
        jnp.full((PACKET,), cap, np.float32), packed, interpret=True,
    )
    t_cap = np.asarray(t_cap)
    hit_cap = np.asarray(tri_cap) >= 0
    assert np.all(t_cap[hit_cap] < cap)
    # Every capped hit must match the uncapped result at that t.
    t_full = np.asarray(t_full)
    np.testing.assert_allclose(t_cap[hit_cap], t_full[hit_cap], rtol=1e-5)


def test_quantized_bounds_conservative(rng):
    """Quantization must never cull a hit child box: compare against the
    unquantized jnp traversal on a thin-triangle scene (worst case for
    uint8 bounds)."""
    from tracerboy_tpu.trace.traverse import traverse_wide

    v0, v1, v2 = make_scene(rng, 800, size=0.02)  # thin slivers
    bvh = build_bvh_auto(v0, v1, v2, leaf_size=4)
    packed = pack_bvh(bvh, v0, v1, v2)
    p0, p1, p2 = (x[bvh.tri_order] for x in (v0, v1, v2))
    o, d = make_rays(rng, PACKET)
    t_pk, tri_pk, _, _ = traverse_packets(
        jnp.asarray(o), jnp.asarray(d),
        jnp.full((PACKET,), 1e30, np.float32), packed, interpret=True,
    )
    t_jn, tri_jn, _, _, _ = traverse_wide(
        jnp.asarray(o), jnp.asarray(d), jnp.full((PACKET,), 1e30),
        jnp.asarray(bvh.bounds_lo), jnp.asarray(bvh.bounds_hi),
        jnp.asarray(bvh.children),
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2), leaf_size=4,
    )
    np.testing.assert_array_equal(
        np.asarray(tri_pk) >= 0, np.asarray(tri_jn) >= 0
    )
    hits = np.asarray(tri_pk) >= 0
    np.testing.assert_allclose(
        np.asarray(t_pk)[hits], np.asarray(t_jn)[hits], rtol=1e-4
    )
