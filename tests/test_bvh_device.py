"""On-device LBVH builder tests (accel/bvh_device.py).

Oracle strategy per SURVEY.md section 4: structural validation with the
BVHValidator port (containment + reachability) plus closest-hit parity
against the brute-force intersector — the same bar the host builder
meets.  The device build need not be byte-identical to the host build
(wide ids are assigned in node order, not BFS order); it must be a
VALID tree that finds the same hits.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tracerboy_tpu.accel.bvh import build_bvh
from tracerboy_tpu.accel.bvh_device import build_bvh_device, to_host_widebvh
from tracerboy_tpu.accel.validate import validate_bvh
from tracerboy_tpu.trace.intersect import BIG, brute_force_closest
from tracerboy_tpu.trace.traverse import traverse_wide


def random_soup(rng, n, spread=10.0, size=0.4):
    base = (rng.random((n, 3), np.float32) - 0.5) * spread
    e1 = rng.standard_normal((n, 3)).astype(np.float32) * size
    e2 = rng.standard_normal((n, 3)).astype(np.float32) * size
    return base, base + e1, base + e2


def make_rays(rng, n, spread=18.0):
    o = (rng.random((n, 3), np.float32) - 0.5) * spread
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def closest_via_tables(built, v0, v1, v2, o, d):
    order = np.asarray(built["tri_order"])
    w0 = jnp.asarray(v0[order])
    w1 = jnp.asarray(v1[order])
    w2 = jnp.asarray(v2[order])
    t, tri, u, v, _cost = traverse_wide(
        jnp.asarray(o), jnp.asarray(d),
        jnp.full((o.shape[0],), BIG, jnp.float32),
        built["bounds_lo"], built["bounds_hi"], built["children"],
        w0, w1, w2, leaf_size=8,
    )
    return np.asarray(t), np.asarray(tri)


@pytest.mark.parametrize("n_tris", [5, 300, 5000])
def test_device_build_valid_and_hit_parity(rng, n_tris):
    v0, v1, v2 = random_soup(rng, n_tris)
    built = build_bvh_device(jnp.asarray(v0), jnp.asarray(v1),
                             jnp.asarray(v2))
    bvh = to_host_widebvh(built, num_tris=n_tris)
    assert validate_bvh(bvh, v0, v1, v2) == []

    o, d = make_rays(rng, 2048)
    t, tri = closest_via_tables(built, v0, v1, v2, o, d)
    t_ref, _, _, _ = brute_force_closest(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
    )
    t_ref = np.asarray(t_ref)
    hit = tri >= 0
    hit_ref = t_ref < BIG * 0.5
    assert not np.any(hit_ref & ~hit), "device-built BVH missed a hit"
    assert (hit == hit_ref).mean() > 0.999
    both = hit & hit_ref
    np.testing.assert_allclose(t[both], t_ref[both], rtol=1e-3, atol=1e-4)


def test_device_build_degenerate_common_centroid(rng):
    """All-identical morton codes exercise the index tie-break path."""
    n = 64
    base = np.zeros((n, 3), np.float32)
    e1 = rng.standard_normal((n, 3)).astype(np.float32) * 0.3
    e2 = rng.standard_normal((n, 3)).astype(np.float32) * 0.3
    v0, v1, v2 = base, base + e1, base + e2
    built = build_bvh_device(jnp.asarray(v0), jnp.asarray(v1),
                             jnp.asarray(v2))
    bvh = to_host_widebvh(built, num_tris=n)
    assert validate_bvh(bvh, v0, v1, v2) == []
    o, d = make_rays(rng, 512, spread=4.0)
    t, tri = closest_via_tables(built, v0, v1, v2, o, d)
    t_ref, _, _, _ = brute_force_closest(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
    )
    t_ref = np.asarray(t_ref)
    hit_ref = t_ref < BIG * 0.5
    assert not np.any(hit_ref & (tri < 0))


def test_device_matches_host_topology_quality(rng):
    """Same leaf clustering (identical morton order modulo ties) — the
    device tri_order must equal the host builder's on tie-free input,
    and the wide-node count must be within the depth-3 cut's bound."""
    v0, v1, v2 = random_soup(rng, 1000)
    built = build_bvh_device(jnp.asarray(v0), jnp.asarray(v1),
                             jnp.asarray(v2))
    host = build_bvh(v0, v1, v2, leaf_size=8)
    np.testing.assert_array_equal(
        np.asarray(built["tri_order"]), np.asarray(host.tri_order)
    )
    W_dev = int(built["num_wide"])
    assert W_dev == host.num_nodes, (W_dev, host.num_nodes)


def test_single_cluster_scene(rng):
    v0, v1, v2 = random_soup(rng, 3)
    built = build_bvh_device(jnp.asarray(v0), jnp.asarray(v1),
                             jnp.asarray(v2))
    o, d = make_rays(rng, 256)
    t, tri = closest_via_tables(built, v0, v1, v2, o, d)
    t_ref, _, _, _ = brute_force_closest(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
    )
    t_ref = np.asarray(t_ref)
    hit_ref = t_ref < BIG * 0.5
    assert not np.any(hit_ref & (tri < 0))
