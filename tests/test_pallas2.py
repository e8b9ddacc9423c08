"""v2 packet-traversal kernel tests (interpret mode on CPU).

Oracle strategy per SURVEY.md section 4: the Pallas kernel is validated
against the brute-force intersector, in both VMEM-resident and
HBM-streaming (DMA ring) configurations.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tracerboy_tpu.trace.intersect import brute_force_closest
from tracerboy_tpu.trace.pallas_traverse import pack_scene_for_pallas
from tracerboy_tpu.trace.pallas_traverse2 import (
    PACKET,
    anyhit_packets2,
    traverse_packets2,
)
from tests.test_pallas import make_rays, make_scene


def run_v2(o, d, t_max, packed, tris_in_hbm=False):
    t, tri, u, v = traverse_packets2(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max), packed,
        interpret=True, tris_in_hbm=tris_in_hbm,
    )
    tri = np.asarray(tri)
    mapped = np.where(
        tri >= 0, np.asarray(packed["tri_map"])[np.clip(tri, 0, None)], -1
    )
    return np.asarray(t), mapped, np.asarray(u), np.asarray(v)


@pytest.mark.parametrize("n_tris", [37, 2000, 20_000])
def test_v2_matches_brute_force(rng, n_tris):
    v0, v1, v2 = make_scene(rng, n_tris)
    packed, _ = pack_scene_for_pallas(v0, v1, v2)
    o, d = make_rays(rng, PACKET)
    t, tri, _, _ = run_v2(o, d, np.full((PACKET,), 1e30, np.float32), packed)
    t_ref, tri_ref, _, _ = brute_force_closest(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
    )
    t_ref = np.asarray(t_ref)
    hit = tri >= 0
    hit_ref = t_ref < 1e29
    np.testing.assert_array_equal(hit, hit_ref)
    np.testing.assert_allclose(t[hit], t_ref[hit], rtol=1e-4)
    same = np.abs(t - t_ref) < 1e-6
    assert (tri[hit & same] == np.asarray(tri_ref)[hit & same]).mean() > 0.99


def test_v2_hbm_streaming_matches_vmem(rng):
    """The DMA-ring streaming path must agree exactly with VMEM-resident."""
    v0, v1, v2 = make_scene(rng, 5000)
    packed, _ = pack_scene_for_pallas(v0, v1, v2)
    o, d = make_rays(rng, PACKET)
    tmax = np.full((PACKET,), 1e30, np.float32)
    t_a, tri_a, u_a, v_a = run_v2(o, d, tmax, packed, tris_in_hbm=False)
    t_b, tri_b, u_b, v_b = run_v2(o, d, tmax, packed, tris_in_hbm=True)
    np.testing.assert_array_equal(tri_a, tri_b)
    np.testing.assert_allclose(t_a, t_b, rtol=1e-6)
    np.testing.assert_allclose(u_a, u_b, rtol=1e-5, atol=1e-6)


def test_v2_respects_tmax(rng):
    v0, v1, v2 = make_scene(rng, 500)
    packed, _ = pack_scene_for_pallas(v0, v1, v2)
    o, d = make_rays(rng, PACKET)
    t_full, _, _, _ = run_v2(
        o, d, np.full((PACKET,), 1e30, np.float32), packed
    )
    cap = 10.0
    t_cap, tri_cap, _, _ = run_v2(
        o, d, np.full((PACKET,), cap, np.float32), packed
    )
    hit_cap = tri_cap >= 0
    assert np.all(t_cap[hit_cap] < cap)
    np.testing.assert_allclose(t_cap[hit_cap], t_full[hit_cap], rtol=1e-5)


@pytest.mark.parametrize("tris_in_hbm", [False, True])
def test_v2_anyhit_matches_closest(rng, tris_in_hbm):
    v0, v1, v2 = make_scene(rng, 3000)
    packed, _ = pack_scene_for_pallas(v0, v1, v2)
    o, d = make_rays(rng, PACKET)
    cap = np.full((PACKET,), 14.0, np.float32)
    t, tri, _, _ = run_v2(o, d, cap, packed)
    occ = np.asarray(
        anyhit_packets2(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(cap), packed,
            interpret=True, tris_in_hbm=tris_in_hbm,
        )
    )
    # closest-hit within the cap implies occluded; occluded implies some
    # hit exists (closest must have found one too).
    closest_hit = tri >= 0
    np.testing.assert_array_equal(occ, closest_hit)


def test_v2_dead_rays_ignored(rng):
    """t_max = 0 marks dead lanes (the wavefront's masked rays)."""
    v0, v1, v2 = make_scene(rng, 800)
    packed, _ = pack_scene_for_pallas(v0, v1, v2)
    o, d = make_rays(rng, PACKET)
    tmax = np.full((PACKET,), 1e30, np.float32)
    tmax[::2] = 0.0
    t, tri, _, _ = run_v2(o, d, tmax, packed)
    assert (tri[::2] == -1).all()
    occ = np.asarray(
        anyhit_packets2(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax), packed,
            interpret=True,
        )
    )
    assert not occ[::2].any()


@pytest.mark.slow
def test_v2_sub_parameter_parity(rng):
    """Packet height (sub=) must not change results: 512/1024-ray
    packets vs the default 2048 (static knob, TB_PACKET_SUB)."""
    v0, v1, v2 = make_scene(rng, 1500)
    packed, _ = pack_scene_for_pallas(v0, v1, v2)
    o, d = make_rays(rng, PACKET)
    tmax = np.full((PACKET,), 1e30, np.float32)
    base = traverse_packets2(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax), packed,
        interpret=True,
    )
    for sub in (8, 4):
        got = traverse_packets2(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax), packed,
            interpret=True, sub=sub,
        )
        for a, b in zip(base, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_v2_interval_nodes_parity(rng):
    """Interval (frustum) node phase is conservative-only: identical
    final hits to the per-ray slab phase, including dead lanes and
    mixed-octant packets. (Measured 10x slower in production — kept as
    a correct, documented-negative knob.)"""
    v0, v1, v2 = make_scene(rng, 1500)
    packed, _ = pack_scene_for_pallas(v0, v1, v2)
    o, d = make_rays(rng, PACKET)
    d[: PACKET // 2] = np.abs(d[: PACKET // 2])  # octant-pure half
    tmax = np.full((PACKET,), 1e30, np.float32)
    tmax[100:200] = 0.0                          # dead lanes
    args = (jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax), packed)
    a = traverse_packets2(*args, interpret=True, interval=False)
    b = traverse_packets2(*args, interpret=True, interval=True)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                               rtol=1e-6)
    assert (np.asarray(a[1]) == np.asarray(b[1])).mean() > 0.999
    occ_a = anyhit_packets2(*args, interpret=True, interval=False)
    occ_b = anyhit_packets2(*args, interpret=True, interval=True)
    np.testing.assert_array_equal(np.asarray(occ_a), np.asarray(occ_b))
