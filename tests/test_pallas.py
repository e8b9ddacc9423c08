"""Pallas packet-traversal kernel tests (interpret mode on CPU).

The CPU-vs-kernel parity strategy SURVEY.md section 4 prescribes: every
Pallas kernel is validated against its jnp reference implementation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tracerboy_tpu.trace.intersect import brute_force_closest
from tracerboy_tpu.trace.pallas_traverse import (
    PACKET,
    pack_scene_for_pallas,
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


def run_packets(o, d, t_max, packed):
    t, tri, u, v = traverse_packets(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max), packed,
        interpret=True,
    )
    tri = np.asarray(tri)
    mapped = np.where(tri >= 0, np.asarray(packed["tri_map"])[np.clip(tri, 0, None)], -1)
    return np.asarray(t), mapped


@pytest.mark.parametrize("n_tris", [37, 2000, 20_000])
def test_packet_matches_brute_force(rng, n_tris):
    v0, v1, v2 = make_scene(rng, n_tris)
    packed, _ = pack_scene_for_pallas(v0, v1, v2)
    o, d = make_rays(rng, PACKET)
    t, tri = run_packets(o, d, np.full((PACKET,), 1e30, np.float32), packed)
    t_ref, tri_ref, _, _ = brute_force_closest(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
    )
    t_ref = np.asarray(t_ref)
    hit = tri >= 0
    hit_ref = t_ref < 1e29
    np.testing.assert_array_equal(hit, hit_ref)
    np.testing.assert_allclose(t[hit], t_ref[hit], rtol=1e-4)
    # Where t is unique, tri ids must agree too.
    same = np.abs(t - t_ref) < 1e-6
    assert (tri[hit & same] == np.asarray(tri_ref)[hit & same]).mean() > 0.99


def test_packet_respects_tmax(rng):
    v0, v1, v2 = make_scene(rng, 500)
    packed, _ = pack_scene_for_pallas(v0, v1, v2)
    o, d = make_rays(rng, PACKET)
    t_full, _ = run_packets(o, d, np.full((PACKET,), 1e30, np.float32), packed)
    cap = 10.0
    t_cap, tri_cap = run_packets(o, d, np.full((PACKET,), cap, np.float32), packed)
    hit_cap = tri_cap >= 0
    assert np.all(t_cap[hit_cap] < cap)
    np.testing.assert_allclose(t_cap[hit_cap], t_full[hit_cap], rtol=1e-5)


def _patch_interpret(pt2):
    """Force interpret mode on the v2 kernels (CPU test environment)."""
    orig_c = pt2.traverse_packets2
    orig_a = pt2.anyhit_packets2

    def patched_c(o, d, tm, packed, interpret=False, **kw):
        return orig_c(o, d, tm, packed, interpret=True, **kw)

    def patched_a(o, d, tm, packed, interpret=False, **kw):
        return orig_a(o, d, tm, packed, interpret=True, **kw)

    pt2.traverse_packets2 = patched_c
    pt2.anyhit_packets2 = patched_a
    return orig_c, orig_a


def test_end_to_end_render_parity(tmp_path):
    """Full render with the pallas backend (interpret) matches jnp."""
    import os
    import tracerboy_tpu.trace.pallas_traverse2 as pt2
    from tracerboy_tpu import Renderer
    import tests.conftest as c

    path = c.require_scene("cornell-box/scene.pbrt")

    orig_c, orig_a = _patch_interpret(pt2)
    try:
        os.environ["TB_TRAVERSAL"] = "pallas"
        r1 = Renderer(path, film_size=(32, 24))
        assert r1.traversal == "pallas"
        r1.render_sample(2)
        img1 = np.asarray(r1.resolve_radiance())
        os.environ["TB_TRAVERSAL"] = "jnp"
        r2 = Renderer(path, film_size=(32, 24))
        r2.render_sample(2)
        img2 = np.asarray(r2.resolve_radiance())
    finally:
        pt2.traverse_packets2 = orig_c
        pt2.anyhit_packets2 = orig_a
        os.environ.pop("TB_TRAVERSAL", None)
    np.testing.assert_allclose(img1, img2, atol=1e-4)


@pytest.mark.parametrize("backend", ["brute", "jnp", "pallas"])
def test_set_material_rebuilds_backend_pytree(backend):
    """Live material edit must rebuild the scene pytree with the same
    backend packing (regression: the pallas path lost pk_* arrays after
    set_material and the next render_wave KeyError'd)."""
    import os
    import tracerboy_tpu.trace.pallas_traverse2 as pt2
    from tracerboy_tpu import Renderer
    import tests.conftest as c

    path = c.require_scene("cornell-box/scene.pbrt")
    orig_c, orig_a = _patch_interpret(pt2)
    try:
        os.environ["TB_TRAVERSAL"] = backend
        r = Renderer(path, film_size=(16, 16))
        assert r.traversal == backend
        r.render_sample()
        r.set_material(0, albedo=[0.9, 0.1, 0.1])
        if backend == "pallas":
            assert "pk_nodes" in r.scene_pytree
        r.render_sample()
        img = np.asarray(r.resolve_radiance())
        assert np.isfinite(img).all()
    finally:
        pt2.traverse_packets2 = orig_c
        pt2.anyhit_packets2 = orig_a
        os.environ.pop("TB_TRAVERSAL", None)
