"""Binned (stream-compaction) traversal tests (interpret mode on CPU).

Oracle strategy per SURVEY.md section 4: the binned backend is validated
against the brute-force intersector. The fallback path (K-nearest
overflow) and the no-fallback path are exercised separately.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tracerboy_tpu.trace.binned import (
    PACKET,
    binned_closest,
    pack_scene_binned,
)
from tracerboy_tpu.trace.intersect import brute_force_closest
from tracerboy_tpu.trace.pallas_traverse import pack_scene_for_pallas
from tests.test_pallas import make_rays, make_scene


def make_env(rng, n_tris):
    v0, v1, v2 = make_scene(rng, n_tris)
    packed, _ = pack_scene_for_pallas(v0, v1, v2)
    scene = dict(
        pk_nodes=packed["nodes"], pk_tris=packed["tris"],
        pk_tris_bw=packed["tris_bw"],
        world_lo=jnp.asarray(
            np.minimum(np.minimum(v0, v1), v2).min(0)),
        world_hi=jnp.asarray(
            np.maximum(np.maximum(v0, v1), v2).max(0)),
        **pack_scene_binned(packed["tris"]),
    )
    tri_map = np.asarray(packed["tri_map"])
    return scene, tri_map, (v0, v1, v2)


def run_binned(scene, tri_map, o, d, t_max, **kw):
    t, tri, u, v = binned_closest(
        scene, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max),
        interpret=True, **kw,
    )
    tri = np.asarray(tri)
    mapped = np.where(tri >= 0, tri_map[np.clip(tri, 0, None)], -1)
    return np.asarray(t), mapped, np.asarray(u), np.asarray(v)


@pytest.mark.parametrize("n_tris", [300, 5000])
def test_binned_matches_brute_force(rng, n_tris):
    scene, tri_map, (v0, v1, v2) = make_env(rng, n_tris)
    o, d = make_rays(rng, PACKET)
    t, tri, u, v = run_binned(
        scene, tri_map, o, d, np.full((PACKET,), 1e30, np.float32)
    )
    t_ref, tri_ref, _, _ = brute_force_closest(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
    )
    t_ref = np.asarray(t_ref)
    hit = tri >= 0
    hit_ref = t_ref < 1e29
    # The binned drains share the production kernels' conservative
    # containment band (pallas_traverse2: barycentrics accepted within
    # 1e-5 of the valid region, so shared edges can never crack). The
    # watertight brute-force oracle is exact, so binned may report an
    # EXTRA hit exactly on an edge — verify any such hit really lies
    # within the band. Missing a brute-force hit is always a failure.
    assert not np.any(hit_ref & ~hit), "binned missed a true hit"

    def assert_band_hit(i):
        """The reported hit must lie on the reported triangle within the
        band, and be no farther than the oracle's closest hit."""
        k = tri[i]
        e1, e2 = v1[k] - v0[k], v2[k] - v0[k]
        n = np.cross(e1, e2)
        tt = float(np.dot(n, v0[k] - o[i])) / float(np.dot(n, d[i]))
        p = o[i] + tt * d[i] - v0[k]
        m = np.linalg.inv(np.stack([e1, e2, n]).T.astype(np.float64))
        uu, vv, _ = m @ p.astype(np.float64)
        band = 5e-5
        assert (uu >= -band and vv >= -band and uu + vv <= 1 + band), (
            f"ray {i}: disagreeing hit not on a containment-band edge "
            f"(u={uu} v={vv})"
        )
        assert t[i] <= t_ref[i] * (1 + 1e-5) + 1e-5, (
            f"ray {i}: binned hit farther than oracle closest "
            f"({t[i]} > {t_ref[i]})"
        )

    for i in np.nonzero(hit & ~hit_ref)[0]:
        assert_band_hit(i)
    both = hit & hit_ref
    agree = both & np.isclose(t, t_ref, rtol=1e-3, atol=1e-5)
    for i in np.nonzero(both & ~agree)[0]:
        assert_band_hit(i)
    assert agree[both].mean() > 0.995
    same = np.abs(t - t_ref) < 1e-6
    assert (tri[both & same] == np.asarray(tri_ref)[both & same]).mean() > 0.98


def test_binned_no_fallback_is_conservative(rng):
    """Without the packet fallback, every reported hit must still be a
    true closest hit (only unresolved rays may differ)."""
    scene, tri_map, (v0, v1, v2) = make_env(rng, 4000)
    o, d = make_rays(rng, PACKET)
    t, tri, _, _ = run_binned(
        scene, tri_map, o, d, np.full((PACKET,), 1e30, np.float32),
        use_fallback=False,
    )
    t_ref, _, _, _ = brute_force_closest(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
    )
    t_ref = np.asarray(t_ref)
    hit = tri >= 0
    # any reported t is >= the true closest (never closer than truth)
    assert np.all(t[hit] >= t_ref[hit] - 1e-4)


def test_binned_respects_tmax(rng):
    scene, tri_map, _ = make_env(rng, 1500)
    o, d = make_rays(rng, PACKET)
    t_full, _, _, _ = run_binned(
        scene, tri_map, o, d, np.full((PACKET,), 1e30, np.float32)
    )
    cap = 10.0
    t_cap, tri_cap, _, _ = run_binned(
        scene, tri_map, o, d, np.full((PACKET,), cap, np.float32)
    )
    hit_cap = tri_cap >= 0
    assert np.all(t_cap[hit_cap] < cap)
    np.testing.assert_allclose(
        t_cap[hit_cap], t_full[hit_cap], rtol=1e-5
    )


def test_binned_dead_rays_ignored(rng):
    scene, tri_map, _ = make_env(rng, 800)
    o, d = make_rays(rng, PACKET)
    tmax = np.full((PACKET,), 1e30, np.float32)
    tmax[::2] = 0.0
    t, tri, _, _ = run_binned(scene, tri_map, o, d, tmax)
    assert (tri[::2] == -1).all()


def test_binned_overflow_scene_falls_back(rng):
    """A ray crossing more than KSEL clusters (a long thin scene along
    x) exercises the dropped-cluster fallback path."""
    # 40 separated slabs of 128 triangles each along +x
    n_slabs = 40
    tris = []
    for s in range(n_slabs):
        base = np.float32(s * 10.0)
        v0, v1, v2 = make_scene(rng, 128)
        for v in (v0, v1, v2):
            v[:, 0] = v[:, 0] * 0.02 + base   # squash to a thin slab
        tris.append((v0, v1, v2))
    v0 = np.concatenate([t[0] for t in tris])
    v1 = np.concatenate([t[1] for t in tris])
    v2 = np.concatenate([t[2] for t in tris])
    packed, _ = pack_scene_for_pallas(v0, v1, v2)
    scene = dict(
        pk_nodes=packed["nodes"], pk_tris=packed["tris"],
        pk_tris_bw=packed["tris_bw"],
        world_lo=jnp.asarray(
            np.minimum(np.minimum(v0, v1), v2).min(0)),
        world_hi=jnp.asarray(
            np.maximum(np.maximum(v0, v1), v2).max(0)),
        **pack_scene_binned(packed["tris"]),
    )
    tri_map = np.asarray(packed["tri_map"])
    # rays marching down +x through every slab, starting left of all
    n = PACKET
    o = np.stack([
        np.full(n, -5.0), rng.random(n) * 8 - 4, rng.random(n) * 8 - 4,
    ], 1).astype(np.float32)
    d = np.tile(np.array([[1.0, 0.001, 0.001]], np.float32), (n, 1))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t, tri, _, _ = run_binned(
        scene, tri_map, o, d, np.full((n,), 1e30, np.float32)
    )
    t_ref, tri_ref, _, _ = brute_force_closest(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
    )
    t_ref = np.asarray(t_ref)
    hit = tri >= 0
    hit_ref = t_ref < 1e29
    np.testing.assert_array_equal(hit, hit_ref)
    np.testing.assert_allclose(t[hit], t_ref[hit], rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_binned_in_renderer_matches_brute(tmp_path):
    """End-to-end: a full render_sample with binned bounce waves matches
    the brute-force backend on the same scene + sampler streams."""
    import functools
    import os

    import tracerboy_tpu.trace.binned as bn
    import tracerboy_tpu.trace.pallas_traverse2 as pt2
    from tests.conftest import SCENES_ROOT
    from tests.test_pallas import _patch_interpret
    from tracerboy_tpu.renderer import Renderer

    scene = os.path.join(SCENES_ROOT, "cornell-box", "scene.pbrt")
    if not os.path.exists(scene):
        pytest.skip("cornell-box scene missing")
    orig = _patch_interpret(pt2)
    orig_bc = bn.binned_closest
    bn.binned_closest = functools.partial(orig_bc, interpret=True)
    try:
        os.environ["TB_TRAVERSAL"] = "brute"
        r_b = Renderer(scene, film_size=(24, 16))
        r_b.render_sample(1)
        img_b = np.asarray(r_b.resolve_radiance())

        os.environ["TB_TRAVERSAL"] = "pallas"
        os.environ["TB_BINNED"] = "1"
        r_p = Renderer(scene, film_size=(24, 16))
        assert r_p.wave_config().binned_bounces
        r_p.render_sample(1)
        img_p = np.asarray(r_p.resolve_radiance())
        assert np.isfinite(img_p).all()
        close = np.isclose(img_p, img_b, rtol=1e-3, atol=5e-3)
        assert close.mean() > 0.97, close.mean()
    finally:
        os.environ.pop("TB_TRAVERSAL", None)
        os.environ.pop("TB_BINNED", None)
        bn.binned_closest = orig_bc
        pt2.traverse_packets2, pt2.anyhit_packets2 = orig
