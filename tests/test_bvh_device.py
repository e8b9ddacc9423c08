"""On-device LBVH builder tests (accel/bvh_device.py).

Oracle strategy per SURVEY.md section 4: structural validation with the
BVHValidator port (containment + reachability) plus closest-hit parity
against the brute-force intersector — the same bar the host builder
meets.  The device build need not be byte-identical to the host build
(wide ids are assigned in node order, not BFS order); it must be a
VALID tree that finds the same hits.
"""

import os

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


# ---------------------------------------------------------------------------
# Device repack (pack_for_pallas_device) + the product animated-geometry
# path (Renderer.update_geometry)
# ---------------------------------------------------------------------------


def test_pack_for_pallas_device_matches_host_pack(rng):
    """Device repack of a device build == host pack_bvh of the same
    tree: node rows bit-exact, Baldwin-Weber rows within the f64->f32
    precompute tolerance, tri_map exact."""
    from tracerboy_tpu.accel.bvh_device import pack_for_pallas_device
    from tracerboy_tpu.trace.pallas_traverse import pack_bvh

    v0, v1, v2 = random_soup(rng, 700)
    built = build_bvh_device(jnp.asarray(v0), jnp.asarray(v1),
                             jnp.asarray(v2))
    dev = pack_for_pallas_device(built, jnp.asarray(v0), jnp.asarray(v1),
                                 jnp.asarray(v2))
    host = pack_bvh(to_host_widebvh(built, num_tris=700), v0, v1, v2)
    W = int(built["num_wide"])
    np.testing.assert_array_equal(
        np.asarray(dev["nodes"])[:W], np.asarray(host["nodes"])
    )
    np.testing.assert_allclose(
        np.asarray(dev["tris_bw"]), np.asarray(host["tris_bw"]),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(dev["tri_map"]), np.asarray(host["tri_map"])
    )


def _cornell_renderer(size=(24, 24), traversal=None):
    import os

    import tests.conftest as c
    from tracerboy_tpu.renderer import Renderer
    from tracerboy_tpu.utils.config import default_output_settings

    path = c.require_scene("cornell-box/scene.pbrt")
    import dataclasses

    s = default_output_settings()
    s = s.replace(performance_settings=dataclasses.replace(
        s.performance_settings, max_bounces=2, use_blue_noise=False,
    ))
    old = os.environ.get("TB_TRAVERSAL")
    try:
        if traversal:
            os.environ["TB_TRAVERSAL"] = traversal
        return Renderer(path, settings=s, film_size=size)
    finally:
        if traversal:
            if old is None:
                os.environ.pop("TB_TRAVERSAL", None)
            else:
                os.environ["TB_TRAVERSAL"] = old


class TestUpdateGeometry:
    def test_identity_update_preserves_image(self):
        r = _cornell_renderer()
        r.render_sample()
        ref = np.asarray(r.resolve_radiance())
        sp = r.scene_pytree
        r.update_geometry(sp["tri_v0"], sp["tri_v1"], sp["tri_v2"],
                          normals=sp["tri_n0"])
        assert r.state.spp == 0  # history invalidated
        r.render_sample()
        np.testing.assert_allclose(
            np.asarray(r.resolve_radiance()), ref, atol=1e-5
        )

    def test_moved_geometry_changes_image(self):
        r = _cornell_renderer()
        r.render_sample()
        ref = np.asarray(r.resolve_radiance())
        sp = r.scene_pytree
        delta = jnp.asarray([0.35, 0.0, 0.0], jnp.float32)
        r.update_geometry(sp["tri_v0"] + delta, sp["tri_v1"] + delta,
                          sp["tri_v2"] + delta)
        r.render_sample()
        moved = np.asarray(r.resolve_radiance())
        assert np.isfinite(moved).all()
        assert np.abs(moved - ref).mean() > 1e-3

    def test_pallas_update_matches_brute(self):
        """After an on-device rebuild, the pallas backend (interpret
        kernels on CPU) agrees with brute force on the moved scene —
        the full product animation loop with no host rebuild."""
        from tests.test_pallas import _patch_interpret
        import tracerboy_tpu.trace.pallas_traverse2 as pt2

        size = (16, 16)
        delta = jnp.asarray([0.0, 0.2, 0.0], jnp.float32)

        rb = _cornell_renderer(size=size, traversal="brute")
        sp = rb.scene_pytree
        rb.update_geometry(sp["tri_v0"] + delta, sp["tri_v1"] + delta,
                           sp["tri_v2"] + delta)
        rb.render_sample()
        ref = np.asarray(rb.resolve_radiance())

        rp = _cornell_renderer(size=size, traversal="pallas")
        spp_ = rp.scene_pytree
        orig_c, orig_a = _patch_interpret(pt2)
        try:
            rp.update_geometry(
                spp_["tri_v0"] + delta, spp_["tri_v1"] + delta,
                spp_["tri_v2"] + delta,
            )
            rp.render_sample()
            got = np.asarray(rp.resolve_radiance())
        finally:
            pt2.traverse_packets2 = orig_c
            pt2.anyhit_packets2 = orig_a
        np.testing.assert_allclose(got, ref, atol=1e-4)
    def test_rejects_topology_change(self):
        r = _cornell_renderer()
        with pytest.raises(ValueError):
            r.update_geometry(np.zeros((3, 3)), np.zeros((3, 3)),
                              np.zeros((3, 3)))


class TestInstancedAnimation:
    """TLAS-instanced animation (round-4 verdict item 6): transform
    refits and per-object BLAS rebuilds, mirroring the reference's
    per-change rebuild flow for instanced scenes
    (TracerBoy.cpp:1963-2026)."""

    GRID = 2

    def _scene_text(self, shift=(0.0, 0.0, 0.0), radius=1.0):
        insts = []
        for i in range(self.GRID):
            for j in range(self.GRID):
                insts.append(f"""
                AttributeBegin
                Translate {i * 3.0 + shift[0]} {shift[1]} \
{j * 3.0 - 3.0 + shift[2]}
                ObjectInstance "ball"
                AttributeEnd
                """)
        return f"""
            Camera "perspective" "float fov" [55]
            Film "image" "integer xresolution" [48]
                 "integer yresolution" [32]
            WorldBegin
            LightSource "infinite" "rgb L" [1 1 1]
            Material "matte" "rgb Kd" [0.6 0.4 0.3]
            ObjectBegin "ball"
            Shape "sphere" "float radius" [{radius}]
            ObjectEnd
            {''.join(insts)}
            WorldEnd
        """

    def _compile(self, tmp_path, name, text, instancing="tlas"):
        from tracerboy_tpu.scene.compile import compile_scene
        from tracerboy_tpu.scene.pbrt_parser import parse_pbrt

        p = tmp_path / name
        p.write_text(text)
        return compile_scene(parse_pbrt(str(p)), film_size=(48, 32),
                             instancing=instancing)

    def _render(self, cs):
        import tracerboy_tpu.trace.pallas_traverse2 as pt2
        from tests.test_pallas import _patch_interpret
        from tracerboy_tpu.renderer import Renderer

        orig = _patch_interpret(pt2)
        try:
            os.environ["TB_TRAVERSAL"] = "pallas"
            if isinstance(cs, Renderer):
                r = cs
            else:
                r = Renderer(cs, film_size=(48, 32))
            r.render_sample(1)
            return r, np.asarray(r.resolve_radiance())
        finally:
            os.environ.pop("TB_TRAVERSAL", None)
            pt2.traverse_packets2, pt2.anyhit_packets2 = orig

    @staticmethod
    def _transforms(cs):
        it = cs.inst_tables
        out = []
        for row in np.asarray(it["inst_inv"]):
            A = np.vstack([row.reshape(3, 4), [0, 0, 0, 1.0]])
            out.append(np.linalg.inv(A))
        return np.stack(out)

    @pytest.mark.slow
    def test_transform_refit_matches_recompile(self, tmp_path):
        shift = (0.7, 0.3, -0.5)
        cs = self._compile(tmp_path, "a.pbrt", self._scene_text())
        cs_shifted = self._compile(
            tmp_path, "b.pbrt", self._scene_text(shift=shift))
        r, _ = self._render(cs)
        M = self._transforms(cs)
        T = np.eye(4)
        T[:3, 3] = shift
        r.update_instance_transforms(np.einsum("ab,ibc->iac", T, M))
        assert r.state.spp == 0  # history invalidated
        _, img = self._render(r)
        _, ref = self._render(cs_shifted)
        close = np.isclose(img, ref, rtol=1e-3, atol=5e-3)
        assert close.mean() > 0.98, close.mean()

    @pytest.mark.slow
    def test_object_rebuild_matches_recompile(self, tmp_path):
        cs = self._compile(tmp_path, "a.pbrt", self._scene_text())
        cs_big = self._compile(
            tmp_path, "b.pbrt", self._scene_text(radius=1.25))
        r, _ = self._render(cs)
        verts = cs.inst_objects[0]["verts"]
        r.update_object_geometry(
            0, verts[:, 0] * 1.25, verts[:, 1] * 1.25, verts[:, 2] * 1.25)
        _, img = self._render(r)
        _, ref = self._render(cs_big)
        assert np.isfinite(img).all()
        close = np.isclose(img, ref, rtol=1e-3, atol=5e-3)
        assert close.mean() > 0.97, close.mean()

    def test_contract_errors(self, tmp_path):
        cs = self._compile(tmp_path, "a.pbrt", self._scene_text())
        from tracerboy_tpu.renderer import Renderer

        os.environ["TB_TRAVERSAL"] = "pallas"
        try:
            r = Renderer(cs, film_size=(48, 32))
        finally:
            os.environ.pop("TB_TRAVERSAL", None)
        with pytest.raises(NotImplementedError):
            r.update_geometry(np.zeros((3, 3)), np.zeros((3, 3)),
                              np.zeros((3, 3)))
        with pytest.raises(ValueError):
            r.update_instance_transforms(np.eye(4)[None])
        with pytest.raises(ValueError):
            r.update_object_geometry(0, np.zeros((3, 3)),
                                     np.zeros((3, 3)), np.zeros((3, 3)))
