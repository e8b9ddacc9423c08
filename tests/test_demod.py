"""Two-plane albedo demodulation (RealTime decouple path).

The reference demodulates first-hit albedo with a single scalar ratio
in AlbedoTexture.w (kernel.glsl:1733-1771, CompositeAlbedoCS.hlsl:17-26),
which cannot represent samples whose NEE / env-NEE direction has a
different diffuse/specular split than the continuation lobe. The repo
carries the albedo-modulated radiance D as its own plane
(render_wave's radiance_d): composite = albedo*D + (I-D) + E must equal
the plain (non-decoupled) trace EXACTLY per sample when russian
roulette is off (RR decisions legitimately diverge — throughput differs
by the substituted white albedo — which is variance, not bias)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from tests.test_integrator import PLANE_UNDER_SKY, write_scene
from tracerboy_tpu.post.realtime import composite_albedo
from tracerboy_tpu.renderer import Renderer, _demod_ratio
from tracerboy_tpu.trace.wavefront import render_wave

# Mixed-material box under an area light: matte walls (lambert),
# a plastic floor (dc in (0,1)), a metal slab, and the light itself —
# exercises every phi branch plus NEE at the first vertex.
MIXED_BOX = """
    LookAt 0 2 6  0 1 0  0 1 0
    Camera "perspective" "float fov" [ 45 ]
    Film "image" "integer xresolution" [ 32 ] "integer yresolution" [ 32 ]
    Integrator "path" "integer maxdepth" [ 4 ]
    WorldBegin
    AttributeBegin
      AreaLightSource "diffuse" "rgb L" [ 8 8 8 ]
      Shape "trianglemesh" "integer indices" [ 0 1 2 0 2 3 ]
        "point P" [ -1 3.9 -1  1 3.9 -1  1 3.9 1  -1 3.9 1 ]
    AttributeEnd
    Material "plastic" "rgb Kd" [ 0.4 0.2 0.1 ] "rgb Ks" [ 0.5 0.5 0.5 ]
      "float roughness" [ 0.2 ]
    Shape "trianglemesh" "integer indices" [ 0 1 2 0 2 3 ]
      "point P" [ -4 0 -4  4 0 -4  4 0 4  -4 0 4 ]
    Material "matte" "rgb Kd" [ 0.6 0.3 0.3 ]
    Shape "trianglemesh" "integer indices" [ 0 1 2 0 2 3 ]
      "point P" [ -4 0 -4  -4 4 -4  4 4 -4  4 0 -4 ]
    Material "metal" "rgb eta" [ 0.2 0.9 1.4 ] "rgb k" [ 3.9 2.4 2.1 ]
      "float roughness" [ 0.3 ]
    Shape "trianglemesh" "integer indices" [ 0 1 2 0 2 3 ]
      "point P" [ -1.5 0.01 0  1.5 0.01 0  1.5 2 0  -1.5 2 0 ]
    WorldEnd
"""


def _render_pair(path, film=(32, 32)):
    r = Renderer(path, film_size=film)
    h, w = film[1], film[0]
    pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
    params = r.frame_params()
    cfg = dataclasses.replace(r.wave_config(), use_russian_roulette=False)
    cfg_d = dataclasses.replace(cfg, decouple_albedo=True)
    out_p = render_wave(r.scene_pytree, params, pixel_ids, jnp.int32(0),
                        cfg)
    out_d = render_wave(r.scene_pytree, params, pixel_ids, jnp.int32(0),
                        cfg_d)
    plain = np.asarray(out_p["radiance"].reshape(h, w, 3))
    ind = out_d["radiance"].reshape(h, w, 3)
    ind_d = out_d["radiance_d"].reshape(h, w, 3)
    alb = out_d["albedo"].reshape(h, w, 3)
    emi = out_d["emissive"].reshape(h, w, 3)
    fw = np.asarray(out_d["filter_weight"].reshape(h, w, 1))
    return plain, ind, ind_d, alb, emi, fw


class TestTwoPlaneDemodulation:
    def test_composite_roundtrip_exact_env(self, tmp_path):
        path = write_scene(tmp_path, PLANE_UNDER_SKY)
        plain, ind, ind_d, alb, emi, fw = _render_pair(path)
        comp = np.asarray(alb * ind_d + (ind - ind_d)) + np.asarray(emi) * fw
        np.testing.assert_allclose(comp, plain, atol=1e-4)

    def test_composite_roundtrip_exact_lights(self, tmp_path):
        path = write_scene(tmp_path, MIXED_BOX)
        plain, ind, ind_d, alb, emi, fw = _render_pair(path)
        comp = np.asarray(alb * ind_d + (ind - ind_d)) + np.asarray(emi) * fw
        np.testing.assert_allclose(comp, plain, atol=1e-4)

    def test_ratio_form_matches_exact(self, tmp_path):
        """composite_albedo with the per-channel D/I ratio reproduces
        the exact two-plane composite (the form the denoiser path
        uses)."""
        path = write_scene(tmp_path, MIXED_BOX)
        plain, ind, ind_d, alb, emi, fw = _render_pair(path)
        dc3 = _demod_ratio(ind_d, ind)
        comp = np.asarray(composite_albedo(alb, dc3, ind,
                                           emi * jnp.asarray(fw)))
        np.testing.assert_allclose(comp, plain, atol=1e-4)

    def test_modulated_plane_bounded(self, tmp_path):
        """D must sit inside [0, I] channelwise (it is a convex share
        of the indirect light)."""
        path = write_scene(tmp_path, MIXED_BOX)
        _, ind, ind_d, _, _, _ = _render_pair(path)
        ind, ind_d = np.asarray(ind), np.asarray(ind_d)
        assert (ind_d >= -1e-6).all()
        assert (ind_d <= ind + 1e-4).all()

    def test_merged_fold_aovs_sums_planes(self, tmp_path):
        """render_wave_merged(fold_aovs=True) returns per-pixel SUMS of
        the geometric AOV planes over the k samples — the contract the
        golden-aux regen (scripts/make_goldens.make_aux) divides by spp
        to get anti-aliased means."""
        from tracerboy_tpu.trace.wavefront import render_wave_merged

        path = write_scene(tmp_path, MIXED_BOX)
        r = Renderer(path, film_size=(16, 16))
        pixel_ids = jnp.arange(16 * 16, dtype=jnp.int32)
        params = r.frame_params()
        cfg = dataclasses.replace(r.wave_config(), decouple_albedo=True,
                                  want_aovs=True)
        k = 3
        merged = render_wave_merged(r.scene_pytree, params, pixel_ids,
                                    jnp.int32(0), k, cfg, fold_aovs=True)
        singles = [render_wave(r.scene_pytree, params, pixel_ids,
                               jnp.int32(s), cfg) for s in range(k)]
        for key in ("albedo", "normal", "emissive", "radiance",
                    "radiance_d"):
            want = np.sum([np.asarray(s[key]) for s in singles], axis=0)
            np.testing.assert_allclose(np.asarray(merged[key]), want,
                                       rtol=1e-4, atol=1e-4)

    def test_scalar_dc_still_supported(self):
        """Reference-parity scalar AlbedoTexture.w form still works."""
        alb = jnp.full((4, 4, 3), 0.5)
        ind = jnp.ones((4, 4, 3))
        dc = jnp.full((4, 4), 0.25)
        out = composite_albedo(alb, dc, ind, jnp.zeros((4, 4, 3)))
        np.testing.assert_allclose(np.asarray(out), 0.875, atol=1e-6)
