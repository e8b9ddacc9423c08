"""Environment NEE with MIS (no reference analog — kernel.glsl reaches
the environment only through BSDF-sampled rays that escape,
kernel.glsl:1327-1343). The combined estimator must stay unbiased
(balance heuristic) while cutting variance on env-lit scenes."""

import numpy as np

from tests.test_integrator import PLANE_UNDER_SKY, write_scene
from tracerboy_tpu import Renderer

# A blocker hovering over the plane: env-NEE shadow rays toward the
# zenith are occluded in its footprint, exercising the occlusion path
# (and any leak would brighten the shadowed region).
PLANE_WITH_BLOCKER = """
    LookAt 0 5 0  0 0 0  0 0 1
    Camera "perspective" "float fov" [ 30 ]
    Film "image" "integer xresolution" [ 32 ] "integer yresolution" [ 32 ]
    Integrator "path" "integer maxdepth" [ 4 ]
    WorldBegin
    LightSource "infinite" "rgb L" [ 1 1 1 ]
    Material "matte" "rgb Kd" [ 0.3 0.5 0.7 ]
    Shape "trianglemesh" "integer indices" [ 0 1 2 0 2 3 ]
      "point P" [ -50 0 -50  50 0 -50  50 0 50  -50 0 50 ]
    Material "matte" "rgb Kd" [ 0.1 0.1 0.1 ]
    Shape "trianglemesh" "integer indices" [ 0 1 2 0 2 3 ]
      "point P" [ -0.4 1 -0.4  0.4 1 -0.4  0.4 1 0.4  -0.4 1 0.4 ]
    WorldEnd
"""


def _mean_image(path, env_nee: str, spp: int, seed: int = 0):
    import dataclasses

    r = Renderer(path)
    r.settings = r.settings.replace(
        performance_settings=dataclasses.replace(
            r.settings.performance_settings, environment_nee=env_nee
        ),
    )
    r.render_sample(spp)
    return np.asarray(r.resolve_radiance())


class TestEnvNEE:
    def test_uniform_sky_stays_exact(self, tmp_path):
        """Lambert under a unit sky must still read back its albedo
        EXACTLY per sample: NEE contributes a*w and the MIS-weighted
        escape a*(1-w), so the split preserves the zero-variance
        estimator."""
        path = write_scene(tmp_path, PLANE_UNDER_SKY)
        img = _mean_image(path, "on", spp=2)
        np.testing.assert_allclose(
            img[8:24, 8:24].mean(axis=(0, 1)), [0.3, 0.5, 0.7], atol=0.01
        )

    def test_unbiased_vs_escape_only(self, tmp_path):
        """Means with env NEE on vs off agree on an occluded scene."""
        path = write_scene(tmp_path, PLANE_WITH_BLOCKER)
        on = _mean_image(path, "on", spp=96)
        off = _mean_image(path, "off", spp=96)
        # Compare region means (pointwise at 96 spp is still noisy for
        # the escape-only estimator).
        np.testing.assert_allclose(
            on[8:24, 8:24].mean(axis=(0, 1)),
            off[8:24, 8:24].mean(axis=(0, 1)),
            rtol=0.06,
        )

    def test_variance_drops_under_occlusion(self, tmp_path):
        """Per-pixel spatial noise at low spp must drop with env NEE:
        the blocker makes escape-only a binary test while NEE splits
        the estimate across two strategies."""
        path = write_scene(tmp_path, PLANE_WITH_BLOCKER)
        on = _mean_image(path, "on", spp=4)
        off = _mean_image(path, "off", spp=4)

        def noise(img):
            g = img[6:26, 6:26].mean(axis=2)
            # High-pass: residual vs a 3x3 box blur.
            from scipy.ndimage import uniform_filter

            return float(np.std(g - uniform_filter(g, 3)))

        try:
            n_on, n_off = noise(on), noise(off)
        except ImportError:  # pragma: no cover - scipy always present
            g_on = on[6:26, 6:26].mean(axis=2)
            g_off = off[6:26, 6:26].mean(axis=2)
            n_on = float(np.std(np.diff(g_on, axis=0)))
            n_off = float(np.std(np.diff(g_off, axis=0)))
        assert n_on < n_off

    def test_auto_enables_only_without_lights(self, tmp_path):
        """auto -> on for env-only scenes, off when light records exist."""
        path = write_scene(tmp_path, PLANE_UNDER_SKY)
        r = Renderer(path)
        assert r.compiled.num_lights == 0
        assert r.wave_config().env_nee
        import dataclasses

        r.settings = r.settings.replace(
            performance_settings=dataclasses.replace(
                r.settings.performance_settings, environment_nee="off"
            )
        )
        assert not r.wave_config().env_nee


class TestChunkedAttrGather:
    def test_matches_direct_gather(self):
        import jax.numpy as jnp

        from tracerboy_tpu.trace import wavefront as wf

        table = jnp.arange(40 * 19, dtype=jnp.float32).reshape(40, 19)
        idx = jnp.array([0, 5, 39, 7, 7, 12, 3, 1, 0, 38, 2, 9],
                        jnp.int32)
        old = wf.ATTR_GATHER_CHUNK
        try:
            wf.ATTR_GATHER_CHUNK = 5  # force multiple + padded chunks
            planes = wf._gather_rows_chunked(table, idx)
        finally:
            wf.ATTR_GATHER_CHUNK = old
        direct = table[idx].T
        np.testing.assert_array_equal(
            np.asarray(planes[:, : idx.shape[0]]), np.asarray(direct)
        )
