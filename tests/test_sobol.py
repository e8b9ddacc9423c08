"""Owen-scrambled Sobol sampler tests (core/rng.py sobol2_soa).

The sampler the bundled scenes declare (`Sampler "sobol"`,
/root/reference/Scenes/cornell-box/scene.pbrt:2) — the reference ignores
the declaration and uses blue-noise + Halton CP (RayGenCommon.h:49-122);
here it is a real padded Owen-scrambled (0,2)-sequence generator, so
these tests pin the properties the construction must have:
stratification of every power-of-two prefix, per-stream decorrelation,
determinism, and end-to-end unbiasedness against the PCG sampler.
"""

import textwrap

import numpy as np
import pytest
import jax.numpy as jnp

from tracerboy_tpu.core import rng as tbrng


def _draws(n_samples, lanes=None, bounce=0, stream=2, seed=0):
    """(u, v) arrays of shape (len(lanes), n_samples)."""
    if lanes is None:
        lanes = [0, 7, 123, 4096]
    us, vs = [], []
    for s in range(n_samples):
        u, v = tbrng.sobol2_soa(
            jnp.asarray(lanes, jnp.int32), s, bounce, stream, seed)
        us.append(np.asarray(u))
        vs.append(np.asarray(v))
    return np.stack(us, axis=1), np.stack(vs, axis=1)


@pytest.mark.smoke
class TestSobolProperties:
    def test_range_and_determinism(self):
        u1, v1 = _draws(16)
        u2, v2 = _draws(16)
        assert (u1 >= 0).all() and (u1 < 1).all()
        assert (v1 >= 0).all() and (v1 < 1).all()
        np.testing.assert_array_equal(u1, u2)
        np.testing.assert_array_equal(v1, v2)

    @pytest.mark.parametrize("n", [4, 8, 16])
    def test_1d_prefix_stratification(self, n):
        """Any 2^k prefix of an Owen-scrambled (0,2) pair puts exactly
        one point in each of the n equal 1D strata — per lane, per dim.
        (8 independent randoms fail this with probability ~1.)"""
        for stream in (0, 2, 4):
            u, v = _draws(n, stream=stream)
            for dim in (u, v):
                strata = np.floor(dim * n).astype(int)
                for lane_row in strata:
                    assert sorted(lane_row) == list(range(n)), (
                        stream, lane_row)

    def test_2d_elementary_intervals(self):
        """First 16 points hit each cell of the 4x4 grid exactly once
        (the (0,2)-sequence property, preserved by Owen scrambling)."""
        u, v = _draws(16)
        for lu, lv in zip(u, v):
            cells = set(zip(np.floor(lu * 4).astype(int),
                            np.floor(lv * 4).astype(int)))
            assert len(cells) == 16

    def test_streams_and_lanes_decorrelated(self):
        """The index shuffle + per-dim Owen seeds decorrelate streams
        and lanes: sample-aligned correlation stays small."""
        lanes = list(range(512))
        u_a, _ = _draws(8, lanes=lanes, stream=2)
        u_b, _ = _draws(8, lanes=lanes, stream=4)
        u_c, _ = _draws(8, lanes=lanes, bounce=1, stream=2)
        flat_a, flat_b, flat_c = (x.ravel() for x in (u_a, u_b, u_c))
        assert abs(np.corrcoef(flat_a, flat_b)[0, 1]) < 0.05
        assert abs(np.corrcoef(flat_a, flat_c)[0, 1]) < 0.05
        # distinct lanes of the same stream
        assert abs(np.corrcoef(u_a[:-1].ravel(), u_a[1:].ravel())[0, 1]) \
            < 0.05

    def test_uniform_marginals(self):
        u, v = _draws(64, lanes=list(range(256)))
        assert abs(u.mean() - 0.5) < 0.01
        assert abs(v.mean() - 0.5) < 0.01

    def test_variance_beats_pcg_on_smooth_integrand(self):
        """8-sample estimates of E[u*v] = 1/4: the scrambled Sobol pad
        must cut RMS error at least 2x vs independent randoms."""
        lanes = jnp.arange(2048, dtype=jnp.int32)

        def rms(sampler):
            ests = []
            for s in range(8):
                u, v = tbrng.uniform2_soa(lanes, s, 0, 2, 0, sampler)
                ests.append(np.asarray(u) * np.asarray(v))
            est = np.mean(ests, axis=0)
            return float(np.sqrt(np.mean((est - 0.25) ** 2)))

        assert rms("sobol") < 0.5 * rms("pcg")


class TestSobolIntegration:
    @pytest.mark.slow
    def test_lambert_sky_unbiased(self, tmp_path):
        """The analytic zero-variance case must still be exact with the
        sobol sampler (albedo under a unit sky)."""
        from tracerboy_tpu import Renderer

        p = tmp_path / "scene.pbrt"
        p.write_text(textwrap.dedent("""
            LookAt 0 5 0  0 0 0  0 0 1
            Camera "perspective" "float fov" [ 30 ]
            Film "image" "integer xresolution" [ 32 ]
                 "integer yresolution" [ 32 ]
            WorldBegin
            LightSource "infinite" "rgb L" [ 1 1 1 ]
            Material "matte" "rgb Kd" [ 0.3 0.5 0.7 ]
            Shape "trianglemesh" "integer indices" [ 0 1 2 0 2 3 ]
              "point P" [ -50 0 -50  50 0 -50  50 0 50  -50 0 50 ]
            WorldEnd
        """))
        import dataclasses

        r = Renderer(str(p))
        r.settings = dataclasses.replace(
            r.settings,
            performance_settings=dataclasses.replace(
                r.settings.performance_settings, sampler="sobol"))
        r.render_sample(4)
        img = np.asarray(r.resolve_radiance())
        np.testing.assert_allclose(
            img[8:24, 8:24].mean(axis=(0, 1)), [0.3, 0.5, 0.7], atol=0.01)

    def test_matches_pcg_mean_on_cornell(self, tmp_path):
        """Same scene, both samplers, enough spp that the means must
        agree within noise — pins unbiasedness of the swap."""
        import dataclasses

        import conftest as c
        from tracerboy_tpu import Renderer

        path = c.require_scene("cornell-box/scene.pbrt")
        imgs = {}
        for sampler in ("pcg", "sobol"):
            r = Renderer(path, film_size=(32, 32))
            r.settings = dataclasses.replace(
                r.settings,
                performance_settings=dataclasses.replace(
                    r.settings.performance_settings, sampler=sampler))
            r.render_sample(48)
            imgs[sampler] = np.asarray(r.resolve_radiance())
        diff = np.abs(imgs["pcg"] - imgs["sobol"]).mean()
        assert diff < 0.05, diff
