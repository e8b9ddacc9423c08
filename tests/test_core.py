"""Unit tests for tracerboy_tpu.core: math, rng, tonemap, filters, image io."""

import numpy as np
import jax.numpy as jnp
import pytest

from tracerboy_tpu.core import mathutil as mu
from tracerboy_tpu.core import rng as tbrng
from tracerboy_tpu.core import tonemap as tm
from tracerboy_tpu.core import filters, image_io
from tracerboy_tpu.utils.config import FilterType


class TestMath:
    def test_normalize(self):
        v = jnp.array([[3.0, 0.0, 4.0], [0.0, 2.0, 0.0]])
        n = mu.normalize(v)
        np.testing.assert_allclose(mu.length(n), [1.0, 1.0], atol=1e-5)

    def test_reflect(self):
        d = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2)
        n = jnp.array([[0.0, 1.0, 0.0]])
        r = mu.reflect(d, n)
        np.testing.assert_allclose(r, [[1 / np.sqrt(2), 1 / np.sqrt(2), 0.0]], atol=1e-6)

    def test_refract_straight_through(self):
        d = jnp.array([[0.0, -1.0, 0.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])
        out, tir = mu.refract_dir(d, n, jnp.array([1.0]))
        assert not bool(tir[0])
        np.testing.assert_allclose(out, d, atol=1e-6)

    def test_refract_snell(self):
        # 45 degrees into glass (n=1.5): sin(t) = sin(45)/1.5
        theta_i = np.deg2rad(45.0)
        d = jnp.array([[np.sin(theta_i), -np.cos(theta_i), 0.0]], jnp.float32)
        n = jnp.array([[0.0, 1.0, 0.0]])
        out, tir = mu.refract_dir(d, n, jnp.array([1.0 / 1.5]))
        assert not bool(tir[0])
        sin_t = float(out[0, 0])
        np.testing.assert_allclose(sin_t, np.sin(theta_i) / 1.5, atol=1e-5)

    def test_total_internal_reflection(self):
        # From glass to air beyond critical angle
        theta_i = np.deg2rad(60.0)
        d = jnp.array([[np.sin(theta_i), -np.cos(theta_i), 0.0]], jnp.float32)
        n = jnp.array([[0.0, 1.0, 0.0]])
        out, tir = mu.refract_dir(d, n, jnp.array([1.5]))
        assert bool(tir[0])

    def test_orthonormal_basis(self):
        normals = mu.normalize(jnp.array(np.random.default_rng(0).normal(size=(64, 3)), jnp.float32))
        t, b = mu.orthonormal_basis(normals)
        np.testing.assert_allclose(mu.dot(t, normals), 0.0, atol=1e-5)
        np.testing.assert_allclose(mu.dot(b, normals), 0.0, atol=1e-5)
        np.testing.assert_allclose(mu.length(t), 1.0, atol=1e-4)
        np.testing.assert_allclose(mu.length(b), 1.0, atol=1e-4)

    def test_reorient_preserves_up(self):
        normals = mu.normalize(jnp.array(np.random.default_rng(1).normal(size=(16, 3)), jnp.float32))
        local_up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (16, 3))
        world = mu.reorient_around_normal(local_up, normals)
        np.testing.assert_allclose(world, normals, atol=1e-5)


class TestRng:
    def test_uniform_range_and_determinism(self):
        lanes = jnp.arange(4096)
        u1 = tbrng.uniform(lanes, 3, 1, tbrng.STREAM_RUSSIAN_ROULETTE)
        u2 = tbrng.uniform(lanes, 3, 1, tbrng.STREAM_RUSSIAN_ROULETTE)
        np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
        assert float(jnp.min(u1)) >= 0.0 and float(jnp.max(u1)) < 1.0
        # roughly uniform
        assert abs(float(jnp.mean(u1)) - 0.5) < 0.02

    def test_streams_decorrelated(self):
        lanes = jnp.arange(8192)
        a = np.asarray(tbrng.uniform(lanes, 0, 0, 0))
        b = np.asarray(tbrng.uniform(lanes, 0, 0, 1))
        corr = np.corrcoef(a, b)[0, 1]
        assert abs(corr) < 0.05

    def test_halton_base2(self):
        i = jnp.array([1, 2, 3, 4, 5, 6, 7])
        expected = [0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875]
        np.testing.assert_allclose(np.asarray(tbrng.halton(2, i)), expected, atol=1e-6)

    def test_halton_base3(self):
        i = jnp.array([1, 2, 3, 4])
        expected = [1 / 3, 2 / 3, 1 / 9, 4 / 9]
        np.testing.assert_allclose(np.asarray(tbrng.halton(3, i)), expected, atol=1e-5)

    def test_lds_rotation_wraps(self):
        noise = jnp.array([[0.9, 0.9]])
        out = tbrng.apply_lds_rotation(noise, 1)  # halton23(1) = (0.5, 1/3)
        np.testing.assert_allclose(np.asarray(out), [[0.4, 0.9 + 1 / 3 - 1]], atol=1e-5)


class TestTonemap:
    @pytest.mark.parametrize("op", range(tm.NUM_TONEMAPPERS))
    def test_black_maps_to_black(self, op):
        out = tm.tonemap(op, jnp.zeros((4, 3)))
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=2e-2)

    @pytest.mark.parametrize("op", range(tm.NUM_TONEMAPPERS))
    def test_monotonic_and_bounded(self, op):
        greys = jnp.linspace(0.0, 20.0, 64)[:, None] * jnp.ones((1, 3))
        out = np.asarray(tm.tonemap(op, greys))[:, 0]
        assert np.all(np.diff(out) >= -1e-3), f"operator {op} not monotonic"
        assert out.max() <= 1.2, f"operator {op} exceeded display range"

    def test_reinhard_known_value(self):
        out = tm.tonemap(tm.TONEMAP_REINHARD, jnp.array([[1.0, 3.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(out), [[0.5, 0.75, 0.0]], atol=1e-6)

    def test_gamma_roundtrip(self):
        c = jnp.array([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(
            np.asarray(tm.gamma_to_linear(tm.gamma_correct(c))), np.asarray(c), atol=1e-5
        )


class TestFilters:
    def test_box_is_one(self):
        j = jnp.array([[0.1, 0.9], [0.5, 0.5]])
        np.testing.assert_allclose(
            np.asarray(filters.filter_weight(j, FilterType.BOX)), 1.0
        )

    def test_triangle_peak_at_center(self):
        center = filters.filter_weight(jnp.array([[0.5, 0.5]]), FilterType.TRIANGLE)
        edge = filters.filter_weight(jnp.array([[0.0, 0.0]]), FilterType.TRIANGLE)
        assert float(center[0]) == pytest.approx(0.5)
        assert float(edge[0]) == pytest.approx(0.0)

    def test_gaussian_positive_at_center(self):
        # Center weight is (1 - G(1))^2 ~= 0.29 with sigma=0.8 (the
        # reference subtracts the edge value, kernel.glsl:1852-1859).
        center = filters.filter_weight(jnp.array([[0.5, 0.5]]), FilterType.GAUSSIAN)
        edge = filters.filter_weight(jnp.array([[0.0, 0.0]]), FilterType.GAUSSIAN)
        assert float(center[0]) > 0.25
        assert float(edge[0]) == pytest.approx(0.0, abs=1e-6)


class TestImageIO:
    def test_png_roundtrip(self, tmp_path):
        img = np.random.default_rng(0).random((16, 24, 3)).astype(np.float32)
        p = str(tmp_path / "t.png")
        image_io.write_png(p, img)
        back = image_io.read_ldr(p)
        np.testing.assert_allclose(back, img, atol=1 / 255.0 + 1e-6)

    def test_hdr_roundtrip(self, tmp_path):
        img = (np.random.default_rng(1).random((8, 12, 3)) * 100.0).astype(np.float32)
        p = str(tmp_path / "t.hdr")
        image_io.write_hdr(p, img)
        back = image_io.read_hdr(p)
        # RGBE shares one exponent across channels: error is relative to the
        # per-pixel max channel, not per-channel.
        bound = img.max(axis=-1, keepdims=True) / 256.0 + 1e-3
        assert np.all(np.abs(back - img) <= bound)

    def test_pfm_roundtrip(self, tmp_path):
        img = np.random.default_rng(2).normal(size=(6, 9, 3)).astype(np.float32)
        p = str(tmp_path / "t.pfm")
        image_io.write_pfm(p, img)
        back = image_io.read_pfm(p)
        np.testing.assert_allclose(back, img, atol=1e-6)

    def test_exr_roundtrip_zip(self, tmp_path):
        img = (np.random.default_rng(3).random((20, 33, 3)) * 4.0).astype(np.float32)
        p = str(tmp_path / "t.exr")
        image_io.write_exr(p, img)
        back = image_io.read_exr_rgb(p)
        np.testing.assert_allclose(back, img, rtol=2e-3, atol=2e-3)  # half precision

    def test_exr_roundtrip_uncompressed(self, tmp_path):
        img = (np.random.default_rng(4).random((5, 7, 3))).astype(np.float32)
        p = str(tmp_path / "u.exr")
        image_io.write_exr(p, img, compress=False)
        back = image_io.read_exr_rgb(p)
        np.testing.assert_allclose(back, img, rtol=2e-3, atol=2e-3)

    def test_reference_envmap_hdr_loads(self):
        import os
        path = "/root/reference/Scenes/Teapot/textures/envmap.hdr"
        if not os.path.exists(path):
            pytest.skip("reference envmap not present")
        img = image_io.read_hdr(path)
        assert img.ndim == 3 and img.shape[2] == 3
        assert img.shape[0] > 100 and img.shape[1] > 100
        assert np.all(np.isfinite(img)) and img.max() > 1.0  # HDR content
