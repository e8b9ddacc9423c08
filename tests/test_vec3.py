"""SoA vector algebra consistency vs the (N, 3) mathutil reference."""

import numpy as np
import jax.numpy as jnp

from tracerboy_tpu.core import mathutil as mu
from tracerboy_tpu.core import vec3 as v3


def pair(rng, n=256):
    a = rng.normal(size=(n, 3)).astype(np.float32)
    b = rng.normal(size=(n, 3)).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(b)


def test_dot_cross_normalize(rng):
    a, b = pair(rng)
    av, bv = v3.from_rows(a), v3.from_rows(b)
    np.testing.assert_allclose(
        np.asarray(v3.dot(av, bv)), np.asarray(mu.dot(a, b)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(v3.to_rows(v3.cross(av, bv))),
        np.asarray(mu.cross(a, b)), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(v3.to_rows(v3.normalize(av))),
        np.asarray(mu.normalize(a)), rtol=1e-5, atol=1e-6,
    )


def test_reflect_and_reorient(rng):
    a, b = pair(rng)
    n = mu.normalize(b)
    nv = v3.normalize(v3.from_rows(b))
    np.testing.assert_allclose(
        np.asarray(v3.to_rows(v3.reflect(v3.from_rows(a), nv))),
        np.asarray(mu.reflect(a, n)), rtol=1e-4, atol=1e-5,
    )
    local = mu.normalize(a)
    np.testing.assert_allclose(
        np.asarray(v3.to_rows(v3.reorient(v3.from_rows(local), nv))),
        np.asarray(mu.reorient_around_normal(local, n)),
        rtol=1e-4, atol=1e-5,
    )


def test_rng_soa_matches_stacked(rng):
    from tracerboy_tpu.core import rng as tbrng

    lanes = jnp.arange(4096)
    u2 = tbrng.uniform2(lanes, 5, 2, 7)
    ua, ub = tbrng.uniform2_soa(lanes, 5, 2, 7)
    np.testing.assert_array_equal(np.asarray(u2[:, 0]), np.asarray(ua))
    np.testing.assert_array_equal(np.asarray(u2[:, 1]), np.asarray(ub))


def test_arithmetic_ops(rng):
    a, b = pair(rng)
    av, bv = v3.from_rows(a), v3.from_rows(b)
    np.testing.assert_allclose(
        np.asarray(v3.to_rows(av + bv * 2.0 - av / 4.0)),
        np.asarray(a + b * 2.0 - a / 4.0), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(v3.to_rows(-av)), np.asarray(-a)
    )
    np.testing.assert_allclose(
        np.asarray(v3.max_c(av)), np.asarray(a.max(axis=1)), rtol=1e-6
    )
