"""Pixel reconstruction filter weights (box / triangle / Gaussian).

The reference evaluates the filter weight at the jittered sample offset and
stores it in the accumulator alpha channel as the sample weight
(TracerBoy/kernel.glsl:1840-1870); display divides RGB by alpha. Same scheme
here: `filter_weight` returns the weight for an AA jitter in [0,1)^2.
"""

from __future__ import annotations

import jax.numpy as jnp

from tracerboy_tpu.utils.config import FilterType


def gaussian(x, mu, sigma):
    a = (x - mu) / sigma
    return jnp.exp(-0.5 * a * a)


def filter_weight(jitter: jnp.ndarray, filter_type: int, filter_width: float = 1.0):
    """Weight for samples jittered by `jitter` in [0,1)^2 about pixel center.

    filter_type is static (python int / FilterType). Matches the reference's
    per-type weights (kernel.glsl:1843-1868).
    """
    offset = jitter - 0.5
    if filter_type == FilterType.TRIANGLE:
        w = jnp.maximum(
            0.5 - jnp.abs(offset[..., 0]), 0.5 - jnp.abs(offset[..., 1])
        )
        return jnp.maximum(w, 0.0)
    if filter_type == FilterType.GAUSSIAN:
        sigma = 0.8
        edge = gaussian(1.0, 0.0, sigma)
        wx = jnp.maximum(0.0, gaussian(offset[..., 0] * 2.0, 0.0, sigma) - edge)
        wy = jnp.maximum(0.0, gaussian(offset[..., 1] * 2.0, 0.0, sigma) - edge)
        return wx * wy
    return jnp.ones(jitter.shape[:-1], jnp.float32)
