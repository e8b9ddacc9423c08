"""Edge-avoiding a-trous wavelet denoiser (SVGF-style).

Rebuilds DenoiserCS.hlsl: 5x5 B3-spline kernel with dilation
OffsetMultiplier = 2^i per iteration (DenoiserPass.cpp:61-93 ping-pong),
weights = luma (variance-normalized, DenoiserCS.hlsl:33-35) x normal^exp
(37-39) x world-position distance (41-44), variance propagated with w^2
(145-152). The jnp formulation expresses the 25 dilated taps as jnp.roll
shifts, fully vectorized over the image.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tracerboy_tpu.core.mathutil import luminance

EPSILON = 1e-4
_KERNEL_1D = (1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)


@partial(jax.jit, static_argnames=("step",))
def atrous_iteration(
    color_var,        # (H, W, 4) color + luminance variance in alpha
    undenoised,       # (H, W, 3) original noisy frame (luma reference)
    normals,          # (H, W, 3)
    positions,        # (H, W, 4) world pos + neighbor distance
    step: int,        # dilation (1, 2, 4, ...)
    luma_weight_mult=4.0,
    normal_exp=128.0,
    position_weight_mult=1.0,
):
    H, W = color_var.shape[:2]
    center_luma = luminance(undenoised)
    center_var_sqrt = jnp.sqrt(jnp.maximum(color_var[..., 3], 0.0))
    center_n = normals
    center_p = positions[..., :3]
    neighbor_dist = positions[..., 3]
    valid = jnp.any(normals != 0.0, axis=-1)

    acc_color = jnp.zeros((H, W, 3), jnp.float32)
    acc_var = jnp.zeros((H, W), jnp.float32)
    acc_w = jnp.zeros((H, W), jnp.float32)

    for oy in range(-2, 3):
        for ox in range(-2, 3):
            # Neighbor at (y + oy*step, x + ox*step) => roll by the negative.
            shift = (-oy * step, -ox * step)
            q_cv = jnp.roll(color_var, shift, axis=(0, 1))
            q_luma = jnp.roll(center_luma, shift, axis=(0, 1))
            q_n = jnp.roll(center_n, shift, axis=(0, 1))
            q_p = jnp.roll(center_p, shift, axis=(0, 1))

            luma_w = jnp.exp(
                -jnp.abs(q_luma - center_luma)
                / jnp.maximum(luma_weight_mult * center_var_sqrt, EPSILON)
            )
            normal_w = jnp.power(
                jnp.maximum(0.0, jnp.sum(center_n * q_n, axis=-1)),
                normal_exp,
            )
            dist = jnp.linalg.norm(q_p - center_p, axis=-1)
            # offset-scaled tolerance (DenoiserCS.hlsl:41-44)
            off_mag = jnp.abs(ox * step) + jnp.abs(oy * step)
            pos_w = jnp.exp(
                -dist / (position_weight_mult * off_mag * neighbor_dist
                         + EPSILON)
            )
            w = (
                luma_w * normal_w * pos_w
                * _KERNEL_1D[ox + 2] * _KERNEL_1D[oy + 2]
            )
            # Clamp out-of-image taps (roll wraps; suppress wrapped taps).
            yy = jnp.arange(H)[:, None] + oy * step
            xx = jnp.arange(W)[None, :] + ox * step
            inside = (
                (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
            ).astype(jnp.float32)
            w = w * inside

            acc_color = acc_color + q_cv[..., :3] * w[..., None]
            acc_var = acc_var + q_cv[..., 3] * w * w
            acc_w = acc_w + w

    out_color = acc_color / jnp.maximum(acc_w, 1e-8)[..., None]
    out_var = acc_var / jnp.maximum(acc_w * acc_w, 1e-8)
    out = jnp.concatenate([out_color, out_var[..., None]], axis=-1)
    # Pixels with no geometry pass through untouched.
    return jnp.where(valid[..., None], out, color_var)


def denoise(color_var, undenoised, normals, positions, iterations: int = 4,
            **weights):
    """N a-trous iterations with doubling dilation (DenoiserPass.cpp:61-93)."""
    out = color_var
    for i in range(iterations):
        out = atrous_iteration(
            out, undenoised, normals, positions, step=2**i, **weights
        )
    return out
