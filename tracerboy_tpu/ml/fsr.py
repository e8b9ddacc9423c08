"""FSR1-style spatial upscale: edge-adaptive upsampling + RCAS sharpening.

Vendor-neutral rebuild of the reference's FidelityFX-SR1 pass
(TracerBoy/FidelityFXSuperResolution.cpp + vendored ffx_fsr1.h: EASU
edge-adaptive scaling followed by RCAS robust contrast-adaptive
sharpening). This implementation keeps the two-stage capability with
jnp-native kernels: Catmull-Rom resampling (the same 4x4 support EASU
uses) followed by RCAS's 5-tap adaptive sharpen with its noise-safe
clamp.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _catmull_rom_weights(t):
    t2 = t * t
    t3 = t2 * t
    w0 = -0.5 * t3 + t2 - 0.5 * t
    w1 = 1.5 * t3 - 2.5 * t2 + 1.0
    w2 = -1.5 * t3 + 2.0 * t2 + 0.5 * t
    w3 = 0.5 * t3 - 0.5 * t2
    return w0, w1, w2, w3


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def easu_upscale(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Edge-preserving upsample via separable Catmull-Rom (4x4 support)."""
    H, W = img.shape[:2]
    ys = (jnp.arange(out_h) + 0.5) * (H / out_h) - 0.5
    xs = (jnp.arange(out_w) + 0.5) * (W / out_w) - 0.5
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    ty = ys - y0
    tx = xs - x0

    wy = _catmull_rom_weights(ty)   # each (out_h,)
    wx = _catmull_rom_weights(tx)

    out = jnp.zeros((out_h, out_w, img.shape[2]), jnp.float32)
    for j in range(4):
        yy = jnp.clip(y0 + j - 1, 0, H - 1)
        row_acc = jnp.zeros((out_h, out_w, img.shape[2]), jnp.float32)
        for i in range(4):
            xx = jnp.clip(x0 + i - 1, 0, W - 1)
            row_acc = row_acc + img[yy[:, None], xx[None, :]] * wx[i][None, :, None]
        out = out + row_acc * wy[j][:, None, None]
    return jnp.clip(out, 0.0, None)


@partial(jax.jit, static_argnames=())
def rcas_sharpen(img: jnp.ndarray, sharpness: float = 0.87) -> jnp.ndarray:
    """Robust contrast-adaptive sharpen (the RCAS stage).

    5-tap cross kernel; the negative lobe is limited by the local
    min/max so noise is not amplified, per the published RCAS scheme.
    """
    n = jnp.roll(img, 1, axis=0)
    s = jnp.roll(img, -1, axis=0)
    w = jnp.roll(img, 1, axis=1)
    e = jnp.roll(img, -1, axis=1)

    mn = jnp.minimum(jnp.minimum(jnp.minimum(n, s), jnp.minimum(w, e)), img)
    mx = jnp.maximum(jnp.maximum(jnp.maximum(n, s), jnp.maximum(w, e)), img)
    # Limiter: how much negative lobe the local contrast allows.
    hit_min = mn / jnp.maximum(4.0 * mx, 1e-4)
    hit_max = (1.0 - mx) / jnp.maximum(4.0 * mn - 4.0, -1e4)
    lobe = jnp.maximum(
        -hit_min, jnp.minimum(hit_max, jnp.zeros_like(img))
    )
    lobe = jnp.clip(lobe, -0.1875, 0.0) * sharpness
    denom = 4.0 * lobe + 1.0
    out = (lobe * (n + s + w + e) + img) / jnp.maximum(denom, 1e-4)
    return jnp.clip(out, 0.0, 1.0)


def fsr_upscale(img: jnp.ndarray, scale: float = 2.0,
                sharpness: float = 0.87) -> jnp.ndarray:
    """Full FSR-style chain: EASU upscale then RCAS sharpen."""
    H, W = img.shape[:2]
    up = easu_upscale(img, int(H * scale), int(W * scale))
    return rcas_sharpen(jnp.clip(up, 0.0, 1.0), sharpness)
