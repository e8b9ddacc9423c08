"""2x super-resolution CNN, loading the reference's weights.bin.

Rebuilds the reference's DirectMLSuperResolution network
(TracerBoy/DirectMLSuperResolution.cpp:300-410): conv1 5x5 3->32, conv2
3x3 32->64, conv3 3x3 64->64, nearest 2x upsample, conv_up1 5x5 64->32,
conv4/conv5 3x3 32->32 (all ReLU-fused with folded BatchNorm
scale/shift), conv6 3x3 32->3 (linear), output = residual + nearest-2x
upsampled input. The weights.bin format (LoadWeights,
DirectMLSuperResolution.cpp:93-145) is: int32 count, then per tensor
{u32 name_len, name, u32 float_count, float32 data}.
"""

from __future__ import annotations

import struct

import jax
import jax.numpy as jnp
import numpy as np

_LAYERS = (
    # (name, kernel, in, out, relu, upsample_before)
    ("conv1", 5, 3, 32, True, False),
    ("conv2", 3, 32, 64, True, False),
    ("conv3", 3, 64, 64, True, False),
    ("conv_up1/conv", 5, 64, 32, True, True),
    ("conv4", 3, 32, 32, True, False),
    ("conv5", 3, 32, 32, True, False),
    ("conv6", 3, 32, 3, False, False),
)


def read_weights_bin(path: str) -> dict:
    with open(path, "rb") as f:
        data = f.read()
    (count,) = struct.unpack_from("<i", data, 0)
    pos = 4
    out = {}
    for _ in range(count):
        (name_len,) = struct.unpack_from("<I", data, pos)
        pos += 4
        name = data[pos : pos + name_len].decode("ascii")
        pos += name_len
        (w_len,) = struct.unpack_from("<I", data, pos)
        pos += 4
        out[name] = np.frombuffer(data, "<f4", w_len, offset=pos).copy()
        pos += 4 * w_len
    return out


def load_superres(path: str):
    """Returns a params dict keyed by layer name with folded batchnorm."""
    raw = read_weights_bin(path)
    params = {}
    for name, k, cin, cout, relu, _up in _LAYERS:
        w = raw[f"{name}/weights"].reshape(k, k, cin, cout)  # TF HWIO
        scale = raw.get(f"{name}/BatchNorm/scale")
        shift = raw.get(f"{name}/BatchNorm/shift")
        if scale is not None:
            # Fold BN as per-channel scale/shift after the conv.
            w = w * scale[None, None, None, :]
            b = shift
        else:
            b = np.zeros(cout, np.float32)
        params[name] = (jnp.asarray(w), jnp.asarray(b))
    return params


@jax.jit
def upscale2x(params: dict, image: jnp.ndarray) -> jnp.ndarray:
    """2x super-resolve an (H, W, 3) image in [0, 1]."""
    x = image[None].astype(jnp.bfloat16)

    def conv(x, name, k, relu):
        w, b = params[name]
        y = jax.lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + b
        y = y.astype(jnp.bfloat16)
        return jnp.maximum(y, 0) if relu else y

    def up2(y):
        H, W = y.shape[1], y.shape[2]
        return jax.image.resize(
            y, (y.shape[0], H * 2, W * 2, y.shape[3]), "nearest"
        )

    y = x
    for name, k, cin, cout, relu, upsample_before in _LAYERS:
        if upsample_before:
            y = up2(y)
        y = conv(y, name, k, relu)

    residual = y.astype(jnp.float32)[0]
    base = up2(x.astype(jnp.float32))[0]
    return jnp.clip(base + residual, 0.0, 1.0)
