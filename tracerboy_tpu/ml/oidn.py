"""OIDN-style UNet denoiser in Flax, loading the reference's .tza weights.

The TPU-native rebuild of the reference's from-scratch DirectML port of
Open Image Denoise (TracerBoy/OpenImageDenoise.cpp:855-1000: the
enc_conv0..enc_conv5b / dec_conv4a..dec_conv0 topology of 16 conv + 4
maxpool + 4 nearest-upsample + 4 concat joins, ReLU, fp16 NHWC). Here the
graph is a Flax module in NHWC bfloat16 whose convolutions land on the
MXU; weights come straight from the shipped rt_ldr / rt_ldr_alb_nrm
archives via the tza parser.

Inputs: color (+ albedo + normal for the _alb_nrm variant), HWC in [0,1]
after tonemapping; spatial dims must be multiples of 16 (the reference
enforces the same, WinMain.cpp:212-214) — `denoise_image` pads
reflectively and crops back.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ALIGNMENT = 16


class OIDNUNet(nn.Module):
    """The OIDN `rt` UNet graph."""

    in_channels: int = 9
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        conv = lambda ch, name: nn.Conv(
            ch, (3, 3), padding="SAME", name=name, dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        pool = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))

        def up(y):
            H, W = y.shape[-3], y.shape[-2]
            return jax.image.resize(
                y, y.shape[:-3] + (H * 2, W * 2, y.shape[-1]), "nearest"
            )

        relu = nn.relu
        inp = x.astype(self.dtype)

        x0 = relu(conv(32, "enc_conv0")(inp))
        x1 = relu(conv(32, "enc_conv1")(x0))
        p1 = pool(x1)
        x2 = relu(conv(48, "enc_conv2")(p1))
        p2 = pool(x2)
        x3 = relu(conv(64, "enc_conv3")(p2))
        p3 = pool(x3)
        x4 = relu(conv(80, "enc_conv4")(p3))
        p4 = pool(x4)
        x5 = relu(conv(96, "enc_conv5a")(p4))
        x5 = relu(conv(96, "enc_conv5b")(x5))

        u4 = jnp.concatenate([up(x5), p3], axis=-1)        # 96 + 64
        d4 = relu(conv(112, "dec_conv4a")(u4))
        d4 = relu(conv(112, "dec_conv4b")(d4))
        u3 = jnp.concatenate([up(d4), p2], axis=-1)        # 112 + 48
        d3 = relu(conv(96, "dec_conv3a")(u3))
        d3 = relu(conv(96, "dec_conv3b")(d3))
        u2 = jnp.concatenate([up(d3), p1], axis=-1)        # 96 + 32
        d2 = relu(conv(64, "dec_conv2a")(u2))
        d2 = relu(conv(64, "dec_conv2b")(d2))
        u1 = jnp.concatenate([up(d2), inp], axis=-1)       # 64 + in
        d1 = relu(conv(64, "dec_conv1a")(u1))
        d1 = relu(conv(32, "dec_conv1b")(d1))
        out = conv(3, "dec_conv0")(d1)
        return out.astype(jnp.float32)


def params_from_tza(tza: dict) -> dict:
    """Map tza tensors {name.weight oihw, name.bias} to Flax params
    (HWIO kernels), mirroring the reference's oihw->NHWC conversion
    (OpenImageDenoise.cpp:2072-2120)."""
    params = {}
    names = sorted({k.rsplit(".", 1)[0] for k in tza})
    for name in names:
        w, layout = tza[f"{name}.weight"]
        assert layout == "oihw", layout
        kernel = np.transpose(w, (2, 3, 1, 0))  # oihw -> hwio
        bias = tza[f"{name}.bias"][0]
        params[name] = {"kernel": jnp.asarray(kernel),
                        "bias": jnp.asarray(bias)}
    return {"params": params}


def load_oidn(path: str):
    """Returns (module, variables) for a .tza weight archive."""
    from tracerboy_tpu.ml.tza import read_tza

    tza = read_tza(path)
    in_ch = tza["enc_conv0.weight"][0].shape[1]
    model = OIDNUNet(in_channels=in_ch)
    return model, params_from_tza(tza)


def denoise_image(model, variables, color, albedo=None, normal=None):
    """Denoise an (H, W, 3) LDR color image (+ optional aux features).

    Pads H/W up to multiples of 16 with reflection and crops the result
    (the reference instead constrains the window size).
    """
    feats = [color]
    if model.in_channels >= 9:
        feats.append(
            albedo if albedo is not None else jnp.zeros_like(color)
        )
        feats.append(
            normal if normal is not None else jnp.zeros_like(color)
        )
    x = jnp.concatenate(feats, axis=-1)
    H, W = x.shape[:2]
    ph = (-H) % ALIGNMENT
    pw = (-W) % ALIGNMENT
    x = jnp.pad(x, ((0, ph), (0, pw), (0, 0)), mode="reflect")
    out = model.apply(variables, x[None])[0]
    return jnp.clip(out[:H, :W], 0.0, None)
