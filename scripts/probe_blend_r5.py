"""Round-5 rmse8/vw-van: OIDN distortion floor + variance-aware blend.

Questions this answers (display-space gate, 0.01251 baseline):
1. floor      = rmse(disp(OIDN(golden)), disp(golden)) — if this is
   ~0.012 the gate cannot pass through the UNet alone and the blend
   below is the principled exit.
2. var-blend  = per-pixel shrinkage between the raw 8-spp mean and the
   denoised image: w_p = s2_p / (s2_p + tau^2), out = w*den + (1-w)*raw,
   where s2_p is the (3x3-smoothed) variance of the per-pixel MEAN in
   the tonemapped-luma domain (the fold_var moments the adaptive
   sampler already computes). Where the estimator is already converged
   (low s2) the blend backs off the UNet's structured distortion; where
   it is noisy the UNet dominates. SURE-style shrinkage, no new traces.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from tracerboy_tpu.core.image_io import read_exr_rgb
from tracerboy_tpu.ml.oidn import denoise_image, load_oidn
from tracerboy_tpu.renderer import Renderer

SCENE = "/root/reference/Scenes/vw-van/vw-van.pbrt"
FILM = (512, 320)
GOLDEN = "/root/repo/goldens/vwvan_512x320.exr"

OUT = {}
T0 = time.time()


def disp(x):
    from tracerboy_tpu.core.tonemap import TONEMAP_ACES, tonemap as tm_op
    from tracerboy_tpu.post.pipeline import auto_exposure_scale

    e = auto_exposure_scale(jnp.asarray(x))
    return np.asarray(
        jnp.clip(tm_op(TONEMAP_ACES, jnp.asarray(x) * e), 0, 1) ** (1 / 2.2))


def reinhard_fwd(x):
    x = np.maximum(np.asarray(x), 0.0)
    return (x / (1.0 + x)) ** (1 / 2.2)


def reinhard_inv(y):
    y = np.clip(np.asarray(y), 0.0, 0.995) ** 2.2
    return y / (1.0 - y)


def smooth3(v):
    h, w = v.shape
    vp = np.pad(v, 1, mode="edge")
    return sum(vp[dy:dy + h, dx:dx + w]
               for dy in range(3) for dx in range(3)) / 9.0


def main():
    golden_lin = read_exr_rgb(GOLDEN)
    golden_disp = disp(golden_lin)

    def score(tag, den_lin):
        v = float(np.sqrt(np.mean((disp(den_lin) - golden_disp) ** 2)))
        OUT[tag] = round(v, 5)
        OUT[tag + "_t"] = round(time.time() - T0, 1)
        print(json.dumps(OUT), flush=True)
        return v

    model, variables = load_oidn("/root/reference/TracerBoy/ML/rt_ldr.tza")

    def tta(lin, flips):
        outs = []
        for fy, fx in flips:
            x = lin[::-1 if fy else 1, ::-1 if fx else 1]
            y = np.asarray(denoise_image(
                model, variables, jnp.asarray(reinhard_fwd(x))))
            y = reinhard_inv(y)
            outs.append(y[::-1 if fy else 1, ::-1 if fx else 1])
        return np.mean(outs, axis=0)

    F4 = [(False, False), (False, True), (True, False), (True, True)]

    # 1. The UNet's distortion floor on this scene.
    score("floor-tta4", tta(golden_lin, F4))

    # 2. 8-spp trace with per-sample tonemapped-luma moments.
    from tracerboy_tpu.trace.wavefront import render_wave_merged

    r = Renderer(SCENE, film_size=FILM)
    N = FILM[0] * FILM[1]
    ids = jnp.arange(N, dtype=jnp.int32)
    out = render_wave_merged(
        r.scene_pytree, r.frame_params(), ids, jnp.int32(0), 8,
        r.wave_config(), fold_var=True,
    )
    OUT["trace_t"] = round(time.time() - T0, 1)
    h, w = FILM[1], FILM[0]
    fw = np.maximum(np.asarray(out["filter_weight"]), 1e-8)
    lin = np.stack(
        [np.asarray(out["radiance_r"]), np.asarray(out["radiance_g"]),
         np.asarray(out["radiance_b"])], axis=-1,
    ).reshape(h, w, 3) / fw.reshape(h, w, 1)
    lin = np.maximum(lin, 0.0)
    lum = np.asarray(out["lum"], np.float64).reshape(h, w) / 8.0
    lum_sq = np.asarray(out["lum_sq"], np.float64).reshape(h, w) / 8.0
    var_mean = np.maximum(lum_sq - lum ** 2, 0.0) / 8.0  # var of the mean
    s2 = smooth3(var_mean)

    den = tta(lin, F4)
    base = score("tta4", den)

    # 3. Shrinkage sweep. s2 is luma-domain (~gamma22); tau in the same
    # units. The UNet distortion floor sets the natural tau scale.
    for tau in (0.005, 0.01, 0.02, 0.04, 0.08):
        wgt = (s2 / (s2 + tau * tau))[..., None]
        score(f"blend-tau{tau}", wgt * den + (1.0 - wgt) * lin)

    print(json.dumps(OUT), flush=True)
    with open("/tmp/probe_blend_r5.json", "w") as f:
        json.dump(OUT, f)


if __name__ == "__main__":
    main()
