"""Round-5 go/no-go: tent-splat reconstruction on the rmse8/vw-van gate.

The converged splat render equals the converged box render convolved
with the tent (tent = box*box), so a [1/4, 1/2, 1/4] separable
convolution of the existing 8192-spp box golden is a close proxy target
while the true splat golden renders. Scores (display space):

  box-tta4 / golden       the shipping number (0.01243 baseline)
  splat-tta4 / golden~    splat render vs convolved-golden proxy
  splat-raw / golden~     undenoised splat render (input-noise check)
  box-raw / golden        undenoised box render
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
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


def conv_tent(img):
    """Separable [1/4, 1/2, 1/4] — discrete proxy for box->tent."""
    k = np.array([0.25, 0.5, 0.25])
    p = np.pad(img, ((1, 1), (0, 0), (0, 0)), mode="edge")
    out = (p[:-2] * k[0] + p[1:-1] * k[1] + p[2:] * k[2])
    p = np.pad(out, ((0, 0), (1, 1), (0, 0)), mode="edge")
    return p[:, :-2] * k[0] + p[:, 1:-1] * k[1] + p[:, 2:] * k[2]


def main():
    golden_lin = read_exr_rgb(GOLDEN)
    model, variables = load_oidn("/root/reference/TracerBoy/ML/rt_ldr.tza")
    F4 = [(False, False), (False, True), (True, False), (True, True)]

    def tta(lin):
        outs = []
        for fy, fx in F4:
            x = lin[::-1 if fy else 1, ::-1 if fx else 1]
            y = np.asarray(denoise_image(
                model, variables, jnp.asarray(reinhard_fwd(x))))
            y = reinhard_inv(y)
            outs.append(y[::-1 if fy else 1, ::-1 if fx else 1])
        return np.mean(outs, axis=0)

    def score(tag, den_lin, gold_lin):
        g = disp(gold_lin)
        v = float(np.sqrt(np.mean((disp(den_lin) - g) ** 2)))
        OUT[tag] = round(v, 5)
        OUT[tag + "_t"] = round(time.time() - T0, 1)
        print(json.dumps(OUT), flush=True)
        with open("/tmp/probe_splat_r5.json", "w") as f:
            json.dump(OUT, f)
        return v

    def trace(splat):
        r = Renderer(SCENE, film_size=FILM)
        if splat:
            cam = dataclasses.replace(
                r.settings.camera_settings, filter_splat=True)
            r.settings = dataclasses.replace(
                r.settings, camera_settings=cam)
            assert r.wave_config().filter_splat
        r.render_sample(8)
        return np.maximum(np.asarray(r.resolve_radiance()), 0.0)

    if not os.environ.get("TB_SKIP_BOX"):
        box = trace(False)
        OUT["box_trace_t"] = round(time.time() - T0, 1)
        score("box-raw", box, golden_lin)
        score("box-tta4", tta(box), golden_lin)

    gold_c = conv_tent(golden_lin)
    sp = trace(True)
    OUT["splat_trace_t"] = round(time.time() - T0, 1)
    score("splat-raw", sp, gold_c)
    score("splat-tta4", tta(sp), gold_c)
    # Cross-checks: splat vs the raw golden (upper bound incl. the
    # reconstruction difference) and box vs convolved (sanity).
    score("splat-tta4-vs-rawgold", tta(sp), golden_lin)


if __name__ == "__main__":
    main()
