"""Round-5 display-space rmse8/vw-van probe.

The config-5 gate now scores in the display pipeline (auto-exposure +
ACES + gamma, bench.bench_oidn_rmse). Baseline there: 0.01251
(reinhard + 2-way flip TTA). Variants measured here, all on the SAME
8-spp trace unless the recipe changes the estimator:

  tta2      reinhard + h-flip TTA           (the shipping recipe)
  tta4      + v-flip and hv-flip passes     (same program, 2 more runs)
  m4-tta4   env_nee_samples=4 trace         (gamma22 winner, -1.8%)
  atrous    0.5*(tta4 + edge-aware a-trous of the raw input)
  oidn2     OIDN applied twice (over-smooth check)

Prints one JSON line.
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


def main():
    golden_disp = disp(read_exr_rgb(GOLDEN))

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

    def trace(recipe=None):
        r = Renderer(SCENE, film_size=FILM)
        if recipe:
            ps = r.settings.performance_settings
            if recipe.get("env_nee_samples"):
                ps = dataclasses.replace(
                    ps, environment_nee_samples=recipe["env_nee_samples"])
            r.settings = dataclasses.replace(
                r.settings, performance_settings=ps)
        if recipe and recipe.get("adaptive") is not None:
            r.render_sample_adaptive(8, exponent=recipe["adaptive"])
        else:
            r.render_sample(8)
        return np.maximum(np.asarray(r.resolve_radiance()), 0.0)

    F2 = [(False, False), (False, True)]
    F4 = F2 + [(True, False), (True, True)]

    lin = trace()
    OUT["trace_t"] = round(time.time() - T0, 1)
    den2 = tta(lin, F2)
    score("tta2", den2)
    den4 = tta(lin, F4)
    score("tta4", den4)

    # Transfer-ensemble: the clip-transfer denoise has a different
    # structured error than the reinhard one (super-white handling);
    # mixing decorrelates at zero extra compile cost.
    den_clip = np.asarray(denoise_image(
        model, variables,
        jnp.asarray(np.clip(lin, 0, 1) ** (1 / 2.2))))
    den_clip = np.clip(den_clip, 0.0, 1.0) ** 2.2
    score("clip-solo", den_clip)
    score("clip-mix25", 0.75 * den4 + 0.25 * den_clip)
    score("clip-mix50", 0.5 * den4 + 0.5 * den_clip)

    # Double OIDN on the tta4 output.
    y = np.asarray(denoise_image(
        model, variables, jnp.asarray(reinhard_fwd(den4))))
    score("oidn2", reinhard_inv(y))

    # m4 estimator recipe (gamma22 winner), then best TTA.
    lin4 = trace(dict(env_nee_samples=4))
    OUT["m4_trace_t"] = round(time.time() - T0, 1)
    score("m4-tta4", tta(lin4, F4))

    print(json.dumps(OUT), flush=True)
    with open("/tmp/probe_disp_r5.json", "w") as f:
        json.dump(OUT, f)


if __name__ == "__main__":
    main()
