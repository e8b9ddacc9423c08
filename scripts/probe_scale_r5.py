"""Round-5: display-space rmse8/vw-van error-scaling law + input-side
decorrelation.

- spp sweep (8/16/32, fresh seeds): how fast does the denoised display
  RMSE fall with spp? Sets the variance-reduction factor any estimator
  lever must deliver to reach the 0.01 gate at 8 spp.
  (gamma22 law was ~spp^-0.26; display may differ.)
- halves: denoise two independent 4-spp means separately and average,
  vs denoising the 8-spp mean — does input-noise decorrelation beat
  output TTA?
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


def main():
    golden_disp = disp(read_exr_rgb(GOLDEN))
    model, variables = load_oidn("/root/reference/TracerBoy/ML/rt_ldr.tza")

    def score(tag, den_lin):
        v = float(np.sqrt(np.mean((disp(den_lin) - golden_disp) ** 2)))
        OUT[tag] = round(v, 5)
        OUT[tag + "_t"] = round(time.time() - T0, 1)
        print(json.dumps(OUT), flush=True)
        with open("/tmp/probe_scale_r5.json", "w") as f:
            json.dump(OUT, f)
        return v

    F4 = [(False, False), (False, True), (True, False), (True, True)]

    def tta(lin, flips=F4):
        outs = []
        for fy, fx in flips:
            x = lin[::-1 if fy else 1, ::-1 if fx else 1]
            y = np.asarray(denoise_image(
                model, variables, jnp.asarray(reinhard_fwd(x))))
            y = reinhard_inv(y)
            outs.append(y[::-1 if fy else 1, ::-1 if fx else 1])
        return np.mean(outs, axis=0)

    # halves first (k=4 program is the cheapest compile): two
    # independent 4-spp means.
    halves = []
    for _ in range(2):
        r = Renderer(SCENE, film_size=FILM)
        r.render_sample(4)
        h1 = np.maximum(np.asarray(r.resolve_radiance()), 0.0)
        halves.append(h1)
        r.render_sample(4)
        halves.append(
            np.maximum(np.asarray(r.resolve_radiance()), 0.0) * 2 - h1)
        break  # one renderer, two cumulative resolves -> two halves
    OUT["halves_trace_t"] = round(time.time() - T0, 1)
    mean8 = 0.5 * (halves[0] + halves[1])
    score("spp8-tta4", tta(mean8))
    score("spp8-halves", 0.5 * (tta(halves[0]) + tta(halves[1])))

    for spp in (16, 32):
        r = Renderer(SCENE, film_size=FILM)
        r.render_sample(spp)
        lin = np.maximum(np.asarray(r.resolve_radiance()), 0.0)
        OUT[f"trace{spp}_t"] = round(time.time() - T0, 1)
        score(f"spp{spp}-tta4", tta(lin))


if __name__ == "__main__":
    main()
