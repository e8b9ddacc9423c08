"""Round-5 rmse8/vw-van: split-plane denoising (WaveConfig.split_early).

One 8-spp trace emits (total, early) planes; late = total - early
exactly. 63% of the gate variance lives at bounce<=1
(probe_var_components_r5), and the early plane is 'albedo texture x
smooth occlusion' — structurally the image class OIDN is best at —
while the late plane is low-magnitude interior bounce light. Denoise
the planes separately (reinhard transfer + 4-flip TTA each), sum, and
score against the box golden in display space:

  tta4           single-plane baseline       (0.01243 round-5)
  split-sum      den(early) + den(late)
  split-late     den(early) + RAW late       (is late noise material?)
  early-raw      RAW early + den(late)       (sanity: early noise share)

Saves all planes to /tmp/vwvan_split.npz so recombination reruns are
CPU-only.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import json
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

SCENE = "/root/reference/Scenes/vw-van/vw-van.pbrt"
FILM = (512, 320)
GOLDEN = "/root/repo/goldens/vwvan_512x320.exr"
PLANES = "/tmp/vwvan_split.npz"

OUT = {}
T0 = time.time()


def disp(x):
    from tracerboy_tpu.core.tonemap import TONEMAP_ACES, tonemap as tm
    from tracerboy_tpu.post.pipeline import auto_exposure_scale

    e = auto_exposure_scale(jnp.asarray(x))
    return np.asarray(
        jnp.clip(tm(TONEMAP_ACES, jnp.asarray(x) * e), 0, 1) ** (1 / 2.2))


def rein_f(x):
    x = np.maximum(np.asarray(x), 0.0)
    return (x / (1.0 + x)) ** (1 / 2.2)


def rein_i(y):
    y = np.clip(np.asarray(y), 0.0, 0.995) ** 2.2
    return y / (1.0 - y)


def trace_planes():
    from tracerboy_tpu.renderer import Renderer
    from tracerboy_tpu.trace.wavefront import (
        make_blue_noise_params, render_wave_merged,
    )

    r = Renderer(SCENE, film_size=FILM)
    cfg = dataclasses.replace(
        r.wave_config(), want_aovs=False, split_early=1)
    W, H = FILM
    ids = jnp.arange(W * H, dtype=jnp.int32)
    params = dict(r.frame_params())
    params["seed"] = jnp.int32(0)
    params["bn"] = make_blue_noise_params(r.scene_pytree, ids, W)
    step = jax.jit(partial(render_wave_merged, k=8, cfg=cfg))
    out = step(r.scene_pytree, params, ids, jnp.int32(0))
    fw = np.maximum(np.asarray(out["filter_weight"]), 1e-8)

    def img(pre):
        return np.stack(
            [np.asarray(out[pre + c]) / fw for c in ("r", "g", "b")],
            axis=-1).reshape(H, W, 3)

    total = np.maximum(img("radiance_"), 0.0)
    early = np.clip(img("radiance_early_"), 0.0, None)
    return total, early


def main():
    from tracerboy_tpu.core.image_io import read_exr_rgb
    from tracerboy_tpu.ml.oidn import denoise_image, load_oidn

    golden_disp = disp(read_exr_rgb(GOLDEN))

    if os.path.exists(PLANES):
        z = np.load(PLANES)
        total, early = z["total"], z["early"]
    else:
        total, early = trace_planes()
        np.savez(PLANES, total=total, early=early)
        OUT["trace_t"] = round(time.time() - T0, 1)
    late = np.maximum(total - early, 0.0)

    model, variables = load_oidn("/root/reference/TracerBoy/ML/rt_ldr.tza")

    def tta4(lin):
        outs = []
        for fy, fx in ((False, False), (False, True), (True, False),
                       (True, True)):
            x = lin[::-1 if fy else 1, ::-1 if fx else 1]
            y = np.asarray(denoise_image(
                model, variables, jnp.asarray(rein_f(x))))
            y = rein_i(y)
            outs.append(y[::-1 if fy else 1, ::-1 if fx else 1])
        return np.mean(outs, axis=0)

    def score(tag, img):
        v = float(np.sqrt(np.mean((disp(img) - golden_disp) ** 2)))
        OUT[tag] = round(v, 5)
        OUT[tag + "_t"] = round(time.time() - T0, 1)
        print(json.dumps(OUT), flush=True)
        with open("/tmp/probe_split_r5.json", "w") as f:
            json.dump(OUT, f)

    den_total = tta4(total)
    score("tta4", den_total)
    den_early = tta4(early)
    den_late = tta4(late)
    score("split-sum", den_early + den_late)
    score("split-late", den_early + late)
    score("early-raw", early + den_late)
    # blend: average the one-plane and two-plane estimates (their
    # structured errors are partially independent)
    score("split-blend50", 0.5 * den_total + 0.5 * (den_early + den_late))


if __name__ == "__main__":
    main()
