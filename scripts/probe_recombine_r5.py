"""Round-5 rmse8/vw-van recombination sweep.

The splat lever measured a no-go (probe_splat_r5.py); this probe works
the remaining denoiser-ensemble levers on ONE saved 8-spp trace:

  tta4        4 flip combos, mean            (baseline: 0.01243)
  tta8        dihedral group: 4 flips x transpose (rot90 members)
  tta4-med    median instead of mean over the 4 flips
  mix25/50    blend the clip-transfer output into the reinhard tta4
  polish      1 gentle a-trous iteration on the tta4 output

The raw trace is cached at /tmp/vwvan_8spp.npy so CPU-side reruns skip
the TPU render entirely (TB_TRACE_ONLY=1 exits after saving it).
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

SCENE = "/root/reference/Scenes/vw-van/vw-van.pbrt"
FILM = (512, 320)
GOLDEN = "/root/repo/goldens/vwvan_512x320.exr"
TRACE = os.environ.get("TB_TRACE_PATH", "/tmp/vwvan_8spp.npy")

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


def main():
    from tracerboy_tpu.core.image_io import read_exr_rgb

    golden_disp = disp(read_exr_rgb(GOLDEN))

    if os.path.exists(TRACE):
        lin = np.load(TRACE)
    elif os.path.exists("/tmp/vwvan_split.npz"):
        # reuse the split probe's trace (same seed-0 8-spp config)
        lin = np.load("/tmp/vwvan_split.npz")["total"]
    else:
        from tracerboy_tpu.renderer import Renderer

        r = Renderer(SCENE, film_size=FILM)
        r.render_sample(8)
        lin = np.maximum(np.asarray(r.resolve_radiance()), 0.0)
        np.save(TRACE, lin)
        OUT["trace_t"] = round(time.time() - T0, 1)
    if os.environ.get("TB_TRACE_ONLY"):
        print("trace saved", TRACE)
        return

    from tracerboy_tpu.ml.oidn import denoise_image, load_oidn

    model, variables = load_oidn("/root/reference/TracerBoy/ML/rt_ldr.tza")

    def den(x):
        return rein_i(np.asarray(denoise_image(
            model, variables, jnp.asarray(rein_f(x)))))

    def score(tag, img):
        v = float(np.sqrt(np.mean((disp(img) - golden_disp) ** 2)))
        OUT[tag] = round(v, 5)
        OUT[tag + "_t"] = round(time.time() - T0, 1)
        print(json.dumps(OUT), flush=True)
        with open("/tmp/probe_recombine_r5.json", "w") as f:
            json.dump(OUT, f)

    # flips (same XLA shape => one compile)
    flips = []
    for fy, fx in ((False, False), (False, True), (True, False),
                   (True, True)):
        x = lin[::-1 if fy else 1, ::-1 if fx else 1]
        y = den(x)
        flips.append(y[::-1 if fy else 1, ::-1 if fx else 1])
    flips = np.stack(flips)
    tta4 = flips.mean(axis=0)
    score("tta4", tta4)
    score("tta4-med", np.median(flips, axis=0))

    # transpose members (one extra compile for the WxH shape)
    tposes = []
    for fy, fx in ((False, False), (False, True), (True, False),
                   (True, True)):
        x = lin[::-1 if fy else 1, ::-1 if fx else 1].transpose(1, 0, 2)
        y = den(x).transpose(1, 0, 2)
        tposes.append(y[::-1 if fy else 1, ::-1 if fx else 1])
    tta8 = np.concatenate([flips, np.stack(tposes)]).mean(axis=0)
    score("tta8", tta8)
    score("tta8-med", np.median(
        np.concatenate([flips, np.stack(tposes)]), axis=0))

    # clip-transfer blend (probe_blend measured clip-mix25 0.01232 on
    # the 2-flip pipeline; remeasure against tta4/tta8)
    from tracerboy_tpu.ml.oidn import denoise_image as di

    clip = np.asarray(di(model, variables, jnp.asarray(
        np.clip(lin, 0, 1) ** (1 / 2.2))))
    clip = np.clip(clip, 0.0, 1.0) ** 2.2
    for a, tag in ((0.25, "tta8-mix25"), (0.4, "tta8-mix40")):
        score(tag, (1 - a) * tta8 + a * clip)

    # gentle self-guided 3x3 bilateral polish (edge-preserving residual
    # speckle suppression on the ensemble output)
    def bilateral3(img, sigma):
        p = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
        num = np.zeros_like(img)
        den_w = np.zeros(img.shape[:2] + (1,))
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                q = p[1 + dy:1 + dy + img.shape[0],
                      1 + dx:1 + dx + img.shape[1]]
                w_s = np.exp(-(dy * dy + dx * dx) / 2.0)
                d2 = ((q - img) ** 2).sum(-1, keepdims=True)
                w = w_s * np.exp(-d2 / (2 * sigma * sigma))
                num += w * q
                den_w += w
        return num / den_w

    for sig, tag in ((0.02, "tta8-pol02"), (0.05, "tta8-pol05")):
        score(tag, bilateral3(tta8, sig))


if __name__ == "__main__":
    main()
