"""Round-5 fidelity diagnosis: WHERE does vw-van 8-spp variance come from?

Decomposes the per-pixel sample variance of the gate config:
  - bounce depth: max_bounces=1 (direct + first indirect vertex) vs 6
  - concentration: Lorenz shares (top 5/10/25/50% of pixels by variance)
  - sampler: pcg vs sobol
Prints one JSON line with the shares; writes /tmp/var*.png maps.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tracerboy_tpu.core.image_io import write_png
from tracerboy_tpu.renderer import Renderer
from tracerboy_tpu.trace.wavefront import render_wave

SCENE = "/root/reference/Scenes/vw-van/vw-van.pbrt"
FILM = (512, 320)
SPP = 8


def sample_stack(r, max_bounces, sampler, spp=SPP, seed=0):
    cfg = dataclasses.replace(r.wave_config(), max_bounces=max_bounces,
                              sampler=sampler, want_aovs=False)
    h, w = FILM[1], FILM[0]
    pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
    params = dict(r.frame_params())
    params["seed"] = jnp.int32(seed)
    step = jax.jit(lambda s: render_wave(
        r.scene_pytree, params, pixel_ids, s, cfg))
    frames = []
    for s in range(spp):
        out = step(jnp.int32(s))
        rad = np.stack([np.asarray(out["radiance_" + c]).reshape(h, w)
                        for c in "rgb"], axis=-1)
        fw = np.asarray(out["filter_weight"]).reshape(h, w, 1)
        frames.append(rad / np.maximum(fw, 1e-8))
    return np.stack(frames)


def tmap(x):
    return np.clip(x, 0, 1) ** (1 / 2.2)


def main():
    r = Renderer(SCENE, film_size=FILM)
    res = {}

    t0 = time.time()
    full = sample_stack(r, 6, "pcg")
    res["t_full8"] = round(time.time() - t0, 1)

    # Variance of the TONEMAPPED per-pixel mean estimator (what the gate
    # metric sees): var of tonemapped samples / spp, luma-summed.
    def varmap(stack):
        tm = tmap(stack)
        return tm.var(axis=0).mean(axis=-1) / stack.shape[0]

    v_full = varmap(full)
    total = float(v_full.sum())
    res["raw_rmse_proxy"] = round(float(np.sqrt(v_full.mean())), 5)

    # Concentration: Lorenz shares.
    order = np.sort(v_full.flatten())[::-1]
    csum = np.cumsum(order)
    n = order.size
    for pct in (5, 10, 25, 50):
        res[f"top{pct}pct_share"] = round(
            float(csum[int(n * pct / 100) - 1] / csum[-1]), 3)

    # Bounce decomposition: variance with the path killed after the
    # first indirect vertex (direct + 1 bounce) vs full transport.
    b1 = sample_stack(r, 1, "pcg")
    v_b1 = varmap(b1)
    res["var_share_bounce<=1"] = round(float(v_b1.sum() / total), 3)
    b2 = sample_stack(r, 2, "pcg")
    res["var_share_bounce<=2"] = round(float(varmap(b2).sum() / total), 3)

    # Sampler effect.
    sob = sample_stack(r, 6, "sobol")
    res["var_ratio_sobol"] = round(float(varmap(sob).sum() / total), 3)

    # Where direct-ish variance lives: map images.
    write_png("/tmp/var_full.png",
              (np.clip(np.sqrt(v_full) * 20, 0, 1) * 255).astype(np.uint8))
    write_png("/tmp/var_b1.png",
              (np.clip(np.sqrt(v_b1) * 20, 0, 1) * 255).astype(np.uint8))

    print(json.dumps(res))


if __name__ == "__main__":
    main()
