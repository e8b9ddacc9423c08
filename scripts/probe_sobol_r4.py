"""Gate probe: padded Owen-scrambled Sobol sampling at the 8-spp gate.

Measures raw 8-spp RMSE and denoised (rt_ldr, invertible-Reinhard
transfer) RMSE vs the 8192-spp golden, pcg vs sobol, on vw-van.
Also reports cornell as the control scene.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from tracerboy_tpu.core.image_io import read_exr_rgb
from tracerboy_tpu.ml.oidn import denoise_image, load_oidn
from tracerboy_tpu.renderer import Renderer

NET, VAR = load_oidn("/root/reference/TracerBoy/ML/rt_ldr.tza")
DEN = jax.jit(lambda c: denoise_image(NET, VAR, c))


def tmap(x):
    return np.clip(np.asarray(x), 0, 1) ** (1 / 2.2)


def rh_fwd(x):
    x = jnp.maximum(jnp.asarray(x), 0.0)
    return (x / (1.0 + x)) ** (1 / 2.2)


def rh_inv(y):
    y = jnp.clip(jnp.asarray(y), 0.0, 0.995) ** 2.2
    return y / (1.0 - y)


def gate(scene, film, golden_path, sampler, spp=8, seeds=(0,)):
    golden = tmap(read_exr_rgb(golden_path))
    raws, dens = [], []
    for seed in seeds:
        r = Renderer(scene, film_size=film, seed=seed)
        r.settings = dataclasses.replace(
            r.settings,
            performance_settings=dataclasses.replace(
                r.settings.performance_settings, sampler=sampler))
        t0 = time.time()
        r.render_sample(spp)
        lin = np.maximum(np.asarray(r.resolve_radiance()), 0)
        den = np.asarray(rh_inv(DEN(rh_fwd(lin))))
        raws.append(float(np.sqrt(((tmap(lin) - golden) ** 2).mean())))
        dens.append(float(np.sqrt(((tmap(den) - golden) ** 2).mean())))
        print(f"  seed {seed}: raw {raws[-1]:.5f} den {dens[-1]:.5f} "
              f"({time.time()-t0:.0f}s)", flush=True)
    return round(float(np.mean(raws)), 5), round(float(np.mean(dens)), 5)


def main():
    res = {}
    for sampler in ("pcg", "sobol"):
        raw, den = gate("/root/reference/Scenes/vw-van/vw-van.pbrt",
                        (512, 320),
                        "/root/repo/goldens/vwvan_512x320.exr", sampler)
        res[f"vwvan-{sampler}-raw8"] = raw
        res[f"vwvan-{sampler}-rmse8"] = den
        print(json.dumps(res), flush=True)
    for sampler in ("pcg", "sobol"):
        raw, den = gate("/root/reference/Scenes/cornell-box/scene.pbrt",
                        (512, 512),
                        "/root/repo/goldens/cornell_512.exr", sampler)
        res[f"cornell-{sampler}-raw8"] = raw
        res[f"cornell-{sampler}-rmse8"] = den
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
