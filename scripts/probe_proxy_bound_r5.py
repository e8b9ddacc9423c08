"""Round-5: bound the error of the vw-van 1080p PROXY golden.

goldens/vwvan_1080p.exr is a 256-spp + OIDN cleanup (the raw converged
render would cost days at current throughput). This probe measures the
SAME recipe at 512x320 — where a raw 8192-spp golden exists — so the
proxy's bias can be published as a bound instead of an unknown:

  proxy-rmse      tonemapped RMSE(proxy_recipe, raw_golden)
  proxy-psnr      the PSNR ceiling the proxy imposes: a render that
                  exactly matched the TRUE image would score this
                  against the proxy, so any psnr35 gate scored against
                  the proxy is trustworthy only below this ceiling.

Writes goldens/vwvan_1080p.BOUND.json (committed) for the bench to
report next to psnr35/vw-van-1080p.
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
OUT_PATH = "/root/repo/goldens/vwvan_1080p.BOUND.json"


def tmap(x):
    return np.clip(np.asarray(x), 0.0, 1.0) ** (1 / 2.2)


def main():
    t0 = time.time()
    from tracerboy_tpu.core.image_io import read_exr_rgb
    from tracerboy_tpu.ml.oidn import denoise_image, load_oidn
    from tracerboy_tpu.renderer import Renderer

    golden = read_exr_rgb(GOLDEN)

    # The exact 1080p-proxy recipe (scripts/make_1080p_golden.py):
    # 256 spp, then rt_ldr OIDN on the clipped tonemapped frame.
    r = Renderer(SCENE, film_size=FILM)
    done = 0
    while done < 256:
        r.render_sample(32)
        done += 32
        print(f"{done}/256 spp  {time.time()-t0:.0f}s", flush=True)
    lin = np.maximum(np.asarray(r.resolve_radiance()), 0.0)

    model, variables = load_oidn("/root/reference/TracerBoy/ML/rt_ldr.tza")
    den = np.asarray(denoise_image(model, variables, jnp.asarray(tmap(lin))))
    proxy = np.clip(den, 0.0, 1.0) ** 2.2

    tg, tp = tmap(golden), tmap(proxy)
    rmse = float(np.sqrt(np.mean((tp - tg) ** 2)))
    peak = max(float(tg.max()), 1e-6)
    psnr = 10.0 * np.log10(peak * peak / max(rmse * rmse, 1e-12))
    raw_rmse = float(np.sqrt(np.mean((tmap(lin) - tg) ** 2)))

    bound = dict(
        recipe="256spp+rt_ldr-OIDN (make_1080p_golden.py), measured at "
               "512x320 against the raw 8192-spp golden",
        proxy_rmse_tonemapped=round(rmse, 5),
        proxy_psnr_ceiling_db=round(psnr, 2),
        raw256_rmse_tonemapped=round(raw_rmse, 5),
        measured_s=round(time.time() - t0, 1),
    )
    with open(OUT_PATH, "w") as f:
        json.dump(bound, f, indent=1)
    print(json.dumps(bound), flush=True)


if __name__ == "__main__":
    main()
