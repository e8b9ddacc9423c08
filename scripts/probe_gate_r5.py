"""Round-5 rmse8/vw-van gate probe: estimator-side levers, measured.

Variants over the SAME 8-spp budget at 512x320:
  base               render_sample(8)            (round-4 recipe)
  m4 / m8            env_nee_samples = 4 / 8     (multi-sample env NEE)
  ad05 / ad10        render_sample_adaptive exponent 0.5 / 1.0
  m4+ad10            both levers together
Each scored vs the 8192-spp golden after rt_ldr and rt_ldr_alb_nrm OIDN
through the invertible Reinhard transfer (the round-4 winner recipe in
bench.bench_oidn_rmse). Prints one JSON line of RMSEs.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import json
import time

import jax.numpy as jnp
import numpy as np

from tracerboy_tpu.core.image_io import read_exr_rgb
from tracerboy_tpu.ml.oidn import denoise_image, load_oidn
from tracerboy_tpu.renderer import Renderer

SCENE = "/root/reference/Scenes/vw-van/vw-van.pbrt"
FILM = (512, 320)
GOLDEN = "/root/repo/goldens/vwvan_512x320.exr"
ML = "/root/reference/TracerBoy/ML"


def tm(x):
    return np.clip(np.asarray(x), 0.0, 1.0) ** (1.0 / 2.2)


def reinhard_fwd(x):
    x = np.maximum(np.asarray(x), 0.0)
    return (x / (1.0 + x)) ** (1 / 2.2)


def reinhard_inv(y):
    y = np.clip(np.asarray(y), 0.0, 0.995) ** 2.2
    return tm(y / (1.0 - y))


def main():
    golden = tm(read_exr_rgb(GOLDEN))
    models = {}
    for tag, tza in (("ldr", "rt_ldr.tza"),
                     ("anr", "rt_ldr_alb_nrm.tza")):
        models[tag] = load_oidn(os.path.join(ML, tza))

    def make_renderer(m_env=1):
        r = Renderer(SCENE, film_size=FILM)
        if m_env != 1:
            r.settings = dataclasses.replace(
                r.settings,
                performance_settings=dataclasses.replace(
                    r.settings.performance_settings,
                    environment_nee_samples=m_env,
                ),
            )
        return r

    def trace(m_env=1, adaptive=None, spp=8):
        t0 = time.time()
        r = make_renderer(m_env)
        if adaptive is None:
            r.render_sample(spp)
        else:
            r.render_sample_adaptive(spp, exponent=adaptive)
        lin = np.asarray(r.resolve_radiance())
        aovs = r._last_aovs
        h, w = FILM[1], FILM[0]
        aux = dict(
            albedo=jnp.asarray(np.clip(
                np.asarray(aovs["albedo"]).reshape(h, w, 3), 0.0, 1.0)),
            normal=jnp.asarray(
                np.asarray(aovs["normal"]).reshape(h, w, 3)),
        )
        return lin, aux, round(time.time() - t0, 1)

    res = {}

    def score(name, lin, aux):
        for tag in ("ldr", "anr"):
            model, variables = models[tag]
            kw = aux if tag == "anr" else {}
            den = reinhard_inv(denoise_image(
                model, variables, jnp.asarray(reinhard_fwd(lin)), **kw))
            rm = float(np.sqrt(np.mean(
                (np.clip(den, 0, 1) - golden) ** 2)))
            res[f"{name}-{tag}"] = round(rm, 5)
        print(json.dumps({name: {k: v for k, v in res.items()
                                 if k.startswith(name)}}),
              file=sys.stderr, flush=True)

    variants = [
        ("base", dict()),
        ("m4", dict(m_env=4)),
        ("m8", dict(m_env=8)),
        ("ad05", dict(adaptive=0.5)),
        ("ad10", dict(adaptive=1.0)),
        ("m4ad10", dict(m_env=4, adaptive=1.0)),
    ]
    only = os.environ.get("TB_VARIANTS")
    if only:
        keep = set(only.split(","))
        variants = [v for v in variants if v[0] in keep]
    for name, kw in variants:
        lin, aux, dt = trace(**kw)
        res[f"{name}-trace_s"] = dt
        score(name, lin, aux)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
