"""Gate probe: test-time-augmentation + ensembling of the OIDN pass.

The round-4 fidelity postmortem (README.md) measured a seed-INDEPENDENT
rmse8 component of ~0.016 on vw-van — structured error the UNet
manufactures from input noise, which more seeds cannot average away.
TTA attacks exactly that: the network's error field is covariant with
image orientation, so denoising the 8 dihedral transforms of the SAME
input and averaging the inverse-transformed outputs decorrelates the
structured error (the input noise term is common, so only the
network-bias part averages down). Also measured here, on the same
cached 8-spp render:
  - model ensemble (rt_ldr (+) rt_ldr_alb_nrm)
  - transfer ensemble (clip (+) invertible-Reinhard)
  - the full-product display metric variant (auto-exposure + tonemap on
    both sides, per BASELINE config 5 "histogram tonemap post-process")
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np
import jax.numpy as jnp

from tracerboy_tpu.core.image_io import read_exr_rgb
from tracerboy_tpu.ml.oidn import denoise_image, load_oidn
from tracerboy_tpu.renderer import Renderer

FILM = (512, 320)
CACHE = "/tmp/probe_tta_cache.npz"
GOLDEN = "/root/repo/goldens/vwvan_512x320.exr"


def tmap(x):
    return np.clip(np.asarray(x), 0, 1) ** (1 / 2.2)


def rh_fwd(x):
    x = jnp.maximum(jnp.asarray(x), 0.0)
    return (x / (1.0 + x)) ** (1 / 2.2)


def rh_inv(y):
    y = jnp.clip(jnp.asarray(y), 0.0, 0.995) ** 2.2
    return y / (1.0 - y)


def main():
    golden = read_exr_rgb(GOLDEN)
    gtm = tmap(golden)

    if os.path.exists(CACHE):
        z = np.load(CACHE)
        lin8, albedo, normal = z["lin8"], z["albedo"], z["normal"]
        print("cache hit", flush=True)
    else:
        t0 = time.time()
        r = Renderer("/root/reference/Scenes/vw-van/vw-van.pbrt",
                     film_size=FILM)
        r.render_sample(8)
        lin8 = np.maximum(np.asarray(r.resolve_radiance()), 0)
        h, w = FILM[1], FILM[0]
        aovs = r._last_aovs
        albedo = np.clip(
            np.asarray(aovs["albedo"]).reshape(h, w, 3), 0.0, 1.0)
        normal = np.asarray(aovs["normal"]).reshape(h, w, 3)
        np.savez(CACHE, lin8=lin8, albedo=albedo, normal=normal)
        print(f"8 spp in {time.time() - t0:.0f}s", flush=True)

    nets = {
        "ldr": load_oidn("/root/reference/TracerBoy/ML/rt_ldr.tza"),
        "albnrm": load_oidn(
            "/root/reference/TracerBoy/ML/rt_ldr_alb_nrm.tza"),
    }

    # Jitted whole-pass denoisers per (model, orientation shape): the
    # eager path dispatches each conv over the device tunnel (35 ms RTT
    # x ~50 ops x 60 passes — the first version of this probe timed
    # out on exactly that).
    import jax

    _den_jit = {}

    def run_denoise(model_tag, color, alb=None, nrm=None):
        key = (model_tag, color.shape)
        if key not in _den_jit:
            net, var = nets[model_tag]
            if model_tag == "albnrm":
                _den_jit[key] = jax.jit(
                    lambda c, a, n: denoise_image(
                        net, var, c, albedo=a, normal=n))
            else:
                _den_jit[key] = jax.jit(
                    lambda c: denoise_image(net, var, c))
        if model_tag == "albnrm":
            return _den_jit[key](jnp.asarray(color), jnp.asarray(alb),
                                 jnp.asarray(nrm))
        return _den_jit[key](jnp.asarray(color))

    # The 8 dihedral transforms as (forward, inverse) on HWC arrays.
    def make_dihedral():
        ts = []
        for k in range(4):
            ts.append((lambda x, k=k: np.rot90(x, k, axes=(0, 1)),
                       lambda x, k=k: np.rot90(x, -k, axes=(0, 1))))
            ts.append((
                lambda x, k=k: np.rot90(x[:, ::-1], k, axes=(0, 1)),
                lambda x, k=k: np.rot90(x, -k, axes=(0, 1))[:, ::-1]))
        return ts

    DIH = make_dihedral()

    def denoise_variant(model_tag, transfer, tta):
        """Average of the inverse-transformed denoised outputs, linear."""
        outs = []
        for fwd, inv in DIH[:tta]:
            lin_t = np.ascontiguousarray(fwd(lin8))
            alb_t = np.ascontiguousarray(fwd(albedo))
            nrm_t = np.ascontiguousarray(fwd(normal))
            if transfer == "reinhard":
                den = rh_inv(run_denoise(
                    model_tag, rh_fwd(lin_t), alb_t, nrm_t))
            else:
                den = run_denoise(
                    model_tag, jnp.asarray(tmap(lin_t)), alb_t, nrm_t)
                den = jnp.clip(den, 0, 1) ** 2.2
            outs.append(inv(np.asarray(den)))
        return np.mean(outs, axis=0)

    def score(lin):
        return round(float(np.sqrt(((tmap(lin) - gtm) ** 2).mean())), 5)

    res = {"raw8": score(lin8)}
    lin_cache = {}
    for model_tag in ("ldr", "albnrm"):
        for transfer in ("reinhard", "clip"):
            for tta in (1, 2, 4, 8):
                t0 = time.time()
                lin = denoise_variant(model_tag, transfer, tta)
                lin_cache[(model_tag, transfer, tta)] = lin
                key = f"{model_tag}-{transfer}-tta{tta}"
                res[key] = score(lin)
                print(f"{key}: {res[key]}  ({time.time()-t0:.0f}s)",
                      flush=True)

    # Ensembles of the cached TTA-8 outputs (linear-space averages).
    ens = {
        "ens-transfer-ldr": ("ldr", "reinhard", 8, "ldr", "clip", 8),
        "ens-model-reinhard": ("ldr", "reinhard", 8,
                               "albnrm", "reinhard", 8),
    }
    for key, (m1, t1, k1, m2, t2, k2) in ens.items():
        lin = 0.5 * (lin_cache[(m1, t1, k1)] + lin_cache[(m2, t2, k2)])
        res[key] = score(lin)
    lin_all = np.mean([lin_cache[(m, t, 8)]
                       for m in ("ldr", "albnrm")
                       for t in ("reinhard", "clip")], axis=0)
    res["ens-all4-tta8"] = score(lin_all)

    # Full-product display metric (BASELINE config 5 names "histogram
    # tonemap post-process"): auto-exposure + tonemap applied to BOTH
    # sides. Reported separately; the headline gate stays gamma-2.2.
    try:
        from tracerboy_tpu.post.pipeline import auto_exposure_scale
        from tracerboy_tpu.core.tonemap import TONEMAP_ACES, tonemap as tm_op

        def disp(lin):
            e = auto_exposure_scale(jnp.asarray(lin))
            return np.asarray(jnp.clip(
                tm_op(TONEMAP_ACES, jnp.asarray(lin) * e), 0, 1)
                ** (1 / 2.2))

        g_d = disp(golden)
        best = lin_cache[("ldr", "reinhard", 8)]
        res["disp-ldr-reinhard-tta8"] = round(
            float(np.sqrt(((disp(best) - g_d) ** 2).mean())), 5)
    except Exception as e:
        res["disp"] = f"error: {type(e).__name__}: {e}"

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
