"""Round-4 gate probe: measure every vw-van rmse8 lever combination.

Levers: trace-time firefly clamp, OIDN model (ldr vs alb-nrm), transfer
(clip/reinhard), exposure pre-normalization, demod dc filtering depth,
averaged (8-spp) aux guides for alb-nrm.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
import dataclasses, time, json

from tracerboy_tpu.renderer import Renderer, _demod_ratio
from tracerboy_tpu.post.realtime import composite_albedo
from tracerboy_tpu.trace.wavefront import render_wave_merged
from tracerboy_tpu.core.image_io import read_exr_rgb
from tracerboy_tpu.ml.oidn import denoise_image, load_oidn

film = (512, 320)
scene = "/root/reference/Scenes/vw-van/vw-van.pbrt"
golden_tm = np.clip(read_exr_rgb("goldens/vwvan_512x320.exr"), 0, 1) ** (1/2.2)
def tmap(x): return np.clip(np.asarray(x), 0, 1) ** (1/2.2)
def rmse(a): return round(float(np.sqrt(((tmap(a)-golden_tm)**2).mean())), 5)
def rh_fwd(x):
    x = jnp.maximum(x, 0.0); return (x/(1.0+x)) ** (1/2.2)
def rh_inv(y):
    y = jnp.clip(y, 0.0, 0.995) ** 2.2; return y/(1.0-y)

MODELS = {m: load_oidn(f"/root/reference/TracerBoy/ML/{m}.tza")
          for m in ("rt_ldr", "rt_ldr_alb_nrm")}
def oidn(model, img, **kw):
    net, var = MODELS[model]
    return denoise_image(net, var, jnp.asarray(img), **kw)

results = {}
spp = 8

def trace(clamp):
    """Decoupled 8-spp trace; returns dict of averaged planes."""
    r = Renderer(scene, film_size=film)
    if clamp:
        r.settings = r.settings.replace(fireflies_clamp=clamp)
    h, w = r.height, r.width
    N = w * h
    cfg = dataclasses.replace(r.wave_config(), decouple_albedo=True,
                              want_aovs=True)
    params = r.frame_params()
    ids = jnp.arange(N, dtype=jnp.int32)
    acc = {}
    k_max = max(1, min(32, 8_388_608 // N))
    done = 0
    while done < spp:
        kk = min(k_max, spp - done)
        out = render_wave_merged(r.scene_pytree, params, ids,
                                 jnp.int32(done), kk, cfg, fold_aovs=True)
        for key in ("radiance", "radiance_d", "albedo", "normal",
                    "emissive"):
            acc[key] = acc.get(key, 0.0) + out[key]
        acc["fw"] = acc.get("fw", 0.0) + out["filter_weight"]
        acc["wpos"] = out["world_pos"]; acc["nd"] = out["neighbor_dist"]
        done += kk
    fw = jnp.maximum(acc["fw"], 1e-8)[:, None]
    return dict(
        h=h, w=w,
        plain=(acc["radiance"]/fw).reshape(h, w, 3),  # == full radiance (demod I)
        D=(acc["radiance_d"]/fw).reshape(h, w, 3),
        alb=jnp.clip(acc["albedo"]/spp, 0, 1).reshape(h, w, 3),
        nrm=(acc["normal"]/spp).reshape(h, w, 3),
        emi=(acc["emissive"]/spp).reshape(h, w, 3),
        wpos4=jnp.concatenate([acc["wpos"].reshape(h, w, 3),
                               acc["nd"].reshape(h, w, 1)], -1),
    )

for clamp in (0.0, 1.0, 2.0, 4.0):
    t0 = time.time()
    P = trace(clamp)
    I = P["plain"]           # demodulated illumination
    results[f"raw-clamp{clamp}"] = rmse(I*0 + I) if False else None
    # NOTE: under decouple, 'radiance' is demodulated — reconstruct the
    # plain image via composite with UNfiltered dc for the ldr paths.
    dc = _demod_ratio(P["D"], I)
    full = composite_albedo(P["alb"], dc, I, P["emi"])
    results[f"full-raw-clamp{clamp}"] = rmse(full)
    # ldr on the full image
    for model, kw_builder in (
        ("rt_ldr", lambda: {}),
        ("rt_ldr_alb_nrm", lambda: dict(albedo=P["alb"], normal=P["nrm"])),
    ):
        den = rh_inv(oidn(model, rh_fwd(full), **kw_builder()))
        results[f"{model}-reinhard-clamp{clamp}"] = rmse(den)
    # exposure-normalized variant (rt_ldr)
    k = 0.18 / max(float(jnp.mean(0.2126*full[...,0]+0.7152*full[...,1]
                                  +0.0722*full[...,2])), 1e-6)
    denk = rh_inv(oidn("rt_ldr", rh_fwd(full*k))) / k
    results[f"rt_ldr-expnorm-clamp{clamp}"] = rmse(denk)
    # demod: denoise I, filter dc, composite
    from tracerboy_tpu.post.denoise import denoise as atrous
    h, w = P["h"], P["w"]
    def smooth(p, iters):
        x = jnp.concatenate([p, jnp.zeros((h, w, 1), jnp.float32)], -1)
        return atrous(x, p, P["nrm"], P["wpos4"], iterations=iters)[..., :3]
    denI = rh_inv(oidn("rt_ldr", rh_fwd(I)))
    for it in (2, 4):
        dcf = jnp.clip(smooth(dc, it), 0, 1)
        comp = composite_albedo(P["alb"], dcf, denI, P["emi"])
        results[f"demod-it{it}-clamp{clamp}"] = rmse(comp)
    # demod with alb-nrm guides on I (flat albedo)
    denI2 = rh_inv(oidn("rt_ldr_alb_nrm", rh_fwd(I),
                        albedo=jnp.ones_like(P["alb"]), normal=P["nrm"]))
    dcf = jnp.clip(smooth(dc, 4), 0, 1)
    results[f"demod-albnrm-it4-clamp{clamp}"] = rmse(
        composite_albedo(P["alb"], dcf, denI2, P["emi"]))
    print(f"clamp {clamp} done in {time.time()-t0:.0f}s", flush=True)
    print(json.dumps({k_: v for k_, v in results.items() if v is not None},
                     indent=0), flush=True)
