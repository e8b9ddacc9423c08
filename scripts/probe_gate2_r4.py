"""Gate probe 2: plain-path levers at 8 spp — clamp sweep, atrous
pre/post filtering around OIDN, model averaging, error-map dump."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
import time, json

from tracerboy_tpu.renderer import Renderer
from tracerboy_tpu.core.image_io import read_exr_rgb
from tracerboy_tpu.ml.oidn import denoise_image, load_oidn
from tracerboy_tpu.post.denoise import denoise as atrous

film = (512, 320)
scene = "/root/reference/Scenes/vw-van/vw-van.pbrt"
golden_tm = np.clip(read_exr_rgb("goldens/vwvan_512x320.exr"), 0, 1) ** (1/2.2)
def tmap(x): return np.clip(np.asarray(x), 0, 1) ** (1/2.2)
def rmse(a): return round(float(np.sqrt(((tmap(a)-golden_tm)**2).mean())), 5)
def rh_fwd(x):
    x = jnp.maximum(jnp.asarray(x), 0.0); return (x/(1.0+x)) ** (1/2.2)
def rh_inv(y):
    y = jnp.clip(y, 0.0, 0.995) ** 2.2; return y/(1.0-y)
MODELS = {m: load_oidn(f"/root/reference/TracerBoy/ML/{m}.tza")
          for m in ("rt_ldr", "rt_ldr_alb_nrm")}
def oidn(model, img, **kw):
    net, var = MODELS[model]
    return denoise_image(net, var, jnp.asarray(img), **kw)

results = {}
spp = 8
for clamp in (0.0, 2.0, 4.0, 8.0):
    t0 = time.time()
    r = Renderer(scene, film_size=film)
    if clamp:
        r.settings = r.settings.replace(fireflies_clamp=clamp)
    r.render_sample(spp)
    lin = jnp.maximum(jnp.asarray(r.resolve_radiance()), 0.0)
    h, w = film[1], film[0]
    aovs = r._last_aovs
    alb = jnp.clip(jnp.asarray(aovs["albedo"]).reshape(h, w, 3), 0, 1)
    nrm = jnp.asarray(aovs["normal"]).reshape(h, w, 3)
    wpos4 = jnp.concatenate([
        jnp.asarray(aovs["world_pos"]).reshape(h, w, 3),
        jnp.asarray(aovs["neighbor_dist"]).reshape(h, w, 1)], -1)
    results[f"raw-clamp{clamp}"] = rmse(lin)
    den = rh_inv(oidn("rt_ldr", rh_fwd(lin)))
    results[f"ldr-clamp{clamp}"] = rmse(den)
    # atrous pre-filter (1 iter) then OIDN
    pre = atrous(jnp.concatenate([lin, jnp.ones((h, w, 1))], -1),
                 alb, nrm, wpos4, iterations=1)[..., :3]
    results[f"pre1+ldr-clamp{clamp}"] = rmse(rh_inv(oidn("rt_ldr", rh_fwd(pre))))
    # OIDN then atrous cleanup (1 iter)
    post = atrous(jnp.concatenate([jnp.asarray(den), jnp.ones((h, w, 1))], -1),
                  alb, nrm, wpos4, iterations=1)[..., :3]
    results[f"ldr+post1-clamp{clamp}"] = rmse(post)
    # model average
    den2 = rh_inv(oidn("rt_ldr_alb_nrm", rh_fwd(lin), albedo=alb, normal=nrm))
    results[f"albnrm-clamp{clamp}"] = rmse(den2)
    results[f"avg-clamp{clamp}"] = rmse(0.5*(jnp.asarray(den)+jnp.asarray(den2)))
    print(f"clamp {clamp}: {time.time()-t0:.0f}s", flush=True)
    print(json.dumps(results), flush=True)
    if clamp == 4.0:
        err = np.abs(tmap(den) - golden_tm).mean(-1)
        np.save("/tmp/errmap.npy", err)
        print("err p50/p90/p99/max:",
              [round(float(np.quantile(err, q)), 4) for q in (0.5, 0.9, 0.99, 1.0)], flush=True)
