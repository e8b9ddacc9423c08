"""Gate probe 3: deterministic albedo demodulation + distortion floor.

I' = L / max(albedo_aov, eps); denoise I'; L'' = denoised * albedo.
The division is an identity conditioner (exactly undone at remultiply),
so unlike the two-plane MC dc split it adds NO stochastic error — the
network just sees texture-free input (the reference's RealTime demod
intent, CompositeAlbedoCS.hlsl, with the G-buffer albedo).
Also measures rmse(OIDN(golden)) — the distortion floor of the
pipeline: nothing denoise-side can beat it."""
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
golden_lin = read_exr_rgb("goldens/vwvan_512x320.exr")
golden_tm = np.clip(golden_lin, 0, 1) ** (1/2.2)
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
# Distortion floor: the pipeline applied to the golden itself.
results["floor-ldr-reinhard"] = rmse(rh_inv(oidn("rt_ldr", rh_fwd(golden_lin))))
results["floor-ldr-clip"] = rmse(
    jnp.clip(oidn("rt_ldr", jnp.clip(jnp.asarray(golden_lin), 0, 1) ** (1/2.2)), 0, 1) ** 2.2)
print(json.dumps(results), flush=True)

spp = 8
clamp = 4.0
r = Renderer(scene, film_size=film)
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
results["floor-alb-mean"] = round(float(alb.mean()), 4)

for eps, tag in ((0.05, "e05"), (0.15, "e15")):
    albd = jnp.where(alb > eps, alb, 1.0)
    I = lin / albd
    den = rh_inv(oidn("rt_ldr", rh_fwd(I)))
    results[f"demod-det-{tag}"] = rmse(jnp.asarray(den) * albd)
    den2 = rh_inv(oidn("rt_ldr_alb_nrm", rh_fwd(I),
                       albedo=jnp.ones_like(alb), normal=nrm))
    results[f"demod-det-albnrm-{tag}"] = rmse(jnp.asarray(den2) * albd)
    # with a lightly filtered albedo (AA-noise suppression)
    albf = jnp.clip(atrous(jnp.concatenate([albd, jnp.ones((h,w,1))], -1),
                           alb, nrm, wpos4, iterations=1)[..., :3], 0.01, 1)
    I2 = lin / albf
    den3 = rh_inv(oidn("rt_ldr", rh_fwd(I2)))
    results[f"demod-det-filtalb-{tag}"] = rmse(jnp.asarray(den3) * albf)
print(json.dumps(results), flush=True)
