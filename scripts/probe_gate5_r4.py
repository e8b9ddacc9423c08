"""Gate probe 5: error scaling + sampler ablation.

- denoised RMSE at 8/16/32/64 spp: if noise-dominated it should fall
  ~1/sqrt(spp); the asymptote is the pipeline bias.
- blue noise on vs off at 8 spp (are the ground rings CP-rotation
  correlation?).
- two independent 8-spp denoised renders: cross-RMSE isolates noise."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
import dataclasses, json

from tracerboy_tpu.renderer import Renderer
from tracerboy_tpu.core.image_io import read_exr_rgb
from tracerboy_tpu.ml.oidn import denoise_image, load_oidn

film = (512, 320)
scene = "/root/reference/Scenes/vw-van/vw-van.pbrt"
golden_tm = np.clip(read_exr_rgb("goldens/vwvan_512x320.exr"), 0, 1) ** (1/2.2)
def tmap(x): return np.clip(np.asarray(x), 0, 1) ** (1/2.2)
def rmse(a): return round(float(np.sqrt(((tmap(a)-golden_tm)**2).mean())), 5)
def rh_fwd(x):
    x = jnp.maximum(jnp.asarray(x), 0.0); return (x/(1.0+x)) ** (1/2.2)
def rh_inv(y):
    y = jnp.clip(y, 0.0, 0.995) ** 2.2; return y/(1.0-y)
net, var = load_oidn("/root/reference/TracerBoy/ML/rt_ldr.tza")
def denoise(lin):
    return np.asarray(rh_inv(denoise_image(net, var, rh_fwd(lin))))

results = {}
def run(tag, spp, blue=True, seed=0):
    r = Renderer(scene, film_size=film, seed=seed)
    if not blue:
        s = r.settings
        r.settings = s.replace(performance_settings=dataclasses.replace(
            s.performance_settings, use_blue_noise=False))
    r.render_sample(spp)
    lin = np.maximum(np.asarray(r.resolve_radiance()), 0)
    den = denoise(lin)
    results[f"{tag}-raw"] = rmse(lin)
    results[f"{tag}"] = rmse(den)
    return lin, den

for spp in (8, 16, 32, 64):
    run(f"spp{spp}", spp)
    print(json.dumps(results), flush=True)
run("spp8-nobn", 8, blue=False)
_, denA = run("spp8-seedA", 8, seed=0)
_, denB = run("spp8-seedB", 8, seed=777)
cross = float(np.sqrt(((tmap(denA) - tmap(denB)) ** 2).mean()))
results["cross-seed-rmse"] = round(cross, 5)
results["implied-noise-each"] = round(cross / np.sqrt(2), 5)
print(json.dumps(results), flush=True)
err = np.abs(tmap(denA) - golden_tm).mean(-1)
np.save("/tmp/errmap8A.npy", err)
