"""Round-4 probe: is render_denoised's demod algebra self-consistent?

composite(albedo, dc, illum, emissive) with NO denoise step should equal
the plain 8-spp radiance. If not, the demod plumbing is biased and the
0.063 bench score is algebra, not denoising."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
import dataclasses, sys, time

from tracerboy_tpu.renderer import Renderer, _demod_ratio
from tracerboy_tpu.post.realtime import composite_albedo
from tracerboy_tpu.trace.wavefront import render_wave_merged
from tracerboy_tpu.core.image_io import read_exr_rgb

film = (512, 320)
scene = "/root/reference/Scenes/vw-van/vw-van.pbrt"
golden = read_exr_rgb("goldens/vwvan_512x320.exr")
def tmap(x): return np.clip(np.asarray(x), 0, 1) ** (1/2.2)
def rmse(a, b): return float(np.sqrt(((tmap(a)-tmap(b))**2).mean()))

r = Renderer(scene, film_size=film)
h, w = r.height, r.width
N = w * h
cfg = dataclasses.replace(r.wave_config(), decouple_albedo=True, want_aovs=True)
params = r.frame_params()
ids = jnp.arange(N, dtype=jnp.int32)
spp = 8
acc = {}
t0 = time.time()
done = 0
k_max = max(1, min(32, 8_388_608 // N))
while done < spp:
    kk = min(k_max, spp - done)
    out = render_wave_merged(r.scene_pytree, params, ids, jnp.int32(done), kk,
                             cfg, fold_aovs=True)
    for key in ("radiance", "radiance_d", "albedo", "normal", "emissive"):
        acc[key] = acc.get(key, 0.0) + out[key]
    acc["fw"] = acc.get("fw", 0.0) + out["filter_weight"]
    done += kk
fw = jnp.maximum(acc["fw"], 1e-8)[:, None]
illum = (acc["radiance"] / fw).reshape(h, w, 3)
dc = _demod_ratio(acc["radiance_d"] / fw, acc["radiance"] / fw).reshape(h, w, 3)
alb = jnp.clip(acc["albedo"] / spp, 0.0, 1.0).reshape(h, w, 3)
emi = (acc["emissive"] / spp).reshape(h, w, 3)
comp = np.asarray(composite_albedo(alb, dc, illum, emi))
print("time", round(time.time()-t0, 1))

# plain radiance at same samples (no decouple)
r2 = Renderer(scene, film_size=film)
r2.render_sample(spp)
plain = np.asarray(r2.resolve_radiance())

print("RMSE composite(no-denoise) vs plain:", rmse(comp, plain))
print("RMSE plain vs golden:", rmse(plain, golden))
print("RMSE composite vs golden:", rmse(comp, golden))
print("illum stats", float(jnp.mean(illum)), float(jnp.max(illum)))
print("dc mean", float(jnp.mean(dc)), "alb mean", float(jnp.mean(alb)),
      "emi mean", float(jnp.mean(emi)))
# where does composite diverge?
d = np.abs(tmap(comp) - tmap(plain)).mean(axis=-1)
print("divergence: mean", d.mean(), "p99", np.quantile(d, 0.99))
