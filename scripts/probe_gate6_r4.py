"""Gate probe 6: upper bound of the transparent-shadow lever.

Exclude glass (SSS-flag, zero-scattering) triangles from the shadow
BVH entirely (transmittance 1.0 through windows), re-converge a 512-spp
pseudo-golden under the SAME transport, and measure rmse8. If this
transport's rmse8 lands at/below 0.01, a proper Fresnel-weighted
transmissive shadow march is worth building."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
import time, json

from tracerboy_tpu.scene.compile import load_scene
from tracerboy_tpu.renderer import Renderer
from tracerboy_tpu.ml.oidn import denoise_image, load_oidn

film = (512, 320)
cs = load_scene("/root/reference/Scenes/vw-van/vw-van.pbrt", film_size=film)
flags = np.asarray(cs.materials["flags"])
scat = np.asarray(cs.materials["scattering"])
is_glass = ((flags & 0x2) != 0) & (scat.reshape(len(flags), -1).max(1) < 1e-6)
print("glass materials:", int(is_glass.sum()), "of", len(flags), flush=True)
# Glass tris leave the shadow BVH via the same light-exclusion flag the
# packer uses (0x10); shading still sees SSS because lookups test 0x2
# first... CAREFUL: 0x10 also means IsLight to the shader. Instead,
# rebuild via a patched opaque mask: monkeypatch the flags only for the
# pallas_pack call.
import tracerboy_tpu.scene.compile as comp

orig_pack = comp.CompiledScene.pallas_pack
def patched_pack(self, tri_attr_rows=None):
    saved = self.materials["flags"]
    f2 = saved.copy()
    f2[is_glass] |= 0x10
    self.materials["flags"] = f2
    try:
        out = orig_pack(self, tri_attr_rows)
    finally:
        self.materials["flags"] = saved
    return out
comp.CompiledScene.pallas_pack = patched_pack

def tmap(x): return np.clip(np.asarray(x), 0, 1) ** (1/2.2)
def rh_fwd(x):
    x = jnp.maximum(jnp.asarray(x), 0.0); return (x/(1.0+x)) ** (1/2.2)
def rh_inv(y):
    y = jnp.clip(y, 0.0, 0.995) ** 2.2; return y/(1.0-y)
net, var = load_oidn("/root/reference/TracerBoy/ML/rt_ldr.tza")

r = Renderer(cs, film_size=film)
# also patch brute/jnp mask for consistency (pallas is the backend here)
opaque = np.asarray(r.scene_pytree["tri_shadow_opaque"])
tri_glass = is_glass[np.asarray(cs.tri_material)]
r.scene_pytree["tri_shadow_opaque"] = jnp.asarray(opaque & ~tri_glass)

t0 = time.time()
r.render_sample(8)
lin8 = np.maximum(np.asarray(r.resolve_radiance()), 0)
print(f"8 spp in {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
while r.state.spp < 512:
    r.render_sample(32)
golden = np.maximum(np.asarray(r.resolve_radiance()), 0)
print(f"512 spp in {time.time()-t0:.0f}s", flush=True)
gtm = tmap(golden)
den = np.asarray(rh_inv(denoise_image(net, var, rh_fwd(lin8))))
res = dict(
    raw8=round(float(np.sqrt(((tmap(lin8)-gtm)**2).mean())), 5),
    rmse8=round(float(np.sqrt(((tmap(den)-gtm)**2).mean())), 5),
)
# reference: old-transport rmse vs old golden was raw 0.069 / den 0.0191
print(json.dumps(res), flush=True)
np.save("/tmp/glassfree_golden.npy", golden)
