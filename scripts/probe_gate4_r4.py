"""Gate probe 4: is the OIDN port spatially aligned? Denoise the GOLDEN
and score SHIFTED variants — if a +-1 px shift scores better, the UNet
has an alignment bug (upsample/concat offset) that manifests as the
edge-outline error map."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
import json

from tracerboy_tpu.core.image_io import read_exr_rgb
from tracerboy_tpu.ml.oidn import denoise_image, load_oidn

golden_lin = read_exr_rgb("goldens/vwvan_512x320.exr")
golden_tm = np.clip(golden_lin, 0, 1) ** (1/2.2)
def tmap(x): return np.clip(np.asarray(x), 0, 1) ** (1/2.2)
def rh_fwd(x):
    x = jnp.maximum(jnp.asarray(x), 0.0); return (x/(1.0+x)) ** (1/2.2)
def rh_inv(y):
    y = jnp.clip(y, 0.0, 0.995) ** 2.2; return y/(1.0-y)
net, var = load_oidn("/root/reference/TracerBoy/ML/rt_ldr.tza")
den = np.asarray(rh_inv(denoise_image(net, var, rh_fwd(golden_lin))))

results = {}
for dy in (-1, 0, 1):
    for dx in (-1, 0, 1):
        s = np.roll(np.roll(den, dy, axis=0), dx, axis=1)
        r = float(np.sqrt(((tmap(s)[2:-2, 2:-2] - golden_tm[2:-2, 2:-2]) ** 2).mean()))
        results[f"shift({dy},{dx})"] = round(r, 5)
print(json.dumps(results, indent=0))
# Also: where is the floor error? dump the golden-denoise error map.
err = np.abs(tmap(den) - golden_tm).mean(-1)
np.save("/tmp/errmap_floor.npy", err)
print("floor err p50/p90/p99:", [round(float(np.quantile(err, q)), 4)
                                 for q in (0.5, 0.9, 0.99)])
