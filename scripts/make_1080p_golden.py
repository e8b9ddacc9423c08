"""vw-van 1920x1200 PROXY golden for the psnr35/vw-van-1080p north-star
config: 256 spp (fully converged is hours at this resolution; 256 spp
raw noise ~0.012 RMSE) + OIDN rt_ldr cleanup to push residual noise
well under the 35 dB (RMSE 0.018) measurement threshold. Labeled a
proxy in bench output — good enough to decide whether 35 dB is reached,
not a converged reference."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
import time

from tracerboy_tpu.renderer import Renderer
from tracerboy_tpu.core.image_io import write_exr
from tracerboy_tpu.ml.oidn import denoise_image, load_oidn

film = (1920, 1200)
r = Renderer("/root/reference/Scenes/vw-van/vw-van.pbrt", film_size=film)
t0 = time.time()
while r.state.spp < 256:
    r.render_sample(32)
    print(f"{r.state.spp} spp, {time.time()-t0:.0f}s", flush=True)
lin = np.maximum(np.asarray(r.resolve_radiance()), 0)
net, var = load_oidn("/root/reference/TracerBoy/ML/rt_ldr.tza")
enc = (jnp.maximum(jnp.asarray(lin), 0) / (1 + jnp.asarray(lin))) ** (1/2.2)
den = np.asarray(denoise_image(net, var, enc))
y = np.clip(den, 0, 0.995) ** 2.2
golden = y / (1 - y)
write_exr("goldens/vwvan_1080p.exr", golden.astype(np.float32))
print("wrote goldens/vwvan_1080p.exr", time.time() - t0, flush=True)
