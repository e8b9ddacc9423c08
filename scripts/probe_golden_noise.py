"""Quantify residual Monte-Carlo noise in a committed golden.

Renders the same scene at `spp` with a DIFFERENT seed and reports the
gate-space (clip^1/2.2) RMSE against the golden, decomposed under the
independence model rmse^2 = sigma_g^2 + sigma_probe^2 with
sigma_N = sigma_1/sqrt(N):

    sigma_1^2 = rmse^2 / (1/N_golden + 1/N_probe)

If the implied golden floor sigma_g is a significant fraction of the
1e-2 fidelity gate, the golden needs more samples — the gate measures
the GOLDEN's noise, not the renderer's.

Usage: python scripts/probe_golden_noise.py [vw-van|cornell] [spp]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDENS = {
    "cornell": ("/root/reference/Scenes/cornell-box/scene.pbrt",
                (512, 512), "goldens/cornell_512.exr", 1024),
    "vw-van": ("/root/reference/Scenes/vw-van/vw-van.pbrt",
               (512, 320), "goldens/vwvan_512x320.exr", 1024),
}


def main():
    key = sys.argv[1] if len(sys.argv) > 1 else "vw-van"
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import numpy as np

    from tracerboy_tpu.core.image_io import read_exr_rgb
    from tracerboy_tpu.renderer import Renderer

    path, film, golden_rel, n_golden = GOLDENS[key]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gt = np.clip(np.asarray(read_exr_rgb(os.path.join(root, golden_rel))),
                 0, 1) ** (1 / 2.2)

    r = Renderer(path, film_size=film, seed=7777)
    done = 0
    while done < spp:
        r.render_sample(min(32, spp - done))
        done += 32
        print(f"  {done}/{spp}", flush=True)
    img = np.clip(np.asarray(r.resolve_radiance()), 0, 1) ** (1 / 2.2)

    rmse = float(np.sqrt(np.mean((img - gt) ** 2)))
    var1 = rmse * rmse / (1.0 / n_golden + 1.0 / spp)
    sig_g = np.sqrt(var1 / n_golden)
    print(f"rmse(probe@{spp} seed=7777, golden@{n_golden}) = {rmse:.5f}")
    print(f"implied per-sample sigma_1 = {np.sqrt(var1):.4f}")
    print(f"implied GOLDEN noise floor sigma_g = {sig_g:.5f} "
          f"(gate is 0.01)")


if __name__ == "__main__":
    main()
