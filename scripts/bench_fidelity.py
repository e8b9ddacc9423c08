"""Decompose the vw-van denoised-fidelity residual: noise vs floor.

rmse8/vw-van sits above the 1e-2 gate. Is the residual (a) 8-spp noise
OIDN can't remove (fix: variance reduction), (b) the denoiser's own
distortion floor (fix: different denoise path), or (c) bias vs the
golden (fix: a correctness bug)? Measure denoised RMSE at rising spp —
the asymptote is floor+bias; the spp-dependent part is noise. Also A/B
rt_ldr vs rt_ldr_alb_nrm (aux AOVs guide edges at high noise).

Usage: python scripts/bench_fidelity.py [scene] [spps...]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENES = {
    "cornell": ("/root/reference/Scenes/cornell-box/scene.pbrt",
                (512, 512), "goldens/cornell_512.exr"),
    "vw-van": ("/root/reference/Scenes/vw-van/vw-van.pbrt",
               (512, 320), "goldens/vwvan_512x320.exr"),
}


def main():
    scene_key = sys.argv[1] if len(sys.argv) > 1 else "vw-van"
    spps = [int(s) for s in sys.argv[2:]] or [8, 16, 32, 64]

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from tracerboy_tpu.core.image_io import read_exr_rgb
    from tracerboy_tpu.ml.oidn import denoise_image, load_oidn
    from tracerboy_tpu.renderer import Renderer

    path, film, golden_rel = SCENES[scene_key]
    golden_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), golden_rel)
    golden = read_exr_rgb(golden_path)

    def tm(img):
        return np.clip(np.asarray(img), 0.0, 1.0) ** (1 / 2.2)

    gt = tm(golden)

    def rmse(a, b):
        return float(np.sqrt(np.mean((a - b) ** 2)))

    ldr_m, ldr_v = load_oidn("/root/reference/TracerBoy/ML/rt_ldr.tza")
    an_m, an_v = load_oidn(
        "/root/reference/TracerBoy/ML/rt_ldr_alb_nrm.tza")

    r = Renderer(path, film_size=film)
    done = 0
    for spp in sorted(spps):
        r.render_sample(spp - done)
        done = spp
        img = tm(r.resolve_radiance())
        raw = rmse(img, gt)
        den = np.clip(np.asarray(
            denoise_image(ldr_m, ldr_v, jnp.asarray(img))), 0, 1)
        base = rmse(den, gt)
        try:
            aovs = r._last_aovs
            h, w = film[1], film[0]
            alb = np.asarray(aovs["albedo"]).reshape(h, w, 3)
            nrm = np.asarray(aovs["normal"]).reshape(h, w, 3)
            den2 = np.clip(np.asarray(denoise_image(
                an_m, an_v, jnp.asarray(img),
                albedo=jnp.asarray(alb), normal=jnp.asarray(nrm))), 0, 1)
            guided = rmse(den2, gt)
        except Exception as e:
            guided = f"error: {type(e).__name__}: {e}"
        print(f"spp={spp:4d}  raw={raw:.4f}  rt_ldr={base:.4f}  "
              f"alb_nrm={guided}", flush=True)

    # Denoiser self-distortion floor on this scene: denoise the golden.
    den_g = np.clip(np.asarray(
        denoise_image(ldr_m, ldr_v, jnp.asarray(gt))), 0, 1)
    print(f"rt_ldr floor (denoised golden vs golden): "
          f"{rmse(den_g, gt):.4f}", flush=True)


if __name__ == "__main__":
    main()
