"""Score Renderer.render_denoised (the product gate pipeline) against
the converged golden — the same measurement bench.py's rmse8 gate will
make, so probe winners transfer 1:1.

Usage: python scripts/probe_gate_api.py [scene] [spp]
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
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import numpy as np

    from tracerboy_tpu.core.image_io import read_exr_rgb
    from tracerboy_tpu.renderer import Renderer

    path, film, golden_rel = SCENES[scene_key]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gt = np.clip(np.asarray(read_exr_rgb(os.path.join(root, golden_rel))),
                 0, 1) ** (1 / 2.2)

    def rmse(img):
        a = np.clip(np.asarray(img), 0, 1) ** (1 / 2.2)
        return float(np.sqrt(np.mean((a - gt) ** 2)))

    r = Renderer(path, film_size=film)
    for tag, kw in (
        ("plain rt_ldr", dict(demod=False)),
        ("plain rt_ldr clamp16", dict(demod=False, clamp=16.0)),
        ("demod rt_ldr", dict(demod=True)),
        ("demod rt_ldr clamp16", dict(demod=True, clamp=16.0)),
        ("demod rt_ldr clamp16 dcf3", dict(demod=True, clamp=16.0,
                                           dc_filter_iters=3)),
        ("demod rt_ldr clamp16 +alb_f", dict(demod=True, clamp=16.0,
                                             filter_albedo=True)),
        ("demod alb_nrm clamp16", dict(demod=True, clamp=16.0,
                                       model="rt_ldr_alb_nrm")),
    ):
        img = r.render_denoised(spp=spp, **kw)
        print(f"{tag}: rmse={rmse(img):.4f}", flush=True)


if __name__ == "__main__":
    main()
