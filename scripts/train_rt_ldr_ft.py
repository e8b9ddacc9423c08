"""Train the scene-adapted rt_ldr fine-tune on the TPU.

Stage 1: render the orbit-view dataset (resumable: skipped if the .npz
exists). Stage 2: fine-tune from the reference's rt_ldr.tza. Stage 3:
validate on the GATE view (never trained on) against the 512x320
golden with the exact bench recipe transfer, printing the ensemble
member's RMSE next to the pretrained member's.

Usage: python scripts/train_rt_ldr_ft.py [--views N] [--steps N]
       [--scene vw-van] [--stop-at UNIX]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

SCENES = {
    "vw-van": "/root/reference/Scenes/vw-van/vw-van.pbrt",
    "cornell": "/root/reference/Scenes/cornellbox/cornellbox.pbrt",
}
GOLDENS = {
    "vw-van": "/root/repo/goldens/vwvan_512x320.exr",
    "cornell": "/root/repo/goldens/cornell_512.exr",
}
FILMS = {"vw-van": (512, 320), "cornell": (512, 512)}
DATA = "/root/repo/.ft_data/{scene}_pairs.npz"
OUT = "/root/repo/tracerboy_tpu/ml/weights/rt_ldr_ft.npz"


def validate(scene_key, weights_npz):
    """RMSE of the ft member vs the pretrained member on the gate view."""
    import jax.numpy as jnp

    from tracerboy_tpu.core.image_io import read_exr_rgb
    from tracerboy_tpu.ml.finetune import (
        load_params_npz, reinhard_fwd, reinhard_inv,
    )
    from tracerboy_tpu.ml.oidn import denoise_image, load_oidn
    from tracerboy_tpu.post.pipeline import auto_exposure_scale
    from tracerboy_tpu.renderer import Renderer

    golden = read_exr_rgb(GOLDENS[scene_key])
    r = Renderer(SCENES[scene_key], film_size=FILMS[scene_key])
    r.render_sample(8)
    lin = np.maximum(np.asarray(r.resolve_radiance(), np.float32), 0.0)
    expo = float(auto_exposure_scale(jnp.asarray(lin)))

    def tm(x):
        return np.clip(np.asarray(x), 0.0, 1.0) ** (1 / 2.2)

    def tta4(model, variables, e):
        outs = []
        for fy, fx in ((False, False), (False, True), (True, False),
                       (True, True)):
            x = lin[::-1 if fy else 1, ::-1 if fx else 1] * e
            y = np.asarray(denoise_image(
                model, variables, jnp.asarray(reinhard_fwd(x))))
            y = reinhard_inv(y) / e
            outs.append(y[::-1 if fy else 1, ::-1 if fx else 1])
        return np.mean(outs, axis=0)

    gt = tm(golden)

    def rmse(den_lin):
        return float(np.sqrt(np.mean((tm(den_lin) - gt) ** 2)))

    pre_m, pre_v = load_oidn("/root/reference/TracerBoy/ML/rt_ldr.tza")
    ft_m, ft_v = load_params_npz(weights_npz)
    pre = tta4(pre_m, pre_v, expo)
    ft = tta4(ft_m, ft_v, expo)
    print(f"[{scene_key}] gamma22 rmse  pretrained={rmse(pre):.5f}  "
          f"ft={rmse(ft):.5f}  blend50={rmse(0.5 * pre + 0.5 * ft):.5f}",
          flush=True)
    return rmse(pre), rmse(ft)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="vw-van")
    ap.add_argument("--views", type=int, default=48)
    ap.add_argument("--input-spp", type=int, default=8)
    ap.add_argument("--target-spp", type=int, default=128)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", default=OUT)
    ap.add_argument("--stop-at", type=float, default=float("inf"))
    args = ap.parse_args()

    from tracerboy_tpu.ml.finetune import finetune, make_dataset

    data = DATA.format(scene=args.scene)
    t0 = time.time()
    if not os.path.exists(data):
        make_dataset(
            SCENES[args.scene], data, film=FILMS[args.scene],
            n_views=args.views, input_spp=args.input_spp,
            target_spp=args.target_spp,
            progress=lambda m: print(f"{time.time() - t0:7.0f}s {m}",
                                     flush=True))
    if time.time() > args.stop_at:
        print("stop-at reached after dataset; rerun to train", flush=True)
        return
    finetune(data, args.out, steps=args.steps, lr=args.lr,
             batch=args.batch,
             progress=lambda m: print(f"{time.time() - t0:7.0f}s {m}",
                                      flush=True))
    validate(args.scene, args.out)


if __name__ == "__main__":
    main()
