"""Generate converged golden renders consumed by bench.py's fidelity and
time-to-PSNR gates. Run once on TPU hardware; goldens/ is committed.

  python scripts/make_goldens.py [--only cornell_512,...]

Goldens (linear radiance EXRs):
  cornell_512.exr      cornell-box 512x512, 1024 spp
  cornell_1080p.exr    cornell-box 1920x1088, 256 spp
  vwvan_512x320.exr    vw-van 512x320, 8192 spp (pallas backend)
  vwvan_512x320_g.exr  same, rendered with the tent reconstruction
                       splat (CameraSettings.filter_splat) — the gate
                       target for splat-filtered renders; a splat
                       render must NEVER be scored against the box
                       golden (different reconstruction kernels).
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "goldens")

JOBS = {
    "cornell_512": ("/root/reference/Scenes/cornell-box/scene.pbrt",
                    (512, 512), 1024),
    "cornell_1080p": ("/root/reference/Scenes/cornell-box/scene.pbrt",
                      (1920, 1088), 256),
    # 8192 spp: the 1024-spp golden measured sigma_g ~= 0.021 in gate
    # space (probe_golden_noise two-point fit: per-sample sigma 0.69
    # under the pre-env-NEE estimator) — ABOVE the 1e-2 fidelity gate,
    # i.e. the gate was measuring the golden's own noise. With env NEE
    # (per-sample sigma ~0.20) 8192 spp puts the floor at ~0.002.
    "vwvan_512x320": ("/root/reference/Scenes/vw-van/vw-van.pbrt",
                      (512, 320), 8192),
    # vwvan_512x320_g (tent-splat golden) was dropped: the splat gate
    # recipe measured a no-go (probe_splat_r5.py — splat correlates
    # neighbor noise, canceling the denoiser's gain). SPLAT_JOBS keeps
    # the machinery for scenes that do want a tent golden.
}
SPLAT_JOBS = set()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else set(JOBS)

    import numpy as np

    from tracerboy_tpu.core.image_io import write_exr
    from tracerboy_tpu.renderer import Renderer

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, (path, film, spp) in JOBS.items():
        if name not in only:
            continue
        out = os.path.join(GOLDEN_DIR, f"{name}.exr")
        if os.path.exists(out):
            print(f"{name}: exists, skipping")
            continue
        t0 = time.time()
        r = Renderer(path, film_size=film)
        if name in SPLAT_JOBS:
            import dataclasses

            cam = dataclasses.replace(
                r.settings.camera_settings, filter_splat=True)
            r.settings = dataclasses.replace(
                r.settings, camera_settings=cam)
            assert r.wave_config().filter_splat
        print(f"{name}: backend={r.traversal}, {spp} spp @ {film} ...")
        done = 0
        while done < spp:
            n = min(args.batch, spp - done)
            st = r.render_sample(n)
            # Block per batch: unbounded enqueue-ahead can hang the
            # remote-attach tunnel (same guard as bench.py).
            float(st.accum[0, 0, 0])
            done += n
            if done % 64 == 0 or done == spp:
                print(f"  [{time.time()-t0:7.1f}s] {done}/{spp} spp")
        img = np.asarray(r.resolve_radiance()).astype(np.float32)
        write_exr(out, {
            "R": img[..., 0], "G": img[..., 1], "B": img[..., 2],
        })
        print(f"{name}: wrote {out} ({time.time()-t0:.0f}s)")

    if "vwvan_512x320" in only:
        aux_path = os.path.join(GOLDEN_DIR, "vwvan_512x320_aux.npz")
        if not os.path.exists(aux_path):
            make_aux("vwvan_512x320", aux_path, spp=2048)


def make_aux(name, out_path, spp=2048):
    """Converged DECOUPLED planes for the demod-fidelity floor probes:
    illumination I (white-albedo radiance), modulated share D, mean
    albedo/normal/emissive. Composite-of-means carries an edge
    cross-term (cov(albedo, D) per pixel) vs the plain golden — that is
    inherent to every albedo-demodulated denoise pipeline, so the probe
    needs these planes to measure it, not the plain EXR."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from tracerboy_tpu.renderer import Renderer
    from tracerboy_tpu.trace.wavefront import (render_wave,
                                               render_wave_merged)

    path, film, _ = JOBS[name]
    t0 = time.time()
    r = Renderer(path, film_size=film)
    h, w = film[1], film[0]
    N = w * h
    cfg = dataclasses.replace(r.wave_config(), decouple_albedo=True,
                              want_aovs=True)
    pixel_ids = jnp.arange(N, dtype=jnp.int32)
    params = r.frame_params()
    k = max(1, min(32, 8_388_608 // N))
    print(f"{name}: aux decoupled pass, {spp} spp, k={k} ...")
    acc = {}
    done = 0
    while done < spp:
        kk = min(k, spp - done)
        out = render_wave_merged(r.scene_pytree, params, pixel_ids,
                                 jnp.int32(done), kk, cfg,
                                 fold_aovs=True)
        for key in ("radiance", "radiance_d", "albedo", "normal",
                    "emissive"):
            acc[key] = acc.get(key, 0.0) + out[key].reshape(h, w, 3)
        acc["fw"] = acc.get("fw", 0.0) + out["filter_weight"].reshape(
            h, w, 1)
        float(out["rays_traced"])  # block (tunnel enqueue-ahead hang)
        done += kk
        if done % 256 == 0 or done >= spp:
            print(f"  [{time.time()-t0:7.1f}s] {done}/{spp} spp")
    fw = np.maximum(np.asarray(acc["fw"]), 1e-8)
    np.savez_compressed(
        out_path,
        illum=(np.asarray(acc["radiance"]) / fw).astype(np.float32),
        illum_d=(np.asarray(acc["radiance_d"]) / fw).astype(np.float32),
        albedo=(np.asarray(acc["albedo"]) / spp).astype(np.float32),
        normal=(np.asarray(acc["normal"]) / spp).astype(np.float32),
        emissive=(np.asarray(acc["emissive"]) / spp).astype(np.float32),
        fw=(fw / spp).astype(np.float32),
        spp=np.int32(spp),
    )
    print(f"{name}: wrote {out_path} ({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
