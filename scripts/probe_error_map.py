"""Fidelity diagnosis: where does the vw-van 8-spp denoised error live?

Renders spp samples (defaults mirror the bench gate), denoises with both
OIDN models, and writes:
  /tmp/err_raw.png      tonemapped |raw - golden| x8
  /tmp/err_den.png      tonemapped |denoised - golden| x8
  /tmp/noise.png        per-pixel std across samples x4
  /tmp/den.png, /tmp/raw.png, /tmp/golden.png
plus region stats (glass/specular vs diffuse vs edges) to stdout.

Usage: python scripts/probe_error_map.py [scene] [spp] [clamp]
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
    clamp = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from tracerboy_tpu.core.image_io import read_exr_rgb, write_png
    from tracerboy_tpu.ml.oidn import denoise_image, load_oidn
    from tracerboy_tpu.renderer import Renderer
    from tracerboy_tpu.trace.wavefront import render_wave

    path, film, golden_rel = SCENES[scene_key]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gt = np.clip(np.asarray(read_exr_rgb(os.path.join(root, golden_rel))),
                 0, 1) ** (1 / 2.2)

    r = Renderer(path, film_size=film)
    if clamp:
        r.settings = r.settings.replace(fireflies_clamp=clamp)
    h, w = film[1], film[0]
    cfg = r.wave_config()
    pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
    params = r.frame_params()

    step = jax.jit(lambda s: render_wave(
        r.scene_pytree, params, pixel_ids, s, cfg))
    acc = {}
    samples = []
    for s in range(spp):
        out = step(jnp.int32(s))
        rad = out["radiance"].reshape(h, w, 3)
        fw1 = out["filter_weight"].reshape(h, w, 1)
        samples.append(np.asarray(rad / jnp.maximum(fw1, 1e-8)))
        for k in ("radiance", "albedo", "normal"):
            acc[k] = acc.get(k, 0.0) + out[k].reshape(h, w, 3) / spp
        acc["fw"] = acc.get("fw", 0.0) + fw1 / spp
        acc["mat"] = out["material"].reshape(h, w)
        float(out["rays_traced"])

    img_lin = np.asarray(acc["radiance"] / jnp.maximum(acc["fw"], 1e-8))
    img = np.clip(img_lin, 0, 1) ** (1 / 2.2)
    noise = np.std(np.stack(samples), axis=0).mean(axis=2)

    def rmse(a, b, mask=None):
        d = (np.asarray(a) - np.asarray(b)) ** 2
        if mask is not None:
            d = d[mask]
        return float(np.sqrt(d.mean()))

    print(f"raw rmse: {rmse(img, gt):.4f}")

    ldr = load_oidn("/root/reference/TracerBoy/ML/rt_ldr.tza")
    an = load_oidn("/root/reference/TracerBoy/ML/rt_ldr_alb_nrm.tza")
    den1 = np.clip(np.asarray(denoise_image(
        ldr[0], ldr[1], jnp.asarray(img))), 0, 1)
    alb = np.clip(np.asarray(acc["albedo"]), 0, 1)
    nrm = np.asarray(acc["normal"])
    den2 = np.clip(np.asarray(denoise_image(
        an[0], an[1], jnp.asarray(img), albedo=jnp.asarray(alb),
        normal=jnp.asarray(nrm))), 0, 1)
    print(f"rt_ldr: {rmse(den1, gt):.4f}   alb_nrm: {rmse(den2, gt):.4f}")
    den = den2 if rmse(den2, gt) < rmse(den1, gt) else den1

    # Region decomposition on the better model.
    mats = np.asarray(r.compiled.materials["flags"])
    mat_id = np.asarray(acc["mat"])
    valid = mat_id >= 0
    flags = np.zeros_like(mat_id)
    flags[valid] = mats[mat_id[valid]]
    # METALLIC_FLAG=0x1, SUBSURFACE_SCATTER_FLAG=0x2 (materials.py:23-24)
    spec_like = valid & (((flags & 0x1) != 0) | ((flags & 0x2) != 0))
    miss = ~valid
    gy, gx = np.gradient(gt.mean(axis=2))
    edges = (np.hypot(gx, gy) > 0.03) & ~miss
    flat = valid & ~edges & ~spec_like
    for name, m in (("specular/sss", spec_like & ~edges),
                    ("edges", edges), ("flat diffuse", flat),
                    ("miss/env", miss)):
        if m.sum() == 0:
            continue
        e = rmse(den, gt, m)
        share = float((((den - gt) ** 2) * m[..., None]).sum()
                      / ((den - gt) ** 2).sum())
        print(f"  {name:13s}: pixels={m.mean():5.1%}  rmse={e:.4f}  "
              f"share of MSE={share:5.1%}  mean-noise="
              f"{noise[m].mean():.4f}")

    def save(name, arr):
        write_png(f"/tmp/{name}.png",
                  (np.clip(arr, 0, 1) * 255).astype(np.uint8))

    save("raw", img)
    save("den", den)
    save("golden", gt)
    save("err_raw", np.abs(img - gt) * 8)
    save("err_den", np.abs(den - gt) * 8)
    save("noise", noise[..., None].repeat(3, axis=2) * 4)
    print("wrote /tmp/{raw,den,golden,err_raw,err_den,noise}.png")


if __name__ == "__main__":
    main()
