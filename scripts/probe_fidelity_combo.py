"""Fidelity-gate variant shootout on one 8-spp trace.

Scores every denoise pipeline we have against the converged golden in
gate space (clip^(1/2.2) RMSE): OIDN (clip + reinhard transfers),
SVGF-style a-trous (variance-guided, using the renderer's own AOVs),
and hybrids. One trace, many cheap denoise evaluations.

Usage: python scripts/probe_fidelity_combo.py [scene] [spp] [clamp]
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

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from tracerboy_tpu.core.image_io import read_exr_rgb
    from tracerboy_tpu.ml.oidn import denoise_image, load_oidn
    from tracerboy_tpu.post.denoise import denoise
    from tracerboy_tpu.renderer import Renderer
    from tracerboy_tpu.trace.wavefront import render_wave

    path, film, golden_rel = SCENES[scene_key]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gt = np.clip(np.asarray(read_exr_rgb(os.path.join(root, golden_rel))),
                 0, 1) ** (1 / 2.2)

    def tm(x):
        return np.clip(np.asarray(x), 0, 1) ** (1 / 2.2)

    def rmse(a):
        return float(np.sqrt(np.mean((np.asarray(a) - gt) ** 2)))

    r = Renderer(path, film_size=film)
    if clamp:
        r.settings = r.settings.replace(fireflies_clamp=clamp)
    h, w = film[1], film[0]
    cfg = r.wave_config()
    pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
    params = r.frame_params()
    step = jax.jit(lambda s: render_wave(
        r.scene_pytree, params, pixel_ids, s, cfg))
    acc, samples = {}, []
    for s in range(spp):
        out = step(jnp.int32(s))
        fw1 = out["filter_weight"].reshape(h, w, 1)
        samples.append(np.asarray(
            out["radiance"].reshape(h, w, 3) / jnp.maximum(fw1, 1e-8)))
        for k in ("radiance", "albedo", "normal", "world_pos"):
            acc[k] = acc.get(k, 0.0) + out[k].reshape(h, w, 3) / spp
        acc["nd"] = acc.get("nd", 0.0) + out["neighbor_dist"].reshape(
            h, w, 1) / spp
        acc["fw"] = acc.get("fw", 0.0) + fw1 / spp
        float(out["rays_traced"])

    lin = np.asarray(acc["radiance"] / jnp.maximum(acc["fw"], 1e-8))
    stack = np.stack(samples)
    # Variance of the MEAN of the spp samples, per pixel (luma).
    lum = (stack * np.array([0.2126, 0.7152, 0.0722])).sum(-1)
    var_mean = lum.var(axis=0) / max(spp - 1, 1)
    print(f"raw: {rmse(tm(lin)):.4f}", flush=True)

    alb = np.clip(np.asarray(acc["albedo"]), 0, 1)
    nrm = np.asarray(acc["normal"])
    wpos4 = np.concatenate([np.asarray(acc["world_pos"]),
                            np.asarray(acc["nd"])], axis=-1)

    def fwd(x):
        x = np.maximum(np.asarray(x), 0.0)
        return (x / (1.0 + x)) ** (1 / 2.2)

    def inv(y):
        y = np.clip(np.asarray(y), 0.0, 0.995) ** 2.2
        return y / (1.0 - y)

    ldr = load_oidn("/root/reference/TracerBoy/ML/rt_ldr.tza")
    an = load_oidn("/root/reference/TracerBoy/ML/rt_ldr_alb_nrm.tza")

    def oidn(img01, model, **kw):
        return np.asarray(denoise_image(model[0], model[1],
                                        jnp.asarray(img01), **kw))

    print(f"oidn ldr reinhard: "
          f"{rmse(tm(inv(oidn(fwd(lin), ldr)))):.4f}", flush=True)
    print(f"oidn alb_nrm reinhard: "
          f"{rmse(tm(inv(oidn(fwd(lin), an, albedo=jnp.asarray(alb), normal=jnp.asarray(nrm))))):.4f}",
          flush=True)

    cv = jnp.concatenate([jnp.asarray(lin),
                          jnp.asarray(var_mean)[..., None]], axis=-1)
    for iters in (3, 4, 5):
        dn = np.asarray(denoise(cv, jnp.asarray(lin), jnp.asarray(nrm),
                                jnp.asarray(wpos4), iterations=iters))
        print(f"a-trous x{iters}: {rmse(tm(dn[..., :3])):.4f}", flush=True)

    # Hybrid: 2 a-trous iterations to knock down high-frequency noise,
    # then OIDN for the low-frequency residue.
    dn2 = np.asarray(denoise(cv, jnp.asarray(lin), jnp.asarray(nrm),
                             jnp.asarray(wpos4), iterations=2))[..., :3]
    print(f"a-trous x2 -> oidn ldr reinhard: "
          f"{rmse(tm(inv(oidn(fwd(dn2), ldr)))):.4f}", flush=True)
    dn1 = np.asarray(denoise(cv, jnp.asarray(lin), jnp.asarray(nrm),
                             jnp.asarray(wpos4), iterations=1))[..., :3]
    print(f"a-trous x1 -> oidn ldr reinhard: "
          f"{rmse(tm(inv(oidn(fwd(dn1), ldr)))):.4f}", flush=True)


if __name__ == "__main__":
    main()
