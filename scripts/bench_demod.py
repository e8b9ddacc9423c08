"""Probe: demodulated-albedo denoising for the 8-spp fidelity gate.

The reference's RealTime path denoises DEMODULATED lighting and
re-composites albedo afterwards (CompositeAlbedoCS.hlsl:17-26,
TracerBoy.cpp:3062-3160): the denoiser never sees texture detail, so
its distortion floor collapses. Here: trace spp demodulated samples
(decouple_albedo), average radiance + AOVs, denoise tonemapped
indirect with rt_ldr / alb_nrm(white albedo), composite, RMSE vs the
converged golden.

Usage: python scripts/bench_demod.py [scene] [spp] [clamp]
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

    from tracerboy_tpu.core.image_io import read_exr_rgb
    from tracerboy_tpu.ml.oidn import denoise_image, load_oidn
    from tracerboy_tpu.post.realtime import composite_albedo
    from tracerboy_tpu.renderer import Renderer
    from tracerboy_tpu.trace.wavefront import render_wave

    path, film, golden_rel = SCENES[scene_key]
    golden_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), golden_rel)
    gt = np.clip(np.asarray(read_exr_rgb(golden_path)), 0, 1) ** (1 / 2.2)

    def tm(x):
        return np.clip(np.asarray(x), 0.0, 1.0) ** (1 / 2.2)

    def rmse(a, b):
        return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))

    r = Renderer(path, film_size=film)
    if clamp:
        r.settings = r.settings.replace(fireflies_clamp=clamp)
    h, w = film[1], film[0]
    cfg = dataclasses.replace(r.wave_config(), decouple_albedo=True)
    pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
    params = r.frame_params()

    acc = {}
    step = jax.jit(lambda sc, pp, pi, s: render_wave(sc, pp, pi, s, cfg))
    for s in range(spp):
        out = step(r.scene_pytree, params, pixel_ids, jnp.int32(s))
        for k in ("radiance", "radiance_d", "albedo", "normal",
                  "emissive"):
            v = out[k].reshape(h, w, 3)
            acc[k] = acc.get(k, 0.0) + v / spp
        fw = out["filter_weight"].reshape(h, w, 1)
        acc["fw"] = acc.get("fw", 0.0) + fw / spp
        float(out["rays_traced"])  # block (tunnel enqueue-ahead hang)

    fw = jnp.maximum(acc["fw"], 1e-8)
    ind = np.asarray(acc["radiance"] / fw)
    # Exact per-channel modulation ratio from the two-plane trace.
    from tracerboy_tpu.renderer import _demod_ratio

    acc["dc"] = np.asarray(_demod_ratio(
        jnp.asarray(acc["radiance_d"]) / fw, jnp.asarray(ind)))

    # Invertible Reinhard transfer for the denoiser: the demodulated
    # illumination routinely exceeds 1 under the white dome, and the
    # clip(x,0,1)^(1/2.2) gate transfer DESTROYS it before the
    # denoiser ever sees it (measured: rt_ldr-on-clipped-demod 0.047
    # vs 0.030 plain). x/(1+x) keeps the full range in [0,1).
    def fwd(x):
        x = np.maximum(np.asarray(x), 0.0)
        return (x / (1.0 + x)) ** (1 / 2.2)

    def inv(y):
        y = np.clip(np.asarray(y), 0.0, 0.995) ** 2.2
        return y / (1.0 - y)

    ldr = load_oidn("/root/reference/TracerBoy/ML/rt_ldr.tza")
    an = load_oidn("/root/reference/TracerBoy/ML/rt_ldr_alb_nrm.tza")

    def composite_and_score(den_lin, tag):
        outc = composite_albedo(
            jnp.asarray(acc["albedo"]), jnp.asarray(acc["dc"]),
            jnp.asarray(den_lin), jnp.asarray(acc["emissive"]),
        )
        score = rmse(tm(outc), gt)
        print(f"{tag}: rmse={score:.4f}", flush=True)
        return score

    nrm = np.asarray(acc["normal"])
    white = jnp.ones_like(jnp.asarray(nrm))

    # Raw (no denoise) composite sanity: measures demod round-trip error.
    composite_and_score(ind, f"raw composite (spp={spp})")
    for name, model, kw in (
        ("rt_ldr", ldr, {}),
        ("alb_nrm(white,normal)", an,
         dict(albedo=white, normal=jnp.asarray(nrm))),
    ):
        den = denoise_image(model[0], model[1], jnp.asarray(fwd(ind)),
                            **kw)
        composite_and_score(inv(den), f"{name} reinhard demod")

    # Plain (non-demod) path through the same reinhard transfer, for
    # comparison against the clip-transfer bench numbers.
    plain = np.asarray(composite_albedo(
        jnp.asarray(acc["albedo"]), jnp.asarray(acc["dc"]),
        jnp.asarray(ind), jnp.asarray(acc["emissive"]),
    ))
    for name, model, kw in (
        ("rt_ldr", ldr, {}),
        ("alb_nrm", an,
         dict(albedo=jnp.asarray(np.clip(acc["albedo"], 0, 1)),
              normal=jnp.asarray(nrm))),
    ):
        den = denoise_image(model[0], model[1], jnp.asarray(fwd(plain)),
                            **kw)
        score = rmse(tm(inv(den)), gt)
        print(f"{name} reinhard plain: rmse={score:.4f}", flush=True)

    den_g = denoise_image(ldr[0], ldr[1], jnp.asarray(gt))
    print(f"(reference) rt_ldr floor on golden: "
          f"{rmse(np.clip(np.asarray(den_g), 0, 1), gt):.4f}", flush=True)


if __name__ == "__main__":
    main()
