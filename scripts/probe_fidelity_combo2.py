"""Fidelity-gate shootout v2: demod-aware variants on decoupled traces.

One DECOUPLED trace per estimator config gives every pipeline the same
inputs: per-sample exact composites (= the plain trace, test_demod) for
the image + per-pixel variance, plus converged-ish mean planes (illum I,
modulated share D, albedo, normal) for the demodulated variants.

Measured motivation (round 3): plain oidn-ldr-reinhard = 0.0271 where
the rt_ldr distortion floor on the CLEAN golden is 0.0090 — residual
NOISE dominates, so the levers are (a) lower-variance estimator configs
(RR off, firefly clamp), (b) demodulation so the denoiser sees smooth
illumination (the reference's RealTime design, CompositeAlbedoCS.hlsl),
(c) filtering the noisy dc/albedo planes BEFORE the composite (the raw
demod variant measured WORSE — 0.0438 — precisely because the noisy
per-pixel dc ratio multiplies the denoised signal back in).

Usage: python scripts/probe_fidelity_combo2.py [scene] [spp] [clamp]
"""

import dataclasses
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
    clamp = float(sys.argv[3]) if len(sys.argv) > 3 else 16.0

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from tracerboy_tpu.core.image_io import read_exr_rgb
    from tracerboy_tpu.ml.oidn import denoise_image, load_oidn
    from tracerboy_tpu.post.denoise import denoise
    from tracerboy_tpu.post.realtime import composite_albedo
    from tracerboy_tpu.renderer import Renderer, _demod_ratio
    from tracerboy_tpu.trace.wavefront import render_wave

    path, film, golden_rel = SCENES[scene_key]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.environ.get("TB_PROBE_FILM"):
        # Smoke-testing the probe itself on CPU: tiny film, golden
        # replaced by a zero image (scores are meaningless, shapes real).
        fw_, fh_ = map(int, os.environ["TB_PROBE_FILM"].split("x"))
        film = (fw_, fh_)
        gt = np.zeros((fh_, fw_, 3), np.float32)
    else:
        gt = np.clip(np.asarray(read_exr_rgb(os.path.join(root, golden_rel))),
                     0, 1) ** (1 / 2.2)

    def tm(x):
        return np.clip(np.asarray(x), 0, 1) ** (1 / 2.2)

    def rmse(a):
        return float(np.sqrt(np.mean((np.asarray(a) - gt) ** 2)))

    def fwd(x):
        x = np.maximum(np.asarray(x), 0.0)
        return (x / (1.0 + x)) ** (1 / 2.2)

    def inv(y):
        y = np.clip(np.asarray(y), 0.0, 0.995) ** 2.2
        return y / (1.0 - y)

    ldr = load_oidn("/root/reference/TracerBoy/ML/rt_ldr.tza")
    an = load_oidn("/root/reference/TracerBoy/ML/rt_ldr_alb_nrm.tza")

    def oidn(img01, model=ldr, **kw):
        return np.asarray(denoise_image(model[0], model[1],
                                        jnp.asarray(img01), **kw))

    h, w = film[1], film[0]

    def trace(tag, rr, fclamp):
        r = Renderer(path, film_size=film)
        if fclamp:
            r.settings = r.settings.replace(fireflies_clamp=fclamp)
        cfg = dataclasses.replace(r.wave_config(), decouple_albedo=True,
                                  want_aovs=True,
                                  use_russian_roulette=rr)
        pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
        params = r.frame_params()
        step = jax.jit(lambda s: render_wave(
            r.scene_pytree, params, pixel_ids, s, cfg))
        acc, comps = {}, []
        for s in range(spp):
            out = step(jnp.int32(s))
            fw1 = out["filter_weight"].reshape(h, w, 1)
            ind = out["radiance"].reshape(h, w, 3)
            ind_d = out["radiance_d"].reshape(h, w, 3)
            alb = out["albedo"].reshape(h, w, 3)
            emi = out["emissive"].reshape(h, w, 3)
            # Exact per-sample composite == the plain trace
            # (tests/test_demod.py) — normalized per sample.
            comp = (alb * ind_d + (ind - ind_d) + emi * fw1)
            comps.append(np.asarray(comp / jnp.maximum(fw1, 1e-8)))
            for k in ("radiance", "radiance_d", "albedo", "normal",
                      "world_pos", "emissive"):
                acc[k] = acc.get(k, 0.0) + out[k].reshape(h, w, 3) / spp
            acc["nd"] = acc.get("nd", 0.0) + out["neighbor_dist"].reshape(
                h, w, 1) / spp
            acc["fw"] = acc.get("fw", 0.0) + fw1 / spp
            float(out["rays_traced"])
        fw = np.maximum(np.asarray(acc["fw"]), 1e-8)
        stack = np.stack(comps)
        planes = dict(
            plain=stack.mean(0),
            halves=(stack[0::2].mean(0), stack[1::2].mean(0)),
            var=(stack * np.array([0.2126, 0.7152, 0.0722])).sum(-1)
            .var(axis=0) / max(spp - 1, 1),
            illum=np.asarray(acc["radiance"]) / fw,
            dc=np.asarray(_demod_ratio(
                jnp.asarray(acc["radiance_d"] / fw),
                jnp.asarray(acc["radiance"] / fw))),
            alb=np.clip(np.asarray(acc["albedo"]), 0, 1),
            nrm=np.asarray(acc["normal"]),
            emi=np.asarray(acc["emissive"]),
            wpos4=np.concatenate([np.asarray(acc["world_pos"]),
                                  np.asarray(acc["nd"])], axis=-1),
        )
        print(f"[{tag}] raw plain: {rmse(tm(planes['plain'])):.4f}",
              flush=True)
        return planes

    def atrous_plane(p, planes, iters=2):
        """Edge-aware smoothing of a noisy composite plane (dc/albedo)
        via the SVGF a-trous machinery, normal+position guided."""
        x = jnp.asarray(np.concatenate(
            [p, np.zeros(p.shape[:2] + (1,), np.float32)], axis=-1))
        out = denoise(x, jnp.asarray(p), jnp.asarray(planes["nrm"]),
                      jnp.asarray(planes["wpos4"]), iterations=iters)
        return np.asarray(out)[..., :3]

    def score(tag, img_lin):
        print(f"{tag}: {rmse(tm(img_lin)):.4f}", flush=True)

    def variants(tag, planes):
        plain, illum = planes["plain"], planes["illum"]
        alb, nrm, dc, emi = (planes["alb"], planes["nrm"], planes["dc"],
                             planes["emi"])
        score(f"[{tag}] oidn ldr reinhard",
              inv(oidn(fwd(plain))))
        score(f"[{tag}] oidn alb_nrm reinhard",
              inv(oidn(fwd(plain), an, albedo=jnp.asarray(alb),
                       normal=jnp.asarray(nrm))))
        ha, hb = planes["halves"]
        score(f"[{tag}] two-half oidn ldr avg",
              0.5 * (inv(oidn(fwd(ha))) + inv(oidn(fwd(hb)))))
        den_i = inv(oidn(fwd(illum)))
        score(f"[{tag}] demod raw-planes",
              np.asarray(composite_albedo(
                  jnp.asarray(alb), jnp.asarray(dc), jnp.asarray(den_i),
                  jnp.asarray(emi))))
        dc_f = np.clip(atrous_plane(dc, planes, iters=2), 0, 1)
        alb_f = np.clip(atrous_plane(alb, planes, iters=1), 0, 1)
        score(f"[{tag}] demod filtered dc",
              np.asarray(composite_albedo(
                  jnp.asarray(alb), jnp.asarray(dc_f),
                  jnp.asarray(den_i), jnp.asarray(emi))))
        score(f"[{tag}] demod filtered dc+alb",
              np.asarray(composite_albedo(
                  jnp.asarray(alb_f), jnp.asarray(dc_f),
                  jnp.asarray(den_i), jnp.asarray(emi))))
        den_i_an = inv(oidn(fwd(illum), an,
                            albedo=jnp.ones_like(jnp.asarray(alb)),
                            normal=jnp.asarray(nrm)))
        score(f"[{tag}] demod alb_nrm(white) filtered dc",
              np.asarray(composite_albedo(
                  jnp.asarray(alb), jnp.asarray(dc_f),
                  jnp.asarray(den_i_an), jnp.asarray(emi))))

    base = trace("base", rr=True, fclamp=0.0)
    variants("base", base)
    qual = trace(f"rr-off clamp={clamp}", rr=False, fclamp=clamp)
    variants(f"rr-off clamp={clamp}", qual)


if __name__ == "__main__":
    main()
