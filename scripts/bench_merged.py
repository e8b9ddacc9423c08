"""Merged-wave density sweep + packet-kernel stats on real TPU.

Questions this answers (round-3 traversal campaign):
1. Does cross-sample merged density keep paying past k=16, or saturate?
   (renderer caps lanes at ~4M for sort workspace; sweep k and watch
   Mrays/s + sort share)
2. At production density, what are pops + clusters per packet (union
   tax), per wave type? -> where the next kernel lever is.

Usage: python scripts/bench_merged.py [teapot|dragon|vw-van] [kmax]
"""

import os
import sys
import time
import dataclasses
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENES = {
    "cornell": "/root/reference/Scenes/cornell-box/scene.pbrt",
    "teapot": "/root/reference/Scenes/Teapot/scene.pbrt",
    "dragon": "/root/reference/Scenes/dragon/scene.pbrt",
    "vw-van": "/root/reference/Scenes/vw-van/vw-van.pbrt",
}
FILMS = {
    "cornell": (512, 512), "teapot": (640, 368),
    "dragon": (640, 368), "vw-van": (512, 320),
}


def main():
    scene_key = sys.argv[1] if len(sys.argv) > 1 else "teapot"
    kmax = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    kmin = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from tracerboy_tpu.renderer import Renderer
    from tracerboy_tpu.trace.wavefront import (
        make_blue_noise_params,
        render_wave,
        render_wave_merged,
    )

    r = Renderer(SCENES[scene_key], film_size=FILMS[scene_key])
    cfg = dataclasses.replace(r.wave_config(), max_bounces=6,
                              want_aovs=False)
    if os.environ.get("TB_ENV_NEE") == "0":  # A/B the extra shadow wave
        cfg = dataclasses.replace(cfg, env_nee=False)
    W, H = FILMS[scene_key]
    pixel_ids = jnp.arange(W * H, dtype=jnp.int32)
    params = dict(
        dof_focus=jnp.float32(0.0), dof_aperture=jnp.float32(0.0),
        firefly_clamp=jnp.float32(0.0), seed=jnp.int32(0),
        bn=make_blue_noise_params(r.scene_pytree, pixel_ids, W),
    )
    print(f"{scene_key}: {W}x{H} = {W*H} px, backend={r.traversal}",
          flush=True)

    def timed(step, n_runs=4):
        # Block EVERY dispatch: enqueue-ahead hangs on this tunnel
        # (observed 2026-08-17) and per-wave work >> RTT anyway.
        out = step(jnp.int32(0))
        rays = float(out["rays_traced"])
        times = []
        for q in range(n_runs):
            t0 = time.time()
            out = step(jnp.int32(1 + q))
            float(out["rays_traced"])
            times.append(time.time() - t0)
        per = min(times)
        return rays / per / 1e6, rays, per

    k = kmin
    while k <= kmax:
        if k == 1:
            step = jax.jit(lambda s: render_wave(
                r.scene_pytree, params, pixel_ids, s, cfg))
        else:
            step = jax.jit(partial(
                render_wave_merged, r.scene_pytree, params, pixel_ids,
                k=k, cfg=cfg))
        try:
            mrays, rays, per = timed(step)
            print(f"k={k:3d}  lanes={k*W*H/1e6:5.2f}M  "
                  f"rays/wave={rays/1e6:6.2f}M  {per*1e3:8.1f} ms  "
                  f"{mrays:7.2f} Mrays/s", flush=True)
        except Exception as e:
            print(f"k={k:3d}  FAILED: {type(e).__name__}: {e}", flush=True)
            break
        k *= 2


if __name__ == "__main__":
    main()
