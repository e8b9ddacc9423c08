"""Benchmark harness: ray throughput on the BASELINE.json configs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 100 Mrays/s per TPU v5e chip on the
cornell-box 512x512 path-tracing config.

Measures the full wavefront (6 bounces, NEE + shadow rays, russian
roulette, blue-noise sampling) — not a bare-intersection microbenchmark.
Waves are dispatched asynchronously and drained with one final
block_until_ready; per-wave time amortizes dispatch latency.
"""

import json
import os
import sys
import time
from functools import partial

# Persistent compilation cache: the first TPU compile of the render
# program is slow over the remote-compile tunnel; cache it in-repo so
# subsequent bench runs skip it.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tracerboy_tpu.scene.compile import load_scene
    from tracerboy_tpu.trace.wavefront import WaveConfig, render_wave

    W = H = 512
    scene_path = "/root/reference/Scenes/cornell-box/scene.pbrt"

    cs = load_scene(scene_path, use_cache=False, film_size=(W, H))
    scene = cs.as_pytree()
    cfg = WaveConfig(
        width=W, height=H, max_bounces=6, leaf_size=cs.leaf_size,
        num_lights=cs.num_lights, has_env=cs.has_env,
        enable_nee=True, traversal="brute",
        has_mix=False, has_textures=False,
        want_aovs=False,  # pure progressive accumulation
    )
    pixel_ids = jnp.arange(W * H, dtype=jnp.int32)
    from tracerboy_tpu.trace.wavefront import make_blue_noise_params

    params = dict(
        dof_focus=jnp.float32(0.0), dof_aperture=jnp.float32(0.0),
        firefly_clamp=jnp.float32(0.0), seed=jnp.int32(0),
        bn=make_blue_noise_params(scene, pixel_ids, W),
    )
    step = jax.jit(partial(render_wave, cfg=cfg))

    # Warmup / compile (served from the persistent cache when possible).
    out = step(scene, params, pixel_ids, jnp.int32(0))
    jax.block_until_ready(out["rays_traced"])
    rays_per_wave = float(out["rays_traced"])

    # Timed: async-dispatch a fixed number of waves, drain once.
    n_runs = 200
    t0 = time.time()
    for r in range(n_runs):
        out = step(scene, params, pixel_ids, jnp.int32(r + 1))
    jax.block_until_ready(out["rays_traced"])
    elapsed = time.time() - t0

    mrays = rays_per_wave * n_runs / elapsed / 1e6
    print(
        json.dumps(
            {
                "metric": "Mrays/s/chip (cornell-box 512x512 full wavefront:"
                          " 6 bounces, NEE+shadows, RR, blue noise)",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
