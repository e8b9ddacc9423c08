"""Benchmark harness: ray throughput on the BASELINE.json configs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 100 Mrays/s per TPU v5e chip on the
cornell-box 512x512 path-tracing config.
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
    spp_per_call = 4
    scene_path = "/root/reference/Scenes/cornell-box/scene.pbrt"

    cs = load_scene(scene_path, use_cache=False, film_size=(W, H))
    scene = cs.as_pytree()
    cfg = WaveConfig(
        width=W, height=H, max_bounces=6, leaf_size=cs.leaf_size,
        num_lights=cs.num_lights, has_env=cs.has_env,
        use_blue_noise=True,
        traversal="brute",  # fastest backend for cornell-scale scenes
    )
    params = dict(
        dof_focus=jnp.float32(0.0), dof_aperture=jnp.float32(0.0),
        firefly_clamp=jnp.float32(0.0), seed=jnp.int32(0),
    )
    pixel_ids = jnp.arange(W * H, dtype=jnp.int32)

    @partial(jax.jit, static_argnames=())
    def k_samples(scene, params, pixel_ids, base):
        def body(k, carry):
            rad, fw, rays = carry
            out = render_wave(scene, params, pixel_ids, base + k, cfg)
            return (rad + out["radiance"], fw + out["filter_weight"],
                    rays + out["rays_traced"])

        z = jnp.zeros((pixel_ids.shape[0], 3), jnp.float32)
        zf = jnp.zeros((pixel_ids.shape[0],), jnp.float32)
        return jax.lax.fori_loop(
            0, spp_per_call, body, (z, zf, jnp.float32(0.0))
        )

    # Warmup / compile.
    rad, fw, rays = k_samples(scene, params, pixel_ids, jnp.int32(0))
    jax.block_until_ready(rays)

    # Timed runs.
    n_runs = 5
    t0 = time.time()
    total_rays = 0.0
    for r in range(n_runs):
        rad, fw, rays = k_samples(
            scene, params, pixel_ids, jnp.int32(spp_per_call * (r + 1))
        )
    jax.block_until_ready(rays)
    elapsed = time.time() - t0
    total_rays = float(rays) * n_runs  # rays per call are ~constant

    mrays = total_rays / elapsed / 1e6
    print(
        json.dumps(
            {
                "metric": "Mrays/s/chip (cornell-box 512x512 path trace, "
                          "6 bounces, NEE)",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
