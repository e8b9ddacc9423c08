"""Accumulate a RAW converged vw-van 1920x1200 golden (no denoiser).

Replaces the 256-spp+OIDN proxy (make_1080p_golden.py) with an unbiased
render: at 2048 spp the per-pixel noise floor caps golden-relative PSNR
at ~47 dB, at 4096 ~50 dB — both above the proxy's measured 42.4 dB
ceiling (goldens/vwvan_1080p.BOUND.json), so any target up to that spp
is an upgrade. Resumable: writes goldens/vwvan_1080p_raw.{exr,json}
every CHUNK spp and re-loads them on restart; promote to
goldens/vwvan_1080p.exr (and delete the .PROXY marker) once the target
is reached — scripts/promote_1080p_golden.py does exactly that.

Usage: python scripts/make_1080p_golden_raw.py [target_spp] [stop_at_unix]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

SCENE = "/root/reference/Scenes/vw-van/vw-van.pbrt"
FILM = (1920, 1200)
EXR = "/root/repo/goldens/vwvan_1080p_raw.exr"
META = "/root/repo/goldens/vwvan_1080p_raw.json"
CHUNK = 128


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    stop_at = float(sys.argv[2]) if len(sys.argv) > 2 else float("inf")
    t0 = time.time()

    from tracerboy_tpu.core.image_io import write_exr
    from tracerboy_tpu.renderer import Renderer

    ACC = "/root/repo/goldens/vwvan_1080p_raw_acc.npy"
    done = 0
    acc = None
    if os.path.exists(META) and os.path.exists(ACC):
        with open(META) as f:
            done = json.load(f)["spp"]
        acc = np.load(ACC)  # float32 radiance SUM (resume-exact)
        print(f"resuming from {done} spp", flush=True)

    while done < target and time.time() < stop_at:
        # a fresh Renderer per chunk: seed = spp offset decorrelates the
        # chunks; the scene cache + in-process jit cache make the
        # rebuild a device re-put, not a recompile.
        r = Renderer(SCENE, film_size=FILM, seed=done)
        n = 0
        while n < CHUNK:
            r.render_sample(16)
            n += 16
        img = np.maximum(np.asarray(r.resolve_radiance()), 0.0)
        acc = img * np.float32(CHUNK) if acc is None \
            else acc + img * np.float32(CHUNK)
        done += CHUNK
        np.save(ACC, acc)
        write_exr(EXR, (acc / done).astype(np.float32))
        with open(META, "w") as f:
            json.dump(dict(spp=done, film=FILM,
                           updated=time.strftime("%F %T")), f)
        print(f"{done}/{target} spp  {time.time()-t0:.0f}s", flush=True)
    print("done", done, flush=True)


if __name__ == "__main__":
    main()
