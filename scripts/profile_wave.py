"""Profile one full render_wave on real TPU hardware and print the
per-fusion device-time breakdown (traversal kernels vs shading fixed cost).

    python scripts/profile_wave.py --scene teapot --film 640x368

Uses jax.profiler (works over the axon tunnel; the trace names fusions
with source lines — see ARCHITECTURE.md timing notes).
"""

import argparse
import glob
import gzip
import json
import os
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

SCENES = {
    "cornell": "/root/reference/Scenes/cornell-box/scene.pbrt",
    "teapot": "/root/reference/Scenes/Teapot/scene.pbrt",
    "dragon": "/root/reference/Scenes/dragon/scene.pbrt",
    "vw-van": "/root/reference/Scenes/vw-van/vw-van.pbrt",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="teapot")
    ap.add_argument("--film", default="640x368")
    ap.add_argument("--traversal", default=None)
    ap.add_argument("--waves", type=int, default=3)
    ap.add_argument("--bounces", type=int, default=6)
    ap.add_argument("--merged-k", type=int, default=0,
                    help="profile render_wave_merged with this k")
    ap.add_argument("--out", default="/tmp/tb_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    sys.path.insert(0, os.path.dirname(__file__))
    import importlib
    bench = importlib.import_module("bench")

    W, H = map(int, args.film.split("x"))
    step, scene, params, pixel_ids, r = bench._wave_step(
        SCENES[args.scene], (W, H), traversal=args.traversal,
        max_bounces=args.bounces,
    )
    if args.merged_k:
        import dataclasses
        from functools import partial
        from tracerboy_tpu.trace.wavefront import render_wave_merged
        cfg = dataclasses.replace(r.wave_config(), max_bounces=args.bounces,
                                  want_aovs=False)
        mstep = jax.jit(partial(render_wave_merged, k=args.merged_k,
                                cfg=cfg))
        step = lambda sc, pp, pi, s: mstep(sc, pp, pi, s)
    print(f"backend={r.traversal}")
    out = step(scene, params, pixel_ids, jnp.int32(0))
    print("rays/wave:", float(out["rays_traced"]))
    # warm + time without profiler (RTT-cancelling)
    def run(n, base):
        # block EVERY dispatch: the tunnel queue hangs on enqueue-ahead
        # (observed 2026-08-17); per-wave work >> RTT so this is safe
        t0 = time.time()
        for k in range(n):
            o = step(scene, params, pixel_ids, jnp.int32(base + k))
            float(o["rays_traced"])
        return time.time() - t0

    per_wave = run(4, 1) / 4
    print(f"wall per wave: {per_wave*1e3:.1f} ms "
          f"({float(out['rays_traced'])/per_wave/1e6:.2f} Mrays/s)")

    os.system(f"rm -rf {args.out}")
    with jax.profiler.trace(args.out):
        for k in range(args.waves):
            o = step(scene, params, pixel_ids, jnp.int32(100 + k))
            float(o["rays_traced"])

    # parse the trace: sum device-op durations by name
    paths = glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace written"); return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    # find device pids (XLA Ops track)
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or "/device" in n.lower()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            tot[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    total = sum(tot.values())
    print(f"\ndevice total: {total/1e3/args.waves:.1f} ms/wave over "
          f"{args.waves} waves; tracks: "
          f"{[pids[p] for p in dev_pids][:4]}")
    items = sorted(tot.items(), key=lambda kv: -kv[1])[:args.top]
    for name, us in items:
        print(f"{us/1e3/args.waves:9.2f} ms  {100*us/total:5.1f}%  "
              f"x{cnt[name]//args.waves:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
