"""Traversal-kernel microbenchmark: v1 vs v2 packet kernels on real scenes.

Run on TPU hardware (one process, claims the chip once):
    python scripts/bench_traverse.py --scene teapot --runs 30

Measures closest-hit and any-hit throughput on three realistic ray sets:
- primary: camera rays (coherent)
- bounce:  cosine-hemisphere rays from random surface points (incoherent,
           then coherence-sorted like the wavefront does each bounce)
- shadow:  surface points toward a fixed light with capped t_max

Times a FIXED number of dispatches with a block every run (the dispatch
queue on this runtime never applies backpressure).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

SCENES = {
    "cornell": "/root/reference/Scenes/cornell-box/scene.pbrt",
    "teapot": "/root/reference/Scenes/Teapot/scene.pbrt",
    "dragon": "/root/reference/Scenes/dragon/scene.pbrt",
    "vw-van": "/root/reference/Scenes/vw-van/vw-van.pbrt",
}


def make_ray_sets(cs, n_rays, rng):
    """(primary, bounce, shadow) ray sets as (o, d, tmax) numpy triples."""
    import numpy as np

    v0 = np.asarray(cs.tri_v0)
    v1 = np.asarray(cs.tri_v1)
    v2 = np.asarray(cs.tri_v2)
    lo = np.minimum(np.minimum(v0, v1), v2).min(0)
    hi = np.maximum(np.maximum(v0, v1), v2).max(0)
    center = (lo + hi) / 2
    radius = float(np.linalg.norm(hi - lo)) / 2

    # primary: pinhole from outside the scene toward a raster film grid
    # (real camera-ray coherence, unlike random targets)
    eye = center + np.array([0.0, 0.35, 1.0]) * radius * 2.2
    fw = int(np.sqrt(n_rays * 16 / 9))
    fh = (n_rays + fw - 1) // fw
    ii = np.arange(fw * fh, dtype=np.int64)[:n_rays]
    fx = ((ii % fw) + 0.5) / fw - 0.5
    fy = ((ii // fw) + 0.5) / fh - 0.5
    fwd = center - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0.0, 1.0, 0.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    span = 1.1 * radius
    target = (
        center + right * (fx * span * 16 / 9)[:, None]
        + up * (fy * span)[:, None]
    )
    d = target - eye
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    primary = (
        np.broadcast_to(eye, (n_rays, 3)).astype(np.float32).copy(),
        d.astype(np.float32),
        np.full((n_rays,), 1e30, np.float32),
    )

    # bounce: random surface origins, cosine-ish random dirs
    ti = rng.integers(0, v0.shape[0], n_rays)
    b1 = rng.random(n_rays, dtype=np.float32)
    b2 = rng.random(n_rays, dtype=np.float32)
    flip = b1 + b2 > 1
    b1 = np.where(flip, 1 - b1, b1)
    b2 = np.where(flip, 1 - b2, b2)
    p = (
        v0[ti] * (1 - b1 - b2)[:, None]
        + v1[ti] * b1[:, None]
        + v2[ti] * b2[:, None]
    )
    n = np.cross(v1[ti] - v0[ti], v2[ti] - v0[ti])
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    dirs = rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = np.where(
        (dirs * n).sum(1, keepdims=True) < 0, -dirs, dirs
    )
    bounce = (
        (p + n * 1e-4 * radius).astype(np.float32),
        dirs.astype(np.float32),
        np.full((n_rays,), 1e30, np.float32),
    )

    # shadow: same origins toward a point light above the scene
    light = center + np.array([0.3, 1.0, 0.2]) * radius * 1.5
    to_l = light - p
    dist = np.linalg.norm(to_l, axis=1)
    to_l /= dist[:, None]
    shadow = (
        bounce[0],
        to_l.astype(np.float32),
        (dist * (1 - 1e-3)).astype(np.float32),
    )
    # dead: all lanes masked (t_max = 0) — measures per-packet fixed cost
    dead = (primary[0], primary[1], np.zeros((n_rays,), np.float32))
    return dict(primary=primary, bounce=bounce, shadow=shadow, dead=dead)


def coherence_sort(o, d, lo, hi, mode="oct-org", tm=None):
    """Sort-key variants for packet formation."""
    import numpy as np

    if mode == "none":
        return np.arange(o.shape[0])
    tm_dead = None if tm is None else (tm <= 0).astype(np.uint64)
    ext = np.maximum(hi - lo, 1e-12)
    q = np.clip((o - lo) / ext * 1023.0, 0, 1023).astype(np.uint64)

    def spread(v):
        v = (v | (v << 16)) & 0x30000FF
        v = (v | (v << 8)) & 0x300F00F
        v = (v | (v << 4)) & 0x30C30C3
        v = (v | (v << 2)) & 0x9249249
        return v

    morton = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    octant = (
        (d[:, 0] >= 0).astype(np.uint64)
        | ((d[:, 1] >= 0).astype(np.uint64) << 1)
        | ((d[:, 2] >= 0).astype(np.uint64) << 2)
    )
    qd = np.clip((d * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint64)
    dmorton = (
        (spread(qd[:, 0] << 2) << 2)
        | (spread(qd[:, 1] << 2) << 1)
        | spread(qd[:, 2] << 2)
    )
    if mode == "oct-org-compact":
        # dead-last bit: the packet-world ray compaction A/B
        key = (octant << 30) | morton
        key = key | ((tm_dead << 34) if tm_dead is not None else 0)
    elif mode == "oct-org":
        key = (octant << 30) | morton
    elif mode == "org-oct":
        key = (morton << 3) | octant
    elif mode == "org-dir":
        key = (morton << 24) | (dmorton >> 6)
    elif mode == "dir-org":
        key = (dmorton << 30) | morton
    else:
        raise ValueError(mode)
    return np.argsort(key, kind="stable")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="teapot")
    ap.add_argument("--runs", type=int, default=20)
    ap.add_argument("--rays", type=int, default=640 * 360)
    ap.add_argument("--variants", default="v1,v2,v2any")
    ap.add_argument("--hbm", action="store_true",
                    help="force the HBM cluster-streaming path")
    ap.add_argument("--sets", default="primary,bounce,shadow")
    ap.add_argument("--sort", default="oct-org",
                    help="comma list: oct-org,org-oct,org-dir,dir-org,none")
    ap.add_argument("--stats", action="store_true",
                    help="also report per-packet pop/cluster counters (v2)")
    ap.add_argument("--dead-frac", type=float, default=0.0,
                    help="kill this fraction of rays (t_max=0); compare "
                         "sort oct-org vs oct-org-compact")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tracerboy_tpu.scene.compile import load_scene
    from tracerboy_tpu.trace.pallas_traverse import (
        pack_scene_for_pallas,
        traverse_packets,
    )
    from tracerboy_tpu.trace.pallas_traverse2 import (
        anyhit_packets2,
        traverse_packets2,
    )

    t0 = time.time()
    cs = load_scene(SCENES[args.scene], film_size=(64, 64))
    print(f"[{time.time()-t0:6.1f}s] scene: {cs.tri_v0.shape[0]} tris")
    packed, bvh = pack_scene_for_pallas(cs.tri_v0, cs.tri_v1, cs.tri_v2)
    nodes_mb = packed["nodes"].size * 4 / 2**20
    tris_mb = packed["tris"].size * 4 / 2**20
    print(f"[{time.time()-t0:6.1f}s] packed: nodes {nodes_mb:.1f} MB, "
          f"tris {tris_mb:.1f} MB")

    rng = np.random.default_rng(7)
    sets = make_ray_sets(cs, args.rays, rng)
    lo = np.asarray(cs.tri_v0).min(0)
    hi = np.asarray(cs.tri_v0).max(0)

    import re

    variants = {}
    for vname in args.variants.split(","):
        if vname == "v1":
            variants["v1"] = lambda o, d, tm: traverse_packets(
                o, d, tm, packed, tris_in_hbm=args.hbm)[0]
        elif vname.endswith("any"):
            m = re.match(r"v2(?:p(\d+))?any", vname)
            p = int(m.group(1) or 1)
            variants[vname] = (
                lambda o, d, tm, p=p: anyhit_packets2(
                    o, d, tm, packed, tris_in_hbm=args.hbm,
                    pops_per_iter=p)
            )
        else:
            # v2[ns][pN]: ns = unordered pushes, pN = pops per iteration
            m = re.match(r"v2(ns)?(?:p(\d+))?$", vname)
            order = m.group(1) is None
            p = int(m.group(2) or 1)
            variants[vname] = (
                lambda o, d, tm, order=order, p=p: traverse_packets2(
                    o, d, tm, packed, tris_in_hbm=args.hbm, order=order,
                    pops_per_iter=p)[0]
            )

    results = {}
    for set_name in args.sets.split(","):
        for sort_mode in args.sort.split(","):
            o, d, tm = sets[set_name]
            if args.dead_frac > 0:
                tm = tm.copy()
                kill = np.random.default_rng(1).random(tm.shape[0])
                tm[kill < args.dead_frac] = 0.0
            perm = coherence_sort(o, d, lo, hi, sort_mode, tm=tm)
            o, d, tm = o[perm], d[perm], tm[perm]
            oj, dj, tmj = jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm)
            if args.stats:
                st = traverse_packets2(
                    oj, dj, tmj, packed, tris_in_hbm=args.hbm, stats=True,
                )[4]
                st = np.asarray(st)
                # Per-ray NEED from the lock-step oracle: the per-lane
                # work a packet pays (every lane tests every pop +
                # drain) over the tests a lone ray needs. This union
                # tax bounds any re-binning/sub-packeting win.
                from tracerboy_tpu.trace.traverse import traverse_wide

                tmap = np.asarray(packed["tri_map"])
                mv0 = jnp.asarray(np.asarray(cs.tri_v0)[tmap])
                mv1 = jnp.asarray(np.asarray(cs.tri_v1)[tmap])
                mv2 = jnp.asarray(np.asarray(cs.tri_v2)[tmap])
                cost = traverse_wide(
                    oj, dj, tmj, jnp.asarray(bvh.bounds_lo),
                    jnp.asarray(bvh.bounds_hi),
                    jnp.asarray(bvh.children), mv0, mv1, mv2,
                    leaf_size=bvh.leaf_size,
                )[4]
                live = np.asarray(tmj) > 0
                need = float(np.asarray(cost)[live].mean())
                paid = (st[:, 0].mean() + st[:, 1].mean()) * 8
                print(f"[{time.time()-t0:6.1f}s] {args.scene}/{set_name}"
                      f"/{sort_mode}: pops/packet mean {st[:,0].mean():.0f}"
                      f" max {st[:,0].max():.0f}, clusters/packet mean"
                      f" {st[:,1].mean():.0f} max {st[:,1].max():.0f}; "
                      f"per-lane tests paid {paid:.0f} vs per-ray need "
                      f"{need:.0f}: union tax {paid / max(need, 1e-9):.1f}x")
            for vname, fn in variants.items():
                if vname == "v2any" and set_name != "shadow":
                    continue
                label = f"{args.scene}/{set_name}/{sort_mode}/{vname}"
                out = fn(oj, dj, tmj)
                o_np = np.asarray(out)  # forces: block_until_ready lies
                nhit = (
                    int((o_np < 1e29).sum()) if o_np.dtype == np.float32
                    else int(o_np.sum())
                )

                def timed(n):
                    # Enqueue n dispatches, force the last via a scalar
                    # readback (device stream is in-order, so forcing the
                    # last output drains all of them). Each dispatch gets
                    # a bit-distinct t_max: the axon runtime CACHES
                    # identical-input executions, which silently turned
                    # repeat timings into cache hits.
                    t1 = time.time()
                    for k in range(n):
                        out = fn(oj, dj, tmj * (1.0 + (k + 1) * 1e-6))
                    float(jnp.sum(out))
                    return time.time() - t1

                n = args.runs
                ta = timed(n)
                tb = timed(3 * n)
                dt = (tb - ta) / (2 * n)  # cancels the readback RTT
                mrays = args.rays / dt / 1e6
                results[label] = round(mrays, 2)
                print(f"[{time.time()-t0:6.1f}s] {label}: {dt*1e3:.2f} ms"
                      f" = {mrays:.1f} Mrays/s  (hits {nhit})")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
