"""TPU primitive-rate microbenchmarks for traversal-design decisions.

Measures the raw rates of the building blocks a stream-binning traversal
(cluster cull -> sort pairs by cluster -> dense per-cluster tests) is made
of, so the design is chosen from numbers, not guesses:

  dense-mt      (N,) SoA rays vs K VMEM triangles, Moller-Trumbore
                fori loop (the brute backend inner loop) -> pair tests/s
  sort          jax.lax.sort of M (u32 key, i32 value) pairs -> keys/s
  argsort-take  argsort M keys + gather 8 f32 ray planes -> rays/s
  take          jnp.take of M arbitrary i32 indices from an (M, 8) table
  box-cull      (N,) rays vs K cluster AABBs, hit mask only -> pair tests/s

Timing uses the same RTT-cancelling forced-readback scheme as bench.py.
"""

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def timed(fn, n_runs, force):
    """fn(k) must derive bit-distinct device inputs from k: the runtime
    CACHES identical-input executions, which silently turned repeat
    timings into cache hits (advisor finding, round 2 — the same fix
    bench_traverse.py applies by perturbing t_max per dispatch)."""
    fn(0)  # compile
    t0 = time.time()
    for k in range(n_runs):
        out = fn(1 + k)
    force(out)
    ta = time.time() - t0
    t0 = time.time()
    for k in range(3 * n_runs):
        out = fn(1 + n_runs + k)
    force(out)
    tb = time.time() - t0
    return max((tb - ta) / (2 * n_runs), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=230_400)
    ap.add_argument("--tris", type=int, default=512)
    ap.add_argument("--pairs", type=int, default=2_000_000)
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--which", default="dense-mt,box-cull,sort,argsort-take,take")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    except Exception:
        pass

    from tracerboy_tpu.core.vec3 import V3
    from tracerboy_tpu.trace.intersect import brute_force_closest_soa

    rng = np.random.default_rng(0)
    N, K, M = args.rays, args.tris, args.pairs
    force = lambda out: float(jnp.sum(jax.tree.leaves(out)[0][:1]))
    which = set(args.which.split(","))

    if "dense-mt" in which:
        o = V3(*(jnp.asarray(rng.random(N, np.float32)) for _ in range(3)))
        d = V3(*(jnp.asarray(rng.random(N, np.float32)) for _ in range(3)))
        tris = jnp.asarray(rng.random((K, 9), np.float32))
        jf = jax.jit(lambda o_, d_, tris_, s: brute_force_closest_soa(
            o_, d_, tris_ * s))
        fn = lambda k: jf(o, d, tris, jnp.float32(1 + k * 1e-6))
        dt = timed(fn, args.runs, force)
        rate = N * K / dt
        print(f"dense-mt: {dt*1e3:.2f} ms for {N}x{K} "
              f"= {rate/1e9:.2f} G pair-tests/s")

    if "box-cull" in which:
        o = V3(*(jnp.asarray(rng.random(N, np.float32)) for _ in range(3)))
        inv = V3(*(jnp.asarray(rng.random(N, np.float32) + 0.5)
                   for _ in range(3)))
        boxes = jnp.asarray(rng.random((K, 6), np.float32))

        def cull():
            def body(i, acc):
                r = jax.lax.dynamic_slice(boxes, (i, 0), (1, 6))[0]
                t0x = (r[0] - o.x) * inv.x
                t1x = (r[3] - o.x) * inv.x
                t0y = (r[1] - o.y) * inv.y
                t1y = (r[4] - o.y) * inv.y
                t0z = (r[2] - o.z) * inv.z
                t1z = (r[5] - o.z) * inv.z
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.minimum(t0z, t1z))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                             jnp.maximum(t0y, t1y)),
                                 jnp.maximum(t0z, t1z))
                return acc + (tf >= jnp.maximum(tn, 0.0)).astype(jnp.int32)

            return jax.lax.fori_loop(
                0, K, body, jnp.zeros((N,), jnp.int32))

        def cull2(o_, inv_, boxes_):
            def body(i, acc):
                r = jax.lax.dynamic_slice(boxes_, (i, 0), (1, 6))[0]
                t0x = (r[0] - o_.x) * inv_.x
                t1x = (r[3] - o_.x) * inv_.x
                t0y = (r[1] - o_.y) * inv_.y
                t1y = (r[4] - o_.y) * inv_.y
                t0z = (r[2] - o_.z) * inv_.z
                t1z = (r[5] - o_.z) * inv_.z
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.minimum(t0z, t1z))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                             jnp.maximum(t0y, t1y)),
                                 jnp.maximum(t0z, t1z))
                return acc + (tf >= jnp.maximum(tn, 0.0)).astype(jnp.int32)

            return jax.lax.fori_loop(
                0, boxes_.shape[0], body,
                jnp.zeros((o_.x.shape[0],), jnp.int32))

        jf = jax.jit(lambda o_, inv_, boxes_, s: cull2(o_, inv_, boxes_ * s))
        fn = lambda k: jf(o, inv, boxes, jnp.float32(1 + k * 1e-6))
        dt = timed(fn, args.runs, force)
        print(f"box-cull: {dt*1e3:.2f} ms for {N}x{K} "
              f"= {N*K/dt/1e9:.2f} G pair-tests/s")

    if "sort" in which:
        keys = jnp.asarray(rng.integers(0, 1 << 30, M).astype(np.uint32))
        vals = jnp.arange(M, dtype=jnp.int32)
        jf = jax.jit(lambda k, v, s: jax.lax.sort((k + s, v), num_keys=1))
        fn = lambda q: jf(keys, vals, jnp.uint32(q))
        dt = timed(fn, args.runs, force)
        print(f"sort: {dt*1e3:.2f} ms for {M} pairs "
              f"= {M/dt/1e6:.1f} M keys/s")

    if "argsort-take" in which:
        keys = jnp.asarray(rng.integers(0, 1 << 30, M).astype(np.uint32))
        planes = [jnp.asarray(rng.random(M, np.float32)) for _ in range(8)]

        def f(keys_, planes_):
            perm = jnp.argsort(keys_)
            return [p[perm] for p in planes_]

        jf = jax.jit(lambda k, p, s: f(k + s, p))
        fn = lambda q: jf(keys, planes, jnp.uint32(q))
        dt = timed(fn, args.runs, force)
        print(f"argsort-take(8 planes): {dt*1e3:.2f} ms for {M} "
              f"= {M/dt/1e6:.1f} M rays/s")

    if "take" in which:
        idx = jnp.asarray(rng.integers(0, M, M).astype(np.int32))
        planes = [jnp.asarray(rng.random(M, np.float32)) for _ in range(8)]
        jf = jax.jit(lambda idx_, planes_, s: [p[idx_] * s for p in planes_])
        fn = lambda q: jf(idx, planes, jnp.float32(1 + q * 1e-6))
        dt = timed(fn, args.runs, force)
        print(f"take(8 planes): {dt*1e3:.2f} ms for {M} "
              f"= {M/dt/1e6:.1f} M rows/s")


if __name__ == "__main__":
    main()
