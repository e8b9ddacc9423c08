"""Primitive-rate microbenchmarks behind tracerboy_tpu layout decisions.

Methodology (hard-won, see ARCHITECTURE.md timing notes): every
measurement runs REPS iterations of the op INSIDE one jitted program
(lax.fori_loop with a per-iteration input perturbation and a carried
dependency), then blocks on a scalar readback. Host-side repeat loops
are unusable on this runtime: identical-input executions are cached,
enqueue-ahead of independent dispatches can hang the tunnel queue, and
the per-dispatch readback RTT (~35 ms observed) swamps small ops.

Round-3 re-measurement corrected round-2 artifacts: dense-mt is
~17 G pair-tests/s (not 57 — the old harness hit the execution cache).

    python scripts/bench_primitives.py [--rays N] [--reps R]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=235_520)
    ap.add_argument("--tris", type=int, default=512)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument(
        "--which",
        default="dense-mt,row-gather,plane-gather,sort-carry,argsort-take,"
                "unsort,scatter-add",
    )
    args = ap.parse_args()

    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
    except Exception:
        pass

    rng = np.random.default_rng(0)
    N, K, REPS = args.rays, args.tris, args.reps
    which = set(args.which.split(","))

    def measure(name, make_body, unit_per_iter, unit_name, carry0=0.0):
        """Time REPS iterations of make_body inside one jit."""
        def many(s0):
            def body(i, acc):
                return acc + make_body(s0 + i)
            return lax.fori_loop(0, REPS, body, jnp.float32(carry0))

        jf = jax.jit(many)
        float(jf(jnp.float32(1.0)))  # compile + warm
        times = []
        for trial in range(3):
            t0 = time.time()
            float(jf(jnp.float32(2.0 + trial)))
            times.append(time.time() - t0)
        per = min(times) / REPS
        print(f"{name}: {per*1e3:8.3f} ms/iter = "
              f"{unit_per_iter/per/1e9:8.2f} G {unit_name}/s", flush=True)

    if "dense-mt" in which:
        from tracerboy_tpu.core.vec3 import V3
        from tracerboy_tpu.trace.intersect import brute_force_closest_soa

        o = V3(*(jnp.asarray(rng.random(N, np.float32)) for _ in range(3)))
        d = V3(*(jnp.asarray(rng.random(N, np.float32)) for _ in range(3)))
        tris = jnp.asarray(rng.random((K, 9), np.float32))

        def body(s):
            out = brute_force_closest_soa(o, d, tris * (1 + s * 1e-7))
            return jax.tree.leaves(out)[0][0]

        measure("dense-mt    ", body, N * K, "pair-tests")

    idx = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
    if "row-gather" in which:
        table = jnp.asarray(rng.random((N, 16), np.float32))

        def body(s):
            rows = table[(idx + s.astype(jnp.int32)) % N]   # (N, 16)
            return rows[0, 0]

        measure("row-gather16", body, N, "rows")

    if "plane-gather" in which:
        plane = jnp.asarray(rng.random(N, np.float32))

        def body(s):
            v = plane[(idx + s.astype(jnp.int32)) % N]      # (N,)
            return v[0]

        measure("plane-gather", body, N, "rows")

    planes = [jnp.asarray(rng.random(N, np.float32)) for _ in range(8)]
    key = jnp.asarray(rng.random(N, np.float32))
    if "sort-carry" in which:
        def body(s):
            out = jax.lax.sort((key * (1 + s * 1e-7),) + tuple(planes),
                               num_keys=1)
            return out[1][0]

        measure("sort-carry8 ", body, N, "rows")

    if "argsort-take" in which:
        def body(s):
            perm = jnp.argsort(key * (1 + s * 1e-7))
            vals = [p[perm] for p in planes]
            return vals[0][0]

        measure("argsort-take", body, N, "rows")

    if "unsort" in which:
        # The wavefront's per-bounce unsort: permute 4 hit planes back
        # to ray order given the saved pre-sort index sidx.
        sidx = jnp.asarray(rng.permutation(N).astype(np.int32))
        hit_planes = [jnp.asarray(rng.random(N, np.float32))
                      for _ in range(4)]

        def body_carry(s):
            out = jax.lax.sort(
                (sidx, hit_planes[0] * (1 + s * 1e-7), hit_planes[1],
                 hit_planes[2], hit_planes[3]), num_keys=1)
            return out[1][0]

        measure("unsort-carry", body_carry, N, "rows")

        def body_gather(s):
            iota = jnp.arange(N, dtype=jnp.int32)
            _, inv = jax.lax.sort((sidx, iota), num_keys=1)
            table = jnp.stack(
                [hit_planes[0] * (1 + s * 1e-7), hit_planes[1],
                 hit_planes[2], hit_planes[3]], axis=1)   # (N, 4)
            rows = table[inv]
            return rows[0, 0]

        measure("unsort-gathr", body_gather, N, "rows")

    if "scatter-add" in which:
        def body(s):
            acc = jnp.zeros((N,), jnp.float32)
            acc = acc.at[(idx + s.astype(jnp.int32)) % N].add(key)
            return acc[0]

        measure("scatter-add ", body, N, "rows")


if __name__ == "__main__":
    main()
