"""Round-3 binned traversal: Pallas dense-tile kernel prototype + prep
primitive costs (row sort for cluster ordering, wide-payload sorts,
monotone padded gathers).

    python scripts/bench_binned2.py --which kernel,rowsort,sort32,pad
"""

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def timed(fn, args_fn, runs=10):
    import jax.numpy as jnp

    out = fn(*args_fn(0))
    first = out[0] if isinstance(out, (tuple, list)) else out
    first.block_until_ready()

    def run(n, base):
        t0 = time.time()
        for k in range(n):
            out = fn(*args_fn(base + k))
        o = out[0] if isinstance(out, (tuple, list)) else out
        float(jnp.sum(o.astype(jnp.float32)))
        return time.time() - t0

    ta = run(runs, 1)
    tb = run(3 * runs, 1 + runs)
    return max((tb - ta) / (2 * runs), 1e-9)


SUPER = 8  # tiles per grid step (output block = (SUPER, P))


def make_dense_kernel(C: int, P: int):
    """Dense per-tile cluster test: each tile tests P rays (lanes)
    against one cluster of C triangles (Baldwin-Weber precomputed rows
    via one (3C,4)@(4,P) MXU dot, epilogue + argmin fused in VMEM).
    SUPER tiles per grid step; the cluster table is passed SUPER times
    with per-slot scalar-prefetched index maps."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(cid_ref, rays_ref, *rest):
        mot_refs = rest[:SUPER]
        out_t_ref, out_i_ref = rest[SUPER:]
        i = pl.program_id(0)
        for k in range(SUPER):
            rays = rays_ref[k]                      # (8, P)
            mot = mot_refs[k][0]                    # (3C, 4)
            lhs_o = jnp.concatenate(
                [rays[0:3], jnp.ones((1, P), jnp.float32)], axis=0
            )                                       # (4, P) [o, 1]
            lhs_d = jnp.concatenate(
                [rays[3:6], jnp.zeros((1, P), jnp.float32)], axis=0
            )                                       # (4, P) [d, 0]
            O = jax.lax.dot_general(
                mot, lhs_o, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                       # (3C, P)
            D = jax.lax.dot_general(
                mot, lhs_d, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            A, B = O[:C], D[:C]
            Co, Cd = O[C:2 * C], D[C:2 * C]
            Eo, Ed = O[2 * C:], D[2 * C:]
            t = -A / jnp.where(jnp.abs(B) < 1e-12, jnp.float32(1e-12), B)
            u = Co + t * Cd
            v = Eo + t * Ed
            ok = (
                (t > 1e-5) & (t < 1e30) & (u >= 0.0) & (v >= 0.0)
                & (u + v <= 1.0) & (jnp.abs(B) >= 1e-12)
            )
            tm = jnp.where(ok, t, jnp.float32(1e30))
            tbest = jnp.min(tm, axis=0, keepdims=True)        # (1, P)
            row = jax.lax.broadcasted_iota(jnp.int32, (C, P), 0)
            ibest = jnp.min(
                jnp.where(tm <= tbest, row, jnp.int32(C)), axis=0,
                keepdims=True,
            )
            cid = cid_ref[i * SUPER + k]
            out_t_ref[k:k + 1] = tbest
            out_i_ref[k:k + 1] = jnp.where(
                ibest < C, cid * C + ibest, jnp.int32(-1)
            )

    def run(cid, rays8, mot, n_tiles):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles // SUPER,),
            in_specs=[
                pl.BlockSpec((SUPER, 8, P), lambda i, cid: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec(
                    (1, 3 * C, 4),
                    (lambda k: lambda i, cid: (cid[i * SUPER + k], 0, 0))(k),
                    memory_space=pltpu.VMEM)
                for k in range(SUPER)
            ],
            out_specs=[
                pl.BlockSpec((SUPER, P), lambda i, cid: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SUPER, P), lambda i, cid: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, P), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, P), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
        )(cid, rays8, *([mot] * SUPER))

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--which", default="kernel,rowsort,sort32,pad")
    args = ap.parse_args()
    which = args.which.split(",")

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    rng = np.random.default_rng(5)
    N = 245760

    if "kernel" in which:
        for (P, C, n_tiles, n_clusters) in (
            (256, 128, 4096, 1024),
            (256, 512, 4096, 256),
            (512, 128, 2048, 1024),
            (1024, 128, 1024, 1024),
            (256, 128, 8192, 1024),
        ):
            run = make_dense_kernel(C, P)
            cid = jnp.asarray(
                np.sort(rng.integers(0, n_clusters, n_tiles))
                .astype(np.int32))
            rays8 = jnp.asarray(
                rng.standard_normal((n_tiles, 8, P)).astype(np.float32))
            mot = jnp.asarray(
                rng.standard_normal((n_clusters, 3 * C, 4))
                .astype(np.float32))
            f = jax.jit(lambda c, r, m: run(c, r, m, n_tiles))
            dt = timed(
                f,
                lambda k: (cid, rays8 * (1 + k * 1e-6), mot),
                args.runs,
            )
            pairs = n_tiles * P * C
            print(f"kernel P={P} C={C} tiles={n_tiles}: {dt*1e3:7.2f} ms "
                  f"({pairs/dt/1e9:.0f} Gpairs/s, "
                  f"{n_tiles*P/dt/1e6:.0f} Mpairs-rows/s, "
                  f"{dt/n_tiles*1e6:.2f} us/tile)")

    if "rowsort" in which:
        for C in (64, 256, 1024):
            x = jnp.asarray(rng.random((N, C), np.float32))

            @jax.jit
            def rs(x, s):
                return jax.lax.sort(x * s, dimension=1)

            dt = timed(rs, lambda k: (x, jnp.float32(1 + k * 1e-6)),
                       args.runs)
            print(f"rowsort  (N,{C}) axis1: {dt*1e3:7.2f} ms")

    if "sort32" in which:
        M = 1 << 20
        key = jnp.asarray(rng.integers(0, 1 << 20, M).astype(np.uint32))
        pls = [jnp.asarray(rng.random(M, np.float32)) for _ in range(32)]

        @jax.jit
        def srt(key, s, *pls):
            return jax.lax.sort((key + s,) + pls, num_keys=1)[1]

        dt = timed(srt, lambda k: (key, jnp.uint32(k)) + tuple(pls),
                   args.runs)
        print(f"sort32   M={M} planes=32: {dt*1e3:7.2f} ms")

    if "pad" in which:
        # monotone padded gather: 8 planes -> padded (M2,) via monotone idx
        M, M2 = 1 << 20, (1 << 20) + (1 << 18)
        src = [jnp.asarray(rng.random(M, np.float32)) for _ in range(8)]
        idx = jnp.asarray(
            np.minimum(np.sort(rng.integers(0, M, M2)), M - 1)
            .astype(np.int32))

        @jax.jit
        def pad(idx, s, *src):
            return tuple(p[idx] * s for p in src)

        dt = timed(pad, lambda k: (idx, jnp.float32(1 + k * 1e-6))
                   + tuple(src), args.runs)
        print(f"pad      {M}->{M2} x8 planes monotone: {dt*1e3:7.2f} ms")

        # and as a single (M, 8) row-table gather
        rows = jnp.asarray(rng.random((M, 8), np.float32))

        @jax.jit
        def padr(idx, s):
            return rows[idx] * s

        dt = timed(padr, lambda k: (idx, jnp.float32(1 + k * 1e-6)),
                   args.runs)
        print(f"pad-rows {M}->{M2} (M,8) monotone: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
