"""Microbenchmarks for the round-3 binned (stream-compaction) traversal:
measure the primitive rates the design pencils out on, on real TPU.

    python scripts/bench_binned.py

Primitives:
  topk        lax.top_k(K) over a dense (N, n_clusters) t_near matrix
  sortpairs   lax.sort of M pair rows, u32 key + P payload planes
  tile-dot    batched per-tile Baldwin-Weber via dot_general (MXU)
  tile-vpu    same math as broadcast VPU ops (no dot)
  transpose   (N, 19) -> (19, N) layout flip (the attr-plane fix)
  rowgather   (M,) gathers from a wide row table (reference rate)

Timing: enqueue n dispatches with a perturbed operand each (the axon
runtime caches identical-input executions), force with a scalar
readback, difference two run lengths to cancel RTT (ARCHITECTURE.md).
"""

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def timed(fn, args_fn, runs=10):
    out = fn(*args_fn(0))
    import jax.numpy as jnp

    jnp.sum(out[0] if isinstance(out, tuple) else out).block_until_ready()

    def run(n, base):
        t0 = time.time()
        for k in range(n):
            out = fn(*args_fn(base + k))
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        return time.time() - t0

    ta = run(runs, 1)
    tb = run(3 * runs, 1 + runs)
    return max((tb - ta) / (2 * runs), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--which", default="all")
    args = ap.parse_args()
    which = args.which.split(",") if args.which != "all" else None

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    rng = np.random.default_rng(3)
    N = 245760

    def want(name):
        return which is None or name in which

    # ---- top_k over dense t_near ---------------------------------------
    if want("topk"):
        for C, K in ((256, 16), (1024, 16), (256, 8)):
            tn = jnp.asarray(rng.random((N, C), np.float32))

            @jax.jit
            def tk(x, s):
                v, i = jax.lax.top_k(-(x * s), K)
                return v + i.astype(jnp.float32)

            dt = timed(tk, lambda k: (tn, jnp.float32(1 + k * 1e-6)),
                       args.runs)
            print(f"topk      N={N} C={C} K={K}: {dt*1e3:7.2f} ms "
                  f"({N/dt/1e6:.0f} Mrows/s)")

    # ---- sort of pair rows ---------------------------------------------
    if want("sortpairs"):
        for M, P in ((1 << 20, 8), (1 << 20, 2), (1 << 21, 8), (245760, 8)):
            key = jnp.asarray(
                rng.integers(0, 1 << 20, M).astype(np.uint32))
            pls = [jnp.asarray(rng.random(M, np.float32))
                   for _ in range(P)]

            @jax.jit
            def srt(key, s, *pls):
                out = jax.lax.sort((key + s,) + pls, num_keys=1)
                return out[1]

            dt = timed(
                srt, lambda k: (key, jnp.uint32(k)) + tuple(pls), args.runs
            )
            print(f"sortpairs M={M} planes={P}: {dt*1e3:7.2f} ms "
                  f"({M/dt/1e6:.0f} Mrows/s)")

    # ---- batched tile Baldwin-Weber ------------------------------------
    # MO table rows: per cluster (4, 3C) [n|-d ; p1 ; p2] o-side
    # MD table rows: per cluster (3, 3C) d-side
    def make_tables(n_clusters, C):
        MO = rng.standard_normal((n_clusters, 4 * 3 * C)).astype(np.float32)
        MD = rng.standard_normal((n_clusters, 3 * 3 * C)).astype(np.float32)
        return jnp.asarray(MO), jnp.asarray(MD)

    def tile_pipe(use_dot, T, P, C, n_clusters):
        MO, MD = make_tables(n_clusters, C)
        ro = jnp.asarray(rng.standard_normal((T, P, 4)).astype(np.float32))
        rd = jnp.asarray(rng.standard_normal((T, P, 3)).astype(np.float32))
        cid = jnp.asarray(
            rng.integers(0, n_clusters, T).astype(np.int32))

        @jax.jit
        def run(ro, rd, s):
            mo = MO[cid].reshape(T, 4, 3 * C)
            md = MD[cid].reshape(T, 3, 3 * C)
            if use_dot:
                O = jax.lax.dot_general(
                    ro * s, mo, (((2,), (1,)), ((0,), (0,))))
                D = jax.lax.dot_general(
                    rd, md, (((2,), (1,)), ((0,), (0,))))
            else:
                O = jnp.einsum("tpk,tkc->tpc", ro * s, mo,
                               precision=jax.lax.Precision.DEFAULT)
                D = jnp.einsum("tpk,tkc->tpc", rd, md)
            A = O[..., :C]
            B = D[..., :C]
            Co, Eo = O[..., C:2 * C], O[..., 2 * C:]
            Cd, Ed = D[..., C:2 * C], D[..., 2 * C:]
            t = -A / jnp.where(jnp.abs(B) < 1e-12, 1e-12, B)
            u = Co + t * Cd
            v = Eo + t * Ed
            ok = (t > 1e-5) & (t < 1e30) & (u >= 0) & (v >= 0) & (u + v <= 1)
            tm = jnp.where(ok, t, jnp.float32(1e30))
            tbest = jnp.min(tm, axis=-1)
            ibest = jnp.argmin(tm, axis=-1)
            return tbest + ibest.astype(jnp.float32)

        dt = timed(run, lambda k: (ro, rd, jnp.float32(1 + k * 1e-6)),
                   args.runs)
        pairs = T * P * C
        print(f"tile-{'dot' if use_dot else 'dot2'} T={T} P={P} C={C}: "
              f"{dt*1e3:7.2f} ms ({pairs/dt/1e9:.0f} Gpairs/s)")

    if want("tiledot"):
        tile_pipe(True, 4096, 256, 512, 256)
        tile_pipe(True, 4096, 256, 128, 1024)
        tile_pipe(True, 1024, 1024, 128, 1024)
        tile_pipe(True, 1024, 256, 512, 256)

    # ---- pure VPU broadcast MT (current brute rate, tiled) -------------
    if want("tilevpu"):
        for (T, P, C) in ((4096, 256, 512),):
            tri = jnp.asarray(
                rng.standard_normal((256, 9 * C)).astype(np.float32))
            cid = jnp.asarray(rng.integers(0, 256, T).astype(np.int32))
            ro = jnp.asarray(
                rng.standard_normal((T, P, 3)).astype(np.float32))
            rd = jnp.asarray(
                rng.standard_normal((T, P, 3)).astype(np.float32))

            @jax.jit
            def run(ro, rd, s):
                tb = tri[cid].reshape(T, C, 9)
                v0 = tb[:, None, :, 0:3]
                e1 = tb[:, None, :, 3:6]
                e2 = tb[:, None, :, 6:9]
                o = (ro * s)[:, :, None, :]
                d = rd[:, :, None, :]
                p = jnp.cross(d, e2)
                det = jnp.sum(e1 * p, axis=-1)
                inv = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
                tv = o - v0
                u = jnp.sum(tv * p, axis=-1) * inv
                q = jnp.cross(tv, e1)
                vv = jnp.sum(d * q, axis=-1) * inv
                tt = jnp.sum(e2 * q, axis=-1) * inv
                ok = (u >= 0) & (vv >= 0) & (u + vv <= 1) & (tt > 1e-5)
                tm = jnp.where(ok, tt, 1e30)
                return jnp.min(tm, axis=-1)

            dt = timed(run, lambda k: (ro, rd, jnp.float32(1 + k * 1e-6)),
                       args.runs)
            pairs = T * P * C
            print(f"tile-vpu  T={T} P={P} C={C}: {dt*1e3:7.2f} ms "
                  f"({pairs/dt/1e9:.0f} Gpairs/s)")

    # ---- transpose (N, 19) -> (19, N) ----------------------------------
    if want("transpose"):
        rows = jnp.asarray(rng.random((235520, 19), np.float32))

        @jax.jit
        def tr(x, s):
            y = (x * s).T
            return tuple(y[j] for j in range(19))

        dt = timed(tr, lambda k: (rows, jnp.float32(1 + k * 1e-6)),
                   args.runs)
        print(f"transpose (235520,19): {dt*1e3:7.2f} ms")

        @jax.jit
        def sl(x, s):
            y = x * s
            return tuple(y[:, j] for j in range(19))

        dt = timed(sl, lambda k: (rows, jnp.float32(1 + k * 1e-6)),
                   args.runs)
        print(f"slice     (235520,19): {dt*1e3:7.2f} ms")

    # ---- wide row gather reference -------------------------------------
    if want("rowgather"):
        for M, W in ((1 << 20, 12), (245760, 12), (4096, 6144)):
            tbl = jnp.asarray(rng.random((max(1024, M // 4), W), np.float32))
            idx = jnp.asarray(
                rng.integers(0, tbl.shape[0], M).astype(np.int32))

            @jax.jit
            def g(idx, s):
                return tbl[idx] * s

            dt = timed(g, lambda k: (idx, jnp.float32(1 + k * 1e-6)),
                       args.runs)
            print(f"rowgather M={M} W={W}: {dt*1e3:7.2f} ms "
                  f"({M/dt/1e6:.0f} Mrows/s, "
                  f"{M*W*4/dt/2**30:.0f} GiB/s)")


if __name__ == "__main__":
    main()
