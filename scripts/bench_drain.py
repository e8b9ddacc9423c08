"""Drain-phase microbenchmark: what bounds the leaf drain, and which
surgery helps.

Round-2 profiling showed the leaf drain is ~70% of packet-kernel time and
looked extract/sequencing-bound (96 scalar lane-extracts per cluster row,
each feeding broadcast VPU math; cutting vector ops via Baldwin-Weber
changed nothing). Variants, each a standalone Pallas kernel draining
batches of 8 clusters (the production DRAIN_BATCH structure, unrolled)
against one resident (16,128)-tile packet:

  A8  production drain (_tri_tests: 12 lane-extracts/tri, per-tri VPU)
  S8  same math, but each cluster row is first copied VMEM->SMEM so the
      96 constants come from scalar loads instead of lane extracts
  U8  A8 without the u/v best-hit bookkeeping (u,v recomputable outside
      the kernel from (t, tri) + the wide-row attribute fetch)

A previously-tested MXU variant (rays x tris pair space on lanes) lost
2.6x: only 48/128 lanes useful and the epilogue runs on a 16x bigger
element space than the per-tri scheme — the matmul saves dots but the
rolled epilogue + (R,1) reductions swamp it. Removed.

Usage: python scripts/bench_drain.py [n_clusters] [batches]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUB, LANES, LEAF = 16, 128, 8
BATCH = 8
BIG = 1e30


def make_data(C, seed=0):
    """Random triangles (unit-box soup) in BW rows + one ray packet."""
    import numpy as np

    from tracerboy_tpu.trace.binned import _bw_rows

    rng = np.random.default_rng(seed)
    v0 = rng.uniform(0, 1, (C * LEAF, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.1, 0.1, (C * LEAF, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.1, 0.1, (C * LEAF, 3)).astype(np.float32)
    bw = _bw_rows(v0.astype(np.float64), v1.astype(np.float64),
                  v2.astype(np.float64))          # (C*LEAF, 3, 4)
    bw = np.asarray(bw, np.float32)
    bw_rows = np.zeros((C, 128), np.float32)
    bw_rows[:, : LEAF * 12] = bw.reshape(C, LEAF * 12)

    o = rng.uniform(-0.2, 1.2, (SUB * LANES, 3)).astype(np.float32)
    d = rng.normal(size=(SUB * LANES, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return bw_rows, o, d


def make_drain(variant: str, C: int, batches: int):
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tracerboy_tpu.trace.pallas_traverse2 import _tri_tests

    track_uv = variant != "U8"
    use_smem = variant == "S8"

    def kernel(o_ref, d_ref, tris_ref, t_out, tri_out, tb_ref, tri_ref,
               *extra):
        ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
        dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
        tb_ref[...] = jnp.full((SUB, LANES), jnp.float32(BIG))
        tri_ref[...] = jnp.full((SUB, LANES), -1, jnp.int32)
        if use_smem:
            srow, sem = extra

        def body(i, _):
            tb = tb_ref[...]
            tribest = tri_ref[...]
            for k in range(BATCH):
                cluster = (i * BATCH + k) % C
                if use_smem:
                    cp = pltpu.make_async_copy(
                        tris_ref.at[pl.ds(cluster, 1), :],
                        srow.at[pl.ds(k, 1), :],
                        sem.at[k],
                    )
                    cp.start()
            for k in range(BATCH):
                cluster = (i * BATCH + k) % C
                if use_smem:
                    pltpu.make_async_copy(
                        tris_ref.at[pl.ds(cluster, 1), :],
                        srow.at[pl.ds(k, 1), :],
                        sem.at[k],
                    ).wait()
                    trow = srow.at[k]
                    tests = []
                    for j in range(LEAF):
                        b = j * 12
                        nx, ny, nz, nd = (trow[b], trow[b + 1],
                                          trow[b + 2], trow[b + 3])
                        g1x, g1y, g1z, g1w = (trow[b + 4], trow[b + 5],
                                              trow[b + 6], trow[b + 7])
                        g2x, g2y, g2z, g2w = (trow[b + 8], trow[b + 9],
                                              trow[b + 10], trow[b + 11])
                        A = nx * ox + ny * oy + nz * oz + nd
                        B = nx * dx + ny * dy + nz * dz
                        inv_b = jnp.where(jnp.abs(B) > 1e-12, 1.0 / B, 0.0)
                        tt = -A * inv_b
                        co = g1x * ox + g1y * oy + g1z * oz + g1w
                        cd = g1x * dx + g1y * dy + g1z * dz
                        uu = co + tt * cd
                        eo = g2x * ox + g2y * oy + g2z * oz + g2w
                        ed = g2x * dx + g2y * dy + g2z * dz
                        vv = eo + tt * ed
                        ok = (
                            (jnp.abs(B) > 1e-12)
                            & (uu >= -1e-5) & (vv >= -1e-5)
                            & (uu + vv <= 1.0 + 1e-5) & (tt > 1e-5)
                        )
                        tests.append((tt, uu, vv, ok))
                else:
                    trow = tris_ref[pl.ds(cluster, 1), :]
                    tests = _tri_tests(trow, ox, oy, oz, dx, dy, dz)
                for k2 in range(LEAF):
                    tt, uu, vv, okg = tests[k2]
                    ok = okg & (tt < tb)
                    tb = jnp.where(ok, tt, tb)
                    tribest = jnp.where(ok, cluster * LEAF + k2, tribest)
            tb_ref[...] = tb
            tri_ref[...] = tribest
            return 0

        lax.fori_loop(0, batches, body, 0)
        t_out[...] = tb_ref[...]
        tri_out[...] = tri_ref[...]

    scratch = [
        pltpu.VMEM((SUB, LANES), jnp.float32),
        pltpu.VMEM((SUB, LANES), jnp.int32),
    ]
    if use_smem:
        scratch += [
            pltpu.SMEM((BATCH, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((BATCH,)),
        ]

    def run(o3, d3, bw_rows):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_shape=[
                jax.ShapeDtypeStruct((SUB, LANES), jnp.float32),
                jax.ShapeDtypeStruct((SUB, LANES), jnp.int32),
            ],
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
        )(o3, d3, bw_rows)

    return run


def make_mx128(bw_rows):
    """Regroup C consecutive 8-tri BW rows into (C//16, 8, 768) matmul
    operands: 128 tris per cluster, lanes = tris, six 128-col quantity
    groups [A|B|co|cd|eo|ed], sublanes = contraction basis
    [ox,oy,oz,1, dx,dy,dz,0]."""
    import numpy as np

    C = bw_rows.shape[0]
    bw = bw_rows[:, : LEAF * 12].reshape(C * LEAF, 12)
    n, nd = bw[:, 0:3], bw[:, 3]
    g1, g1w = bw[:, 4:7], bw[:, 7]
    g2, g2w = bw[:, 8:11], bw[:, 11]
    C128 = C // 16
    T = C128 * 128
    op = np.zeros((T, 8, 6), np.float32)
    op[:, 0:3, 0] = n[:T]
    op[:, 3, 0] = nd[:T]
    op[:, 4:7, 1] = n[:T]
    op[:, 0:3, 2] = g1[:T]
    op[:, 3, 2] = g1w[:T]
    op[:, 4:7, 3] = g1[:T]
    op[:, 0:3, 4] = g2[:T]
    op[:, 3, 4] = g2w[:T]
    op[:, 4:7, 5] = g2[:T]
    # (C128, 128, 8, 6) -> (C128, 8, 6, 128) -> (C128, 8, 768)
    op = op.reshape(C128, 128, 8, 6).transpose(0, 2, 3, 1)
    return np.ascontiguousarray(op.reshape(C128, 8, 768))


def make_drain_mx(C128: int, batches: int, precision):
    """128-tri-cluster MXU drain with deferred best-hit reduction."""
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = SUB * LANES

    def kernel(rh_ref, mx_ref, t_out, id_out, tb_ref, id_ref):
        tb_ref[...] = jnp.full((R, 128), jnp.float32(BIG))
        id_ref[...] = jnp.full((R, 128), -1, jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        rh = rh_ref[...]

        def body(i, _):
            cluster = i % C128
            op = mx_ref[pl.ds(cluster, 1)][0]            # (8, 768)
            out = jax.lax.dot_general(
                rh, op, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )                                            # (R, 768)
            A = out[:, 0:128]
            B = out[:, 128:256]
            co = out[:, 256:384]
            cd = out[:, 384:512]
            eo = out[:, 512:640]
            ed = out[:, 640:768]
            inv_b = jnp.where(jnp.abs(B) > 1e-12, 1.0 / B, 0.0)
            tt = -A * inv_b
            uu = co + tt * cd
            vv = eo + tt * ed
            ok = (
                (jnp.abs(B) > 1e-12)
                & (uu >= -1e-5) & (vv >= -1e-5)
                & (uu + vv <= 1.0 + 1e-5) & (tt > 1e-5)
            )
            key = jnp.where(ok, tt, jnp.float32(BIG))
            upd = key < tb_ref[...]
            tb_ref[...] = jnp.where(upd, key, tb_ref[...])
            id_ref[...] = jnp.where(upd, cluster * 128 + lane, id_ref[...])
            return 0

        lax.fori_loop(0, batches, body, 0)
        # one cross-lane reduction per packet
        tb = tb_ref[...]
        tmin = jnp.min(tb, axis=1, keepdims=True)        # (R, 1)
        win = jnp.max(
            jnp.where(tb == tmin, id_ref[...], -1), axis=1, keepdims=True
        )
        t_out[...] = tmin
        id_out[...] = win

    def run(rh, mx):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_shape=[
                jax.ShapeDtypeStruct((R, 1), jnp.float32),
                jax.ShapeDtypeStruct((R, 1), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((R, 128), jnp.float32),
                pltpu.VMEM((R, 128), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
        )(rh, mx)

    return run


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    import jax
    import jax.numpy as jnp
    import numpy as np

    bw_rows, o, d = make_data(C)
    o3 = jnp.asarray(o.T.reshape(3, SUB, LANES))
    d3 = jnp.asarray(d.T.reshape(3, SUB, LANES))
    bw_rows = jnp.asarray(bw_rows)

    results = {}
    for variant in ["A8", "S8", "U8"]:
        try:
            run = make_drain(variant, C, batches)
            f = jax.jit(lambda s, run=run: run(o3 * (1 + s * 1e-7), d3,
                                               bw_rows))
            out = f(jnp.float32(0))
            results[variant] = (np.asarray(out[0]), np.asarray(out[1]))
            times = []
            for trial in range(3):
                t0 = time.time()
                out = f(jnp.float32(1 + trial))
                float(jnp.sum(out[0]))
                times.append(time.time() - t0)
            dt = min(times)
            n_drains = batches * BATCH
            per = dt / n_drains
            tests = SUB * LANES * LEAF / per / 1e9
            print(f"{variant}: {dt*1e3:8.2f} ms / {n_drains} drains  "
                  f"{per*1e9:7.0f} ns/cluster  {tests:6.1f} G pair-tests/s",
                  flush=True)
        except Exception as e:
            print(f"{variant}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)

    # MXU 128-tri variant at three matmul precisions
    import jax.lax as lax
    rh = jnp.asarray(np.concatenate(
        [o, np.ones((o.shape[0], 1), np.float32),
         d, np.zeros((o.shape[0], 1), np.float32)], axis=1))
    mx = jnp.asarray(make_mx128(np.asarray(bw_rows)))
    C128 = mx.shape[0]
    mx_batches = batches * BATCH // 16     # same triangle count as A8
    for pname, prec in [("DEFAULT", lax.Precision.DEFAULT),
                        ("HIGHEST", lax.Precision.HIGHEST)]:
        try:
            run = make_drain_mx(C128, mx_batches, prec)
            f = jax.jit(lambda s, run=run: run(rh * (1 + s * 1e-7), mx))
            out = f(jnp.float32(0))
            tv = np.asarray(out[0]).reshape(SUB, LANES)
            iv = np.asarray(out[1]).reshape(SUB, LANES)
            results[f"M128/{pname}"] = (tv, iv)
            times = []
            for trial in range(3):
                t0 = time.time()
                out = f(jnp.float32(1 + trial))
                float(jnp.sum(out[0]))
                times.append(time.time() - t0)
            dt = min(times)
            per = dt / mx_batches
            tests = SUB * LANES * 128 / per / 1e9
            print(f"M128/{pname}: {dt*1e3:8.2f} ms / {mx_batches} "
                  f"drains  {per*1e9:7.0f} ns/cluster128 "
                  f"({per*1e9/16:5.0f} ns per 8 tris)  "
                  f"{tests:6.1f} G pair-tests/s", flush=True)
        except Exception as e:
            print(f"M128/{pname}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)

    if "A8" in results:
        ta, ia = results["A8"]
        for v, (tv, iv) in results.items():
            if v == "A8":
                continue
            print(f"parity A8 vs {v}: tri match "
                  f"{float((ia == iv).mean()):.4f}  t close "
                  f"{float(np.isclose(ta, tv, rtol=1e-5).mean()):.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
