"""Bisect the binned-cut path on real TPU at small scale.

Phases:
  1. emit_packets2 alone
  2. traverse_packets2 with trivial packet_roots (all zeros == classic)
  3. traverse_packets2 with real per-packet roots
  4. full traverse_binned2 + parity vs classic
  5. anyhit_binned2 parity

Usage: python scripts/debug_cut_tpu.py [scene] [n_rays]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "teapot"
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 65536

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from scripts.bench_traverse import SCENES, coherence_sort, make_ray_sets
    from tracerboy_tpu.scene.compile import load_scene
    from tracerboy_tpu.trace.cut import (
        anyhit_binned2,
        build_cut,
        traverse_binned2,
    )
    from tracerboy_tpu.trace.pallas_traverse import pack_scene_for_pallas
    from tracerboy_tpu.trace.pallas_traverse2 import (
        anyhit_packets2,
        emit_packets2,
        traverse_packets2,
    )

    t0 = time.time()

    def log(*a):
        print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)

    cs = load_scene(SCENES[scene], film_size=(64, 64))
    pk, bvh = pack_scene_for_pallas(cs.tri_v0, cs.tri_v1, cs.tri_v2)
    cut = build_cut(np.asarray(pk["nodes"]), np.asarray(bvh.children),
                    bvh.leaf_size, cut_tris=512)
    pk = dict(pk)
    pk["cut_top"] = jnp.asarray(cut["top_nodes"])
    pk["cut_roots"] = jnp.asarray(cut["roots"])
    S = cut["n_cuts"]
    log(f"{scene}: {cs.tri_v0.shape[0]} tris, S={S} cuts")

    rng = np.random.default_rng(7)
    sets = make_ray_sets(cs, n_rays, rng)
    o, d, tm = sets["bounce"]
    lo = np.asarray(cs.tri_v0).min(0)
    hi = np.asarray(cs.tri_v0).max(0)
    perm = coherence_sort(o, d, lo, hi, "oct-org", tm=tm)
    o, d, tm = (jnp.asarray(o[perm]), jnp.asarray(d[perm]),
                jnp.asarray(tm[perm]))

    log("phase 1: emit_packets2 ...")
    ids = np.asarray(emit_packets2(o, d, tm, pk["cut_top"], n_cuts=S,
                                   K=6))
    emits = (ids >= 0).sum(1)
    log(f"  ok: emits/ray mean {emits.mean():.2f} max {emits.max()}, "
        f"overflow {(ids == S).any(1).mean():.4f}")

    log("phase 2a: packet_roots = zeros (classic-equivalent) ...")
    n_pk = (n_rays + 2047) // 2048
    zeros_roots = jnp.zeros((n_pk,), jnp.int32)
    t_a = traverse_packets2(o, d, tm, pk, packet_roots=zeros_roots)[0]
    t_c = traverse_packets2(o, d, tm, pk)[0]
    np.testing.assert_allclose(np.asarray(t_a), np.asarray(t_c),
                               rtol=1e-5)
    log("  ok: zero-roots == classic")

    log("phase 3: full traverse_binned2 ...")
    t_b, tri_b, _, _ = traverse_binned2(o, d, tm, pk)
    t_b = np.asarray(t_b)
    t_cN = np.asarray(t_c)
    bad = ~np.isclose(t_b, t_cN, rtol=1e-4, atol=1e-4)
    log(f"  ok: parity mismatches {bad.sum()}/{len(t_b)}")
    assert bad.mean() < 1e-4, bad.sum()

    log("phase 4: anyhit_binned2 ...")
    tm_f = jnp.where(tm > 0, 2.0, 0.0)
    a_b = np.asarray(anyhit_binned2(o, d, tm_f, pk))
    a_c = np.asarray(anyhit_packets2(o, d, tm_f, pk))
    assert (a_b == a_c).all(), (a_b != a_c).sum()
    log("  ok: anyhit parity")
    log("ALL OK")


if __name__ == "__main__":
    main()
