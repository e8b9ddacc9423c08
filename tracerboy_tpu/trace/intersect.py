"""Ray-primitive intersection: Moller-Trumbore triangles, slab AABB test,
and a brute-force all-triangles intersector.

The reference's hot intersection is the watertight Woop/Benthin/Wald
triangle test inside the traversal ubershader
(D3D12RaytracingFallback/src/TraverseFunction.hlsli:232-313) plus the
box slab test (TraverseFunction.hlsli:204-221). Here everything is batched
jnp over flat ray pools: a (N,)-ray x (T,)-triangle test broadcasts to
(N, T) on the VPU, which doubles as:
  - the ground-truth reference the BVH traversal is validated against
    (the analog of CpuBVH2Builder vs GpuBvh2Builder A/B debugging), and
  - the fast path for tiny scenes where a BVH would only add gathers.
"""

from __future__ import annotations

import jax.numpy as jnp

from tracerboy_tpu.core.mathutil import cross, dot

BIG = jnp.float32(1e30)
TRI_EPS = jnp.float32(1e-9)


def ray_triangle(orig, direc, v0, v1, v2, t_max=None):
    """Moller-Trumbore, two-sided.

    orig/direc: (..., 3); v0/v1/v2: (..., 3) broadcastable against rays.
    Returns (t, u, v, hit): t = BIG where missed.
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = cross(direc, e2)
    det = dot(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > TRI_EPS, 1.0 / det, 0.0)
    tvec = orig - v0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    v = dot(direc, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    hit = (
        (jnp.abs(det) > TRI_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 1e-5)
    )
    if t_max is not None:
        hit = hit & (t < t_max)
    return jnp.where(hit, t, BIG), u, v, hit


def ray_aabb(orig, inv_dir, lo, hi, t_max):
    """Slab test. orig/inv_dir: (..., 3); lo/hi broadcastable.

    Returns (t_near, intersects). Entry at t_near >= 0 or ray starts inside.
    """
    t0 = (lo - orig) * inv_dir
    t1 = (hi - orig) * inv_dir
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    t_near = jnp.max(tmin, axis=-1)
    t_far = jnp.min(tmax, axis=-1)
    hit = (t_far >= jnp.maximum(t_near, 0.0)) & (t_near < t_max)
    return t_near, hit


def brute_force_closest(orig, direc, v0, v1, v2, t_max=None):
    """Closest hit over all triangles by exhaustive test.

    orig/direc: (N, 3); v0/v1/v2: (T, 3). Returns (t, tri_id, u, v); tri_id
    is -1 where missed. O(N*T) on the VPU — the ground truth for traversal
    tests and the fast path for tiny scenes.
    """
    t, u, v, hit = ray_triangle(
        orig[:, None, :], direc[:, None, :], v0[None], v1[None], v2[None],
        t_max=None if t_max is None else t_max[:, None],
    )
    best = jnp.argmin(t, axis=1)
    n = jnp.arange(t.shape[0])
    t_best = t[n, best]
    found = t_best < BIG
    return (
        t_best,
        jnp.where(found, best, -1),
        u[n, best],
        v[n, best],
    )


def brute_force_anyhit(orig, direc, v0, v1, v2, t_max):
    """Occlusion test over all triangles (shadow rays)."""
    t, _, _, hit = ray_triangle(
        orig[:, None, :], direc[:, None, :], v0[None], v1[None], v2[None],
        t_max=t_max[:, None],
    )
    return jnp.any(hit, axis=1)
