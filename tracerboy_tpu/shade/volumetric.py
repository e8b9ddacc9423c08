"""Heterogeneous participating medium: delta tracking + ratio marching.

The reference loads a density grid + bounds (TracerBoy.cpp:1096-1184,
compile-disabled) but never shades it; its kernel cites the Pixar
production-volume-rendering course for the intended anisotropic phase
(kernel.glsl:1200). This module supplies that missing shading,
TPU-native: fixed-iteration masked walks (no data-dependent loops under
jit), trilinear density taps via single wide-row gathers from a
precomputed (D*H*W, 8) corner-stencil table (nearest-neighbor plane
kept as fallback), and spectral null-collision weights so colored
sigma_a/sigma_s stay unbiased (Kutz et al. 2017 spectral tracking,
single scalar majorant).

Used by trace/wavefront.py when the compiled scene carries a volume
(cfg.has_volume): camera/bounce segments get a delta-tracked scatter
event + Henyey-Greenstein redirection; NEE shadow segments get
jittered ratio-marched transmittance.
"""

from __future__ import annotations

import jax.numpy as jnp

from tracerboy_tpu.core.vec3 import V3


def ray_box_overlap(o, d, lo, hi):
    """Slab overlap of SoA rays with the volume AABB.

    Returns (t0, t1); empty overlap has t1 <= t0.
    """
    eps = jnp.float32(1e-12)

    def axis(oc, dc, lo_c, hi_c):
        dc = jnp.where(jnp.abs(dc) < eps,
                       jnp.where(dc < 0, -eps, eps), dc)
        a = (lo_c - oc) / dc
        b = (hi_c - oc) / dc
        return jnp.minimum(a, b), jnp.maximum(a, b)

    n0, f0 = axis(o.x, d.x, lo[0], hi[0])
    n1, f1 = axis(o.y, d.y, lo[1], hi[1])
    n2, f2 = axis(o.z, d.z, lo[2], hi[2])
    t0 = jnp.maximum(jnp.maximum(n0, n1), jnp.maximum(n2, 0.0))
    t1 = jnp.minimum(jnp.minimum(f0, f1), f2)
    return t0, t1


def sample_density(scene, px, py, pz):
    """Nearest-neighbor density at SoA world positions (one gather)."""
    lo = scene["vol_lo"]
    hi = scene["vol_hi"]
    dims = scene["vol_dims"]  # (D, H, W) = (z, y, x)
    ext = jnp.maximum(hi - lo, 1e-12)
    fz = (pz - lo[2]) / ext[2]
    fy = (py - lo[1]) / ext[1]
    fx = (px - lo[0]) / ext[0]
    iz = jnp.clip((fz * dims[0].astype(jnp.float32)).astype(jnp.int32),
                  0, dims[0] - 1)
    iy = jnp.clip((fy * dims[1].astype(jnp.float32)).astype(jnp.int32),
                  0, dims[1] - 1)
    ix = jnp.clip((fx * dims[2].astype(jnp.float32)).astype(jnp.int32),
                  0, dims[2] - 1)
    flat = (iz * dims[1] + iy) * dims[2] + ix
    inside = (
        (fx >= 0) & (fx < 1) & (fy >= 0) & (fy < 1) & (fz >= 0) & (fz < 1)
    )
    return jnp.where(inside, scene["vol_density"][flat], 0.0)


def sample_density_trilinear(scene, px, py, pz):
    """Trilinearly interpolated density at SoA world positions.

    One row-gather from the precomputed (D*H*W, 8) corner-stencil table
    (scene["vol_oct"], built in scene/compile.py — the env_quad trick in
    3D), then an 8-tap lerp on the VPU. Voxel CENTERS are the sample
    points (continuous coords f*dim - 0.5, edge-clamped), so the field
    is C0 everywhere inside the grid; interpolated values never exceed
    max(density), which keeps the delta-tracking majorant a true bound.
    """
    lo = scene["vol_lo"]
    hi = scene["vol_hi"]
    dims = scene["vol_dims"]  # (D, H, W) = (z, y, x)
    ext = jnp.maximum(hi - lo, 1e-12)
    fz = (pz - lo[2]) / ext[2]
    fy = (py - lo[1]) / ext[1]
    fx = (px - lo[0]) / ext[0]
    inside = (
        (fx >= 0) & (fx < 1) & (fy >= 0) & (fy < 1) & (fz >= 0) & (fz < 1)
    )

    def axis(f, n):
        c = f * n.astype(jnp.float32) - 0.5
        b = jnp.clip(jnp.floor(c), 0.0, n.astype(jnp.float32) - 1.0)
        return b.astype(jnp.int32), jnp.clip(c - b, 0.0, 1.0)

    bz, wz = axis(fz, dims[0])
    by, wy = axis(fy, dims[1])
    bx, wx = axis(fx, dims[2])
    flat = (bz * dims[1] + by) * dims[2] + bx
    row = scene["vol_oct"][flat]  # (N, 8)
    # Corner order (see compile.py): [z y x], [z y x+], [z y+ x],
    # [z y+ x+], [z+ y x], [z+ y x+], [z+ y+ x], [z+ y+ x+].
    lx0 = row[:, 0] * (1 - wx) + row[:, 1] * wx
    lx1 = row[:, 2] * (1 - wx) + row[:, 3] * wx
    lx2 = row[:, 4] * (1 - wx) + row[:, 5] * wx
    lx3 = row[:, 6] * (1 - wx) + row[:, 7] * wx
    ly0 = lx0 * (1 - wy) + lx1 * wy
    ly1 = lx2 * (1 - wy) + lx3 * wy
    return jnp.where(inside, ly0 * (1 - wz) + ly1 * wz, 0.0)


def density_at(scene, px, py, pz):
    """Trilinear when the stencil table is present, else nearest."""
    if "vol_oct" in scene:
        return sample_density_trilinear(scene, px, py, pz)
    return sample_density(scene, px, py, pz)


def hg_pdf(cos_t, g):
    """Henyey-Greenstein phase density over solid angle (= the phase
    value itself: sample_hg draws proportional to it, so it doubles as
    the MIS pdf). |g| ~ 0 falls back to the isotropic 1/4pi."""
    g = jnp.asarray(g, jnp.float32)
    iso = jnp.abs(g) < 1e-3
    den = jnp.power(
        jnp.maximum(1.0 + g * g - 2.0 * g * cos_t, 1e-6), 1.5
    )
    return jnp.where(
        iso, jnp.full_like(cos_t, 1.0 / (4.0 * jnp.pi)),
        (1.0 - g * g) / (4.0 * jnp.pi * den),
    )


def delta_track(scene, o, d, t_lim, active, rng2, steps: int):
    """Delta-tracked medium interaction along [0, t_lim].

    rng2(k) -> (u_dist, u_accept) per fixed iteration k. Returns
    (scattered, t_scatter, weight V3): weight carries the spectral
    null-collision corrections plus single-scatter albedo at the real
    collision; rays that escape the segment keep weight = their
    accumulated null corrections (expected value = transmittance).
    """
    t0, t1 = ray_box_overlap(o, d, scene["vol_lo"], scene["vol_hi"])
    t1 = jnp.minimum(t1, t_lim)
    walk = active & (t1 > t0)

    maj = scene["vol_majorant"]
    sig_a = scene["vol_sigma_a"]
    sig_s = scene["vol_sigma_s"]
    sig_t = sig_a + sig_s
    sig_t_max = jnp.maximum(jnp.max(sig_t), 1e-8)
    sig_s_max = jnp.maximum(jnp.max(sig_s), 1e-8)

    import jax

    one = jnp.ones_like(t0)

    def body(carry):
        k, tcur, scattered, t_sc, wx, wy, wz = carry
        u1, u2 = rng2(k)
        step = -jnp.log(jnp.maximum(1.0 - u1, 1e-12)) / maj
        tcur = jnp.where(walk & ~scattered, tcur + step, tcur)
        live = walk & ~scattered & (tcur < t1)
        px = o.x + d.x * tcur
        py = o.y + d.y * tcur
        pz = o.z + d.z * tcur
        dens = density_at(scene, px, py, pz)
        p_real = jnp.clip(dens * sig_t_max / maj, 0.0, 1.0)
        real = live & (u2 < p_real)
        # Real collision: scatter with per-channel albedo weight
        # sigma_s_c / sigma_t_max (absorption folded in; spectral
        # tracking with a scalar majorant on the max channel).
        scat_w = sig_s / sig_t_max
        # Null collision: per-channel correction
        # (maj - dens*sigma_t_c) / (maj - dens*sigma_t_max).
        denom = jnp.maximum(maj - dens * sig_t_max, 1e-8 * maj)
        nullc = live & ~real

        def upd(wc, c):
            return jnp.where(
                real, wc * scat_w[c],
                jnp.where(
                    nullc, wc * (maj - dens * sig_t[c]) / denom, wc,
                ),
            )

        return (
            k + 1, tcur, scattered | real,
            jnp.where(real, tcur, t_sc),
            upd(wx, 0), upd(wy, 1), upd(wz, 2),
        )

    def cond(carry):
        k, tcur, scattered, *_ = carry
        # Keep walking while any lane is mid-volume and the hard cap
        # (`steps`, the static bound the per-iteration RNG stream is
        # derived from) is not reached. Data-driven length: lock-step
        # lanes all finish before dense media truncate.
        return (k < steps) & jnp.any(walk & ~scattered & (tcur < t1))

    _, _, scattered, t_sc, wx, wy, wz = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), t0, walk & False, jnp.zeros_like(t0),
         one, one, one),
    )
    return scattered, t_sc, V3(wx, wy, wz)


def transmittance(scene, o, d, t_max, active, jitter, steps: int):
    """Ratio-marched transmittance along shadow segments.

    Fixed `steps` jittered samples of sigma_t over the box overlap;
    T_c = exp(-sum sigma_t_c(x_j) * dt). Used to attenuate NEE through
    the volume.
    """
    t0, t1 = ray_box_overlap(o, d, scene["vol_lo"], scene["vol_hi"])
    t1 = jnp.minimum(t1, t_max)
    seg = jnp.maximum(t1 - t0, 0.0)
    march = active & (seg > 0.0)

    sig_t = scene["vol_sigma_a"] + scene["vol_sigma_s"]
    dt = seg / steps
    acc = jnp.zeros_like(t0)
    for j in range(steps):
        tj = t0 + (j + jitter) * dt
        px = o.x + d.x * tj
        py = o.y + d.y * tj
        pz = o.z + d.z * tj
        acc = acc + density_at(scene, px, py, pz)
    tau = jnp.where(march, acc * dt, 0.0)
    return V3(
        jnp.exp(-tau * sig_t[0]),
        jnp.exp(-tau * sig_t[1]),
        jnp.exp(-tau * sig_t[2]),
    )


def sample_hg(d, g, u1, u2):
    """Henyey-Greenstein direction sample around SoA directions d.

    g ~ 0 falls back to the isotropic sphere (the reference's medium
    scatter, kernel.glsl:1616-1621); otherwise the standard HG inversion
    (Pixar PVR course eq. 8, cited at kernel.glsl:1200).
    """
    from tracerboy_tpu.core import vec3 as v3

    g = jnp.broadcast_to(jnp.asarray(g, jnp.float32), u1.shape)
    iso = jnp.abs(g) < 1e-3
    den1 = 1.0 + g - 2.0 * g * u1
    den1 = jnp.where(jnp.abs(den1) < 1e-6,
                     jnp.where(den1 < 0, -1e-6, 1e-6), den1)
    sq = (1.0 - g * g) / den1
    den2 = jnp.where(jnp.abs(g) < 1e-6, 1e-6, 2.0 * g)
    cos_hg = (1.0 + g * g - sq * sq) / den2
    cos_t = jnp.where(iso, 1.0 - 2.0 * u1, jnp.clip(cos_hg, -1.0, 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u2

    # Orthonormal frame around d.
    up_x = jnp.where(jnp.abs(d.z) < 0.999, 0.0, 1.0)
    up = V3(up_x, jnp.zeros_like(up_x), 1.0 - up_x)
    t1v = v3.normalize(v3.cross(up, d))
    t2v = v3.cross(d, t1v)
    return v3.normalize(
        t1v * (sin_t * jnp.cos(phi))
        + t2v * (sin_t * jnp.sin(phi))
        + d * cos_t
    )
