"""Temporal accumulation (TAA) with camera reprojection and moments.

Rebuilds TemporalAccumulationCS.hlsl: reprojection through the previous
camera's lens plane (no motion-vector texture needed; lines 113-168),
3x3 neighborhood color bounds + world-position history rejection with
manual bilinear validity weights (123-212), luma moment history
(mu, mu^2, N) producing variance in the output alpha (216-228), and the
exponential history blend (HistoryWeight = 0.95 default; line 233). The
pass runs twice per RealTime frame: once on demodulated indirect lighting
and once on the final composite (TracerBoy.cpp:3062-3087, 3142-3160).

All-gather-free jnp formulation: the 3x3/bilinear taps are jnp.roll /
gather ops over the full image.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tracerboy_tpu.core.mathutil import luminance


def _neighborhood_minmax(img):
    """Per-pixel 3x3 min/max with edge clamping."""
    lo = img
    hi = img
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            sh = jnp.roll(img, (dy, dx), axis=(0, 1))
            lo = jnp.minimum(lo, sh)
            hi = jnp.maximum(hi, sh)
    return lo, hi


def project_to_prev_uv(world_pos, cam_prev, lens_height, width, height):
    """World position -> previous frame uv via the lens-plane intersection
    (TemporalAccumulationCS.hlsl:113-135)."""
    aspect = width / height
    lens_w = lens_height * aspect
    prev_pos = cam_prev["position"]
    prev_dir = cam_prev["look_at"] - prev_pos
    prev_dir = prev_dir / jnp.linalg.norm(prev_dir)
    focal = prev_pos - cam_prev["focal_distance"] * prev_dir

    ray = world_pos - focal
    denom = jnp.sum(ray * prev_dir, axis=-1)
    t = jnp.sum((prev_pos - focal) * prev_dir) / jnp.where(
        jnp.abs(denom) > 1e-9, denom, 1e-9
    )
    lens_point = focal + ray * t[..., None]
    off = lens_point - prev_pos
    u = jnp.sum(off * cam_prev["right"], axis=-1) / (lens_w / 2.0)
    v = jnp.sum(off * cam_prev["up"], axis=-1) / (lens_height / 2.0)
    uv = jnp.stack([(u + 1.0) / 2.0, 1.0 - (v + 1.0) / 2.0], axis=-1)
    valid = (t >= 0) & jnp.all((uv >= 0.0) & (uv <= 1.0), axis=-1)
    return uv, valid


@partial(jax.jit, static_argnames=("output_moments", "ignore_history"))
def temporal_accumulate(
    current,          # (H, W, 3) this frame's color
    world_pos,        # (H, W, 4) xyz + neighbor distance
    normals,          # (H, W, 3)
    prev_world_pos,   # (H, W, 4) previous frame's world positions
    history,          # (H, W, 3) color history
    moment_history,   # (H, W, 3) luma mu, mu^2, sample count
    cam_prev,         # previous-frame camera pytree
    lens_height,
    history_weight=0.95,
    ignore_history=False,
    output_moments: bool = True,
):
    """Returns (color+variance alpha (H, W, 4), new moments (H, W, 3))."""
    H, W = current.shape[:2]
    wp = world_pos[..., :3]
    hit_valid = jnp.any(normals != 0.0, axis=-1)

    uv, in_bounds = project_to_prev_uv(wp, cam_prev, lens_height, W, H)

    # Neighborhood bounds for clamping + world-position tolerance.
    nmin_c, nmax_c = _neighborhood_minmax(current)
    nmin_w, nmax_w = _neighborhood_minmax(wp)
    dist_tol = jnp.linalg.norm(nmax_w - nmin_w, axis=-1)

    # Manual bilinear taps with world-position validity weights
    # (TemporalAccumulationCS.hlsl:170-204). Gathers run per channel
    # plane from flat (H*W,) views (dense layouts; an (H, W, 3) gather
    # result pads 3 lanes to 128 on TPU).
    fxy = uv * jnp.array([W, H], jnp.float32) - 0.5
    base = jnp.floor(fxy).astype(jnp.int32)
    frac = fxy - base

    # One packed row gather per tap (history rgb + moments + prev world
    # position = 9 channels): 4 row gathers instead of 36 scalar gathers
    # — gather cost on TPU scales with index count, not row width.
    packed = jnp.concatenate(
        [history, moment_history, prev_world_pos[..., :3]], axis=-1
    ).reshape(H * W, 9)

    prev_color = jnp.zeros((H, W, 3), jnp.float32)
    prev_moment = jnp.zeros((H, W, 3), jnp.float32)
    weight_sum = jnp.zeros((H, W), jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            ix = jnp.clip(base[..., 0] + dx, 0, W - 1)
            iy = jnp.clip(base[..., 1] + dy, 0, H - 1)
            rows = packed[iy * W + ix]          # (H, W, 9)
            dp = rows[..., 6:9] - wp
            ok = jnp.linalg.norm(dp, axis=-1) < dist_tol
            wx = jnp.where(dx == 0, 1.0 - frac[..., 0], frac[..., 0])
            wy = jnp.where(dy == 0, 1.0 - frac[..., 1], frac[..., 1])
            wgt = jnp.where(ok, wx * wy, 0.0)
            prev_color = prev_color + rows[..., 0:3] * wgt[..., None]
            prev_moment = prev_moment + rows[..., 3:6] * wgt[..., None]
            weight_sum = weight_sum + wgt

    valid = in_bounds & hit_valid & (weight_sum > 0.0)
    if ignore_history:
        valid = jnp.zeros_like(valid)
    wdiv = jnp.maximum(weight_sum, 1e-8)[..., None]
    prev_color = prev_color / wdiv
    prev_moment = prev_moment / wdiv

    out_alpha = jnp.ones((H, W), jnp.float32)
    new_moments = moment_history
    if output_moments:
        luma = luminance(current)
        sample_count = jnp.where(valid, prev_moment[..., 2], 0.0) + 1.0
        lerp = 1.0 / jnp.minimum(sample_count, 32.0)
        mu = prev_moment[..., 0] * (1 - lerp) + luma * lerp
        mu2 = prev_moment[..., 1] * (1 - lerp) + luma * luma * lerp
        new_moments = jnp.stack([mu, mu2, sample_count], axis=-1)
        out_alpha = jnp.maximum(mu2 - mu * mu, 0.0)

    prev_color = jnp.clip(prev_color, nmin_c, nmax_c)
    blend = jnp.where(valid, history_weight, 0.0)[..., None]
    color = current * (1 - blend) + prev_color * blend
    return jnp.concatenate([color, out_alpha[..., None]], axis=-1), new_moments


@jax.jit
def generate_motion_vectors(world_pos, cam_prev, cam_curr, lens_height,
                            width, height):
    """World position -> pixel-space motion vectors for upscalers
    (GenerateMotionVectorsCS.hlsl:25-55)."""
    wp = world_pos[..., :3]
    uv_prev, v_prev = project_to_prev_uv(wp, cam_prev, lens_height,
                                         width, height)
    uv_curr, v_curr = project_to_prev_uv(wp, cam_curr, lens_height,
                                         width, height)
    mv = (uv_prev - uv_curr) * jnp.array([width, height], jnp.float32)
    return jnp.where((v_prev & v_curr)[..., None], mv, 0.0)
