"""Next-event estimation: light sampling with optional RIS.

Rebuilds the reference's GetOneLightSample (TracerBoy/RayGenCommon.h:170-261)
for flat ray pools:

- Uniform path: pick one light uniformly, sample a barycentric point, pdf =
  1 / (light_count * area) for area lights (1/light_count directional),
  attenuation = 1/d^2.
- RIS path (EnableSamplingImportanceResampling): 16 candidate samples with
  target pdf ~ area * luma(L) / d^2, combined by weighted reservoir
  sampling. Implemented as a categorical draw proportional to candidate
  weight — distributionally identical to the reference's streaming
  reservoir (RayGenCommon.h:141-166) but vectorizable. (The reference's
  shipped RIS branch leaves LightAttenuation = 0 and the light direction
  unnormalized — a bug that blacks out NEE when enabled; here the RIS
  branch produces correctly normalized, attenuated samples.)
"""

from __future__ import annotations

import jax.numpy as jnp

from tracerboy_tpu.core.mathutil import dot, luminance
from tracerboy_tpu.core import rng as tbrng

RIS_CANDIDATES = 16


def _random_barycentric(r0, r1):
    """Uniform triangle barycentrics via reflection (RayGenCommon.h:124-135)."""
    flip = (r0 + r1) > 1.0
    u = jnp.where(flip, 1.0 - r0, r0)
    v = jnp.where(flip, 1.0 - r1, r1)
    return jnp.stack([u, v, 1.0 - u - v], axis=-1)


def _light_point(lights, idx, bary):
    p = (
        lights["p0"][idx] * bary[..., 0:1]
        + lights["p1"][idx] * bary[..., 1:2]
        + lights["p2"][idx] * bary[..., 2:3]
    )
    n = (
        lights["n0"][idx] * bary[..., 0:1]
        + lights["n1"][idx] * bary[..., 1:2]
        + lights["n2"][idx] * bary[..., 2:3]
    )
    return p, n


def sample_one_light(
    lights,
    num_lights: int,
    position,        # (N, 3) shading points
    lane_id,
    sample_index,
    bounce,
    use_ris: bool = False,
    seed=0,
):
    """Sample one light per lane.

    Returns dict(direction, color, pdf, normal, attenuation, distance):
    direction normalized; pdf in the reference's area-measure convention so
    the caller's weight is atten * brdf * |dot(light_n, dir)| / pdf.
    """
    N = position.shape[0]
    if num_lights == 0:
        z3 = jnp.zeros((N, 3), jnp.float32)
        z = jnp.zeros((N,), jnp.float32)
        return dict(direction=z3, color=z3, pdf=z, normal=z3,
                    attenuation=z, distance=z)

    def finalize(idx, bary, pdf):
        lp, ln = _light_point(lights, idx, bary)
        ltype = lights["ltype"][idx]
        to_light = lp - position
        dist = jnp.sqrt(jnp.maximum(dot(to_light, to_light), 1e-12))
        direction = to_light / dist[..., None]
        atten = 1.0 / jnp.maximum(dist * dist, 1e-12)
        # Directional lights (LIGHT_TYPE_DIRECTIONAL): fixed direction,
        # unit attenuation, pdf has no area factor.
        ddir = -lights["direction"][idx]
        dnorm = lights["direction"][idx]
        direction = jnp.where((ltype == 1)[..., None], ddir, direction)
        ln = jnp.where((ltype == 1)[..., None], dnorm, ln)
        atten = jnp.where(ltype == 1, 1.0, atten)
        dist = jnp.where(ltype == 1, 1e9, dist)
        return dict(
            direction=direction,
            color=lights["color"][idx],
            pdf=pdf,
            normal=ln,
            attenuation=atten,
            distance=dist,
        )

    if not use_ris:
        r = tbrng.uniform(lane_id, sample_index, bounce,
                          tbrng.STREAM_LIGHT_SELECT, seed)
        idx = jnp.minimum((r * num_lights).astype(jnp.int32), num_lights - 1)
        b = tbrng.uniform2(lane_id, sample_index, bounce,
                           tbrng.STREAM_AREA_LIGHT, seed)
        bary = _random_barycentric(b[..., 0], b[..., 1])
        area = lights["area"][idx]
        ltype = lights["ltype"][idx]
        pdf = 1.0 / num_lights
        pdf = jnp.where(ltype == 0, pdf / jnp.maximum(area, 1e-12), pdf)
        return finalize(idx, bary, pdf)

    # --- RIS: 16 candidates, categorical-by-weight selection -------------
    cand_idx = []
    cand_bary = []
    cand_w = []
    cand_tpdf = []
    for c in range(RIS_CANDIDATES):
        r = tbrng.uniform(lane_id, sample_index, bounce,
                          tbrng.STREAM_RIS + 2 * c, seed)
        idx = jnp.minimum((r * num_lights).astype(jnp.int32), num_lights - 1)
        b = tbrng.uniform2(lane_id, sample_index, bounce,
                           tbrng.STREAM_RIS + 2 * c + 1, seed)
        bary = _random_barycentric(b[..., 0], b[..., 1])
        lp, _ = _light_point(lights, idx, bary)
        d2 = jnp.maximum(
            jnp.sum((lp - position) ** 2, axis=-1), 1e-6
        )
        target = (
            lights["area"][idx] * luminance(lights["color"][idx]) / d2
        )
        proposal = 1.0 / num_lights
        w = target / (proposal * RIS_CANDIDATES)
        cand_idx.append(idx)
        cand_bary.append(bary)
        cand_w.append(w)
        cand_tpdf.append(target)

    W = jnp.stack(cand_w, axis=1)          # (N, C)
    Tpdf = jnp.stack(cand_tpdf, axis=1)
    idxs = jnp.stack(cand_idx, axis=1)
    barys = jnp.stack(cand_bary, axis=1)   # (N, C, 3)

    wsum = jnp.sum(W, axis=1)
    cdf = jnp.cumsum(W, axis=1)
    u = tbrng.uniform(lane_id, sample_index, bounce,
                      tbrng.STREAM_RIS + 2 * RIS_CANDIDATES, seed)
    pick = jnp.sum((cdf < (u * wsum)[:, None]).astype(jnp.int32), axis=1)
    pick = jnp.minimum(pick, RIS_CANDIDATES - 1)
    rowsN = jnp.arange(N)
    sel_idx = idxs[rowsN, pick]
    sel_bary = barys[rowsN, pick]
    sel_target = Tpdf[rowsN, pick]
    area = jnp.maximum(lights["area"][sel_idx], 1e-12)
    ris_pdf = sel_target / jnp.maximum(wsum, 1e-12) / area
    out = finalize(sel_idx, sel_bary, ris_pdf)
    # Guard degenerate reservoirs (all-zero weights).
    bad = wsum <= 0.0
    out["pdf"] = jnp.where(bad, 0.0, out["pdf"])
    return out
