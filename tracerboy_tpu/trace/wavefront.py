"""Wavefront path-tracing integrator.

The TPU-native redesign of the reference's megakernel `Trace` bounce loop
(TracerBoy/kernel.glsl:1277-1776) plus its PathTrace epilogue
(kernel.glsl:1805-1925): instead of one divergent per-pixel loop, a flat
ray pool advances through uniform, fully-vectorized stages per bounce —
RR -> traverse -> miss/env -> material fetch -> NEE + shadow wave ->
BSDF sample -> throughput update — with lane masks in place of branches.

The reference's nested subsurface random walk (kernel.glsl:1529-1691) is
re-expressed as a per-ray *medium state machine* folded into the same
bounce loop: a ray inside a medium alternates free-flight sampling and
boundary refraction as ordinary wavefront steps, so SSS rays ride the same
traversal waves as everything else (no divergent inner loop). Consequence:
medium scattering events consume bounce budget (the reference allowed 100
dedicated SSS steps); russian roulette bounds the walk instead.

Known deliberate deviations from the reference (all bias-reducing):
- RR survival probability is clamped to <= 1 (the reference divides by
  unclamped p, losing energy when throughput > 1).
- RIS light sampling produces normalized, attenuated directions (the
  reference's RIS branch leaves attenuation at 0 — black NEE).
- Medium phase sampling weights by phase/pdf = 1 exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from tracerboy_tpu.core import rng as tbrng
from tracerboy_tpu.core.filters import filter_weight as eval_filter_weight
from tracerboy_tpu.core.mathutil import dot, normalize, reflect
from tracerboy_tpu.scene.materials import (
    LIGHT_FLAG,
    METALLIC_FLAG,
    NO_SPECULAR_FLAG,
    SINGLE_SIDED_FLAG,
    SUBSURFACE_SCATTER_FLAG,
    HAIR_FLAG,
)
from tracerboy_tpu.shade import bsdf
from tracerboy_tpu.shade.env import sample_environment
from tracerboy_tpu.shade.nee import sample_one_light
from tracerboy_tpu.shade.surface import fetch_material
from tracerboy_tpu.trace.camera import generate_primary_rays
from tracerboy_tpu.trace.traverse import traverse_wide
from tracerboy_tpu.trace.intersect import BIG

EPSILON = 1e-4
MIN_BOUNCES_BEFORE_RR = 2  # kernel.glsl:1276-1277


def _coherence_sort(origin, direction, world_lo, world_hi):
    """Sort key grouping rays into coherent packets: direction octant
    (3 bits) then origin morton (the wavefront ray-sorting step; the
    paper-backed divergence mitigation from SURVEY.md 7.0)."""
    oct_bits = (
        (direction[:, 0] >= 0).astype(jnp.uint32)
        | ((direction[:, 1] >= 0).astype(jnp.uint32) << 1)
        | ((direction[:, 2] >= 0).astype(jnp.uint32) << 2)
    )
    ext = jnp.maximum(world_hi - world_lo, 1e-12)
    q = jnp.clip((origin - world_lo) / ext * 255.0, 0.0, 255.0).astype(
        jnp.uint32
    )

    def spread8(v):  # 8 bits -> every 3rd bit
        v = (v | (v << 8)) & jnp.uint32(0xF00F)
        v = (v | (v << 4)) & jnp.uint32(0xC30C3)
        v = (v | (v << 2)) & jnp.uint32(0x249249)
        return v

    morton = (
        (spread8(q[:, 0]) << 2) | (spread8(q[:, 1]) << 1) | spread8(q[:, 2])
    )
    return (oct_bits << 24) | (morton >> 3)


def _pallas_closest(scene, origin, direction, t_max, shadow: bool):
    """Packet traversal with coherence sorting + padding."""
    from tracerboy_tpu.trace.pallas_traverse import (
        PACKET,
        PACKETS_PER_BLOCK,
        traverse_packets,
    )

    N = origin.shape[0]
    key = _coherence_sort(
        origin, direction, scene["world_lo"], scene["world_hi"]
    )
    perm = jnp.argsort(key)
    pad = (-N) % (PACKET * PACKETS_PER_BLOCK)
    if pad:
        perm_p = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)])
        tmax_p = jnp.concatenate(
            [t_max[perm], jnp.zeros((pad,), t_max.dtype)]
        )
    else:
        perm_p = perm
        tmax_p = t_max[perm]
    o_s = origin[perm_p]
    d_s = direction[perm_p]

    prefix = "pk_sh_" if shadow else "pk_"
    packed = dict(nodes=scene[prefix + "nodes"], tris=scene[prefix + "tris"])
    t, tri, u, v = traverse_packets(o_s, d_s, tmax_p, packed)
    # Packed tri ids -> scene tri order.
    tri_map = scene[prefix + "tri_map"]
    tri = jnp.where(tri >= 0, tri_map[jnp.clip(tri, 0, None)], -1)

    inv = jnp.zeros((N,), jnp.int32).at[perm].set(
        jnp.arange(N, dtype=jnp.int32)
    )
    return t[inv], tri[inv], u[inv], v[inv]


@dataclass(frozen=True)
class WaveConfig:
    """Static integrator configuration (specializes the jit)."""

    width: int
    height: int
    max_bounces: int = 6
    leaf_size: int = 4
    num_lights: int = 0
    enable_nee: bool = True
    enable_ris: bool = False
    use_russian_roulette: bool = True
    filter_type: int = 0
    filter_width: float = 1.0
    use_blue_noise: bool = True
    decouple_albedo: bool = False   # RealTime mode: first-hit albedo out
    has_env: bool = True
    # Compile-time scene facts: scenes without mix materials / textures
    # skip those fetch paths entirely.
    has_mix: bool = True
    has_textures: bool = True
    # Traversal backend:
    #  "jnp"    — lock-step masked traversal (portable reference)
    #  "brute"  — exhaustive ray x tri tests; zero gathers, fastest for
    #             scenes up to a few thousand triangles
    #  "pallas" — packet kernel over the quantized wide BVH (VMEM-resident
    #             scenes); bounce rays are sorted into coherent packets
    traversal: str = "jnp"

    @property
    def use_brute_force(self):
        return self.traversal == "brute"


def _blue_or_hash2(scene, px, py, lane, sample_index, bounce, stream, cfg, seed):
    """2D sample: blue-noise + Cranley-Patterson for the 4 reference
    streams on bounce 0 (RayGenCommon.h:102-122), hash RNG otherwise."""
    if cfg.use_blue_noise and stream in (
        tbrng.STREAM_PRIMARY_JITTER,
        tbrng.STREAM_SECONDARY_DIR,
        tbrng.STREAM_AREA_LIGHT,
        tbrng.STREAM_DOF,
    ):
        tex = scene["blue_noise0"] if stream in (
            tbrng.STREAM_PRIMARY_JITTER, tbrng.STREAM_SECONDARY_DIR
        ) else scene["blue_noise1"]
        chan = 0 if stream in (
            tbrng.STREAM_PRIMARY_JITTER, tbrng.STREAM_AREA_LIGHT
        ) else 2
        noise = tex[py % 256, px % 256][..., chan : chan + 2]
        return tbrng.apply_lds_rotation(noise, sample_index)
    return tbrng.uniform2(lane, sample_index, bounce, stream, seed)


def _interp3(a, b, c, u, v):
    """Barycentric interpolation with Moller-Trumbore's (u, v): u weights
    the second vertex, v the third."""
    w = 1.0 - u - v
    return (
        a * w[..., None] + b * u[..., None] + c * v[..., None]
    )


@partial(jax.jit, static_argnames=("cfg",))
def render_wave(scene, params, pixel_ids, sample_index, cfg: WaveConfig):
    """Trace one sample for each pixel id; returns radiance + AOVs.

    scene: CompiledScene.as_pytree() dict.
    params: dict(dof_focus, dof_aperture, firefly_clamp, seed) traced.
    pixel_ids: (N,) int32 flat pixel indices.
    sample_index: traced int32 (global sample/frame counter).
    """
    N = pixel_ids.shape[0]
    lane = pixel_ids
    seed = params.get("seed", 0)
    px = pixel_ids % cfg.width
    py = pixel_ids // cfg.width

    # --- primary rays (kernel.glsl:1805-1903) ---------------------------
    jitter = _blue_or_hash2(
        scene, px, py, lane, sample_index, 0,
        tbrng.STREAM_PRIMARY_JITTER, cfg, seed,
    )
    fixed = params.get("fixed_pixel_offset")
    if fixed is not None:
        jitter = jnp.broadcast_to(fixed, jitter.shape)
    fw = eval_filter_weight(jitter, cfg.filter_type, cfg.filter_width)
    dof_jitter = _blue_or_hash2(
        scene, px, py, lane, sample_index, 0, tbrng.STREAM_DOF, cfg, seed
    )
    origin, direction = generate_primary_rays(
        scene["camera"], cfg.width, cfg.height, pixel_ids, jitter,
        dof_focus_distance=params.get("dof_focus", 0.0),
        dof_aperture_width=params.get("dof_aperture", 0.0),
        dof_jitter=dof_jitter,
        filter_width=cfg.filter_width,
    )

    # Neighbor ray for the TAA world-position validity metric
    # (RayGenCommon.h:690-711): distance between this and the adjacent
    # pixel's hit points at equal depth.
    n_origin, n_direction = generate_primary_rays(
        scene["camera"], cfg.width, cfg.height, pixel_ids + 1, jitter,
        filter_width=cfg.filter_width,
    )

    # Per-lane zero tied to the (possibly device-sharded) pixel pool so
    # every loop carry keeps a consistent sharding type under shard_map.
    vz = (
        pixel_ids.astype(jnp.float32)
        + jnp.asarray(sample_index, jnp.float32)
    ) * 0.0
    zero3 = jnp.zeros((N, 3), jnp.float32) + vz[:, None]
    state = dict(
        origin=origin,
        direction=direction,
        throughput=jnp.ones((N, 3), jnp.float32) + vz[:, None],
        radiance=zero3,
        # Adaptive sampling: converged pixels are masked off up front
        # (VarianceUtil.h ShouldSkipRay semantics, driven by the caller).
        alive=(vz == 0.0) if params.get("active_mask") is None
        else (params["active_mask"] & (vz == 0.0)),
        prev_perfect_specular=vz != 0.0,
        inside=vz != 0.0,
        med_absorption=zero3,
        med_scattering=zero3,
        med_ior=jnp.ones((N,), jnp.float32) + vz,
        # AOVs (written on the first hit)
        aov_albedo=zero3,
        aov_normal=zero3,
        aov_world_pos=zero3,
        aov_emissive=zero3,
        aov_depth=vz,
        aov_material=jnp.full((N,), -1, jnp.int32) + vz.astype(jnp.int32),
        aov_diffuse_contrib=jnp.ones((N,), jnp.float32) + vz,
        aov_neighbor_dist=vz,
        aov_heatmap=vz,
        viz_rays=jnp.zeros((cfg.max_bounces, 8), jnp.float32) + jnp.sum(vz),
        # Stats: total rays traced (primary+bounce+shadow) and live-lane
        # counts — the analog of the reference's wave/pixel atomics
        # (RaytraceCS.hlsl:59-65).
        rays_traced=jnp.sum(vz),
        live_end=jnp.sum(vz),
    )

    def bounce(i, s):
        alive = s["alive"]

        # --- russian roulette (kernel.glsl:1288-1301) -------------------
        if cfg.use_russian_roulette:
            p = jnp.max(s["throughput"], axis=-1)
            p = jnp.clip(p, EPSILON, 1.0)
            r = tbrng.uniform(lane, sample_index, i,
                              tbrng.STREAM_RUSSIAN_ROULETTE, seed)
            do_rr = alive & (i >= MIN_BOUNCES_BEFORE_RR)
            killed = do_rr & (r >= p)
            alive = alive & ~killed
            s["throughput"] = jnp.where(
                do_rr[..., None] & ~killed[..., None],
                s["throughput"] / p[..., None],
                s["throughput"],
            )

        # Early-out for negligible throughput (kernel.glsl:1318-1325).
        alive = alive & jnp.any(s["throughput"] >= EPSILON, axis=-1)

        s["rays_traced"] = s["rays_traced"] + jnp.sum(alive.astype(jnp.float32))

        # --- traversal --------------------------------------------------
        t_max = jnp.where(alive, BIG, 0.0)
        if cfg.use_brute_force:
            from tracerboy_tpu.trace.intersect import brute_force_closest

            t, tri, u, v = brute_force_closest(
                s["origin"], s["direction"],
                scene["tri_v0"], scene["tri_v1"], scene["tri_v2"],
            )
            t = jnp.where(alive, t, BIG)
            tri = jnp.where(alive, tri, -1)
            trav_cost = jnp.full(
                (N,), float(scene["tri_v0"].shape[0]), jnp.float32
            )
        elif cfg.traversal == "pallas":
            t, tri, u, v = _pallas_closest(
                scene, s["origin"], s["direction"], t_max, shadow=False
            )
            trav_cost = jnp.zeros((N,), jnp.float32)
        else:
            t, tri, u, v, trav_cost = traverse_wide(
                s["origin"], s["direction"], t_max,
                scene["bvh_lo"], scene["bvh_hi"], scene["bvh_children"],
                scene["tri_v0"], scene["tri_v1"], scene["tri_v2"],
                leaf_size=cfg.leaf_size,
            )
        hit = alive & (tri >= 0)
        miss = alive & (tri < 0)

        # --- miss: environment (kernel.glsl:1327-1343) ------------------
        if cfg.has_env:
            env = sample_environment(
                s["direction"], scene["env_map"], scene["env_transform"],
                scene["env_color_scale"],
            )
        else:
            env = zero3
        s["radiance"] = jnp.where(
            miss[..., None], s["radiance"] + s["throughput"] * env,
            s["radiance"],
        )
        s["aov_emissive"] = jnp.where(
            (miss & (i == 0))[..., None],
            s["radiance"], s["aov_emissive"],
        )
        alive = alive & ~miss

        # --- hit attributes --------------------------------------------
        tric = jnp.clip(tri, 0, scene["tri_v0"].shape[0] - 1)
        hit_point = s["origin"] + s["direction"] * t[..., None]
        sh_normal = normalize(_interp3(
            scene["tri_n0"][tric], scene["tri_n1"][tric],
            scene["tri_n2"][tric], u, v,
        ))
        uv = _interp3(
            scene["tri_uv0"][tric], scene["tri_uv1"][tric],
            scene["tri_uv2"][tric], u, v,
        )
        mat_id = scene["tri_material"][tric]

        ray_dot_n = dot(sh_normal, s["direction"])
        backside = ray_dot_n > 0.0
        mat = fetch_material(
            scene, mat_id, uv, backside, lane, sample_index, i, seed,
            has_mix=cfg.has_mix, has_textures=cfg.has_textures,
        )
        flags = mat["flags"]
        detail_normal = sh_normal  # normal mapping hook (normal_tex)

        # Flip normals when hitting the inside (kernel.glsl:1386-1394).
        flip = backside
        normal = jnp.where(flip[..., None], -sh_normal, sh_normal)
        detail_normal = jnp.where(flip[..., None], -detail_normal, detail_normal)
        ray_dot_n = jnp.where(flip, -ray_dot_n, ray_dot_n)

        cur_ior = jnp.where(backside, mat["ior"], bsdf.AIR_IOR)
        new_ior = jnp.where(backside, bsdf.AIR_IOR, mat["ior"])

        # ================================================================
        # Medium transport for rays inside an SSS volume — the wavefront
        # form of the reference's inner walk (kernel.glsl:1591-1691).
        # ================================================================
        in_medium = alive & s["inside"]
        mean_scat = jnp.mean(s["med_scattering"], axis=-1)
        no_scatter = mean_scat < EPSILON
        dist_per_scatter = 1.0 / jnp.maximum(mean_scat, 1e-12)
        r_fly = tbrng.uniform(lane, sample_index, i, tbrng.STREAM_SSS, seed)
        travel = jnp.maximum(-jnp.log(jnp.maximum(r_fly, 1e-12)), 0.1) * \
            dist_per_scatter
        travel = jnp.where(no_scatter, BIG, travel)
        scatter_event = in_medium & (travel < t) & ~no_scatter
        seg = jnp.minimum(travel, t)
        beer = jnp.exp(-s["med_absorption"] * seg[..., None])
        s["throughput"] = jnp.where(
            in_medium[..., None], s["throughput"] * beer, s["throughput"]
        )
        # Rays escaping the medium without a hit die (shouldn't happen in
        # closed meshes; kernel.glsl:1612-1617 zeroes them too).
        med_escaped = s["inside"] & miss
        s["throughput"] = jnp.where(
            med_escaped[..., None], 0.0, s["throughput"]
        )

        # (a) scatter inside the medium: isotropic redirect.
        r2 = tbrng.uniform2(lane, sample_index, i, tbrng.STREAM_SSS + 1, seed)
        scat_dir, _ = bsdf.sample_uniform_sphere(r2[..., 0], r2[..., 1])
        # (b) boundary: refract out (TIR keeps the ray inside).
        exit_dir, tir = _refract_or_reflect(
            s["direction"], normal, cur_ior / jnp.maximum(new_ior, 1e-6),
            ray_dot_n,
        )
        med_exit = in_medium & ~scatter_event
        new_inside = jnp.where(
            scatter_event, True, jnp.where(med_exit & ~tir, False, s["inside"])
        )

        med_dir = jnp.where(scatter_event[..., None], scat_dir, exit_dir)
        med_org = jnp.where(
            scatter_event[..., None],
            s["origin"] + s["direction"] * seg[..., None],
            hit_point + jnp.where(
                tir[..., None], normal * EPSILON, -normal * EPSILON
            ),
        )

        # ================================================================
        # Surface shading for rays NOT inside a medium
        # ================================================================
        shading = alive & ~s["inside"]

        is_light = (flags & LIGHT_FLAG) != 0
        allows_spec = (flags & NO_SPECULAR_FLAG) == 0
        is_metal = ((flags & METALLIC_FLAG) != 0) | ((flags & HAIR_FLAG) != 0)
        is_sss = (flags & SUBSURFACE_SCATTER_FLAG) != 0
        single_sided = (flags & SINGLE_SIDED_FLAG) != 0

        r_spec = tbrng.uniform(lane, sample_index, i,
                               tbrng.STREAM_SPECULAR_SELECT, seed)
        spec_ray = allows_spec & (is_metal | (r_spec < 0.5))
        perfect_spec = spec_ray & (mat["roughness"] < 0.05)

        # --- emissive contribution (kernel.glsl:1425-1433) --------------
        take_emissive = (
            s["prev_perfect_specular"] | (i == 0) | ~is_light
            | (not cfg.enable_nee)
        )
        s["radiance"] = jnp.where(
            (shading & take_emissive)[..., None],
            s["radiance"] + s["throughput"] * mat["emissive"],
            s["radiance"],
        )

        # --- first-hit AOVs (RayGenCommon.h:524-654) --------------------
        first = (i == 0) & shading
        s["aov_world_pos"] = jnp.where(first[..., None], hit_point,
                                       s["aov_world_pos"])
        s["aov_normal"] = jnp.where(first[..., None], detail_normal,
                                    s["aov_normal"])
        s["aov_depth"] = jnp.where(first, t, s["aov_depth"])
        s["aov_material"] = jnp.where(first, mat_id, s["aov_material"])
        s["aov_albedo"] = jnp.where(first[..., None], mat["albedo"],
                                    s["aov_albedo"])
        s["aov_emissive"] = jnp.where(first[..., None], mat["emissive"],
                                      s["aov_emissive"])
        n_hit = n_origin + n_direction * t[..., None]
        s["aov_neighbor_dist"] = jnp.where(
            first, jnp.linalg.norm(n_hit - hit_point, axis=-1),
            s["aov_neighbor_dist"],
        )
        s["aov_heatmap"] = jnp.where(
            i == 0, trav_cost, s["aov_heatmap"]
        )

        # Ray-path visualization record for the selected pixel
        # (RayGenCommon.h:600-630 OutputVisualizationRay): capture this
        # bounce's segment for lane == selected_pixel.
        sel = params.get("selected_pixel")
        if sel is not None:
            is_sel = (lane == sel) & alive
            seg = jnp.concatenate(
                [s["origin"], hit_point,
                 jnp.stack([t, alive.astype(jnp.float32)], axis=-1)],
                axis=-1,
            )  # (N, 8)
            sel_seg = jnp.sum(
                jnp.where(is_sel[..., None], seg, 0.0), axis=0
            )
            s["viz_rays"] = s["viz_rays"].at[i].set(sel_seg)

        # --- NEE (kernel.glsl:1435-1517) --------------------------------
        if cfg.enable_nee and cfg.num_lights > 0:
            ls = sample_one_light(
                scene["lights"], cfg.num_lights, hit_point, lane,
                sample_index, i, use_ris=cfg.enable_ris, seed=seed,
            )
            facing = dot(ls["direction"], ls["normal"]) < 0.0
            do_nee = (
                shading & ~perfect_spec & ~is_light
                & (ls["pdf"] > EPSILON) & facing
            )
            sh_org = hit_point + normal * EPSILON
            sh_tmax = jnp.where(do_nee, ls["distance"] * (1.0 - 1e-3), 0.0)
            if cfg.use_brute_force:
                from tracerboy_tpu.trace.intersect import ray_triangle

                ts, _, _, hits = ray_triangle(
                    sh_org[:, None, :], ls["direction"][:, None, :],
                    scene["tri_v0"][None], scene["tri_v1"][None],
                    scene["tri_v2"][None], t_max=sh_tmax[:, None],
                )
                opaque = scene.get("tri_shadow_opaque")
                if opaque is not None:
                    hits = hits & opaque[None, :]
                occluded = jnp.any(hits, axis=1)
            elif cfg.traversal == "pallas":
                # Shadow rays traverse a second packed BVH that excludes
                # light geometry (the IsLight pass-through semantics).
                st, _, _, _ = _pallas_closest(
                    scene, sh_org, ls["direction"], sh_tmax, shadow=True
                )
                occluded = st < sh_tmax
            else:
                occluded = traverse_wide(
                    sh_org, ls["direction"], sh_tmax,
                    scene["bvh_lo"], scene["bvh_hi"], scene["bvh_children"],
                    scene["tri_v0"], scene["tri_v1"], scene["tri_v2"],
                    leaf_size=cfg.leaf_size, any_hit=True,
                    tri_mask=scene.get("tri_shadow_opaque"),
                )
            s["rays_traced"] = s["rays_traced"] + jnp.sum(
                do_nee.astype(jnp.float32)
            )
            light_mult = (
                ls["attenuation"]
                * bsdf.diffuse_brdf(ls["direction"], detail_normal)
                * jnp.abs(dot(ls["normal"], ls["direction"]))
                / jnp.maximum(ls["pdf"], 1e-12)
            )
            contrib = (
                s["throughput"] * mat["albedo"] * ls["color"]
                * light_mult[..., None]
            )
            s["radiance"] = jnp.where(
                (do_nee & ~occluded)[..., None],
                s["radiance"] + contrib, s["radiance"],
            )

        # Rays that hit a light stop after contributing
        # (kernel.glsl:1430-1433).
        died_on_light = shading & is_light
        # --- BSDF sampling ----------------------------------------------
        # Blue noise drives the first bounce's direction sample; deeper
        # bounces use the hash streams (RayGenCommon.h:102-122).
        r_hash = tbrng.uniform2(
            lane, sample_index, i, tbrng.STREAM_SECONDARY_DIR, seed
        )
        r_blue = _blue_or_hash2(
            scene, px, py, lane, sample_index, i,
            tbrng.STREAM_SECONDARY_DIR, cfg, seed,
        )
        r_dir = jnp.where(i == 0, r_blue, r_hash)

        spec_dir = bsdf.sample_ggx_reflection(
            s["direction"], normal, mat["roughness"],
            r_dir[..., 0], r_dir[..., 1],
        )
        diff_dir, diff_pdf0 = bsdf.sample_cosine_hemisphere(
            normal, r_dir[..., 0], r_dir[..., 1]
        )
        # SSS entry refraction (kernel.glsl:1529-1563).
        sss_dir, sss_tir = _refract_or_reflect(
            s["direction"], normal, cur_ior / jnp.maximum(new_ior, 1e-6),
            ray_dot_n,
        )

        surf_sss = shading & is_sss & ~spec_ray
        new_dir = jnp.where(
            spec_ray[..., None], spec_dir,
            jnp.where(is_sss[..., None], sss_dir, diff_dir),
        )

        # Entering a medium: not single-sided, refracted (not TIR).
        entering = surf_sss & ~single_sided & ~sss_tir
        new_inside2 = jnp.where(shading, entering, new_inside)
        s["med_absorption"] = jnp.where(
            entering[..., None], mat["absorption"], s["med_absorption"]
        )
        s["med_scattering"] = jnp.where(
            entering[..., None], mat["scattering"], s["med_scattering"]
        )
        s["med_ior"] = jnp.where(entering, mat["ior"], s["med_ior"])

        # --- throughput update (kernel.glsl:1699-1772) ------------------
        prev_dir = s["direction"]
        diffuse_pdf = dot(new_dir, normal) / jnp.pi
        half = bsdf.half_vector_safe(-prev_dir, new_dir, normal)
        spec_pdf = bsdf.ggx_reflection_pdf(normal, new_dir, half,
                                           mat["roughness"])
        pdf = jnp.where(
            allows_spec,
            jnp.where(is_metal, spec_pdf, 0.5 * (spec_pdf + diffuse_pdf)),
            diffuse_pdf,
        )
        inv_pdf = 1.0 / jnp.maximum(pdf, 1e-8)

        albedo = mat["albedo"]
        if cfg.decouple_albedo:
            # RealTime mode: demodulate first-hit albedo so the denoiser
            # works on pure lighting (kernel.glsl:1725-1729).
            albedo = jnp.where(i == 0, jnp.ones_like(albedo), albedo)

        spec_w = bsdf.specular_weight(
            prev_dir, new_dir, normal, detail_normal, mat["roughness"]
        )
        cos_sat = jnp.clip(dot(new_dir, normal), 0.0, 1.0)

        metal_mult = spec_w[..., None] * albedo * cos_sat[..., None]

        refl_coef = mat["specular_coef"]
        fresnel = refl_coef + (1.0 - refl_coef) * jnp.power(
            jnp.abs(1.0 - dot(-prev_dir, half)), 5.0
        )
        diffuse_multiplier = (
            (28.0 / (23.0 * jnp.pi))
            * (1.0 - refl_coef)
            * (1.0 - jnp.power(1.0 - 0.5 * dot(-prev_dir, normal), 5.0))
            * (1.0 - jnp.power(1.0 - 0.5 * dot(new_dir, normal), 5.0))
        )
        diffuse_col = albedo * diffuse_multiplier[..., None]
        plastic_mult = (
            (diffuse_col + (fresnel * spec_w)[..., None])
            * cos_sat[..., None]
        )
        diffuse_contrib = diffuse_col[..., 0] / jnp.maximum(
            (diffuse_multiplier + fresnel * spec_w) * cos_sat, 1e-8
        )
        lambert_mult = albedo * bsdf.diffuse_brdf(new_dir, detail_normal)[..., None]

        surface_mult = jnp.where(
            is_metal[..., None], metal_mult,
            jnp.where(allows_spec[..., None], plastic_mult, lambert_mult),
        )
        # SSS entry keeps throughput (transmission handled by the medium).
        surface_mult = jnp.where(surf_sss[..., None],
                                 jnp.ones_like(surface_mult), surface_mult)
        surface_scale = jnp.where(surf_sss, 1.0, inv_pdf)

        s["aov_diffuse_contrib"] = jnp.where(
            first & allows_spec & ~is_metal, diffuse_contrib,
            s["aov_diffuse_contrib"],
        )

        apply_surface = shading & ~died_on_light
        s["throughput"] = jnp.where(
            apply_surface[..., None],
            s["throughput"] * surface_mult * surface_scale[..., None],
            s["throughput"],
        )

        # --- commit new ray state --------------------------------------
        new_origin = jnp.where(
            surf_sss[..., None],
            hit_point + jnp.where(sss_tir[..., None], normal * EPSILON,
                                  -normal * EPSILON),
            hit_point + normal * EPSILON,
        )
        s["origin"] = jnp.where(
            in_medium[..., None], med_org,
            jnp.where(shading[..., None], new_origin, s["origin"]),
        )
        s["direction"] = jnp.where(
            in_medium[..., None], med_dir,
            jnp.where(shading[..., None], new_dir, s["direction"]),
        )
        s["inside"] = jnp.where(in_medium, new_inside,
                                jnp.where(shading, new_inside2, s["inside"]))
        s["prev_perfect_specular"] = jnp.where(
            shading, perfect_spec, s["prev_perfect_specular"]
        )
        s["alive"] = alive & ~died_on_light & ~med_escaped
        s["live_end"] = jnp.sum(s["alive"].astype(jnp.float32))
        return s

    state = jax.lax.fori_loop(0, cfg.max_bounces, bounce, state)

    radiance = state["radiance"]
    clamp = params.get("firefly_clamp", 0.0)
    radiance = jnp.where(clamp >= EPSILON, jnp.minimum(radiance, clamp),
                         radiance)
    radiance = jnp.where(jnp.isnan(radiance), 0.0, radiance)

    # Adaptively-skipped pixels contribute neither radiance nor weight —
    # their accumulator must stay untouched.
    if params.get("active_mask") is not None:
        fw = jnp.where(params["active_mask"], fw, 0.0)

    return dict(
        radiance=radiance * fw[..., None],
        filter_weight=fw,
        albedo=state["aov_albedo"],
        normal=state["aov_normal"],
        world_pos=state["aov_world_pos"],
        depth=state["aov_depth"],
        emissive=state["aov_emissive"],
        material=state["aov_material"],
        diffuse_contrib=state["aov_diffuse_contrib"],
        neighbor_dist=state["aov_neighbor_dist"],
        heatmap=state["aov_heatmap"],
        viz_rays=state["viz_rays"],
        rays_traced=state["rays_traced"],
        live_end=state["live_end"],
    )


@partial(jax.jit, static_argnames=("cfg", "k"))
def render_wave_batch(scene, params, pixel_ids, base_sample, k: int,
                      cfg: WaveConfig):
    """Trace k samples per pixel in ONE dispatch (amortizes dispatch
    latency — significant on remote-attached TPUs). Returns summed
    (radiance, filter_weight, rays_traced) plus the last sample's AOVs."""
    N = pixel_ids.shape[0]

    def body(i, carry):
        rad, fw, rays, aovs = carry
        out = render_wave(scene, params, pixel_ids, base_sample + i, cfg)
        new_aovs = {
            key: out[key]
            for key in ("albedo", "normal", "world_pos", "depth",
                        "emissive", "material", "diffuse_contrib",
                        "neighbor_dist", "heatmap")
        }
        return (
            rad + out["radiance"],
            fw + out["filter_weight"],
            rays + out["rays_traced"],
            new_aovs,
        )

    zero_aovs = dict(
        albedo=jnp.zeros((N, 3), jnp.float32),
        normal=jnp.zeros((N, 3), jnp.float32),
        world_pos=jnp.zeros((N, 3), jnp.float32),
        depth=jnp.zeros((N,), jnp.float32),
        emissive=jnp.zeros((N, 3), jnp.float32),
        material=jnp.zeros((N,), jnp.int32),
        diffuse_contrib=jnp.zeros((N,), jnp.float32),
        neighbor_dist=jnp.zeros((N,), jnp.float32),
        heatmap=jnp.zeros((N,), jnp.float32),
    )
    rad, fw, rays, aovs = jax.lax.fori_loop(
        0, k, body,
        (jnp.zeros((N, 3), jnp.float32), jnp.zeros((N,), jnp.float32),
         jnp.float32(0.0), zero_aovs),
    )
    return dict(radiance=rad, filter_weight=fw, rays_traced=rays, **aovs)


def _refract_or_reflect(direction, normal, nr, ray_dot_n):
    """Snell refraction with TIR fallback (kernel.glsl:1530-1563).

    `normal` already faces against the ray; ray_dot_n = dot(n, d) <= 0.
    Returns (direction, tir_mask).
    """
    nr = nr
    disc = 1.0 - nr * nr * (1.0 - ray_dot_n * ray_dot_n)
    tir = disc <= EPSILON
    refr = normalize(
        nr[..., None] * (direction - normal * ray_dot_n[..., None])
        - normal * jnp.sqrt(jnp.maximum(disc, 0.0))[..., None]
    )
    refl = reflect(direction, normal)
    return jnp.where(tir[..., None], refl, refr), tir
