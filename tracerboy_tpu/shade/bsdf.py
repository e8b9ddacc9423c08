"""BSDF library: sampling routines and reflectance models.

Matches the reference's shading math (TracerBoy/kernel.glsl): GGX NDF
(kernel.glsl:466-478), Fresnel (441-451, Schlick in the bounce loop
1699-1704), cosine-weighted diffuse sampling (1025-1046), GGX NDF
importance sampling via reoriented spherical sample + reflect
(1066-1099), the pow-lobe used for rough refractions (1048-1064), and the
combined throughput weights of the bounce epilogue (1699-1772). All
functions broadcast over flat ray pools.
"""

from __future__ import annotations

import jax.numpy as jnp

from tracerboy_tpu.core.mathutil import (
    dot,
    normalize,
    reflect,
    reorient_around_normal,
    saturate,
    spherical_to_dir,
)

PI = jnp.pi
MIN_ROUGHNESS = 0.04
MIN_ROUGHNESS_SQUARED = MIN_ROUGHNESS * MIN_ROUGHNESS
AIR_IOR = 1.0
EPSILON = 1e-4
LARGE_NUMBER = 1e10


def fresnel_factor(current_ior, new_ior, normal, ray_direction):
    """Dielectric Schlick Fresnel from IOR pair (kernel.glsl:441-451)."""
    r0 = ((current_ior - new_ior) / (current_ior + new_ior)) ** 2
    return r0 + (1.0 - r0) * jnp.power(
        jnp.clip(1.0 - dot(normal, -ray_direction), 0.0, 1.0), 5.0
    )


def ggx_ndf(normal, half_vector, roughness_squared):
    """GGX/Trowbridge-Reitz D (kernel.glsl:466-478)."""
    a2sq = jnp.maximum(roughness_squared, MIN_ROUGHNESS_SQUARED)
    a2 = a2sq * a2sq
    ndoth = dot(normal, half_vector)
    denom = PI * jnp.square(ndoth * ndoth * (a2 - 1.0) + 1.0)
    return a2 / jnp.maximum(denom, 1e-12)


def diffuse_brdf(light_dir, normal):
    """Lambert with the cosine folded in (kernel.glsl:541-546)."""
    return jnp.maximum(dot(light_dir, normal), 0.0) / PI


def half_vector_safe(a, b, normal):
    """normalize(a+b), falling back to the normal for opposite vectors
    (kernel.glsl:1258-1268)."""
    opposite = dot(a, b) <= (-1.0 + EPSILON)
    h = normalize(a + b)
    return jnp.where(opposite[..., None], normal, h)


def sample_cosine_hemisphere(normal, r0, r1):
    """Cosine-weighted direction about `normal`; returns (dir, pdf)
    (kernel.glsl:1025-1046)."""
    r = jnp.sqrt(r0)
    theta = 2.0 * PI * r1
    x = r * jnp.cos(theta)
    y = jnp.sqrt(jnp.maximum(EPSILON, 1.0 - r0))
    z = r * jnp.sin(theta)
    local = jnp.stack([x, y, z], axis=-1)
    pdf = y / PI
    return reorient_around_normal(local, normal), pdf


def sample_ggx_reflection(incoming, normal, roughness, r0, r1):
    """Sample a GGX microfacet normal and reflect `incoming` about it
    (kernel.glsl:1066-1083). `incoming` points toward the surface."""
    rough = jnp.maximum(MIN_ROUGHNESS, roughness)
    a = rough * rough
    a2 = a * a
    theta = 2.0 * PI * r1
    phi = jnp.arccos(
        jnp.sqrt(
            jnp.clip((1.0 - r0) / ((a2 - 1.0) * r0 + 1.0), 0.0, 1.0)
        )
    )
    m = reorient_around_normal(spherical_to_dir(phi, theta), normal)
    return reflect(incoming, m)


def ggx_reflection_pdf(normal, outgoing, half_vector, roughness):
    """PDF of sample_ggx_reflection in outgoing-solid-angle measure
    (kernel.glsl:1085-1097)."""
    rough = jnp.maximum(MIN_ROUGHNESS, roughness)
    a = rough * rough
    a2 = a * a
    cos_t = jnp.abs(dot(normal, half_vector))
    e = (a2 - 1.0) * cos_t * cos_t + 1.0
    d = a2 / (PI * e * e)
    pdf = d * cos_t / (4.0 * jnp.maximum(jnp.abs(dot(outgoing, half_vector)), 1e-8))
    return jnp.where(e > 0.0, pdf, LARGE_NUMBER)


def sample_pow_lobe(axis, roughness, r0, r1):
    """Phong-style pow-lobe around `axis` used for rough refractions;
    returns (dir, pdf) (kernel.glsl:1048-1064)."""
    lobe = jnp.power(1.0 - roughness, 5.0) * 1000.0
    theta = 2.0 * PI * r1
    phi = jnp.arccos(
        jnp.power(jnp.maximum(r0, 1e-12), 1.0 / (lobe + 1.0))
    )
    pdf = (lobe + 1.0) * jnp.power(jnp.cos(phi), lobe) / (2.0 * PI)
    return reorient_around_normal(spherical_to_dir(phi, theta), axis), pdf


def sample_uniform_sphere(r0, r1):
    """Uniform sphere direction; returns (dir, pdf) — the isotropic phase
    function for medium scattering."""
    z = 1.0 - 2.0 * r0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    theta = 2.0 * PI * r1
    d = jnp.stack([r * jnp.cos(theta), z, r * jnp.sin(theta)], axis=-1)
    return d, jnp.full(r0.shape, 1.0 / (4.0 * PI))


def specular_weight(prev_dir, new_dir, normal, detail_normal, roughness):
    """The microfacet weight used after a specular bounce
    (kernel.glsl:1734-1738, 1750-1755): D / (4 |v.h| max(|v.n|, |l.n|))."""
    half = half_vector_safe(-prev_dir, new_dir, normal)
    rough_sq = jnp.maximum(roughness * roughness, MIN_ROUGHNESS_SQUARED)
    d = ggx_ndf(detail_normal, half, rough_sq)
    denom = 4.0 * jnp.maximum(jnp.abs(dot(-prev_dir, half)), 1e-8) * jnp.maximum(
        jnp.maximum(jnp.abs(dot(-prev_dir, normal)), jnp.abs(dot(new_dir, normal))),
        1e-8,
    )
    return d / denom


# ----------------------------------------------------------------------------
# SoA variants (V3 = tuples of dense (N,) components, core/vec3.py).


def sample_cosine_hemisphere_soa(normal, r0, r1):
    """Cosine-weighted direction about V3 `normal`; returns (V3, pdf)."""
    from tracerboy_tpu.core import vec3 as v3

    r = jnp.sqrt(r0)
    theta = 2.0 * PI * r1
    lx = r * jnp.cos(theta)
    ly = jnp.sqrt(jnp.maximum(EPSILON, 1.0 - r0))
    lz = r * jnp.sin(theta)
    pdf = ly / PI
    return v3.reorient(v3.V3(lx, ly, lz), normal), pdf


def sample_pow_lobe_soa(axis, roughness, r0, r1):
    """Phong-style pow-lobe about V3 `axis` for rough refraction
    (kernel.glsl:1048-1064 GenerateImportanceSampledDirection, applied to
    the refraction direction at kernel.glsl:1535-1556 / 1649-1664).
    Returns (V3, pdf); the matched-lobe weight is 1, so callers only kill
    pdf < EPSILON samples like the reference."""
    from tracerboy_tpu.core import vec3 as v3

    lobe = jnp.power(1.0 - roughness, 5.0) * 1000.0
    theta = 2.0 * PI * r1
    cos_phi = jnp.power(jnp.maximum(r0, 1e-12), 1.0 / (lobe + 1.0))
    sin_phi = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_phi * cos_phi))
    local = v3.V3(
        sin_phi * jnp.cos(theta), cos_phi, sin_phi * jnp.sin(theta)
    )
    pdf = (lobe + 1.0) * jnp.power(cos_phi, lobe) / (2.0 * PI)
    return v3.reorient(local, axis), pdf


def sample_ggx_reflection_soa(incoming, normal, roughness, r0, r1):
    """GGX microfacet sample + reflect, SoA (kernel.glsl:1066-1083)."""
    from tracerboy_tpu.core import vec3 as v3

    rough = jnp.maximum(MIN_ROUGHNESS, roughness)
    a2 = (rough * rough) ** 2
    theta = 2.0 * PI * r1
    cos_phi = jnp.sqrt(
        jnp.clip((1.0 - r0) / ((a2 - 1.0) * r0 + 1.0), 0.0, 1.0)
    )
    sin_phi = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_phi * cos_phi))
    local = v3.V3(sin_phi * jnp.cos(theta), cos_phi, sin_phi * jnp.sin(theta))
    m = v3.reorient(local, normal)
    return v3.reflect(incoming, m)


def ggx_reflection_pdf_soa(normal, outgoing, half, roughness):
    from tracerboy_tpu.core import vec3 as v3

    rough = jnp.maximum(MIN_ROUGHNESS, roughness)
    a2 = (rough * rough) ** 2
    cos_t = jnp.abs(v3.dot(normal, half))
    e = (a2 - 1.0) * cos_t * cos_t + 1.0
    d = a2 / (PI * e * e)
    pdf = d * cos_t / (
        4.0 * jnp.maximum(jnp.abs(v3.dot(outgoing, half)), 1e-8)
    )
    return jnp.where(e > 0.0, pdf, LARGE_NUMBER)


def half_vector_safe_soa(a, b, normal):
    from tracerboy_tpu.core import vec3 as v3

    opposite = v3.dot(a, b) <= (-1.0 + EPSILON)
    return v3.where(opposite, normal, v3.normalize(a + b))


def diffuse_brdf_soa(light_dir, normal):
    from tracerboy_tpu.core import vec3 as v3

    return jnp.maximum(v3.dot(light_dir, normal), 0.0) / PI


def ggx_ndf_soa(normal, half, roughness_squared):
    from tracerboy_tpu.core import vec3 as v3

    a2sq = jnp.maximum(roughness_squared, MIN_ROUGHNESS_SQUARED)
    a2 = a2sq * a2sq
    ndoth = v3.dot(normal, half)
    denom = PI * jnp.square(ndoth * ndoth * (a2 - 1.0) + 1.0)
    return a2 / jnp.maximum(denom, 1e-12)


def specular_weight_soa(prev_dir, new_dir, normal, detail_normal, roughness):
    from tracerboy_tpu.core import vec3 as v3

    half = half_vector_safe_soa(-prev_dir, new_dir, normal)
    rough_sq = jnp.maximum(roughness * roughness, MIN_ROUGHNESS_SQUARED)
    d = ggx_ndf_soa(detail_normal, half, rough_sq)
    denom = (
        4.0 * jnp.maximum(jnp.abs(v3.dot(-prev_dir, half)), 1e-8)
        * jnp.maximum(
            jnp.maximum(jnp.abs(v3.dot(-prev_dir, normal)),
                        jnp.abs(v3.dot(new_dir, normal))), 1e-8,
        )
    )
    return d / denom


def sample_uniform_sphere_soa(r0, r1):
    from tracerboy_tpu.core import vec3 as v3

    z = 1.0 - 2.0 * r0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    theta = 2.0 * PI * r1
    return v3.V3(r * jnp.cos(theta), z, r * jnp.sin(theta))


def refract_or_reflect_soa(direction, normal, nr, ray_dot_n):
    """Snell with TIR fallback, SoA (kernel.glsl:1530-1563)."""
    from tracerboy_tpu.core import vec3 as v3

    disc = 1.0 - nr * nr * (1.0 - ray_dot_n * ray_dot_n)
    tir = disc <= EPSILON
    root = jnp.sqrt(jnp.maximum(disc, 0.0))
    refr = v3.normalize(
        v3.V3(
            nr * (direction.x - normal.x * ray_dot_n) - normal.x * root,
            nr * (direction.y - normal.y * ray_dot_n) - normal.y * root,
            nr * (direction.z - normal.z * ray_dot_n) - normal.z * root,
        )
    )
    return v3.where(tir, v3.reflect(direction, normal), refr), tir


def artist_albedo_to_absorption_soa(color, mfp):
    """Burley SSS parameterization on V3s; returns (absorption, scattering)."""
    from tracerboy_tpu.core import vec3 as v3

    def one(c, m):
        alpha = 1.0 - jnp.exp(-5.09406 * c + 2.61188 * c * c - 4.31805 * c**3)
        s = 1.9 - c + 3.5 * (c - 0.8) * (c - 0.8)
        trans = 1.0 / jnp.maximum(s * m, 1e-8)
        return trans - trans * alpha, trans * alpha

    ax, sx = one(color.x, mfp.x)
    ay, sy = one(color.y, mfp.y)
    az, sz = one(color.z, mfp.z)
    return v3.V3(ax, ay, az), v3.V3(sx, sy, sz)


def artist_albedo_to_absorption(color, mfp):
    """Burley's practical subsurface parameterization
    (kernel.glsl:1224-1234). Returns (absorption, scattering)."""
    alpha = 1.0 - jnp.exp(
        -5.09406 * color + 2.61188 * color * color - 4.31805 * color**3
    )
    s = 1.9 - color + 3.5 * (color - 0.8) * (color - 0.8)
    transmission = 1.0 / jnp.maximum(s * mfp, 1e-8)
    scattering = transmission * alpha
    absorption = transmission - scattering
    return absorption, scattering
