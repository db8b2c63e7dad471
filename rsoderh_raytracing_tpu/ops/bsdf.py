"""GGX + Lambert metallic-roughness BSDF, batched over shading points.

Faithful re-derivation of the reference BSDF (shader.wgsl:833-1202):
- alpha = max(0.001, roughness^2); F0 = lerp(0.04, color, metallic)
- diffuse lobe: kd/pi with kd = color*(1-metallic)*(1-max(F0))
- specular lobe: GGX NDF, Smith height-uncorrelated G, Schlick Fresnel,
  VNDF (visible half-vector) sampling [Heitz, JCGT 0007/04/01]
- lobe selection probability = saturate(luminance(F0)), pdf is the
  luminance-weighted mix of both lobe pdfs

All functions are written batched: inputs have shape (N, 3)/(N,) and
results broadcast elementwise; everything is VPU math under jit. The
device constant PI = 3.14159 matches the reference shader exactly
(shader.wgsl:239) for estimator parity.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from rsoderh_raytracing_tpu.ops import rng

PI = rng.PI_DEVICE
DIELECTRIC_F0 = 0.04


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def luminance(color):
    return (
        0.2126 * color[..., 0] + 0.7152 * color[..., 1] + 0.0722 * color[..., 2]
    )


# -- shading frame (shader.wgsl:49-84) --------------------------------------


def make_frame(normal):
    """Returns (tangent, bitangent, normal), each (N,3)."""
    use_z = jnp.abs(normal[..., 2]) < 0.999
    helper = jnp.where(
        use_z[..., None],
        jnp.array([0.0, 0.0, 1.0], dtype=normal.dtype),
        jnp.array([1.0, 0.0, 0.0], dtype=normal.dtype),
    )
    tangent = jnp.cross(helper, normal)
    tangent = tangent / jnp.maximum(
        jnp.linalg.norm(tangent, axis=-1, keepdims=True), 1.0e-20
    )
    bitangent = jnp.cross(normal, tangent)
    return tangent, bitangent, normal


def to_frame_local(frame, vec_world):
    tangent, bitangent, normal = frame
    return jnp.stack(
        [
            _dot(vec_world, tangent),
            _dot(vec_world, bitangent),
            _dot(vec_world, normal),
        ],
        axis=-1,
    )


def to_frame_world(frame, vec_local):
    tangent, bitangent, normal = frame
    v = (
        tangent * vec_local[..., 0:1]
        + bitangent * vec_local[..., 1:2]
        + normal * vec_local[..., 2:3]
    )
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1.0e-20)


# -- material params (shader.wgsl:833-881) -----------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BsdfMaterial:
    color: Any  # (N,3)
    metallic: Any  # (N,)
    alpha: Any  # (N,)
    f0: Any  # (N,3)
    emission: Any  # (N,3)


def make_bsdf_material(color, roughness, metallic, emission) -> BsdfMaterial:
    alpha = jnp.maximum(0.001, roughness * roughness)
    f0 = (
        DIELECTRIC_F0
        + (color - DIELECTRIC_F0) * _saturate(metallic)[..., None]
    )
    return BsdfMaterial(
        color=color, metallic=metallic, alpha=alpha, f0=f0, emission=emission
    )


def surface_kd(material: BsdfMaterial):
    kd0 = material.color * (1.0 - _saturate(material.metallic))[..., None]
    return kd0 * (1.0 - jnp.max(material.f0, axis=-1))[..., None]


# -- lobes (shader.wgsl:884-1051) --------------------------------------------


def sample_cosine_hemisphere(u):
    """u: (N,2) in [0,1) -> (N,3) cosine-weighted direction around +z."""
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * PI * u[..., 1]
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    return jnp.stack([x, y, z], axis=-1)


def pdf_cosine_hemisphere(wi):
    return jnp.where(wi[..., 2] <= 0.0, 0.0, wi[..., 2] / PI)


def sample_uniform_disk(u):
    radius = jnp.sqrt(u[..., 0])
    azimuth = 2.0 * PI * u[..., 1]
    return jnp.stack(
        [radius * jnp.cos(azimuth), radius * jnp.sin(azimuth)], axis=-1
    )


def d_ggx(normal_dot_h, alpha):
    alpha_2 = alpha * alpha
    denom = normal_dot_h * normal_dot_h * (alpha_2 - 1.0) + 1.0
    return alpha_2 / (PI * denom * denom)


def lambda_ggx(normal_dot_v, alpha):
    ndv2 = normal_dot_v * normal_dot_v
    return (
        jnp.sqrt(1.0 + alpha * alpha * (1.0 - ndv2) / jnp.maximum(ndv2, 1e-20))
        - 1.0
    ) / 2.0


def g1_ggx(normal_dot_v, alpha):
    return 1.0 / (1.0 + lambda_ggx(normal_dot_v, alpha))


def g_smith_ggx(normal_dot_o, normal_dot_i, alpha):
    return g1_ggx(normal_dot_o, alpha) * g1_ggx(normal_dot_i, alpha)


def f_schlick(f0, cos_theta):
    x = 1.0 - _saturate(cos_theta)
    x2 = x * x
    x5 = x2 * x2 * x
    return f0 + (1.0 - f0) * x5[..., None]


def pdf_ggx_half_vector_visible(h, wo, alpha):
    normal_dot_h = h[..., 2]
    normal_dot_wo = wo[..., 2]
    pdf = (
        d_ggx(normal_dot_h, alpha)
        * g1_ggx(normal_dot_wo, alpha)
        * jnp.maximum(0.0, _dot(wo, h))
        / jnp.where(normal_dot_wo == 0.0, 1.0, normal_dot_wo)
    )
    return jnp.where(normal_dot_h <= 0.0, 0.0, pdf)


def sample_ggx_visible_half_vector(u, wo, alpha):
    """VNDF sampling (shader.wgsl:962-1009). u: (N,2), wo: (N,3) local."""
    stretch = jnp.stack(
        [alpha, alpha, jnp.ones_like(alpha)], axis=-1
    )
    view = wo * stretch
    view = view / jnp.maximum(
        jnp.linalg.norm(view, axis=-1, keepdims=True), 1.0e-20
    )

    len_sq = view[..., 0] * view[..., 0] + view[..., 1] * view[..., 1]
    inv_len = jax.lax.rsqrt(jnp.maximum(len_sq, 1.0e-20))
    tangent_x = jnp.where(
        (len_sq > 0.0)[..., None],
        jnp.stack(
            [-view[..., 1] * inv_len, view[..., 0] * inv_len, jnp.zeros_like(inv_len)],
            axis=-1,
        ),
        jnp.array([1.0, 0.0, 0.0], dtype=view.dtype),
    )
    tangent_y = jnp.cross(view, tangent_x)

    disk = sample_uniform_disk(u)
    dx = disk[..., 0]
    dy_raw = disk[..., 1]
    # Warp toward the visible-normal distribution (figure 6 construction).
    dy = (1.0 - view[..., 2]) * jnp.sqrt(
        jnp.maximum(0.0, 1.0 - dx * dx)
    ) + view[..., 2] * dy_raw

    hz = jnp.sqrt(jnp.maximum(0.0, 1.0 - dx * dx - dy * dy))
    h_stretched = (
        dx[..., None] * tangent_x + dy[..., None] * tangent_y + hz[..., None] * view
    )
    h = jnp.stack(
        [
            alpha * h_stretched[..., 0],
            alpha * h_stretched[..., 1],
            jnp.maximum(0.0, h_stretched[..., 2]),
        ],
        axis=-1,
    )
    return h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1.0e-20)


# -- eval / pdf / sample (shader.wgsl:1053-1202) ------------------------------


def bsdf_eval_local(wo, wi, material: BsdfMaterial):
    """f(wo, wi) in the shading frame. Returns (N,3)."""
    ndo = wo[..., 2]
    ndi = wi[..., 2]
    valid = (ndo > 0.0) & (ndi > 0.0)

    h = wo + wi
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1.0e-20)
    ndh = _saturate(h[..., 2])

    d = d_ggx(ndh, material.alpha)
    g = g_smith_ggx(ndo, ndi, material.alpha)
    f = f_schlick(material.f0, _dot(h, wo))
    denom = 4.0 * ndo * ndi
    fs = (d * g / jnp.where(valid, denom, 1.0))[..., None] * f

    fd = surface_kd(material) * (1.0 / PI)
    return jnp.where(valid[..., None], fd + fs, 0.0)


def bsdf_pdf_local(wo, wi, material: BsdfMaterial):
    spec_p = _saturate(luminance(material.f0))
    diff_p = 1.0 - spec_p

    h = wo + wi
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1.0e-20)
    wo_dot_h = jnp.abs(_dot(wo, h))
    pdf_spec = pdf_ggx_half_vector_visible(h, wo, material.alpha) / jnp.maximum(
        4.0 * wo_dot_h, 1.0e-20
    )
    pdf_spec = jnp.where(wo_dot_h <= 0.0, 0.0, pdf_spec)

    pdf = diff_p * pdf_cosine_hemisphere(wi) + spec_p * pdf_spec
    valid = (wo[..., 2] > 0.0) & (wi[..., 2] > 0.0)
    return jnp.where(valid, pdf, 0.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BsdfSample:
    direction: Any  # (N,3) world-space wi; zero vector marks an error lane
    scattering: Any  # (N,3) f value (or debug color on error lanes)
    pdf: Any  # (N,)
    zero_direction: Any  # (N,) bool — the reference's all(dir==0) error flag


def bsdf_sample(state, ray_direction, surface_normal, material: BsdfMaterial):
    """Sample a bounce direction. Returns (new_rng_state, BsdfSample).

    Mirrors shader.wgsl:1116-1202 including its error sentinels:
    - dot(n, wo) <= 0      -> zero dir, debug blue,  pdf 0
    - local wo.z <= 0      -> zero dir, debug green, pdf 0
    - specular wi.z <= 0   -> dir (1,0,0), debug red, pdf 0
    - dot(n, wi_world) < 0 -> zero dir, debug green, pdf 0
    RNG consumption is two draws per lane (unconditional; see ops/rng.py).
    """
    wo_world = -ray_direction
    bail_a = _dot(surface_normal, wo_world) <= 0.0

    frame = make_frame(surface_normal)
    wo = to_frame_local(frame, wo_world)
    bail_b = wo[..., 2] <= 0.0

    spec_p = _saturate(luminance(material.f0))
    diff_p = 1.0 - spec_p

    state, u1 = rng.next_uniform(state)
    state, u2 = rng.next_uniform(state)

    # Diffuse candidate (reuses u1 rescaled, shader.wgsl:1153-1159)
    u_diff = jnp.stack([u1 / jnp.maximum(diff_p, 1.0e-6), u2], axis=-1)
    wi_diffuse = sample_cosine_hemisphere(u_diff)

    # Specular candidate
    u_spec = jnp.stack(
        [(u1 - diff_p) / jnp.maximum(spec_p, 1.0e-6), u2], axis=-1
    )
    h = sample_ggx_visible_half_vector(u_spec, wo, material.alpha)
    # reflect(-wo, h) = -wo - 2*dot(-wo,h)*h = 2*dot(wo,h)*h - wo
    wi_specular = 2.0 * _dot(wo, h)[..., None] * h - wo

    choose_diffuse = u1 < diff_p
    wi = jnp.where(choose_diffuse[..., None], wi_diffuse, wi_specular)
    spec_fail = (~choose_diffuse) & (wi_specular[..., 2] <= 0.0)

    scattering = bsdf_eval_local(wo, wi, material)
    pdf = bsdf_pdf_local(wo, wi, material)
    wi_world = to_frame_world(frame, wi)
    bail_c = _dot(surface_normal, wi_world) < 0.0

    zero3 = jnp.zeros_like(wi_world)
    red = jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0], wi_world.dtype), wi_world.shape
    )
    green = jnp.broadcast_to(
        jnp.array([0.0, 1.0, 0.0], wi_world.dtype), wi_world.shape
    )
    blue = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], wi_world.dtype), wi_world.shape
    )

    # Apply sentinels in reverse priority so earlier bails win.
    direction = wi_world
    direction = jnp.where(bail_c[..., None], zero3, direction)
    direction = jnp.where(spec_fail[..., None], red, direction)
    direction = jnp.where((bail_a | bail_b)[..., None], zero3, direction)

    scattering = jnp.where(bail_c[..., None], green, scattering)
    scattering = jnp.where(spec_fail[..., None], red, scattering)
    scattering = jnp.where(bail_b[..., None], green, scattering)
    scattering = jnp.where(bail_a[..., None], blue, scattering)

    any_bail = bail_a | bail_b | bail_c | spec_fail
    pdf = jnp.where(any_bail, 0.0, pdf)
    # spec_fail returns the NON-zero sentinel (1,0,0) in the reference
    # (shader.wgsl:1181-1185), so those lanes terminate via pdf==0 without
    # the light-replacing zero-direction path — even though bail_c would
    # also trigger on them (the reference returns before evaluating it).
    zero_direction = bail_a | bail_b | (bail_c & ~spec_fail)

    return state, BsdfSample(
        direction=direction,
        scattering=scattering,
        pdf=pdf,
        zero_direction=zero_direction,
    )


def power_heuristic(pdf_a, pdf_b):
    """beta=2 power heuristic (shader.wgsl:1206-1210)."""
    a2 = pdf_a * pdf_a
    b2 = pdf_b * pdf_b
    return a2 / jnp.maximum(a2 + b2, 1.0e-30)
