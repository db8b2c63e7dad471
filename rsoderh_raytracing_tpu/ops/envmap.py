"""Device-side HDRI environment sampling (equirect + alias table).

TPU re-design of shader.wgsl:663-831: alias-table lookups become jnp
gathers over SoA arrays; the wgpu Linear/ClampToEdge sampler becomes an
explicit 4-tap bilinear gather. Texture width/height are static Python
ints under jit (baked from the array shape), so all the index math
compiles to pure integer VPU ops.

Device constant PI = 3.14159 matches the shader (shader.wgsl:239).
"""

from __future__ import annotations

import jax.numpy as jnp

from rsoderh_raytracing_tpu.env.environment import DeviceEnvironment
from rsoderh_raytracing_tpu.ops import rng

PI = rng.PI_DEVICE
INV_PI = 1.0 / PI


def direction_to_equirect_uv(direction):
    """(N,3) unit directions -> (N,2) uv. (shader.wgsl:710-714)"""
    u = jnp.arctan2(direction[..., 2], direction[..., 0]) * (INV_PI * 0.5) + 0.5
    v = 0.5 - jnp.arcsin(jnp.clip(direction[..., 1], -1.0, 1.0)) * INV_PI
    return jnp.stack([u, v], axis=-1)


def equirect_uv_to_direction(uv):
    """(N,2) uv -> (N,3) direction. (shader.wgsl:718-732)"""
    phi = (2.0 * uv[..., 0] - 1.0) * PI
    theta = PI * uv[..., 1]
    sin_theta = jnp.sin(theta)
    return jnp.stack(
        [
            sin_theta * jnp.cos(phi),
            jnp.cos(theta),
            sin_theta * jnp.sin(phi),
        ],
        axis=-1,
    )


def pixel_solid_angle(v, width: int, height: int):
    """Approximate solid angle of the lat-long pixel at vertical coord v.
    (shader.wgsl:739-749)"""
    theta = PI * v
    sin_t = jnp.maximum(1.0e-6, jnp.sin(theta))
    d_phi = 2.0 * PI / width
    d_theta = PI / height
    return d_phi * d_theta * sin_t


def _uv_to_pixel_index(uv, width: int, height: int):
    x = jnp.minimum((uv[..., 0] * width).astype(jnp.int32), width - 1)
    y = jnp.minimum((uv[..., 1] * height).astype(jnp.int32), height - 1)
    return x + y * width


def bilinear_sample(texture, uv):
    """4-tap bilinear fetch with clamp-to-edge, texel centers at +0.5.

    texture: (H, W, 3); uv: (N, 2) -> (N, 3).
    """
    height, width = texture.shape[0], texture.shape[1]
    x = uv[..., 0] * width - 0.5
    y = uv[..., 1] * height - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    x0i = jnp.clip(x0.astype(jnp.int32), 0, width - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, width - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, height - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, height - 1)

    flat = texture.reshape(-1, texture.shape[-1])
    c00 = jnp.take(flat, y0i * width + x0i, axis=0)
    c10 = jnp.take(flat, y0i * width + x1i, axis=0)
    c01 = jnp.take(flat, y1i * width + x0i, axis=0)
    c11 = jnp.take(flat, y1i * width + x1i, axis=0)

    top = c00 * (1.0 - fx) + c10 * fx
    bottom = c01 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bottom * fy


def sky_light(env: DeviceEnvironment, direction):
    """Environment radiance along escaped rays (shader.wgsl:822-831)."""
    return bilinear_sample(env.texture, direction_to_equirect_uv(direction))


def direction_pdf(env: DeviceEnvironment, direction):
    """PDF (per steradian) of sampling `direction` from the alias table.
    (shader.wgsl:753-769)"""
    height, width = env.texture.shape[0], env.texture.shape[1]
    uv = direction_to_equirect_uv(direction)
    index = _uv_to_pixel_index(uv, width, height)
    pmf = jnp.take(env.alias_pmf, index, axis=0)
    return pmf / pixel_solid_angle(uv[..., 1], width, height)


def sample_environment(state, env: DeviceEnvironment):
    """Alias-table importance sample (shader.wgsl:782-820).

    Returns (new_rng_state, direction (N,3), radiance (N,3), pdf (N,)).
    RNG draw order matches the reference: index draw, alias-accept draw,
    jitter x, jitter y.
    """
    height, width = env.texture.shape[0], env.texture.shape[1]
    length = width * height

    state, u_index = rng.next_uniform(state)
    index = jnp.minimum(
        (u_index * jnp.float32(length)).astype(jnp.int32), length - 1
    )
    state, u_accept = rng.next_uniform(state)
    probability = jnp.take(env.alias_probability, index, axis=0)
    alias = jnp.take(env.alias_index, index, axis=0)
    index = jnp.where(u_accept < probability, index, alias)

    x = index % width
    y = index // width
    state, jitter_x = rng.next_uniform(state)
    state, jitter_y = rng.next_uniform(state)
    uv = jnp.stack(
        [
            (x.astype(jnp.float32) + jitter_x) / width,
            (y.astype(jnp.float32) + jitter_y) / height,
        ],
        axis=-1,
    )

    direction = equirect_uv_to_direction(uv)
    radiance = bilinear_sample(env.texture, uv)
    pmf = jnp.take(env.alias_pmf, index, axis=0)
    pdf = pmf / pixel_solid_angle(uv[..., 1], width, height)
    return state, direction, radiance, pdf
