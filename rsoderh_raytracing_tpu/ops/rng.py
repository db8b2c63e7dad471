"""Counter-style per-lane u32 RNG, vectorized over ray batches.

Implements the same PCG-ish hash stream as the reference device RNG
(shader.wgsl:605-661): each lane carries a u32 state seeded from
(pixel_index, sample_index); every draw advances the state with

    state = state * 747796405 + 2891336453
    result = ((state >> ((state >> 28) + 4)) ^ state) * 277803737
    result = (result >> 22) ^ result

All ops are uint32 with wraparound, which JAX implements natively — the
whole stream is pure VPU integer math, fully batched, no host RNG calls.
Unlike ``jax.random`` there is no key splitting: determinism per
(pixel, sample) comes from the seeding, matching the reference's
progressive-accumulation contract.

Note: where the reference conditionally skips draws on rarely-taken early
bails (e.g. bsdf_sample bailing before its two draws), this vectorized
version advances the state unconditionally on masked lanes; the streams
remain independent per lane and the estimator is unaffected.
"""

from __future__ import annotations

import jax.numpy as jnp

_MUL = jnp.uint32(747796405)
_INC = jnp.uint32(2891336453)
_MIX = jnp.uint32(277803737)

# The reference uses these truncated constants on the device
# (shader.wgsl:239, :628); kept identical for estimator parity.
PI_DEVICE = 3.14159
TWO_PI_CIRCLE = 2.0 * 3.1415926


def seed(pixel_index, sample_index):
    """Seed per-lane state from pixel index and sample index.

    Matches shader.wgsl:1310-1312: state=0; salt(pixel); salt(sample),
    where salt XORs then advances the generator once.
    """
    state = jnp.zeros_like(jnp.asarray(pixel_index, dtype=jnp.uint32))
    state = state ^ jnp.asarray(pixel_index, dtype=jnp.uint32)
    state, _ = next_u32(state)
    state = state ^ jnp.asarray(sample_index, dtype=jnp.uint32)
    state, _ = next_u32(state)
    return state


def next_u32(state):
    """Advance the generator. Returns (new_state, u32 result)."""
    state = state * _MUL + _INC
    shift = (state >> jnp.uint32(28)) + jnp.uint32(4)
    result = ((state >> shift) ^ state) * _MIX
    result = (result >> jnp.uint32(22)) ^ result
    return state, result


def next_uniform(state):
    """Uniform float32 in [0, 1). Returns (new_state, value)."""
    state, bits = next_u32(state)
    return state, bits.astype(jnp.float32) / jnp.float32(4294967295.0)


def next_in_circle(state):
    """Uniform point in the unit disk (shader.wgsl:627-631).

    Returns (new_state, (batch..., 2) array).
    """
    state, angle_u = next_uniform(state)
    angle = angle_u * jnp.float32(TWO_PI_CIRCLE)
    state, radius_u = next_uniform(state)
    radius = jnp.sqrt(radius_u)
    return state, jnp.stack(
        [radius * jnp.cos(angle), radius * jnp.sin(angle)], axis=-1
    )


def next_on_sphere(state):
    """Uniform direction on the unit sphere (shader.wgsl:640-654)."""
    state, u = next_uniform(state)
    state, v = next_uniform(state)
    longitude = jnp.float32(2.0 * PI_DEVICE) * u
    z = 2.0 * v - 1.0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return state, jnp.stack(
        [r * jnp.cos(longitude), r * jnp.sin(longitude), z], axis=-1
    )
