"""Scene-level closest-hit / any-hit queries over ray batches.

This is the TPU-native replacement for the reference's per-thread
``cast_ray`` (shader.wgsl:566-601): instead of one ray walking a BVH with
a divergent 64-deep stack, a batch of N rays tests all padded primitives
as dense (N, P) blocks and reduces with argmin. For the reference's own
scenes (tens to ~1k primitives) this is faster on TPU than any divergent
traversal — it is pure regular VPU work with no gathers in the hot loop.

Larger scenes route through ops/pallas_intersect.py (tiled Pallas kernel)
or ops/bvh_traverse.py (BVH-guided, parity semantics).

Semantics notes vs the reference:
- `closest_hit` is mathematically what cast_ray computes (BVH walk plus
  the sphere/plane linear fallback): exact geometry tests over every
  primitive. The only divergence is measure-zero: rays exactly parallel
  to a zero-thickness *triangle* AABB, which the reference BVH can miss
  with no triangle fallback (shader.wgsl:576-598).
- `any_hit` mirrors NEE occlusion which uses cast_ray_bvh only
  (shader.wgsl:1249), i.e. all primitive types occlude.
"""

from __future__ import annotations

import jax.numpy as jnp

from rsoderh_raytracing_tpu.ops import geometry as geo
from rsoderh_raytracing_tpu.ops.geometry import INF, HitRecord
from rsoderh_raytracing_tpu.scene.device import DeviceScene


def _take(arr, idx):
    return jnp.take(arr, idx, axis=0)


def closest_hit(scene: DeviceScene, ro, rd) -> HitRecord:
    """Closest intersection along each ray. ro, rd: (N,3)."""
    t_sph = geo.sphere_distances_fast(ro, rd, scene)
    t_pln = geo.plane_distances_fast(ro, rd, scene)
    t_tri = geo.triangle_distances_fast(ro, rd, scene)

    # Per-type winners (N,)
    i_sph = jnp.argmin(t_sph, axis=1)
    d_sph = jnp.min(t_sph, axis=1)
    i_pln = jnp.argmin(t_pln, axis=1)
    d_pln = jnp.min(t_pln, axis=1)
    i_tri = jnp.argmin(t_tri, axis=1)
    d_tri = jnp.min(t_tri, axis=1)

    # Attributes for each type's winner, computed per ray (gather by index).
    # Sphere
    sph_center = _take(scene.sph_pos, i_sph)
    sph_radius = _take(scene.sph_radius, i_sph)
    sph_point = ro + rd * d_sph[:, None]
    sph_normal = geo.sphere_normal(ro, sph_point, sph_center, sph_radius)
    sph_mat = _take(scene.sph_material, i_sph)
    # Plane
    pln_point = ro + rd * d_pln[:, None]
    pln_normal = geo.plane_normal_for_ray(ro, _take(scene.pln_normal, i_pln))
    pln_mat = _take(scene.pln_material, i_pln)
    # Triangle
    tri_point = ro + rd * d_tri[:, None]
    tri_normal = geo.triangle_hit_attributes(
        ro,
        rd,
        _take(scene.tri_a, i_tri),
        _take(scene.tri_edge0, i_tri),
        _take(scene.tri_edge1, i_tri),
        _take(scene.tri_n0, i_tri),
        _take(scene.tri_n1, i_tri),
        _take(scene.tri_n2, i_tri),
    )
    tri_mat = _take(scene.tri_material, i_tri)

    # Pick the closest of the three candidates.
    dists = jnp.stack([d_sph, d_pln, d_tri], axis=1)  # (N,3)
    which = jnp.argmin(dists, axis=1)  # (N,)
    distance = jnp.min(dists, axis=1)
    did_hit = distance < INF

    def pick(s, p, t):
        out = jnp.where((which == 1)[..., None] if s.ndim == 2 else which == 1, p, s)
        return jnp.where((which == 2)[..., None] if s.ndim == 2 else which == 2, t, out)

    point = pick(sph_point, pln_point, tri_point)
    normal = pick(sph_normal, pln_normal, tri_normal)
    material_id = pick(sph_mat, pln_mat, tri_mat)

    return HitRecord(
        did_hit=did_hit,
        distance=jnp.where(did_hit, distance, 0.0),
        point=point,
        normal=normal,
        material_id=material_id,
    )


def any_hit(scene: DeviceScene, ro, rd):
    """True where any primitive blocks the ray. ro, rd: (N,3) -> (N,) bool."""
    t_sph = geo.sphere_distances_fast(ro, rd, scene)
    t_pln = geo.plane_distances_fast(ro, rd, scene)
    t_tri = geo.triangle_distances_fast(ro, rd, scene)
    return (
        jnp.any(t_sph < INF, axis=1)
        | jnp.any(t_pln < INF, axis=1)
        | jnp.any(t_tri < INF, axis=1)
    )
