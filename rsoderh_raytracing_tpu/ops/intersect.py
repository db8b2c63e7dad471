"""Scene-level closest-hit / any-hit queries over ray batches.

This is the TPU-native replacement for the reference's per-thread
``cast_ray`` (shader.wgsl:566-601): instead of one ray walking a BVH with
a divergent 64-deep stack, a batch of N rays tests all padded primitives
as dense sweeps and reduces to the closest winner. For the reference's
own scenes (tens to ~1k primitives) this is faster on TPU than any
divergent traversal — regular VPU work with no gathers in the hot loop.

Two sweep backends produce identical (t, type, index) results:
- ops/pallas_intersect.py — unrolled Pallas kernel (default on TPU for
  small primitive counts; hard kernel boundary, no (N,P) intermediates),
- ops/geometry.py::*_fast — XLA broadcast formulation (CPU, big scenes).
Winner attributes (normals, materials) are reconstructed afterwards from
(type, index) with cheap small-table gathers.

Larger scenes can also route through ops/bvh_traverse.py (BVH-guided,
parity semantics with the reference's traversal).

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
from rsoderh_raytracing_tpu.ops import pallas_intersect
from rsoderh_raytracing_tpu.ops.geometry import INF, HitRecord
from rsoderh_raytracing_tpu.scene.device import DeviceScene


def _take(arr, idx):
    return jnp.take(arr, idx, axis=0)


def _sweep_xla(scene: DeviceScene, ro, rd):
    """(t, type, index) closest winner via the XLA broadcast sweep."""
    t_sph = geo.sphere_distances_fast(ro, rd, scene)
    t_pln = geo.plane_distances_fast(ro, rd, scene)
    t_tri = geo.triangle_distances_fast(ro, rd, scene)

    i_sph = jnp.argmin(t_sph, axis=1).astype(jnp.int32)
    d_sph = jnp.min(t_sph, axis=1)
    i_pln = jnp.argmin(t_pln, axis=1).astype(jnp.int32)
    d_pln = jnp.min(t_pln, axis=1)
    i_tri = jnp.argmin(t_tri, axis=1).astype(jnp.int32)
    d_tri = jnp.min(t_tri, axis=1)

    dists = jnp.stack([d_sph, d_pln, d_tri], axis=1)
    which = jnp.argmin(dists, axis=1).astype(jnp.int32)
    t = jnp.min(dists, axis=1)
    ptype = jnp.where(t < INF, which, -1)
    pidx = jnp.where(
        which == 0, i_sph, jnp.where(which == 1, i_pln, i_tri)
    )
    return t, ptype, pidx


def _sweep_bvh(scene: DeviceScene, ro, rd):
    """(t, type, index) via the flat-BVH traversal (parity path with the
    reference's cast_ray_bvh node ordering), plus the reference's linear
    sphere+plane fallback when the BVH reports a miss
    (shader.wgsl:576-598 cast_ray) — this covers rays the conservative
    AABB test rejects (flat boxes hit edge-on produce NaN slab times
    which WGSL comparisons treat as a miss; see
    ops/geometry.py:ray_intersects_bounds)."""
    from rsoderh_raytracing_tpu.ops.bvh_traverse import traverse_closest

    t, slot = traverse_closest(scene, scene.bvh, ro, rd)
    hit = slot >= 0
    slot_safe = jnp.where(hit, slot, 0)
    ptype = jnp.where(
        hit, jnp.take(scene.bvh.prim_type, slot_safe), -1
    )
    pidx = jnp.take(scene.bvh.prim_index, slot_safe)
    t = jnp.where(hit, t, INF)

    # Linear fallback on BVH miss: spheres + planes only, like cast_ray.
    t_sph = geo.sphere_distances_fast(ro, rd, scene)
    t_pln = geo.plane_distances_fast(ro, rd, scene)
    i_sph = jnp.argmin(t_sph, axis=1).astype(jnp.int32)
    d_sph = jnp.min(t_sph, axis=1)
    i_pln = jnp.argmin(t_pln, axis=1).astype(jnp.int32)
    d_pln = jnp.min(t_pln, axis=1)
    fb_t = jnp.minimum(d_sph, d_pln)
    fb_type = jnp.where(
        fb_t < INF, jnp.where(d_sph <= d_pln, 0, 1), -1
    )
    fb_idx = jnp.where(d_sph <= d_pln, i_sph, i_pln)

    use_fb = ~hit
    return (
        jnp.where(use_fb, fb_t, t),
        jnp.where(use_fb, fb_type, ptype),
        jnp.where(use_fb, fb_idx, pidx),
    )


def _sweep(scene: DeviceScene, ro, rd):
    if scene.bvh is not None:
        return _sweep_bvh(scene, ro, rd)
    if pallas_intersect.sweep_supported(scene):
        return pallas_intersect.closest_sweep(scene, ro, rd)
    return _sweep_xla(scene, ro, rd)


def _hit_attributes(scene: DeviceScene, ro, rd, t, ptype, pidx) -> HitRecord:
    """Reconstruct point/normal/material for the winning primitive."""
    did_hit = ptype >= 0
    t_safe = jnp.where(did_hit, t, 0.0)
    point = ro + rd * t_safe[:, None]

    idx_s = jnp.where(ptype == 0, pidx, 0)
    idx_p = jnp.where(ptype == 1, pidx, 0)
    idx_t = jnp.where(ptype == 2, pidx, 0)

    sph_normal = geo.sphere_normal(
        ro, point, _take(scene.sph_pos, idx_s), _take(scene.sph_radius, idx_s)
    )
    pln_normal = geo.plane_normal_for_ray(ro, _take(scene.pln_normal, idx_p))
    tri_normal = geo.triangle_hit_attributes(
        ro,
        rd,
        _take(scene.tri_a, idx_t),
        _take(scene.tri_edge0, idx_t),
        _take(scene.tri_edge1, idx_t),
        _take(scene.tri_n0, idx_t),
        _take(scene.tri_n1, idx_t),
        _take(scene.tri_n2, idx_t),
    )
    normal = jnp.where(
        (ptype == 0)[:, None],
        sph_normal,
        jnp.where((ptype == 1)[:, None], pln_normal, tri_normal),
    )
    material_id = jnp.where(
        ptype == 0,
        _take(scene.sph_material, idx_s),
        jnp.where(
            ptype == 1,
            _take(scene.pln_material, idx_p),
            _take(scene.tri_material, idx_t),
        ),
    )
    return HitRecord(
        did_hit=did_hit,
        distance=t_safe,
        point=point,
        normal=normal,
        material_id=material_id,
    )


def closest_hit(scene: DeviceScene, ro, rd) -> HitRecord:
    """Closest intersection along each ray. ro, rd: (N,3)."""
    t, ptype, pidx = _sweep(scene, ro, rd)
    return _hit_attributes(scene, ro, rd, t, ptype, pidx)


def trace_nee(scene: DeviceScene, ro, rd, nee_dir):
    """Fused per-segment trace for the wavefront integrator: closest hit,
    shading attributes + material values, and NEE occlusion from the hit
    point along `nee_dir` — ONE Pallas kernel on TPU (the composed path's
    winner-attribute gathers and extra kernel boundaries cost ~20 ns/lane
    at 2048^2, measured), identical values composed from closest_hit /
    material takes / any_hit elsewhere.

    Returns (did_hit (N,), point (N,3), normal (N,3), color (N,3),
    roughness (N,), metallic (N,), emission (N,3), occluded (N,))."""
    if scene.bvh is None and pallas_intersect.fused_supported(scene):
        return pallas_intersect.fused_trace(scene, ro, rd, nee_dir)
    hit = closest_hit(scene, ro, rd)
    color = _take(scene.mat_color, hit.material_id)
    rough = _take(scene.mat_roughness, hit.material_id)
    metal = _take(scene.mat_metallic, hit.material_id)
    emission = _take(scene.mat_emission, hit.material_id)
    occ = any_hit(scene, hit.point, nee_dir)
    return (
        hit.did_hit,
        hit.point,
        hit.normal,
        color,
        rough,
        metal,
        emission,
        occ,
    )


def any_hit(scene: DeviceScene, ro, rd):
    """True where any primitive blocks the ray. ro, rd: (N,3) -> (N,) bool."""
    if scene.bvh is not None:
        # Occlusion uses cast_ray_bvh ONLY — no linear fallback
        # (shader.wgsl:1249), unlike closest-hit's cast_ray. The
        # early-exit walk returns the same boolean as
        # traverse_closest(...)[1] >= 0 (tested) in fewer lockstep
        # iterations.
        from rsoderh_raytracing_tpu.ops.bvh_traverse import traverse_any

        return traverse_any(scene, scene.bvh, ro, rd)
    if pallas_intersect.sweep_supported(scene):
        return pallas_intersect.any_sweep(scene, ro, rd)
    t_sph = geo.sphere_distances_fast(ro, rd, scene)
    t_pln = geo.plane_distances_fast(ro, rd, scene)
    t_tri = geo.triangle_distances_fast(ro, rd, scene)
    return (
        jnp.any(t_sph < INF, axis=1)
        | jnp.any(t_pln < INF, axis=1)
        | jnp.any(t_tri < INF, axis=1)
    )
