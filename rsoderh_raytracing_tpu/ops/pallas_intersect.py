"""Pallas TPU kernels for the intersection sweeps.

The XLA formulation (ops/intersect.py) materializes (N, P) distance
blocks whose fusion with the surrounding integrator body is fragile —
measured ~10x slower in context than standalone. These kernels give the
sweep a hard kernel boundary with the ideal schedule:

- rays live as (SUBLANES, 128) f32 tiles in VMEM (one grid step =
  SUBLANES*128 rays),
- the padded scene SoA (a few KB) sits in SMEM and is read as scalars,
- the primitive loop is UNROLLED python-side over the padded lanes:
  each primitive is a set of scalar broadcasts against the ray tiles
  (pure VPU FMAs — the (N, P) matrix never exists anywhere),
- closest-hit tracks (best_t, best_type, best_index) with elementwise
  mins; attribute reconstruction (normals, materials) stays outside in
  XLA where the winner gathers are cheap small-table lookups.

Math and epsilons are identical to ops/geometry.py::*_fast (the
expanded triple-product forms).

Used by ops/intersect.py when the padded primitive count is small
enough to unroll (<= MAX_UNROLL_PRIMS); larger scenes keep the XLA
path. Disable with RT_DISABLE_PALLAS=1; force-enable the wrapper on CPU
for tests with RT_PALLAS_INTERPRET=1 (interpreter mode).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rsoderh_raytracing_tpu.ops import geometry as geo

SUBLANES = 64
LANES = 128
BLOCK = SUBLANES * LANES  # rays per grid step

MAX_UNROLL_PRIMS = 192  # unrolled loop budget (house: 72, default: 40)
MAX_LOOP_PRIMS = 2048  # fori_loop + dynamic SMEM reads (suzanne: 976)

INF = 3.0e38


def _interpret() -> bool:
    return os.environ.get("RT_PALLAS_INTERPRET") == "1"


def pallas_enabled() -> bool:
    if os.environ.get("RT_DISABLE_PALLAS") == "1":
        return False
    if _interpret():
        return True
    return jax.default_backend() == "tpu"


def _total_prims(scene) -> int:
    return (
        scene.sph_radius.shape[0]
        + scene.pln_valid.shape[0]
        + scene.tri_valid.shape[0]
    )


TRI_CHUNK = 64  # triangles per grid step in the chunked sweep


def _loop_enabled() -> bool:
    # The fori_loop variant keeps primitive constants in SMEM, which on
    # real v5e hardware is 1MB — a 968-triangle scene needs ~2.9MB and
    # fails to compile (measured). The chunked-grid sweep replaces it for
    # big scenes; the loop variant stays opt-in for experimentation.
    return os.environ.get("RT_PALLAS_LOOP") == "1"


def _chunked_applicable(scene) -> bool:
    """Big-triangle scenes use the chunked grid when the non-triangle
    lanes fit the unroll budget and triangle lanes divide into chunks."""
    small = scene.sph_radius.shape[0] + scene.pln_valid.shape[0]
    n_tri = scene.tri_valid.shape[0]
    return (
        small + TRI_CHUNK <= MAX_UNROLL_PRIMS
        and n_tri % TRI_CHUNK == 0
        and n_tri <= MAX_LOOP_PRIMS
    )


def sweep_supported(scene) -> bool:
    if not pallas_enabled():
        return False
    total = _total_prims(scene)
    if total <= MAX_UNROLL_PRIMS:
        return True
    if _loop_enabled() and total <= MAX_LOOP_PRIMS:
        return True
    return _chunked_applicable(scene)


def _use_loop(scene) -> bool:
    return (
        _total_prims(scene) > MAX_UNROLL_PRIMS
        and _loop_enabled()
        and not _chunked_applicable(scene)
    )


def _use_chunked(scene) -> bool:
    return (
        _total_prims(scene) > MAX_UNROLL_PRIMS and _chunked_applicable(scene)
    )


def _sweep_body(n_sph, n_pln, n_tri, refs, ox, oy, oz, dx, dy, dz):
    """Shared unrolled sweep. Returns (best_t, best_type, best_idx)."""
    (
        sph_pos, sph_c2, sph_valid,
        pln_normal, pln_ndotp, pln_r0, pln_r2, pln_r0dotp, pln_r2dotp,
        pln_valid,
        tri_cdet, tri_edge0, tri_edge1, tri_cu, tri_cv, tri_n, tri_adotn,
        tri_valid,
    ) = refs

    a_q = dx * dx + dy * dy + dz * dz
    d_dot_o = dx * ox + dy * oy + dz * oz
    o_dot_o = ox * ox + oy * oy + oz * oz
    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx

    best_t = jnp.full(ox.shape, INF, jnp.float32)
    best_type = jnp.full(ox.shape, -1, jnp.int32)
    best_idx = jnp.zeros(ox.shape, jnp.int32)

    def consider(t, hit, ptype, pidx):
        nonlocal best_t, best_type, best_idx
        better = hit & (t < best_t)
        best_t = jnp.where(better, t, best_t)
        best_type = jnp.where(better, ptype, best_type)
        best_idx = jnp.where(better, pidx, best_idx)

    for i in range(n_sph):
        cx = sph_pos[i, 0]
        cy = sph_pos[i, 1]
        cz = sph_pos[i, 2]
        b = 2.0 * (d_dot_o - (dx * cx + dy * cy + dz * cz))
        c = o_dot_o - 2.0 * (ox * cx + oy * cy + oz * cz) + sph_c2[i]
        disc = b * b - 4.0 * a_q * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        q = jnp.where(b > 0, -0.5 * (b + sq), -0.5 * (b - sq))
        t0 = q / a_q
        t1 = c / jnp.where(q == 0.0, 1.0, q)
        t = jnp.where(
            t0 < geo.SPHERE_EPS,
            t1,
            jnp.where(t1 < geo.SPHERE_EPS, t0, jnp.minimum(t0, t1)),
        )
        t = jnp.where(disc == 0.0, -0.5 * b / a_q, t)
        hit = (disc >= 0.0) & (t >= geo.SPHERE_EPS) & (sph_valid[i] > 0)
        consider(t, hit, 0, i)

    for i in range(n_pln):
        nx = pln_normal[i, 0]
        ny = pln_normal[i, 1]
        nz = pln_normal[i, 2]
        denom = dx * nx + dy * ny + dz * nz
        ok = jnp.abs(denom) >= geo.PLANE_DENOM_EPS
        t = (pln_ndotp[i] - (ox * nx + oy * ny + oz * nz)) / jnp.where(
            ok, denom, 1.0
        )
        px = (
            (ox * pln_r0[i, 0] + oy * pln_r0[i, 1] + oz * pln_r0[i, 2])
            + t * (dx * pln_r0[i, 0] + dy * pln_r0[i, 1] + dz * pln_r0[i, 2])
            - pln_r0dotp[i]
        )
        pz = (
            (ox * pln_r2[i, 0] + oy * pln_r2[i, 1] + oz * pln_r2[i, 2])
            + t * (dx * pln_r2[i, 0] + dy * pln_r2[i, 1] + dz * pln_r2[i, 2])
            - pln_r2dotp[i]
        )
        hit = (
            ok
            & (t >= geo.PLANE_T_EPS)
            & (px >= 0.0)
            & (px <= 1.0)
            & (pz >= 0.0)
            & (pz <= 1.0)
            & (pln_valid[i] > 0)
        )
        consider(t, hit, 1, i)

    for i in range(n_tri):
        det = (
            dx * tri_cdet[i, 0] + dy * tri_cdet[i, 1] + dz * tri_cdet[i, 2]
        )
        ok = jnp.abs(det) >= geo.TRI_DET_EPS
        inv = 1.0 / jnp.where(ok, det, 1.0)
        u = (
            (mx * tri_edge1[i, 0] + my * tri_edge1[i, 1] + mz * tri_edge1[i, 2])
            + (dx * tri_cu[i, 0] + dy * tri_cu[i, 1] + dz * tri_cu[i, 2])
        ) * inv
        v = -(
            (mx * tri_edge0[i, 0] + my * tri_edge0[i, 1] + mz * tri_edge0[i, 2])
            + (dx * tri_cv[i, 0] + dy * tri_cv[i, 1] + dz * tri_cv[i, 2])
        ) * inv
        t = (
            (ox * tri_n[i, 0] + oy * tri_n[i, 1] + oz * tri_n[i, 2])
            - tri_adotn[i]
        ) * inv
        hit = (
            ok
            & (u >= 0.0)
            & (u <= 1.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t >= geo.TRI_T_EPS)
            & (tri_valid[i] > 0)
        )
        consider(t, hit, 2, i)

    return best_t, best_type, best_idx


def _sweep_body_loop(n_sph, n_pln, n_tri, refs, ox, oy, oz, dx, dy, dz):
    """fori_loop sweep for scenes beyond the unroll budget: primitive
    constants are read per iteration with DYNAMIC scalar indices from
    SMEM (supported by Mosaic), so the kernel size stays constant no
    matter the primitive count."""
    (
        sph_pos, sph_c2, sph_valid,
        pln_normal, pln_ndotp, pln_r0, pln_r2, pln_r0dotp, pln_r2dotp,
        pln_valid,
        tri_cdet, tri_edge0, tri_edge1, tri_cu, tri_cv, tri_n, tri_adotn,
        tri_valid,
    ) = refs

    a_q = dx * dx + dy * dy + dz * dz
    d_dot_o = dx * ox + dy * oy + dz * oz
    o_dot_o = ox * ox + oy * oy + oz * oz
    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx

    init = (
        jnp.full(ox.shape, INF, jnp.float32),
        jnp.full(ox.shape, -1, jnp.int32),
        jnp.zeros(ox.shape, jnp.int32),
    )

    def consider(state, t, hit, ptype, pidx):
        best_t, best_type, best_idx = state
        better = hit & (t < best_t)
        return (
            jnp.where(better, t, best_t),
            jnp.where(better, ptype, best_type),
            jnp.where(better, pidx, best_idx),
        )

    def sphere_body(i, state):
        cx, cy, cz = sph_pos[i, 0], sph_pos[i, 1], sph_pos[i, 2]
        b = 2.0 * (d_dot_o - (dx * cx + dy * cy + dz * cz))
        c = o_dot_o - 2.0 * (ox * cx + oy * cy + oz * cz) + sph_c2[i]
        disc = b * b - 4.0 * a_q * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        q = jnp.where(b > 0, -0.5 * (b + sq), -0.5 * (b - sq))
        t0 = q / a_q
        t1 = c / jnp.where(q == 0.0, 1.0, q)
        t = jnp.where(
            t0 < geo.SPHERE_EPS,
            t1,
            jnp.where(t1 < geo.SPHERE_EPS, t0, jnp.minimum(t0, t1)),
        )
        t = jnp.where(disc == 0.0, -0.5 * b / a_q, t)
        hit = (disc >= 0.0) & (t >= geo.SPHERE_EPS) & (sph_valid[i] > 0)
        return consider(state, t, hit, 0, i)

    def plane_body(i, state):
        nx, ny, nz = pln_normal[i, 0], pln_normal[i, 1], pln_normal[i, 2]
        denom = dx * nx + dy * ny + dz * nz
        ok = jnp.abs(denom) >= geo.PLANE_DENOM_EPS
        t = (pln_ndotp[i] - (ox * nx + oy * ny + oz * nz)) / jnp.where(
            ok, denom, 1.0
        )
        px = (
            (ox * pln_r0[i, 0] + oy * pln_r0[i, 1] + oz * pln_r0[i, 2])
            + t * (dx * pln_r0[i, 0] + dy * pln_r0[i, 1] + dz * pln_r0[i, 2])
            - pln_r0dotp[i]
        )
        pz = (
            (ox * pln_r2[i, 0] + oy * pln_r2[i, 1] + oz * pln_r2[i, 2])
            + t * (dx * pln_r2[i, 0] + dy * pln_r2[i, 1] + dz * pln_r2[i, 2])
            - pln_r2dotp[i]
        )
        hit = (
            ok
            & (t >= geo.PLANE_T_EPS)
            & (px >= 0.0)
            & (px <= 1.0)
            & (pz >= 0.0)
            & (pz <= 1.0)
            & (pln_valid[i] > 0)
        )
        return consider(state, t, hit, 1, i)

    def tri_body(i, state):
        det = dx * tri_cdet[i, 0] + dy * tri_cdet[i, 1] + dz * tri_cdet[i, 2]
        ok = jnp.abs(det) >= geo.TRI_DET_EPS
        inv = 1.0 / jnp.where(ok, det, 1.0)
        u = (
            (mx * tri_edge1[i, 0] + my * tri_edge1[i, 1] + mz * tri_edge1[i, 2])
            + (dx * tri_cu[i, 0] + dy * tri_cu[i, 1] + dz * tri_cu[i, 2])
        ) * inv
        v = -(
            (mx * tri_edge0[i, 0] + my * tri_edge0[i, 1] + mz * tri_edge0[i, 2])
            + (dx * tri_cv[i, 0] + dy * tri_cv[i, 1] + dz * tri_cv[i, 2])
        ) * inv
        t = (
            (ox * tri_n[i, 0] + oy * tri_n[i, 1] + oz * tri_n[i, 2])
            - tri_adotn[i]
        ) * inv
        hit = (
            ok
            & (u >= 0.0)
            & (u <= 1.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t >= geo.TRI_T_EPS)
            & (tri_valid[i] > 0)
        )
        return consider(state, t, hit, 2, i)

    state = jax.lax.fori_loop(0, n_sph, sphere_body, init)
    state = jax.lax.fori_loop(0, n_pln, plane_body, state)
    state = jax.lax.fori_loop(0, n_tri, tri_body, state)
    return state


def _chunked_closest_kernel(n_sph, n_pln, *args):
    """Grid (ray_blocks, tri_chunks): out blocks are revisited across the
    chunk axis (innermost), accumulating the closest hit; spheres+planes
    run once at chunk 0. Triangle constants arrive as SMEM windows of
    TRI_CHUNK rows — a few KB regardless of scene size."""
    small_refs = args[:10]
    tri_refs = args[10:18]
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref = args[18:24]
    t_ref, type_ref, idx_ref = args[24:]

    (
        tri_cdet, tri_edge0, tri_edge1, tri_cu, tri_cv, tri_n, tri_adotn,
        tri_valid,
    ) = tri_refs

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        # 18-ref layout expected by _sweep_body; zero triangles processed.
        refs = tuple(small_refs) + tuple(tri_refs)
        best_t, best_type, best_idx = _sweep_body(
            n_sph, n_pln, 0, refs, ox, oy, oz, dx, dy, dz
        )
        t_ref[:] = best_t
        type_ref[:] = best_type
        idx_ref[:] = best_idx

    best_t = t_ref[:]
    best_type = type_ref[:]
    best_idx = idx_ref[:]

    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx
    base = j * TRI_CHUNK

    for i in range(TRI_CHUNK):
        det = dx * tri_cdet[i, 0] + dy * tri_cdet[i, 1] + dz * tri_cdet[i, 2]
        ok = jnp.abs(det) >= geo.TRI_DET_EPS
        inv = 1.0 / jnp.where(ok, det, 1.0)
        u = (
            (mx * tri_edge1[i, 0] + my * tri_edge1[i, 1] + mz * tri_edge1[i, 2])
            + (dx * tri_cu[i, 0] + dy * tri_cu[i, 1] + dz * tri_cu[i, 2])
        ) * inv
        v = -(
            (mx * tri_edge0[i, 0] + my * tri_edge0[i, 1] + mz * tri_edge0[i, 2])
            + (dx * tri_cv[i, 0] + dy * tri_cv[i, 1] + dz * tri_cv[i, 2])
        ) * inv
        t = (
            (ox * tri_n[i, 0] + oy * tri_n[i, 1] + oz * tri_n[i, 2])
            - tri_adotn[i, 0]
        ) * inv
        hit = (
            ok
            & (u >= 0.0)
            & (u <= 1.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t >= geo.TRI_T_EPS)
            & (tri_valid[i, 0] > 0)
        )
        better = hit & (t < best_t)
        best_t = jnp.where(better, t, best_t)
        best_type = jnp.where(better, 2, best_type)
        best_idx = jnp.where(better, base + i, best_idx)

    t_ref[:] = best_t
    type_ref[:] = best_type
    idx_ref[:] = best_idx


def _chunked_call(scene, ro, rd):
    n = ro.shape[0]
    comps, n_pad = _ray_tiles(ro, rd)
    rows = n_pad // LANES
    grid_rays = rows // SUBLANES

    n_sph = scene.sph_radius.shape[0]
    n_pln = scene.pln_valid.shape[0]
    n_tri = scene.tri_valid.shape[0]
    n_chunks = n_tri // TRI_CHUNK

    refs = _scene_refs(scene)
    small_refs = refs[:10]
    # Mosaic requires rank-1 blocks to be 128-multiples; keep the per-
    # triangle scalars as (T, 1) so every block is rank 2.
    tri_arrays = tuple(
        arr if arr.ndim == 2 else arr.reshape(-1, 1) for arr in refs[10:]
    )

    smem_full = pl.BlockSpec(memory_space=pltpu.SMEM)
    tri_specs = [
        pl.BlockSpec(
            (TRI_CHUNK, arr.shape[1]),
            lambda i, j: (j, 0),
            memory_space=pltpu.SMEM,
        )
        for arr in tri_arrays
    ]
    ray_block = pl.BlockSpec(
        (SUBLANES, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    out_block = pl.BlockSpec(
        (SUBLANES, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )

    t, ptype, pidx = pl.pallas_call(
        partial(_chunked_closest_kernel, n_sph, n_pln),
        grid=(grid_rays, n_chunks),
        in_specs=[smem_full] * 10 + tri_specs + [ray_block] * 6,
        out_specs=(out_block, out_block, out_block),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
        interpret=_interpret(),
    )(*small_refs, *tri_arrays, *comps)
    return (
        t.reshape(-1)[:n],
        ptype.reshape(-1)[:n],
        pidx.reshape(-1)[:n],
    )


def _closest_kernel(n_sph, n_pln, n_tri, use_loop, *args):
    refs = args[:18]
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref = args[18:24]
    t_ref, type_ref, idx_ref = args[24:]
    body = _sweep_body_loop if use_loop else _sweep_body
    best_t, best_type, best_idx = body(
        n_sph, n_pln, n_tri, refs,
        ox_ref[:], oy_ref[:], oz_ref[:], dx_ref[:], dy_ref[:], dz_ref[:],
    )
    t_ref[:] = best_t
    type_ref[:] = best_type
    idx_ref[:] = best_idx


def _any_kernel(n_sph, n_pln, n_tri, use_loop, *args):
    refs = args[:18]
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref = args[18:24]
    (hit_ref,) = args[24:]
    body = _sweep_body_loop if use_loop else _sweep_body
    best_t, _, _ = body(
        n_sph, n_pln, n_tri, refs,
        ox_ref[:], oy_ref[:], oz_ref[:], dx_ref[:], dy_ref[:], dz_ref[:],
    )
    hit_ref[:] = (best_t < INF).astype(jnp.int32)


def _scene_refs(scene):
    """The 18 SMEM-resident constant arrays, valid masks as int32."""
    return (
        scene.sph_pos, scene.sph_c2, scene.sph_valid.astype(jnp.int32),
        scene.pln_normal, scene.pln_ndotp, scene.pln_r0, scene.pln_r2,
        scene.pln_r0dotp, scene.pln_r2dotp,
        scene.pln_valid.astype(jnp.int32),
        scene.tri_cdet, scene.tri_edge0, scene.tri_edge1, scene.tri_cu,
        scene.tri_cv, scene.tri_n, scene.tri_adotn,
        scene.tri_valid.astype(jnp.int32),
    )


def _ray_tiles(ro, rd):
    n = ro.shape[0]
    n_pad = -(-n // BLOCK) * BLOCK
    pad = n_pad - n
    comps = []
    for arr in (ro, rd):
        for k in range(3):
            c = arr[:, k]
            if pad:
                c = jnp.concatenate([c, jnp.ones((pad,), c.dtype)])
            comps.append(c.reshape(n_pad // LANES, LANES))
    return comps, n_pad


def _call(kernel, out_dtypes, scene, ro, rd):
    n = ro.shape[0]
    comps, n_pad = _ray_tiles(ro, rd)
    rows = n_pad // LANES
    grid = rows // SUBLANES

    n_sph = scene.sph_radius.shape[0]
    n_pln = scene.pln_valid.shape[0]
    n_tri = scene.tri_valid.shape[0]

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ray_block = pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    outs = tuple(
        jax.ShapeDtypeStruct((rows, LANES), dt) for dt in out_dtypes
    )
    out_specs = tuple(ray_block for _ in out_dtypes)
    if len(outs) == 1:
        outs = outs[0]
        out_specs = out_specs[0]

    result = pl.pallas_call(
        partial(kernel, n_sph, n_pln, n_tri, _use_loop(scene)),
        grid=(grid,),
        in_specs=[smem] * 18 + [ray_block] * 6,
        out_specs=out_specs,
        out_shape=outs,
        interpret=_interpret(),
    )(*_scene_refs(scene), *comps)
    if not isinstance(result, tuple):
        result = (result,)
    return tuple(r.reshape(-1)[:n] for r in result)


def closest_sweep(scene, ro, rd):
    """(t, prim_type, prim_index) per ray. prim_type: 0 sphere / 1 plane
    / 2 triangle / -1 miss; t is INF on miss. ro, rd: (N, 3)."""
    if _use_chunked(scene):
        return _chunked_call(scene, ro, rd)
    return _call(
        _closest_kernel,
        (jnp.float32, jnp.int32, jnp.int32),
        scene,
        ro,
        rd,
    )


def any_sweep(scene, ro, rd):
    """(N,) bool occlusion."""
    if _use_chunked(scene):
        _, ptype, _ = _chunked_call(scene, ro, rd)
        return ptype >= 0
    (hit,) = _call(_any_kernel, (jnp.int32,), scene, ro, rd)
    return hit != 0
