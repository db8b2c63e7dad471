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
  mins; winner attributes (normals, materials) are reconstructed
  IN-KERNEL via unrolled SMEM selects (trace_attrs_body) — the XLA
  small-table winner gathers they replace cost ~20 ns/lane at 2048^2.

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
# Chunked-grid ceiling: the only per-scene SMEM resident that grows with
# triangle count is the chunk-AABB table, passed TRANSPOSED as
# (6, n_chunks) because SMEM allocates 2D arrays at >= 512 B per ROW
# (measured on this toolchain: row-major (3872, 6) allocates 1.9 MB and
# fails the 1 MB compile; transposed it costs 6 rows x 4 B/chunk =
# ~93 KB at 4096 chunks; 372 KB at 15,488 — measured within the 1 MB
# SMEM alongside the streamed, size-invariant per-chunk constant
# windows). Past SHORTLIST/GROUP capacity the grid degrades gracefully
# to the plain chunked sweep (group=0), so the hard wall is the SMEM
# bounds table, not the shortlist. The DEFAULT ceiling stays at the
# round-4 measured envelope (every config below it is benched);
# RT_MAX_CHUNKED_TRIS raises it — round 5 measured a 991k-tri scene
# (15,488 chunks) on this path at 256^2: 0.11 Mrays/s with the auto
# G=2 shortlist, 10x the composed dense sweep's 0.0113, image-checked
# kernel-vs-composed on hardware; at 2048^2 the same scene's kernel
# program blows the tunnel's RPC deadline (UNAVAILABLE), which is why
# the raise is opt-in rather than the default. Scenes beyond the
# ceiling fall (loudly on CPU — see render/wavefront.py) to the
# composed XLA sweep (TPU) or the flat-BVH walk (CPU auto routing,
# scene/device.py).
MAX_CHUNKED_TRIS = int(os.environ.get("RT_MAX_CHUNKED_TRIS", "262144"))
# Spheres stream as chunk windows too (same grid, same AABB culls) when
# the sphere+plane unroll no longer fits the per-step budget — the
# reference handles any sphere count through its BVH (src/bvh.rs:13-28);
# here many-sphere scenes ride the same streamed-window machinery as
# many-triangle ones. Same SMEM argument as MAX_CHUNKED_TRIS.
MAX_CHUNKED_SPHERES = int(
    os.environ.get("RT_MAX_CHUNKED_SPHERES", "262144")
)

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


# Triangles per grid step in the chunked sweep. The consolidated window
# costs TRI_CHUNK * TRI_COLS * 4 B of SMEM (double-buffered): 5 KB at 64.
# (The round-2 "128 needs 1.02 MB" compile failure was an artifact of
# EIGHT separate per-column windows — SMEM window allocation pads per
# row; one consolidated window removed it.) RT_TRI_CHUNK overrides for
# measurement; 64 measured best (see PERFORMANCE.md round 3).
TRI_CHUNK = int(os.environ.get("RT_TRI_CHUNK", "64"))


def _loop_enabled() -> bool:
    # The fori_loop variant keeps primitive constants in SMEM, which on
    # real v5e hardware is 1MB — a 968-triangle scene needs ~2.9MB and
    # fails to compile (measured). The chunked-grid sweep replaces it for
    # big scenes; the loop variant stays opt-in for experimentation.
    return os.environ.get("RT_PALLAS_LOOP") == "1"


def _counts_chunked_applicable(n_sph: int, n_pln: int, n_tri: int) -> bool:
    """Count-based core of _chunked_applicable: big scenes use the
    chunked grid when their triangle lanes divide into chunks and the
    unrolled-smalls step fits the budget — either directly
    (spheres+planes unroll at chunk 0) or by streaming the sphere lanes
    as chunk windows (_counts_chunk_spheres)."""
    if n_tri % TRI_CHUNK != 0 or n_tri > MAX_CHUNKED_TRIS:
        return False
    if n_sph + n_pln + TRI_CHUNK <= MAX_UNROLL_PRIMS:
        return n_tri > 0  # at least one window chunk for the grid
    return _counts_chunk_spheres(n_sph, n_pln)


def _counts_chunk_spheres(n_sph: int, n_pln: int) -> bool:
    """Sphere lanes stream as chunk windows (like triangles) when the
    sphere+plane unroll no longer fits the per-step budget. Planes stay
    unrolled at chunk 0 (authored scenes hold a handful of planes; a
    scene with >128 plane lanes still falls to the composed sweep,
    loudly)."""
    return (
        n_sph + n_pln + TRI_CHUNK > MAX_UNROLL_PRIMS
        and n_sph > 0
        and n_sph % TRI_CHUNK == 0
        and n_sph <= MAX_CHUNKED_SPHERES
        and n_pln + TRI_CHUNK <= MAX_UNROLL_PRIMS
    )


def counts_kernel_path(n_sph: int, n_pln: int, n_tri: int) -> bool:
    """Whether ANY Pallas kernel path covers padded lane counts
    (n_sph, n_pln, n_tri) — fused unroll or the chunked grid. A pure
    scene-size predicate: ignores backend/env gates (pallas_enabled,
    RT_DISABLE_*), so the host scene builder can use it to auto-route
    past-ceiling scenes onto the composed flat-BVH traversal (the
    reference handles any scene size through its per-thread BVH,
    shader.wgsl:469-564; past our kernel ceilings the O(P) composed
    dense sweep is hopeless at scale on every backend)."""
    if n_sph + n_pln + n_tri <= MAX_UNROLL_PRIMS:
        return True
    return _counts_chunked_applicable(n_sph, n_pln, n_tri)


def _chunked_applicable(scene) -> bool:
    return _counts_chunked_applicable(
        scene.sph_radius.shape[0],
        scene.pln_valid.shape[0],
        scene.tri_valid.shape[0],
    )


def _chunk_spheres(scene) -> bool:
    return _counts_chunk_spheres(
        scene.sph_radius.shape[0], scene.pln_valid.shape[0]
    )


def scene_chunk_count(scene) -> int:
    """Chunk-grid size the chunked kernels would use for `scene`:
    triangle windows plus (when _chunk_spheres) sphere windows, both
    padded to whole TRI_CHUNK rows. Drives the production defaults for
    shortlist-scale scenes (render/wavefront.py): lane compaction and
    32-sublane sweep tiles pay off exactly where the per-tile chunk
    culls have many chunks to skip (> SHORTLIST_MIN_CHUNKS)."""
    n_tri = scene.tri_valid.shape[0]
    c = -(-n_tri // TRI_CHUNK) if n_tri else 0
    if _chunk_spheres(scene):
        c += -(-scene.sph_radius.shape[0] // TRI_CHUNK)
    return c


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


def chunk_slab_mask(bounds_ref, cidx, ox, oy, oz, dx, dy, dz, t_max=None):
    """Conservative per-lane chunk-AABB slab test (NaN -> hit): which
    lanes possibly touch chunk `cidx`'s bounds? `bounds_ref` is the
    TRANSPOSED (6, n_chunks) SMEM table — SMEM allocates 2D arrays at
    >= 512 B per ROW (measured: a (3872, 6) f32 table allocates 1.9 MB,
    not 93 KB, and blows the 1 MB budget), so the constant tables keep
    their row count fixed and grow along the lane axis.
    Padded-origin vertices
    only ever ENLARGE bounds, so the cull never drops a triangle the
    dense sweep would find. Optional per-lane `t_max` (the running best
    hit) additionally rejects chunks whose slab ENTRY lies beyond it —
    exact, since any triangle inside the chunk has t >= entry > best_t
    and loses the strict `t < best_t` comparison anyway (and a TYING
    candidate — which the f2b tie-break may prefer — has
    t == best_t >= its chunk's entry, so its chunk always survives
    this inclusive cull). Rounding safety must scale with ray DISTANCE, not chunk
    extent: both the slab entry and the triangle t it bounds carry
    fp error proportional to the hit distance (chunk_bounds' ~1e-5
    spatial inflation covers nearby origins but is dwarfed by t-ulps
    once |origin| >> chunk extent), so the best-t comparison takes a
    1e-3 relative + 1e-4 absolute slack. 1e-3 (not 1e-4) because
    NEAR-TANGENT SPHERE hits amplify rounding: with disc ~ 0 the sqrt
    turns the b^2-4ac ulp into ~sqrt(ulp) ~ 3e-4 relative in t, so a
    grazing sphere's best_t can undershoot a later chunk's true slab
    entry by more than 1e-4 relative (advisor round-3 finding). 1e-3
    still culls essentially everything a tight bound would (a chunk
    surviving only inside a 0.1% t-shell is vanishingly rare) and
    keeps the cull exact for every divergence class we track."""

    def axis_slab(o, d, lo, hi):
        inv = 1.0 / d  # +-inf on axis-parallel rays
        near = (lo - o) * inv
        far = (hi - o) * inv
        t_lo = jnp.minimum(near, far)
        t_hi = jnp.maximum(near, far)
        # NaN (0 * inf) -> the axis imposes no constraint.
        t_lo = jnp.where(jnp.isnan(t_lo), -INF, t_lo)
        t_hi = jnp.where(jnp.isnan(t_hi), INF, t_hi)
        return t_lo, t_hi

    l0, h0 = axis_slab(ox, dx, bounds_ref[0, cidx], bounds_ref[3, cidx])
    l1, h1 = axis_slab(oy, dy, bounds_ref[1, cidx], bounds_ref[4, cidx])
    l2, h2 = axis_slab(oz, dz, bounds_ref[2, cidx], bounds_ref[5, cidx])
    t0 = jnp.maximum(jnp.maximum(l0, l1), jnp.maximum(l2, 0.0))
    t1 = jnp.minimum(jnp.minimum(h0, h1), h2)
    hit = t0 <= t1
    if t_max is not None:
        hit = hit & (t0 <= t_max * (1.0 + 1e-3) + 1e-4)
    return hit


def chunk_slab_any(bounds_ref, cidx, ox, oy, oz, dx, dy, dz):
    """Does ANY lane of the tile possibly touch chunk `cidx`'s bounds?"""
    return jnp.any(chunk_slab_mask(bounds_ref, cidx, ox, oy, oz, dx, dy, dz))


# Consolidated per-triangle constant columns: the chunked kernels stream
# ONE (TRI_COLS, TRI_CHUNK) SMEM window per chunk (transposed — SMEM
# rows pad to 512 B, so the layout keeps TRI_COLS rows and grows along
# the row axis) instead of 8 separate
# arrays — 8 window DMAs per grid step collapse to 1 (measured: the
# per-step overhead, not the 64-triangle sweep, dominated the chunked
# kernels' time; see PERFORMANCE.md round 3).
C_CDET = 0  # ..2
C_E0 = 3  # ..5
C_E1 = 6  # ..8
C_CU = 9  # ..11
C_CV = 12  # ..14
C_N = 15  # ..17
C_ADOTN = 18
C_VALID = 19
TRI_COLS = 20


def tri_const_table(scene):
    """(n_tri, TRI_COLS) f32 consolidated triangle constants (layout
    above; valid as 0/1 f32). Built from device-scene fields under jit —
    loop-invariant, so XLA hoists it out of the wavefront while_loop."""
    return jnp.concatenate(
        [
            scene.tri_cdet,
            scene.tri_edge0,
            scene.tri_edge1,
            scene.tri_cu,
            scene.tri_cv,
            scene.tri_n,
            scene.tri_adotn[:, None],
            scene.tri_valid.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )


# Sphere rows reuse the TRI_COLS window width (one streamed window table
# serves both primitive kinds; a chunk's kind is static from its index):
SC_POS = 0  # ..2
SC_C2 = 3
SC_VALID = 4


def sphere_const_table(scene):
    """(n_sph, TRI_COLS) f32 sphere window rows (layout above), streamed
    by the chunked kernels when _chunk_spheres applies. Built under jit;
    loop-invariant, hoisted like tri_const_table."""
    n = scene.sph_radius.shape[0]
    return jnp.concatenate(
        [
            scene.sph_pos,
            scene.sph_c2[:, None],
            scene.sph_valid.astype(jnp.float32)[:, None],
            jnp.zeros((n, TRI_COLS - 5), jnp.float32),
        ],
        axis=1,
    )


def sphere_chunk_bounds(scene):
    """(n_sph_chunks, 6) per-chunk AABBs over center +- radius, inflated
    like chunk_bounds. Padded (invalid) spheres sit at the LAST REAL
    sphere's center with radius 0 (scene/device.py) — a padded point
    only ever ENLARGES bounds (conservative), and parking it on a real
    center keeps the final partially-filled chunk's AABB tight."""
    n_chunks = scene.sph_radius.shape[0] // TRI_CHUNK
    r = scene.sph_radius[:, None]
    lo = (scene.sph_pos - r).reshape(n_chunks, TRI_CHUNK, 3).min(axis=1)
    hi = (scene.sph_pos + r).reshape(n_chunks, TRI_CHUNK, 3).max(axis=1)
    eps = (hi - lo) * 1.0e-5 + 1.0e-5
    return jnp.concatenate([lo - eps, hi + eps], axis=-1)


def sph_chunk_hits(win_ref, ox, oy, oz, dx, dy, dz, row0=0,
                   transposed=True):
    """Yield (i, t, hit) for each of a window's TRI_CHUNK spheres — the
    exact _sweep_body sphere test on the consolidated SMEM window ref
    (same robust q-form, same epsilons). `transposed` (static) selects
    the window orientation: (SPH_COLS, rows) when the window width is a
    128-multiple (grouped — Mosaic's blocked-spec rule), row-major
    (rows, SPH_COLS) otherwise. `row0` (static or traced) offsets into
    a multi-chunk GROUP window (grouped shortlists)."""
    if transposed:
        rd = lambda c, i: win_ref[c, i]  # noqa: E731
    else:
        rd = lambda c, i: win_ref[i, c]  # noqa: E731
    a_q = dx * dx + dy * dy + dz * dz
    d_dot_o = dx * ox + dy * oy + dz * oz
    o_dot_o = ox * ox + oy * oy + oz * oz
    for j in range(TRI_CHUNK):
        i = row0 + j
        cx = rd(SC_POS, i)
        cy = rd(SC_POS + 1, i)
        cz = rd(SC_POS + 2, i)
        b = 2.0 * (d_dot_o - (dx * cx + dy * cy + dz * cz))
        c = o_dot_o - 2.0 * (ox * cx + oy * cy + oz * cz) + rd(SC_C2, i)
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
        hit = (
            (disc >= 0.0)
            & (t >= geo.SPHERE_EPS)
            & (rd(SC_VALID, i) > 0)
        )
        yield j, t, hit


def tri_chunk_hits(tri_ref, ox, oy, oz, dx, dy, dz, row0=0,
                   transposed=True):
    """Yield (i, t, hit) for each of a chunk window's TRI_CHUNK triangles
    — the same expanded-triple-product test as _sweep_body, on the
    consolidated SMEM window ref: TRANSPOSED (TRI_COLS, win_rows) when
    `transposed` (static), row-major (win_rows, TRI_COLS) otherwise
    (see _chunked_tiles_call for the orientation rule). `row0`
    (static when the group sweep unrolls, traced under its fori_loop)
    offsets into a multi-chunk GROUP window (grouped shortlists); the
    yielded index stays within-chunk (0..TRI_CHUNK-1)."""
    if transposed:
        rd = lambda c, i: tri_ref[c, i]  # noqa: E731
    else:
        rd = lambda c, i: tri_ref[i, c]  # noqa: E731
    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx
    for j in range(TRI_CHUNK):
        i = row0 + j
        det = (
            dx * rd(C_CDET, i)
            + dy * rd(C_CDET + 1, i)
            + dz * rd(C_CDET + 2, i)
        )
        ok = jnp.abs(det) >= geo.TRI_DET_EPS
        inv = 1.0 / jnp.where(ok, det, 1.0)
        u = (
            (
                mx * rd(C_E1, i)
                + my * rd(C_E1 + 1, i)
                + mz * rd(C_E1 + 2, i)
            )
            + (
                dx * rd(C_CU, i)
                + dy * rd(C_CU + 1, i)
                + dz * rd(C_CU + 2, i)
            )
        ) * inv
        v = -(
            (
                mx * rd(C_E0, i)
                + my * rd(C_E0 + 1, i)
                + mz * rd(C_E0 + 2, i)
            )
            + (
                dx * rd(C_CV, i)
                + dy * rd(C_CV + 1, i)
                + dz * rd(C_CV + 2, i)
            )
        ) * inv
        t = (
            (
                ox * rd(C_N, i)
                + oy * rd(C_N + 1, i)
                + oz * rd(C_N + 2, i)
            )
            - rd(C_ADOTN, i)
        ) * inv
        hit = (
            ok
            & (u >= 0.0)
            & (u <= 1.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t >= geo.TRI_T_EPS)
            & (rd(C_VALID, i) > 0)
        )
        yield j, t, hit


def tri_chunk_occluded(tri_ref, ox, oy, oz, dx, dy, dz, row0=0,
                       transposed=True):
    """Yield hit-only masks for a chunk window, DIVISION-FREE: every
    quotient comparison of tri_chunk_hits is replaced by its sign-scaled
    numerator form (u >= 0  <=>  u_num*sign(det) >= 0;  u <= 1  <=>
    u_num*sign(det) <= |det|;  t >= eps  <=>  t_num*sign(det) >=
    eps*|det|). Mathematically identical predicates; float results can
    differ only where a rounded quotient lands exactly on a comparison
    boundary (ulp-scale bands — the same rare class as the documented
    fma-contraction trajectory flips). Occlusion needs no t value, so
    the per-triangle divide disappears entirely. Consumes the
    consolidated SMEM window ref in either orientation (`transposed`
    static — see tri_chunk_hits). `row0` (static or traced) offsets
    into a multi-chunk GROUP window."""
    if transposed:
        rd = lambda c, i: tri_ref[c, i]  # noqa: E731
    else:
        rd = lambda c, i: tri_ref[i, c]  # noqa: E731
    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx
    for j in range(TRI_CHUNK):
        i = row0 + j
        det = (
            dx * rd(C_CDET, i)
            + dy * rd(C_CDET + 1, i)
            + dz * rd(C_CDET + 2, i)
        )
        adet = jnp.abs(det)
        neg = det < 0.0
        un = (
            mx * rd(C_E1, i)
            + my * rd(C_E1 + 1, i)
            + mz * rd(C_E1 + 2, i)
        ) + (
            dx * rd(C_CU, i)
            + dy * rd(C_CU + 1, i)
            + dz * rd(C_CU + 2, i)
        )
        un = jnp.where(neg, -un, un)
        vn = -(
            (
                mx * rd(C_E0, i)
                + my * rd(C_E0 + 1, i)
                + mz * rd(C_E0 + 2, i)
            )
            + (
                dx * rd(C_CV, i)
                + dy * rd(C_CV + 1, i)
                + dz * rd(C_CV + 2, i)
            )
        )
        vn = jnp.where(neg, -vn, vn)
        tn = (
            ox * rd(C_N, i)
            + oy * rd(C_N + 1, i)
            + oz * rd(C_N + 2, i)
        ) - rd(C_ADOTN, i)
        tn = jnp.where(neg, -tn, tn)
        yield (
            (adet >= geo.TRI_DET_EPS)
            & (un >= 0.0)
            & (un <= adet)
            & (vn >= 0.0)
            & (un + vn <= adet)
            & (tn >= geo.TRI_T_EPS * adet)
            & (rd(C_VALID, i) > 0)
        )


# -- per-tile chunk shortlists (scalar-prefetch grids) -------------------------
#
# For scenes with many chunks (suzanne_hi: 242) the dominant cost of a
# culled chunk is no longer its sweep but its GRID STEP: ~1.5 us of
# window DMA + slab eval + vector->scalar sync per (ray-tile, chunk),
# ~186 ms/iteration at 2048^2 even if every chunk is skipped. A
# data-dependent window index_map (PrefetchScalarGridSpec — probed
# working on this Mosaic toolchain) dedupes that: an XLA pre-pass
# computes, per ray tile, a CONSERVATIVE shortlist of reachable chunks
# (interval arithmetic over the tile's live rays); the grid still has
# n_chunks steps, but steps past the shortlist revisit the SAME window
# (no DMA) and skip all work. A chunk the interval test prunes could
# never pass the per-lane slab test, so results are BIT-IDENTICAL to
# the non-shortlist kernels (tested); the per-lane culls remain as the
# exact second level for shortlisted chunks.

SHORTLIST_MIN_CHUNKS = 32  # below this the per-step overhead is small
# The (n_tiles, ceil(C/G)) i32 shortlist is an SMEM resident; this is
# the round-4 MEASURED rule for it alone (suzanne_hi's flat list at
# 2048^2 allocates 512 KB of the v5e's measured 1 MB and compiles;
# every production decision at <= 262,144 triangle lanes was benched
# under exactly this bound, so it stays authoritative there).
SHORTLIST_SMEM_BUDGET = 512 * 1024
# The full-resident (6, n_chunks) bounds table shares SMEM with the
# shortlist, and past the default chunk ceiling (RT_MAX_CHUNKED_TRIS
# raised past 262,144 lanes) it stops being negligible: at 991k tris
# it allocates 366 KB, and the round-4 search — which ignored it —
# picked a flat list whose 500 KB + 366 KB total = HTTP 500 at
# compile. The capacity search therefore ALSO requires
# shortlist + bounds <= this total. Within the default ceiling the
# bounds table is <= 98 KB, so the total bound never binds and every
# round-4 decision is preserved exactly; past it, the search degrades
# flat -> grouped -> plain grid instead of blowing the compile (the
# per-lane culls still apply either way). 640 KB sits just above the
# largest total measured good (616 KB: suzanne_xxhi G=2 at 256^2,
# 0.11 Mrays/s) and well below the measured failure (866 KB).
SHORTLIST_TOTAL_SMEM_BUDGET = 640 * 1024
# Grouped shortlists: when the flat (T, C) list does not fit, shortlist
# chunk GROUPS instead — one grid step fetches a (G*TRI_CHUNK)-row
# window and sweeps its G chunks in-kernel (each behind its own slab
# cull), so BOTH the SMEM footprint and the grid-step count shrink by
# G. The cap bounds the unrolled kernel body (G*TRI_CHUNK primitive
# tests) and the double-buffered window (2*G*TRI_CHUNK*TRI_COLS*4 =
# 196 KB at 16).
MAX_SHORTLIST_GROUP = 32
# Grouped sub-chunk sweeps UNROLL up to this group size and run as an
# in-kernel fori_loop (dynamic SMEM window offsets — same mechanism as
# the dynamic sl_ref/bounds_ref reads) beyond it: Mosaic allocates the
# unrolled body's live vector temporaries on the scoped-VMEM stack, and
# past ~2 chunks of unrolled rows that stack blows the 16 MB limit
# (measured: TRI_CHUNK=128 with shortlists needs 21.46 MB). The loop
# caps the stack at ONE chunk's live set whatever the group size.
GROUP_UNROLL_MAX = 4


def _smem_row_bytes(nbytes: int) -> int:
    """SMEM allocates 2D arrays at >= 512 B per row, rounded up to 512 B
    multiples (measured: a (3872, 6) f32 table allocates exactly
    3872 x 512 B). Capacity math must use this, not the tight size."""
    return max(-(-nbytes // 512) * 512, 512)


def _shortlist_group(n_chunks: int, n_tiles: int) -> int:
    """Chunks per shortlist entry: 0 = no shortlist (plain grid), 1 =
    flat per-chunk shortlist, G > 1 = grouped (grid step = G chunks).
    Smallest group whose (T, ceil(C/G)) i32 list fits the round-4
    shortlist budget AND whose list-plus-bounds-table total fits
    SHORTLIST_TOTAL_SMEM_BUDGET, both at ALLOCATED row sizes
    (_smem_row_bytes — every SMEM row pads to a 512 B multiple; the
    total bound only ever binds past the default chunk ceiling).
    RT_SHORTLIST_GROUP=G forces a size (testing/ablation);
    RT_DISABLE_GROUP_SHORTLIST=1 allows only the flat list."""
    if os.environ.get("RT_DISABLE_SHORTLIST") == "1":
        return 0
    if n_chunks <= SHORTLIST_MIN_CHUNKS:
        return 0
    forced = os.environ.get("RT_SHORTLIST_GROUP")
    if forced:
        return min(int(forced), MAX_SHORTLIST_GROUP)
    bounds_alloc = 6 * _smem_row_bytes(n_chunks * 4)
    g = 1
    while g <= MAX_SHORTLIST_GROUP:
        n_entries = -(-n_chunks // g)
        sl_alloc = n_tiles * _smem_row_bytes(n_entries * 4)
        if (sl_alloc <= SHORTLIST_SMEM_BUDGET
                and sl_alloc + bounds_alloc <= SHORTLIST_TOTAL_SMEM_BUDGET):
            return g
        if os.environ.get("RT_DISABLE_GROUP_SHORTLIST") == "1":
            return 0
        g *= 2
    return 0


def _use_shortlist(n_chunks: int, n_tiles: int) -> bool:
    """Whether the FLAT per-chunk shortlist applies (kept for tests;
    grouped shortlists report via _shortlist_group)."""
    return _shortlist_group(n_chunks, n_tiles) == 1


def group_chunk_bounds(bounds, group: int):
    """(ceil(C/group), 6) union AABBs over `group` consecutive chunks
    (Morton chunk clustering keeps neighbours spatially tight). The
    last entry pads with the final chunk's bounds — padded sub-chunk
    slots are skipped in-kernel by their jc < n_chunks guard, so the
    union only needs to cover real chunks."""
    n = bounds.shape[0]
    n_groups = -(-n // group)
    pad = n_groups * group - n
    if pad:
        bounds = jnp.concatenate(
            [bounds, jnp.broadcast_to(bounds[-1:], (pad, 6))], axis=0
        )
    b = bounds.reshape(n_groups, group, 6)
    return jnp.concatenate(
        [jnp.min(b[..., 0:3], axis=1), jnp.max(b[..., 3:6], axis=1)],
        axis=-1,
    )


def chunk_shortlist(bounds, ray_comps, mask, sub, front_to_back=False):
    """(shortlist (T, C) i32, count (T,) i32): per ray-tile reachable
    chunks, reachable-first, padded with the last reachable entry (or 0)
    so padded grid steps revisit an already-fetched window.

    front_to_back=True orders each tile's reachable chunks by a
    conservative lower bound on their slab ENTRY time (nearest first)
    instead of chunk-index order: early near-chunk sweeps tighten the
    running best-t / occlusion state, so the later chunks' best-t
    bounded culls and the whole-block `pl.when` sweep skips fire more
    often. The occlusion kernel OR-accumulates, so its result is
    bitwise order-independent and it always uses this; the closest
    kernel's winner WOULD be order-dependent on exact cross-chunk
    same-type t ties, so enabling it (RT_SHORTLIST_F2B=1, opt-in until
    the TPU measurement justifies a default flip) also compiles a
    lowest-index tie-break into the sweep (see _chunked_closest_kernel)
    that restores the chunk-index-order winner bitwise under ANY visit
    order; sphere-vs-other ties are order-free via the equal-t override
    regardless.

    Conservative per-axis reachability: lanes' origins/directions are
    boxed per tile (mask-excluded lanes are neutral); an axis constrains
    only when every live lane's direction component has one strict sign,
    and then the chunk must not lie entirely behind the origin box. Any
    lane whose slab test could pass keeps its chunk reachable.

    Non-finite lanes (NaN/inf components) cannot be boxed — NaN would
    poison the tile reductions and silently empty the shortlist for the
    tile's VALID lanes. They are excluded from the box, and any tile
    holding a non-finite live lane keeps ALL chunks: the shortlist only
    ever needs to be a superset of what the kernels sweep (the in-kernel
    per-lane slab culls re-check every listed chunk), so widening to
    everything preserves bit-identity with the non-shortlist grid."""
    ox, oy, oz, dx, dy, dz = ray_comps
    rows = ox.shape[0]
    n_tiles = rows // sub
    lane_finite = (
        jnp.isfinite(ox) & jnp.isfinite(oy) & jnp.isfinite(oz)
        & jnp.isfinite(dx) & jnp.isfinite(dy) & jnp.isfinite(dz)
    ).reshape(n_tiles, sub * LANES)

    def per_tile(v, neutral):
        t = v.reshape(n_tiles, sub * LANES)
        keep = lane_finite
        if mask is not None:
            keep = keep & (mask.reshape(n_tiles, sub * LANES) != 0)
        return jnp.where(keep, t, neutral)

    def mins(v):
        return jnp.min(per_tile(v, INF), axis=1)

    def maxs(v):
        return jnp.max(per_tile(v, -INF), axis=1)

    o_lo = jnp.stack([mins(ox), mins(oy), mins(oz)], axis=1)  # (T, 3)
    o_hi = jnp.stack([maxs(ox), maxs(oy), maxs(oz)], axis=1)
    d_lo = jnp.stack([mins(dx), mins(dy), mins(dz)], axis=1)
    d_hi = jnp.stack([maxs(dx), maxs(dy), maxs(dz)], axis=1)

    b_lo = bounds[:, 0:3]  # (C, 3)
    b_hi = bounds[:, 3:6]

    pos = d_lo > 0.0  # (T, 3): every live lane strictly positive
    neg = d_hi < 0.0
    # axis reachable (T, C, 3)
    reach_pos = b_hi[None, :, :] >= o_lo[:, None, :]
    reach_neg = b_lo[None, :, :] <= o_hi[:, None, :]
    # overlap with the origin box always reaches (t = 0)
    axis_ok = jnp.where(
        pos[:, None, :],
        reach_pos,
        jnp.where(neg[:, None, :], reach_neg, True),
    )
    # a tile with NO live lane reaches nothing (mins are +INF -> pos and
    # neg are both True-ish garbage; the explicit any() guards it)
    live = (
        jnp.ones((n_tiles, sub * LANES), bool)
        if mask is None
        else mask.reshape(n_tiles, sub * LANES) != 0
    )
    any_live = jnp.any(live, axis=1)
    any_nonfinite = jnp.any(live & ~lane_finite, axis=1)
    reachable = (
        (jnp.all(axis_ok, axis=2) | any_nonfinite[:, None])
        & any_live[:, None]
    )  # (T, C)

    n_chunks = bounds.shape[0]
    if front_to_back:
        # Per-axis lower bound on any live lane's slab entry: on a
        # single-sign axis the nearest lane starts at the origin box
        # face closest to the chunk and moves at the box's max speed;
        # mixed-sign axes (and box overlap) bound nothing (t >= 0).
        num_pos = jnp.maximum(b_lo[None, :, :] - o_hi[:, None, :], 0.0)
        num_neg = jnp.maximum(o_lo[:, None, :] - b_hi[None, :, :], 0.0)
        den_pos = jnp.maximum(d_hi, 1e-30)[:, None, :]
        den_neg = jnp.maximum(-d_lo, 1e-30)[:, None, :]
        t_axis = jnp.where(
            pos[:, None, :],
            num_pos / den_pos,
            jnp.where(neg[:, None, :], num_neg / den_neg, 0.0),
        )
        t_lb = jnp.max(t_axis, axis=2)  # (T, C)
        # Reachable chunks MUST sort strictly before unreachable ones
        # (only `count` entries are swept): clamp every reachable key
        # below the unreachable sentinel, NaN/inf included (degenerate
        # tiles — order is moot there, coverage is not).
        t_lb = jnp.where(
            jnp.isfinite(t_lb), jnp.minimum(t_lb, 1e37), 1e37
        )
        key = jnp.where(reachable, t_lb, INF)
        order = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)
    else:
        order = jnp.argsort(~reachable, axis=1, stable=True).astype(
            jnp.int32
        )
    count = jnp.sum(reachable, axis=1).astype(jnp.int32)
    # pad with the last reachable entry so j >= count revisits it
    last = jnp.take_along_axis(
        order, jnp.maximum(count - 1, 0)[:, None], axis=1
    )
    j_idx = jnp.broadcast_to(
        jnp.arange(n_chunks, dtype=jnp.int32)[None, :], order.shape
    )
    shortlist = jnp.where(j_idx < count[:, None], order, last)
    return shortlist, count


def _chunked_closest_kernel(
    n_sph, n_pln, n_tri_chunks, n_sph_chunks, use_live, use_sl,
    tie_break, group, win_t, *args
):
    """Grid (ray_blocks, chunks): out blocks are revisited across the
    chunk axis (innermost), accumulating the closest hit; the unrolled
    smalls run once at chunk 0. Primitive constants arrive as SMEM
    windows of TRI_CHUNK rows — a few KB regardless of scene size.
    Chunks [0, n_tri_chunks) are triangle windows; with n_sph_chunks > 0
    (_chunk_spheres scenes) the remaining chunks are sphere windows and
    n_sph is 0 (spheres left the chunk-0 unroll). Each chunk is
    guarded by a CONSERVATIVE per-lane cull: the chunk-AABB slab test,
    bounded by the running best hit (entry beyond best_t cannot win) and,
    with use_live, restricted to lanes whose path is live (a dead lane's
    sweep result is never consumed — see render/wavefront.py). The
    sweep only runs when ANY lane survives all three. With use_sl the
    step's chunk index comes from the prefetched per-tile shortlist
    (chunk_shortlist) and steps past the shortlist count are no-ops on
    an already-fetched window. With group > 1 (grouped shortlists —
    _shortlist_group) each shortlist entry is a GROUP index: the grid
    step's window carries `group` consecutive chunks and the kernel
    sweeps each behind its own slab cull, so both the shortlist SMEM
    footprint and the grid-step count shrink by `group` — the regime
    where the flat list cannot fit (suzanne_xhi's 3,872 chunks at
    2048^2 would need 7.9 MB).

    Winner order parity: the composed sweep considers spheres, then
    planes, then triangles, keeping the FIRST winner on exact-t ties
    (strict <). Sphere windows sweep after the chunk-0 planes and the
    triangle windows, so their update OVERRIDES equal-t non-sphere
    incumbents ((t == best_t) & (best_type > 0)) — restoring the
    composed priority exactly; sphere-vs-sphere ties keep the strict <
    (windows ascend in sphere index, matching the composed scan). The
    override is restricted to REAL incumbents (planes/triangles,
    type > 0): the miss sentinel (type -1, t = INF, a finite f32) must
    never be overridden by a sphere whose computed t lands exactly on
    INF — the composed sweep's strict < keeps the miss there.

    tie_break (static; compiled in only for front-to-back shortlists):
    chunk-index visit order makes strict < keep the LOWEST device index
    on exact cross-chunk same-type t ties — the composed winner. Under
    an out-of-order shortlist that invariant needs an explicit
    same-type lowest-index tie-break, which costs two extra VPU
    compares per candidate and is therefore compiled out of the
    default index-order path where it is semantically a no-op."""
    if use_sl:
        sl_ref, ct_ref = args[:2]
        args = args[2:]
    bounds_ref = args[0]
    small_refs = args[1:11]
    tri_ref = args[11]
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref = args[12:18]
    if use_live:
        live_ref = args[18]
        t_ref, type_ref, idx_ref = args[19:]
    else:
        live_ref = None
        t_ref, type_ref, idx_ref = args[18:]

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ti = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        # 18-ref layout expected by _sweep_body; zero triangles
        # processed, so the tri positions are dummies.
        refs = tuple(small_refs) + (tri_ref,) * 8
        best_t, best_type, best_idx = _sweep_body(
            n_sph, n_pln, 0, refs, ox, oy, oz, dx, dy, dz
        )
        t_ref[:] = best_t
        type_ref[:] = best_type
        idx_ref[:] = best_idx

    # Read AFTER the j==0 init (program order): t_ref holds the running
    # best (small prims + chunks < j), making the cull best-t-bounded.
    def tri_window_sweep(jc, row0):
        best_t = t_ref[:]
        best_type = type_ref[:]
        best_idx = idx_ref[:]
        base = jc * TRI_CHUNK

        for i, t, hit in tri_chunk_hits(
            tri_ref, ox, oy, oz, dx, dy, dz, row0=row0, transposed=win_t
        ):
            better = hit & (t < best_t)
            if tie_break:
                better = better | (
                    hit
                    & (t == best_t)
                    & (best_type == 2)
                    & (base + i < best_idx)
                )
            best_t = jnp.where(better, t, best_t)
            best_type = jnp.where(better, 2, best_type)
            best_idx = jnp.where(better, base + i, best_idx)

        t_ref[:] = best_t
        type_ref[:] = best_type
        idx_ref[:] = best_idx

    def sph_window_sweep(jc, row0):
        best_t = t_ref[:]
        best_type = type_ref[:]
        best_idx = idx_ref[:]
        base = (jc - n_tri_chunks) * TRI_CHUNK

        for i, t, hit in sph_chunk_hits(
            tri_ref, ox, oy, oz, dx, dy, dz, row0=row0, transposed=win_t
        ):
            # equal-t override of REAL non-sphere incumbents (> 0: the
            # type -1 miss sentinel is never overridden): see docstring
            better = hit & (
                (t < best_t) | ((t == best_t) & (best_type > 0))
            )
            if tie_break:
                better = better | (
                    hit
                    & (t == best_t)
                    & (best_type == 0)
                    & (base + i < best_idx)
                )
            best_t = jnp.where(better, t, best_t)
            best_type = jnp.where(better, 0, best_type)
            best_idx = jnp.where(better, base + i, best_idx)

        t_ref[:] = best_t
        type_ref[:] = best_type
        idx_ref[:] = best_idx

    def sweep_if_any_lane_survives(jc, row0):
        slab = chunk_slab_mask(
            bounds_ref, jc, ox, oy, oz, dx, dy, dz, t_max=t_ref[:]
        )
        if use_live:
            slab = slab & (live_ref[:] != 0)

        @pl.when(jnp.any(slab))
        def _():
            if n_sph_chunks == 0:
                tri_window_sweep(jc, row0)
            elif n_tri_chunks == 0:
                sph_window_sweep(jc, row0)
            else:
                pl.when(jc < n_tri_chunks)(
                    lambda: tri_window_sweep(jc, row0)
                )
                pl.when(jc >= n_tri_chunks)(
                    lambda: sph_window_sweep(jc, row0)
                )

    n_chunks = n_tri_chunks + n_sph_chunks

    def sweep_listed():
        if not use_sl:
            sweep_if_any_lane_survives(j, 0)
        elif group == 1:
            sweep_if_any_lane_survives(sl_ref[ti, j], 0)
        else:
            # grouped shortlist: this grid step's window carries `group`
            # consecutive chunks; sweep each behind its own slab cull
            # (and its own best-t bound — earlier sub-chunks tighten it).
            # Small groups unroll; large ones loop (GROUP_UNROLL_MAX —
            # the unrolled VMEM stack, not SMEM, is the binding limit).
            jg = sl_ref[ti, j]
            if group <= GROUP_UNROLL_MAX:
                for kk in range(group):
                    jc = jg * group + kk

                    @pl.when(jc < n_chunks)  # last group may pad past C
                    def _(jc=jc, kk=kk):
                        sweep_if_any_lane_survives(jc, kk * TRI_CHUNK)
            else:
                def group_body(kk, carry):
                    jc = jg * group + kk

                    @pl.when(jc < n_chunks)  # last group may pad past C
                    def _():
                        sweep_if_any_lane_survives(jc, kk * TRI_CHUNK)

                    return carry

                jax.lax.fori_loop(0, group, group_body, jnp.int32(0))

    if use_sl:
        # padded steps (j >= count) skip even the slab eval
        @pl.when(j < ct_ref[ti])
        def _():
            sweep_listed()
    else:
        sweep_listed()


def _chunked_any_kernel(
    n_sph, n_pln, n_tri_chunks, n_sph_chunks, use_mask, use_sl,
    group, win_t, *args
):
    """Occlusion-only variant of _chunked_closest_kernel: the same hit
    conditions and chunk-AABB cull, OR-accumulated into one i32 output —
    no winner tracking (shadow rays only need "anything blocks"), so
    sphere windows (n_sph_chunks > 0) need no tie handling and keep
    their division-carrying t test (the sphere predicate is cheap and
    stays bitwise the composed form; only the triangle windows use the
    division-free reformulation).
    With use_mask, an extra i32 lane-mask input tightens the cull: chunks
    only sweep when a MASKED lane's ray touches their bounds (the
    wavefront passes did_hit — miss lanes' occlusion is never consumed,
    and a masked lane whose ray misses the chunk AABB cannot be blocked
    by that chunk, so skipping is exact for every consumed lane). Lanes
    already occluded by an earlier chunk are likewise dropped from the
    cull (OR-accumulation cannot change their result), so the sweep
    early-exits once every consumed lane is blocked. use_sl: see
    _chunked_closest_kernel."""
    if use_sl:
        sl_ref, ct_ref = args[:2]
        args = args[2:]
    bounds_ref = args[0]
    small_refs = args[1:11]
    tri_ref = args[11]
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref = args[12:18]
    if use_mask:
        mask_ref = args[18]
        (occ_ref,) = args[19:]
    else:
        (occ_ref,) = args[18:]

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ti = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        refs = tuple(small_refs) + (tri_ref,) * 8
        best_t, _, _ = _sweep_body(
            n_sph, n_pln, 0, refs, ox, oy, oz, dx, dy, dz
        )
        occ_ref[:] = (best_t < INF).astype(jnp.int32)

    # Read AFTER the j==0 init (program order): lanes already occluded
    # cannot change, so they stop forcing chunk sweeps.
    def tri_window_sweep(row0):
        occ = occ_ref[:] != 0
        for hit in tri_chunk_occluded(
            tri_ref, ox, oy, oz, dx, dy, dz, row0=row0, transposed=win_t
        ):
            occ = occ | hit
        occ_ref[:] = occ.astype(jnp.int32)

    def sph_window_sweep(row0):
        occ = occ_ref[:] != 0
        for _, _, hit in sph_chunk_hits(
            tri_ref, ox, oy, oz, dx, dy, dz, row0=row0, transposed=win_t
        ):
            occ = occ | hit
        occ_ref[:] = occ.astype(jnp.int32)

    def sweep_if_any_lane_survives(jc, row0):
        slab = chunk_slab_mask(bounds_ref, jc, ox, oy, oz, dx, dy, dz)
        slab = slab & (occ_ref[:] == 0)
        if use_mask:
            slab = slab & (mask_ref[:] != 0)

        @pl.when(jnp.any(slab))
        def _():
            if n_sph_chunks == 0:
                tri_window_sweep(row0)
            elif n_tri_chunks == 0:
                sph_window_sweep(row0)
            else:
                pl.when(jc < n_tri_chunks)(
                    lambda: tri_window_sweep(row0)
                )
                pl.when(jc >= n_tri_chunks)(
                    lambda: sph_window_sweep(row0)
                )

    n_chunks = n_tri_chunks + n_sph_chunks

    def sweep_listed():
        if not use_sl:
            sweep_if_any_lane_survives(j, 0)
        elif group == 1:
            sweep_if_any_lane_survives(sl_ref[ti, j], 0)
        else:
            # grouped shortlist: see _chunked_closest_kernel; earlier
            # sub-chunks' occlusion writes feed later sub-chunks' culls
            jg = sl_ref[ti, j]
            if group <= GROUP_UNROLL_MAX:
                for kk in range(group):
                    jc = jg * group + kk

                    @pl.when(jc < n_chunks)  # last group may pad past C
                    def _(jc=jc, kk=kk):
                        sweep_if_any_lane_survives(jc, kk * TRI_CHUNK)
            else:
                def group_body(kk, carry):
                    jc = jg * group + kk

                    @pl.when(jc < n_chunks)  # last group may pad past C
                    def _():
                        sweep_if_any_lane_survives(jc, kk * TRI_CHUNK)

                    return carry

                jax.lax.fori_loop(0, group, group_body, jnp.int32(0))

    if use_sl:
        # padded steps (j >= count) skip even the slab eval
        @pl.when(j < ct_ref[ti])
        def _():
            sweep_listed()
    else:
        sweep_listed()


def chunk_bounds(scene):
    """(n_chunks, 6) per-chunk AABBs [min xyz, max xyz], slightly inflated
    for fp safety: min/max over the chunk's triangle vertices
    (a, a+e0, a+e1). Cheap jit-cached XLA. Padded (invalid) triangles are
    all-zero: their vertices collapse to the origin, which only ever
    ENLARGES a chunk's bounds (conservative)."""
    n_chunks = scene.tri_valid.shape[0] // TRI_CHUNK
    va = scene.tri_a
    vb = scene.tri_a + scene.tri_edge0
    vc = scene.tri_a + scene.tri_edge1
    pts = jnp.stack([va, vb, vc], axis=1).reshape(n_chunks, TRI_CHUNK * 3, 3)
    cmin = jnp.min(pts, axis=1)
    cmax = jnp.max(pts, axis=1)
    eps = (cmax - cmin) * 1.0e-5 + 1.0e-5
    return jnp.concatenate([cmin - eps, cmax + eps], axis=-1)


def chunked_closest_tiles(scene, ro_t, rd_t, live_mask=None, sublanes=None):
    """Chunked closest sweep directly on (rows, LANES) component-tile
    3-tuples. Returns (t, ptype, pidx) tiles. `sublanes` sets the ray
    block height (rows must divide by it). Optional live_mask (i32 tile)
    tightens the chunk cull to live lanes (dead lanes keep whatever the
    small-prim sweep produced — callers must not consume them)."""
    comps = ro_t + rd_t
    if live_mask is not None:
        comps = comps + (live_mask,)
    return _chunked_tiles_call(
        scene, comps, sublanes, any_only=False,
        use_mask=live_mask is not None,
    )


def chunked_any_tiles(scene, ro_t, rd_t, hit_mask=None, sublanes=None):
    """Chunked occlusion sweep on tiles -> i32 occlusion tile. Optional
    hit_mask (i32 tile) tightens the chunk cull to masked lanes."""
    comps = ro_t + rd_t
    if hit_mask is not None:
        comps = comps + (hit_mask,)
    (occ,) = _chunked_tiles_call(
        scene, comps, sublanes, any_only=True, use_mask=hit_mask is not None
    )
    return occ


def _chunked_tiles_call(
    scene, comps, sublanes=None, any_only=False, use_mask=False
):
    rows = comps[0].shape[0]
    sub = sublanes or SUBLANES
    if rows % sub:
        raise ValueError(
            f"rows ({rows}) must divide by sublanes ({sub}): a floored "
            "grid would leave output rows uninitialized"
        )
    grid_rays = rows // sub

    n_sph = scene.sph_radius.shape[0]
    n_pln = scene.pln_valid.shape[0]
    n_tri = scene.tri_valid.shape[0]
    n_tri_chunks = n_tri // TRI_CHUNK

    refs = _scene_refs(scene)
    small_refs = refs[:10]
    # ONE consolidated (rows, TRI_COLS) constant table -> one SMEM
    # window DMA per chunk step (8 separate windows cost ~6 us/step of
    # pure overhead — measured; see PERFORMANCE.md round 3). Sphere
    # windows (when _chunk_spheres) append to the same table; their
    # chunk kind is static from the chunk index.
    tri_const = tri_const_table(scene)
    if _chunk_spheres(scene):
        n_sph_chunks = n_sph // TRI_CHUNK
        sph_const = sphere_const_table(scene)
        sph_bounds = sphere_chunk_bounds(scene)
        if n_tri:
            tri_const = jnp.concatenate([tri_const, sph_const], axis=0)
            bounds = jnp.concatenate(
                [chunk_bounds(scene), sph_bounds], axis=0
            )
        else:
            tri_const = sph_const
            bounds = sph_bounds
        # Spheres left the chunk-0 unroll: a many-sphere constant table
        # must not ride SMEM, so the kernel gets 1-row dummies instead.
        small_refs = (
            jnp.zeros((1, 3), jnp.float32),
            jnp.zeros((1,), jnp.float32),
            jnp.zeros((1,), jnp.int32),
        ) + tuple(small_refs[3:])
        n_sph_kernel = 0
    else:
        n_sph_chunks = 0
        bounds = chunk_bounds(scene)
        n_sph_kernel = n_sph
    n_chunks = n_tri_chunks + n_sph_chunks

    # 0 = plain grid, 1 = flat per-chunk shortlist, >1 = grouped
    group = _shortlist_group(n_chunks, grid_rays)
    use_sl = group >= 1
    # occlusion shortlists are always front-to-back (OR order is free);
    # the closest kernel opts in and then ALSO compiles the same-type
    # lowest-index tie-break that keeps its winner order-independent.
    # RT_DISABLE_SHORTLIST_F2B=1 ablates the ordering everywhere (the
    # entry-bound pre-pass is XLA work per shortlist build; occlusion
    # results are order-free bitwise, so the ablation is safe).
    f2b = (
        use_sl
        and os.environ.get("RT_DISABLE_SHORTLIST_F2B") != "1"
        and (any_only or os.environ.get("RT_SHORTLIST_F2B") == "1")
    )

    # Window orientation: Mosaic's blocked-spec rule requires the LAST
    # block dim to be a 128-multiple or equal to the full array dim, so
    # the TRANSPOSED (TRI_COLS, win_rows) window — which is what makes
    # huge grouped windows affordable under the SMEM 512 B/row
    # allocation — is only legal when win_rows % 128 == 0 (grouped
    # G >= 2). Narrow windows (plain grid / flat shortlist, 64 columns)
    # keep the row-major (win_rows, TRI_COLS) orientation, whose
    # allocation is small anyway (64 rows x 512 B, double-buffered).
    win_rows = max(group, 1) * TRI_CHUNK
    win_t = win_rows % 128 == 0

    n_ray_ins = len(comps)
    kernel = (
        partial(
            _chunked_any_kernel, n_sph_kernel, n_pln,
            n_tri_chunks, n_sph_chunks, use_mask, use_sl,
            max(group, 1), win_t,
        )
        if any_only
        else partial(
            _chunked_closest_kernel, n_sph_kernel, n_pln,
            n_tri_chunks, n_sph_chunks, use_mask, use_sl,
            f2b, max(group, 1), win_t,
        )
    )
    if any_only:
        out_dtypes = (jnp.int32,)
    else:
        out_dtypes = (jnp.float32, jnp.int32, jnp.int32)
    out_shape = tuple(
        jax.ShapeDtypeStruct((rows, LANES), dt) for dt in out_dtypes
    )

    # The shortlist and plain grids share all spec plumbing; they differ
    # only in the index-map arity (prefetch operands are appended to the
    # map signature) and the two prefetched shortlist arguments. Grouped
    # shortlists (group > 1) list GROUP indices over union AABBs, fetch
    # (group*TRI_CHUNK)-COLUMN windows, and shrink the chunk grid axis
    # to ceil(C/group).
    # The full-resident bounds table ALWAYS enters TRANSPOSED —
    # (6, n_chunks) — because SMEM allocates 2D arrays at >= 512 B per
    # ROW (measured: the row-major (3872, 6) bounds table allocates
    # 1.9 MB and fails the 1 MB compile; transposed it costs its true
    # ~93 KB). The streamed window transposes only when win_t (above).
    if use_sl:
        n_entries = -(-n_chunks // group)
        mask_tile = comps[6] if use_mask else None
        sl_bounds = (
            bounds if group == 1 else group_chunk_bounds(bounds, group)
        )
        sl, ct = chunk_shortlist(
            sl_bounds, comps[:6], mask_tile, sub, front_to_back=f2b
        )
        # pad the window table to whole group windows (padded rows are
        # valid=0 AND guarded by the in-kernel jc < n_chunks pl.when)
        pad_rows = n_entries * win_rows - tri_const.shape[0]
        if pad_rows:
            tri_const = jnp.concatenate(
                [tri_const, jnp.zeros((pad_rows, TRI_COLS), jnp.float32)],
                axis=0,
            )
        if win_t:
            tri_index = lambda i, j, sl_, ct_: (0, sl_[i, j])  # noqa: E731
        else:
            tri_index = lambda i, j, sl_, ct_: (sl_[i, j], 0)  # noqa: E731
        ray_index = lambda i, j, sl_, ct_: (i, 0)  # noqa: E731
        grid_chunks = n_entries
    else:
        if win_t:
            tri_index = lambda i, j: (0, j)  # noqa: E731
        else:
            tri_index = lambda i, j: (j, 0)  # noqa: E731
        ray_index = lambda i, j: (i, 0)  # noqa: E731
        grid_chunks = n_chunks
    smem_full = pl.BlockSpec(memory_space=pltpu.SMEM)
    win_block = (TRI_COLS, win_rows) if win_t else (win_rows, TRI_COLS)
    tri_spec = pl.BlockSpec(
        win_block, tri_index, memory_space=pltpu.SMEM
    )
    ray_block = pl.BlockSpec(
        (sub, LANES), ray_index, memory_space=pltpu.VMEM
    )
    in_specs = [smem_full] * 11 + [tri_spec] + [ray_block] * n_ray_ins
    out_specs = tuple(ray_block for _ in out_dtypes)
    operands = (
        bounds.T, *small_refs,
        tri_const.T if win_t else tri_const, *comps,
    )

    if use_sl:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid_rays, grid_chunks),
            in_specs=in_specs,
            out_specs=out_specs,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=_interpret(),
        )(sl, ct, *operands)
    return pl.pallas_call(
        kernel,
        grid=(grid_rays, grid_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*operands)


def _chunked_call(scene, ro, rd, any_only: bool = False):
    n = ro.shape[0]
    comps, n_pad = _ray_tiles(ro, rd)
    res = _chunked_tiles_call(scene, tuple(comps), any_only=any_only)
    if any_only:
        return (res[0].reshape(-1)[:n] != 0,)
    t, ptype, pidx = res
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


def _ray_tiles(*arrays):
    """(N,3) arrays -> per-component (rows, LANES) tiles, padded to BLOCK."""
    n = arrays[0].shape[0]
    n_pad = -(-n // BLOCK) * BLOCK
    pad = n_pad - n
    comps = []
    for arr in arrays:
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


# -- fused trace: closest hit + attributes + NEE occlusion in ONE kernel ------
#
# The wavefront body needs, per iteration: the closest hit, its shading
# attributes (normal, material values), and the NEE shadow-ray occlusion
# from the hit point. Composed from separate ops those cost ~20 ns/lane —
# not in the sweeps (1.4 ns) but in the dozen small-table XLA gathers of
# the winner-attribute reconstruction and the extra kernel boundaries
# (measured by ablation at 2048^2). This kernel keeps everything in
# registers: sweep, winner constants via unrolled SMEM selects (replicating
# ops/intersect.py::_hit_attributes' select structure exactly, including
# what miss lanes see), material values via unrolled selects over the
# material table, then the shadow sweep from the reconstructed hit point.


def fused_supported(scene) -> bool:
    return (
        pallas_enabled()
        and scene.bvh is None
        and _total_prims(scene) <= MAX_UNROLL_PRIMS
    )


def chunked_trace_supported(scene) -> bool:
    """Big-triangle scenes take the chunked two-pass trace kernel
    (ops/pallas_wavefront.py) when the sweep's chunked grid applies."""
    return (
        pallas_enabled()
        and scene.bvh is None
        and _total_prims(scene) > MAX_UNROLL_PRIMS
        and _chunked_applicable(scene)
    )


def winner_rows(best_type, best_idx, ptype, table_rows, count, shape):
    """Row `best_idx` of each (n, 3) SMEM table where best_type matches
    `ptype`, else row 0 — the exact semantics of
    jnp.take(tbl, where(win, idx, 0)). Returns a list of 3-tuples."""
    sel_mask = best_type == ptype
    outs = []
    for tbl in table_rows:
        vx = jnp.broadcast_to(tbl[0, 0], shape)
        vy = jnp.broadcast_to(tbl[0, 1], shape)
        vz = jnp.broadcast_to(tbl[0, 2], shape)
        for i in range(1, count):
            sel = sel_mask & (best_idx == i)
            vx = jnp.where(sel, tbl[i, 0], vx)
            vy = jnp.where(sel, tbl[i, 1], vy)
            vz = jnp.where(sel, tbl[i, 2], vz)
        outs.append((vx, vy, vz))
    return outs


def winner_scalar(best_type, best_idx, ptype, tbl, count, shape):
    """Scalar-table variant of winner_rows."""
    sel_mask = best_type == ptype
    v = jnp.broadcast_to(tbl[0], shape)
    for i in range(1, count):
        v = jnp.where(sel_mask & (best_idx == i), tbl[i], v)
    return v


def sphere_normal_values(cx, cy, cz, s_r, ox, oy, oz, px, py, pz):
    """Sphere winner normal from taken center/radius VALUES
    (ops/geometry.py::sphere_normal): unit (p - c) with the inside flip."""
    snx = px - cx
    sny = py - cy
    snz = pz - cz
    inv_len = 1.0 / jnp.sqrt(snx * snx + sny * sny + snz * snz)
    snx, sny, snz = snx * inv_len, sny * inv_len, snz * inv_len
    lx, ly, lz = cx - ox, cy - oy, cz - oz
    inside = (lx * lx + ly * ly + lz * lz) - s_r * s_r < 1.0e-6
    snx = jnp.where(inside, -snx, snx)
    sny = jnp.where(inside, -sny, sny)
    snz = jnp.where(inside, -snz, snz)
    return snx, sny, snz


def plane_normal_values(pnx, pny, pnz, ox, oy, oz):
    """Plane winner normal from taken normal VALUES, with the reference's
    origin-position flip quirk (flips toward the side of the ORIGIN)."""
    flip = ox * pnx + oy * pny + oz * pnz < 0.0
    pnx = jnp.where(flip, -pnx, pnx)
    pny = jnp.where(flip, -pny, pny)
    pnz = jnp.where(flip, -pnz, pnz)
    return pnx, pny, pnz


def small_winner_normals(
    n_sph, n_pln, refs, sph_radius, sph_mat, pln_mat,
    best_type, best_idx, ox, oy, oz, px, py, pz,
):
    """Sphere + plane winner normals and material ids from the FULL SMEM
    tables. Returns ((snx,sny,snz), (pnx,pny,pnz), m_s, m_p)."""
    shape = ox.shape

    ((cx, cy, cz),) = winner_rows(
        best_type, best_idx, 0, [refs[0]], n_sph, shape
    )
    s_r = winner_scalar(best_type, best_idx, 0, sph_radius, n_sph, shape)
    sn = sphere_normal_values(cx, cy, cz, s_r, ox, oy, oz, px, py, pz)

    ((pnx, pny, pnz),) = winner_rows(
        best_type, best_idx, 1, [refs[3]], n_pln, shape
    )
    pn = plane_normal_values(pnx, pny, pnz, ox, oy, oz)

    m_s = winner_scalar(best_type, best_idx, 0, sph_mat, n_sph, shape)
    m_p = winner_scalar(best_type, best_idx, 1, pln_mat, n_pln, shape)
    return sn, pn, m_s, m_p


def tri_normal_recompute(a, e0, e1, tn0, tn1, tn2, ox, oy, oz, dx, dy, dz):
    """Naive Moller-Trumbore recompute on the winner triangle's constants
    (exactly ops/geometry.py::triangle_hit_attributes): barycentric blend
    of the baked normals + backface flip. a/e0/e1/tn*: 3-tuples of tiles."""
    rx, ry, rz = ox - a[0], oy - a[1], oz - a[2]
    p0x = ry * e0[2] - rz * e0[1]
    p0y = rz * e0[0] - rx * e0[2]
    p0z = rx * e0[1] - ry * e0[0]
    p1x = dy * e1[2] - dz * e1[1]
    p1y = dz * e1[0] - dx * e1[2]
    p1z = dx * e1[1] - dy * e1[0]
    det = e0[0] * p1x + e0[1] * p1y + e0[2] * p1z
    inv_det = 1.0 / jnp.where(jnp.abs(det) < geo.TRI_DET_EPS, 1.0, det)
    u = (rx * p1x + ry * p1y + rz * p1z) * inv_det
    v = (dx * p0x + dy * p0y + dz * p0z) * inv_det
    w0 = 1.0 - u - v
    tnx = w0 * tn0[0] + u * tn1[0] + v * tn2[0]
    tny = w0 * tn0[1] + u * tn1[1] + v * tn2[1]
    tnz = w0 * tn0[2] + u * tn1[2] + v * tn2[2]
    inv_tn = 1.0 / jnp.maximum(
        jnp.sqrt(tnx * tnx + tny * tny + tnz * tnz), 1.0e-20
    )
    tnx, tny, tnz = tnx * inv_tn, tny * inv_tn, tnz * inv_tn
    backface = tnx * dx + tny * dy + tnz * dz > 0.0
    tnx = jnp.where(backface, -tnx, tnx)
    tny = jnp.where(backface, -tny, tny)
    tnz = jnp.where(backface, -tnz, tnz)
    return tnx, tny, tnz


def material_values(
    n_mat, mat_color, mat_rough, mat_metal, mat_emis, mat_id, shape
):
    """Material row values via unrolled selects over the SMEM tables.
    Returns (cr, cg, cb, rough, metal, er, eg, eb)."""
    cr = jnp.broadcast_to(mat_color[0, 0], shape)
    cg = jnp.broadcast_to(mat_color[0, 1], shape)
    cb = jnp.broadcast_to(mat_color[0, 2], shape)
    rough = jnp.broadcast_to(mat_rough[0], shape)
    metal = jnp.broadcast_to(mat_metal[0], shape)
    er = jnp.broadcast_to(mat_emis[0, 0], shape)
    eg = jnp.broadcast_to(mat_emis[0, 1], shape)
    eb = jnp.broadcast_to(mat_emis[0, 2], shape)
    for m in range(1, n_mat):
        sel = mat_id == m
        cr = jnp.where(sel, mat_color[m, 0], cr)
        cg = jnp.where(sel, mat_color[m, 1], cg)
        cb = jnp.where(sel, mat_color[m, 2], cb)
        rough = jnp.where(sel, mat_rough[m], rough)
        metal = jnp.where(sel, mat_metal[m], metal)
        er = jnp.where(sel, mat_emis[m, 0], er)
        eg = jnp.where(sel, mat_emis[m, 1], eg)
        eb = jnp.where(sel, mat_emis[m, 2], eb)
    return cr, cg, cb, rough, metal, er, eg, eb


def trace_attrs_body(
    n_sph, n_pln, n_tri, n_mat, refs, extras,
    ox, oy, oz, dx, dy, dz, sx, sy, sz,
):
    """Shared in-kernel body: closest sweep + winner attributes +
    material values + NEE-occlusion shadow sweep. All inputs/outputs are
    (SUBLANES, LANES) tiles; returns a dict (see the end)."""
    (sph_radius, sph_mat, pln_mat, tri_mat,
     tri_a, tri_n0, tri_n1, tri_n2,
     mat_color, mat_rough, mat_metal, mat_emis) = extras

    tri_edge0 = refs[11]
    tri_edge1 = refs[12]

    best_t, best_type, best_idx = _sweep_body(
        n_sph, n_pln, n_tri, refs, ox, oy, oz, dx, dy, dz
    )
    did_hit = best_type >= 0
    t_safe = jnp.where(did_hit, best_t, 0.0)
    px = ox + dx * t_safe
    py = oy + dy * t_safe
    pz = oz + dz * t_safe

    (snx, sny, snz), (pnx, pny, pnz), m_s, m_p = small_winner_normals(
        n_sph, n_pln, refs, sph_radius, sph_mat, pln_mat,
        best_type, best_idx, ox, oy, oz, px, py, pz,
    )

    # --- triangle winner constants + normal recompute --------------------
    (a, e0, e1, tn0, tn1, tn2) = winner_rows(
        best_type, best_idx, 2,
        [tri_a, tri_edge0, tri_edge1, tri_n0, tri_n1, tri_n2],
        n_tri, ox.shape,
    )
    tnx, tny, tnz = tri_normal_recompute(
        a, e0, e1, tn0, tn1, tn2, ox, oy, oz, dx, dy, dz
    )

    is_s = best_type == 0
    is_p = best_type == 1
    nx = jnp.where(is_s, snx, jnp.where(is_p, pnx, tnx))
    ny = jnp.where(is_s, sny, jnp.where(is_p, pny, tny))
    nz = jnp.where(is_s, snz, jnp.where(is_p, pnz, tnz))

    # --- material id then values (unrolled over the material table) -----
    m_t = winner_scalar(best_type, best_idx, 2, tri_mat, n_tri, ox.shape)
    mat_id = jnp.where(is_s, m_s, jnp.where(is_p, m_p, m_t))
    cr, cg, cb, rough, metal, er, eg, eb = material_values(
        n_mat, mat_color, mat_rough, mat_metal, mat_emis, mat_id, ox.shape
    )

    # --- NEE occlusion: shadow sweep from the hit point ------------------
    occ_t, _, _ = _sweep_body(
        n_sph, n_pln, n_tri, refs,
        px, py, pz, sx, sy, sz,
    )

    return dict(
        did_hit=did_hit,
        px=px, py=py, pz=pz,
        nx=nx, ny=ny, nz=nz,
        cr=cr, cg=cg, cb=cb,
        rough=rough, metal=metal,
        er=er, eg=eg, eb=eb,
        occ=occ_t < INF,
    )


def _fused_kernel(n_sph, n_pln, n_tri, n_mat, *args):
    refs = args[:18]
    extras = args[18:30]
    (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
     sx_ref, sy_ref, sz_ref) = args[30:39]
    (hit_ref, px_ref, py_ref, pz_ref, nx_ref, ny_ref, nz_ref,
     cr_ref, cg_ref, cb_ref, rough_ref, metal_ref,
     er_ref, eg_ref, eb_ref, occ_ref) = args[39:]

    a = trace_attrs_body(
        n_sph, n_pln, n_tri, n_mat, refs, extras,
        ox_ref[:], oy_ref[:], oz_ref[:],
        dx_ref[:], dy_ref[:], dz_ref[:],
        sx_ref[:], sy_ref[:], sz_ref[:],
    )
    hit_ref[:] = a["did_hit"].astype(jnp.int32)
    px_ref[:] = a["px"]
    py_ref[:] = a["py"]
    pz_ref[:] = a["pz"]
    nx_ref[:] = a["nx"]
    ny_ref[:] = a["ny"]
    nz_ref[:] = a["nz"]
    cr_ref[:] = a["cr"]
    cg_ref[:] = a["cg"]
    cb_ref[:] = a["cb"]
    rough_ref[:] = a["rough"]
    metal_ref[:] = a["metal"]
    er_ref[:] = a["er"]
    eg_ref[:] = a["eg"]
    eb_ref[:] = a["eb"]
    occ_ref[:] = a["occ"].astype(jnp.int32)


def fused_trace(scene, ro, rd, nee_dir):
    """ONE kernel: closest hit + attributes + materials + NEE occlusion.

    Returns (did_hit (N,) bool, point (N,3), normal (N,3), color (N,3),
    roughness (N,), metallic (N,), emission (N,3), occluded (N,) bool) —
    the same values the composed path (ops/intersect.py::closest_hit +
    material takes + any_hit) produces for hit lanes."""
    n = ro.shape[0]
    comps, n_pad = _ray_tiles(ro, rd, nee_dir)
    rows = n_pad // LANES
    grid = rows // SUBLANES

    n_sph = scene.sph_radius.shape[0]
    n_pln = scene.pln_valid.shape[0]
    n_tri = scene.tri_valid.shape[0]
    n_mat = scene.mat_roughness.shape[0]

    extras = (
        scene.sph_radius,
        scene.sph_material,
        scene.pln_material,
        scene.tri_material,
        scene.tri_a,
        scene.tri_n0,
        scene.tri_n1,
        scene.tri_n2,
        scene.mat_color,
        scene.mat_roughness,
        scene.mat_metallic,
        scene.mat_emission,
    )

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ray_block = pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_dtypes = (
        [jnp.int32]
        + [jnp.float32] * 14
        + [jnp.int32]
    )
    outs = tuple(
        jax.ShapeDtypeStruct((rows, LANES), dt) for dt in out_dtypes
    )

    res = pl.pallas_call(
        partial(_fused_kernel, n_sph, n_pln, n_tri, n_mat),
        grid=(grid,),
        in_specs=[smem] * 30 + [ray_block] * 9,
        out_specs=tuple(ray_block for _ in out_dtypes),
        out_shape=outs,
        interpret=_interpret(),
    )(*_scene_refs(scene), *extras, *comps)
    flat = [r.reshape(-1)[:n] for r in res]
    (hit, px, py, pz, nx, ny, nz, cr, cg, cb,
     rough, metal, er, eg, eb, occ) = flat
    point = jnp.stack([px, py, pz], axis=-1)
    normal = jnp.stack([nx, ny, nz], axis=-1)
    color = jnp.stack([cr, cg, cb], axis=-1)
    emission = jnp.stack([er, eg, eb], axis=-1)
    return (
        hit != 0, point, normal, color, rough, metal, emission, occ != 0
    )


def any_sweep(scene, ro, rd):
    """(N,) bool occlusion."""
    if _use_chunked(scene):
        (occ,) = _chunked_call(scene, ro, rd, any_only=True)
        return occ
    (hit,) = _call(_any_kernel, (jnp.int32,), scene, ro, rd)
    return hit != 0
