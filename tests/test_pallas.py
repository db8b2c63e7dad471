"""Pallas intersection kernels vs the XLA sweep (interpreter mode on CPU)."""

import os

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("RT_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("RT_PALLAS_LOOP", "1")
    monkeypatch.delenv("RT_DISABLE_PALLAS", raising=False)


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-8, 8, size=(n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd


def test_closest_sweep_matches_xla(house_scene):
    from rsoderh_raytracing_tpu.ops import intersect, pallas_intersect
    from rsoderh_raytracing_tpu.scene.device import build_device_scene

    ds = build_device_scene(house_scene)
    assert pallas_intersect.sweep_supported(ds)
    ro, rd = _random_rays(700)

    t_p, ty_p, ix_p = map(
        np.asarray, pallas_intersect.closest_sweep(ds, ro, rd)
    )
    t_x, ty_x, ix_x = map(np.asarray, intersect._sweep_xla(ds, ro, rd))

    np.testing.assert_array_equal(ty_p, ty_x)
    hit = ty_x >= 0
    np.testing.assert_array_equal(ix_p[hit], ix_x[hit])
    np.testing.assert_allclose(t_p[hit], t_x[hit], rtol=1e-5)


def test_any_sweep_matches_xla(house_scene):
    from rsoderh_raytracing_tpu.ops import intersect, pallas_intersect
    from rsoderh_raytracing_tpu.scene.device import build_device_scene

    ds = build_device_scene(house_scene)
    ro, rd = _random_rays(700, seed=1)
    a = np.asarray(pallas_intersect.any_sweep(ds, ro, rd))
    t_x, ty_x, _ = map(np.asarray, intersect._sweep_xla(ds, ro, rd))
    np.testing.assert_array_equal(a, ty_x >= 0)


def test_non_multiple_block_padding(default_scene):
    """Ray counts that don't divide the block size are padded+sliced."""
    from rsoderh_raytracing_tpu.ops import intersect, pallas_intersect
    from rsoderh_raytracing_tpu.scene.device import build_device_scene

    ds = build_device_scene(default_scene)
    ro, rd = _random_rays(333, seed=2)
    t_p, ty_p, _ = map(np.asarray, pallas_intersect.closest_sweep(ds, ro, rd))
    t_x, ty_x, _ = map(np.asarray, intersect._sweep_xla(ds, ro, rd))
    assert t_p.shape == (333,)
    np.testing.assert_array_equal(ty_p, ty_x)


def test_fused_trace_matches_composed():
    """fused_trace (one kernel: closest hit + attributes + materials +
    NEE occlusion) returns the composed path's values. Small synthetic
    scene: the interpreter pays per-op overhead on the unrolled kernel,
    so the full house scene is validated on hardware instead."""
    import jax.numpy as jnp

    from rsoderh_raytracing_tpu.ops import intersect, pallas_intersect
    from rsoderh_raytracing_tpu.scene.camera import Camera
    from rsoderh_raytracing_tpu.scene.device import build_device_scene
    from rsoderh_raytracing_tpu.scene.types import (
        Material,
        PackedMeshes,
        Plane,
        Scene,
        Sphere,
    )

    scene = Scene(
        materials=[
            Material((0.8, 0.2, 0.2), 0.4, 0.0, (0, 0, 0)),
            Material((0.2, 0.8, 0.2), 0.9, 1.0, (0.5, 0, 0)),
        ],
        spheres=[
            Sphere(pos=(0.0, 0.0, -3.0), radius=1.0, material_id=0),
            Sphere(pos=(2.0, 1.0, -4.0), radius=0.7, material_id=1),
        ],
        planes=[
            Plane(
                pos=(-4.0, -1.5, -8.0),
                right=(8.0, 0.0, 0.0),
                forward=(0.0, 0.0, 8.0),
                material_id=1,
            )
        ],
        meshes=PackedMeshes.empty(),
        camera=Camera(pos=[0, 0, 0], yaw=0, pitch=0, fov_y=1.0),
    )
    ds = build_device_scene(scene, pad_to=1)
    assert pallas_intersect.fused_supported(ds)

    ro, rd = _random_rays(700, seed=11)
    sd = np.random.default_rng(12).normal(size=(700, 3)).astype(np.float32)
    sd /= np.linalg.norm(sd, axis=-1, keepdims=True)

    hit_f, pt_f, n_f, col_f, rg_f, mt_f, em_f, occ_f = map(
        np.asarray, pallas_intersect.fused_trace(ds, ro, rd, sd)
    )

    hit = intersect.closest_hit(ds, ro, rd)
    occ = intersect.any_hit(ds, hit.point, sd)
    np.testing.assert_array_equal(hit_f, np.asarray(hit.did_hit))
    np.testing.assert_array_equal(occ_f, np.asarray(occ))
    # interpreter-mode XLA fuses the two graphs differently (fma
    # contraction), so points can differ by ulps; on TPU hardware the
    # same comparison is exactly equal (validated).
    np.testing.assert_allclose(
        pt_f, np.asarray(hit.point), rtol=1e-5, atol=1e-5
    )
    mask = hit_f.astype(bool)
    np.testing.assert_allclose(
        n_f[mask], np.asarray(hit.normal)[mask], atol=1e-6
    )
    np.testing.assert_array_equal(
        col_f, np.asarray(jnp.take(ds.mat_color, hit.material_id, axis=0))
    )
    np.testing.assert_array_equal(
        rg_f, np.asarray(jnp.take(ds.mat_roughness, hit.material_id, axis=0))
    )
    np.testing.assert_array_equal(
        mt_f, np.asarray(jnp.take(ds.mat_metallic, hit.material_id, axis=0))
    )
    np.testing.assert_array_equal(
        em_f, np.asarray(jnp.take(ds.mat_emission, hit.material_id, axis=0))
    )


def test_budget_gates():
    """Gate selection across the size budgets: medium sphere clouds ride
    sphere chunk windows (round 3 — previously the loop variant), plane
    clouds past the unroll budget use the opt-in fori_loop variant, and
    plane clouds beyond MAX_LOOP_PRIMS fall back to XLA (planes are
    never chunked)."""
    from rsoderh_raytracing_tpu.ops import pallas_intersect
    from rsoderh_raytracing_tpu.scene.camera import Camera
    from rsoderh_raytracing_tpu.scene.device import build_device_scene
    from rsoderh_raytracing_tpu.scene.types import (
        Material,
        PackedMeshes,
        Plane,
        Scene,
        Sphere,
    )

    rng = np.random.default_rng(3)

    def cloud_scene(n_spheres=0, n_planes=0):
        return build_device_scene(
            Scene(
                materials=[Material((1, 1, 1), 1, 0, (0, 0, 0))],
                spheres=[
                    Sphere(
                        pos=rng.uniform(-10, 10, 3), radius=0.5, material_id=0
                    )
                    for _ in range(n_spheres)
                ],
                planes=[
                    Plane(
                        pos=rng.uniform(-10, 10, 3),
                        forward=rng.normal(size=3),
                        right=rng.normal(size=3),
                        material_id=0,
                    )
                    for _ in range(n_planes)
                ],
                meshes=PackedMeshes.empty(),
                camera=Camera(pos=[0, 0, 0], yaw=0, pitch=0, fov_y=1.0),
            )
        )

    medium = cloud_scene(n_spheres=pallas_intersect.MAX_UNROLL_PRIMS + 8)
    assert pallas_intersect.sweep_supported(medium)
    assert pallas_intersect._use_chunked(medium)
    assert not pallas_intersect._use_loop(medium)

    plane_cloud = cloud_scene(n_planes=pallas_intersect.MAX_UNROLL_PRIMS + 8)
    assert pallas_intersect.sweep_supported(plane_cloud)
    assert pallas_intersect._use_loop(plane_cloud)

    huge_planes = cloud_scene(n_planes=pallas_intersect.MAX_LOOP_PRIMS + 8)
    assert not pallas_intersect.sweep_supported(huge_planes)


def test_chunked_variant_matches_xla_suzanne(assets_dir):
    """The chunked-grid variant (scenes beyond the unroll budget)
    matches the XLA sweep on suzanne (968 triangles)."""
    import os as _os

    from rsoderh_raytracing_tpu import load_scene
    from rsoderh_raytracing_tpu.ops import intersect, pallas_intersect
    from rsoderh_raytracing_tpu.scene.device import build_device_scene

    scene = load_scene(_os.path.join(assets_dir, "scenes", "suzanne.toml"))
    ds = build_device_scene(scene)
    assert pallas_intersect._use_chunked(ds)
    assert pallas_intersect.sweep_supported(ds)

    ro, rd = _random_rays(300, seed=5)
    ro[:, 2] += 3.0  # in front of the mesh
    t_p, ty_p, ix_p = map(
        np.asarray, pallas_intersect.closest_sweep(ds, ro, rd)
    )
    t_x, ty_x, ix_x = map(np.asarray, intersect._sweep_xla(ds, ro, rd))
    np.testing.assert_array_equal(ty_p, ty_x)
    hit = ty_x >= 0
    assert hit.sum() > 20
    np.testing.assert_array_equal(ix_p[hit], ix_x[hit])
    np.testing.assert_allclose(t_p[hit], t_x[hit], rtol=1e-5)


def test_loop_variant_matches_xla_plane_cloud():
    """The fori_loop variant (opt-in; used when chunking doesn't apply)
    matches the XLA sweep on a >unroll-budget PLANE cloud — planes are
    the one primitive the chunked grid never streams (sphere clouds now
    ride sphere windows, see test_sphere_chunked_matches_xla)."""
    from rsoderh_raytracing_tpu.ops import intersect, pallas_intersect
    from rsoderh_raytracing_tpu.scene.camera import Camera
    from rsoderh_raytracing_tpu.scene.device import build_device_scene
    from rsoderh_raytracing_tpu.scene.types import (
        Material,
        PackedMeshes,
        Plane,
        Scene,
        Sphere,
    )

    rng = np.random.default_rng(7)

    def rand_plane():
        f = rng.normal(size=3)
        r = rng.normal(size=3)
        return Plane(
            pos=rng.uniform(-10, 10, 3), forward=f, right=r, material_id=0
        )

    scene = Scene(
        materials=[Material((1, 1, 1), 1, 0, (0, 0, 0))],
        spheres=[
            Sphere(pos=rng.uniform(-10, 10, 3), radius=0.6, material_id=0)
            for _ in range(16)
        ],
        planes=[rand_plane() for _ in range(250)],
        meshes=PackedMeshes.empty(),
        camera=Camera(pos=[0, 0, 0], yaw=0, pitch=0, fov_y=1.0),
    )
    ds = build_device_scene(scene)
    assert pallas_intersect._use_loop(ds)  # RT_PALLAS_LOOP set by fixture

    ro, rd = _random_rays(300, seed=8)
    t_p, ty_p, ix_p = map(
        np.asarray, pallas_intersect.closest_sweep(ds, ro, rd)
    )
    t_x, ty_x, ix_x = map(np.asarray, intersect._sweep_xla(ds, ro, rd))
    np.testing.assert_array_equal(ty_p, ty_x)
    hit = ty_x >= 0
    assert hit.sum() > 20
    np.testing.assert_array_equal(ix_p[hit], ix_x[hit])
    np.testing.assert_allclose(t_p[hit], t_x[hit], rtol=1e-4, atol=1e-4)


def test_chunked_any_matches_xla_suzanne(assets_dir):
    """The occlusion-only chunked kernel (shadow rays) matches the XLA
    sweep's hit mask on suzanne."""
    import os as _os

    from rsoderh_raytracing_tpu import load_scene
    from rsoderh_raytracing_tpu.ops import intersect, pallas_intersect
    from rsoderh_raytracing_tpu.scene.device import build_device_scene

    scene = load_scene(_os.path.join(assets_dir, "scenes", "suzanne.toml"))
    ds = build_device_scene(scene)
    assert pallas_intersect._use_chunked(ds)
    ro, rd = _random_rays(300, seed=6)
    ro[:, 2] += 3.0
    a = np.asarray(pallas_intersect.any_sweep(ds, ro, rd))
    t_x, ty_x, _ = map(np.asarray, intersect._sweep_xla(ds, ro, rd))
    assert a.dtype == bool and a.shape == (300,)
    np.testing.assert_array_equal(a, ty_x >= 0)
    assert a.sum() > 20


def test_divfree_occlusion_predicates_adversarial():
    """tri_chunk_occluded (division-free occlusion) agrees with
    tri_chunk_hits' quotient predicates on adversarial triangles: dets
    straddling TRI_DET_EPS with both signs, u/v near 0 and 1, t near
    TRI_T_EPS, invalid (all-zero) padded rows, and axis-parallel rays.
    The documented contract is: identical predicates EXCEPT where a
    rounded quotient lands exactly on a comparison boundary. The test
    encodes that contract directly — cases whose float64 u/v/t/det sit
    within a narrow relative band of any comparison threshold are
    exempt; everything else must agree exactly."""
    import numpy as np

    from rsoderh_raytracing_tpu.ops import geometry as geo
    from rsoderh_raytracing_tpu.ops.pallas_intersect import (
        TRI_CHUNK,
        tri_chunk_hits,
        tri_chunk_occluded,
    )

    rng = np.random.default_rng(11)
    n_rays = 256

    # TRI_CHUNK triangles: mostly random, plus engineered degenerates.
    a = rng.normal(size=(TRI_CHUNK, 3)).astype(np.float32)
    e0 = rng.normal(size=(TRI_CHUNK, 3)).astype(np.float32)
    e1 = rng.normal(size=(TRI_CHUNK, 3)).astype(np.float32)
    # rows 0..7: near-degenerate (tiny area -> det magnitudes near eps)
    e1[:8] = e0[:8] * (1.0 + rng.normal(size=(8, 3)).astype(np.float32) * 1e-4)
    # rows 8..11: exactly degenerate (colinear edges -> det == 0)
    e1[8:12] = e0[8:12] * 2.0
    valid = np.ones((TRI_CHUNK,), np.int32)
    valid[12:16] = 0  # padded rows: constants zeroed below
    a[12:16] = 0.0
    e0[12:16] = 0.0
    e1[12:16] = 0.0

    cdet = np.cross(e1, e0).astype(np.float32)
    cu = np.cross(a, e1).astype(np.float32)
    cv = np.cross(a, e0).astype(np.float32)
    n = np.cross(e0, e1).astype(np.float32)
    adotn = (a * n).sum(-1).astype(np.float32)

    # consolidated TRANSPOSED (TRI_COLS, TRI_CHUNK) window — the
    # pallas_intersect layout (SMEM rows pad to 512 B, so constant
    # tables keep TRI_COLS rows and grow along the lane axis)
    tri_refs = np.concatenate(
        [
            cdet, e0, e1, cu, cv, n,
            adotn.reshape(TRI_CHUNK, 1),
            valid.astype(np.float32).reshape(TRI_CHUNK, 1),
        ],
        axis=1,
    ).astype(np.float32).T.copy()

    # Rays: aimed near triangle interiors/edges (barycentric samples
    # around the [0,1] boundaries) plus axis-parallel directions.
    bu = rng.choice(
        [0.0, 1.0, 0.5, -1e-4, 1e-4, 0.999, 1.001], size=(n_rays, 1)
    ) + rng.normal(size=(n_rays, 1)) * 1e-3
    bv = rng.choice(
        [0.0, 0.5, -1e-4, 1e-4, 0.999], size=(n_rays, 1)
    ) + rng.normal(size=(n_rays, 1)) * 1e-3
    tri_pick = rng.integers(0, TRI_CHUNK, size=n_rays)
    target = (
        a[tri_pick] + bu * e0[tri_pick] + bv * e1[tri_pick]
    ).astype(np.float32)
    o = rng.normal(size=(n_rays, 3)).astype(np.float32) * 3.0
    o[:32] = target[:32] - np.array([0.0, 0.0, 1.0], np.float32)  # t near 1
    d = (target - o).astype(np.float32)
    d[-16:, 0] = 0.0  # axis-parallel families
    d[-8:, 1] = 0.0
    norm = np.linalg.norm(d, axis=-1, keepdims=True)
    d = (d / np.maximum(norm, 1e-9)).astype(np.float32)
    # a block of near-surface origins: t near TRI_T_EPS
    o[32:64] = (
        target[32:64]
        - d[32:64] * np.float32(geo.TRI_T_EPS)
        * rng.choice([0.5, 0.99, 1.01, 2.0], size=(32, 1)).astype(np.float32)
    )

    ox, oy, oz = (np.ascontiguousarray(o[:, k]) for k in range(3))
    dx, dy, dz = (np.ascontiguousarray(d[:, k]) for k in range(3))

    ref_hits = np.zeros((TRI_CHUNK, n_rays), bool)
    for i, _t, hit in tri_chunk_hits(tri_refs, ox, oy, oz, dx, dy, dz):
        ref_hits[i] = np.asarray(hit)
    df_hits = np.zeros((TRI_CHUNK, n_rays), bool)
    for i, hit in enumerate(
        tri_chunk_occluded(tri_refs, ox, oy, oz, dx, dy, dz)
    ):
        df_hits[i] = np.asarray(hit)

    assert ref_hits.any() and not ref_hits.all()

    # Boundary-band exemption in float64: a case is exempt when any
    # compared quantity sits within a narrow relative band of its
    # threshold — there the two f32 rounding routes may legally disagree.
    o64, d64 = o.astype(np.float64), d.astype(np.float64)
    m64 = np.cross(o64, d64)  # (n_rays, 3) moment vector
    det64 = d64 @ cdet.astype(np.float64).T  # (n_rays, T)
    safe = np.where(np.abs(det64) < 1e-300, 1.0, det64)
    u64 = (m64 @ e1.astype(np.float64).T + d64 @ cu.astype(np.float64).T) / safe
    v64 = -(m64 @ e0.astype(np.float64).T + d64 @ cv.astype(np.float64).T) / safe
    t64 = (o64 @ n.astype(np.float64).T - adotn.astype(np.float64)) / safe
    band = 1e-5

    def near(x, thresh, scale):
        return np.abs(x - thresh) <= band * scale

    boundary = (
        near(np.abs(det64), geo.TRI_DET_EPS, 1.0)
        | near(u64, 0.0, 1.0)
        | near(u64, 1.0, 1.0)
        | near(v64, 0.0, 1.0)
        | near(u64 + v64, 1.0, 1.0)
        | near(t64, geo.TRI_T_EPS, np.maximum(geo.TRI_T_EPS, np.abs(t64)))
    ).T  # -> (T, n_rays)

    clear = ~boundary
    assert clear.mean() > 0.5  # the band must not swallow the test
    np.testing.assert_array_equal(df_hits[clear], ref_hits[clear])
    # and even on-boundary, disagreements must be rare
    assert (df_hits != ref_hits).mean() < 1e-3


def test_boundary_scene_keeps_a_pallas_path():
    """A scene just past the unroll budget (180 tris + a sphere + a
    plane) must land on the chunked path, not silently fall back to the
    composed XLA sweep: triangle padding accounts for TOTAL lanes."""
    import numpy as np

    from rsoderh_raytracing_tpu.ops import pallas_intersect
    from rsoderh_raytracing_tpu.scene.camera import Camera
    from rsoderh_raytracing_tpu.scene.device import build_device_scene
    from rsoderh_raytracing_tpu.scene.types import (
        Material,
        PackedMeshes,
        Plane,
        Scene,
        Sphere,
    )

    rng_ = np.random.default_rng(3)
    n_tri = 180
    vertices = rng_.normal(size=(n_tri * 3, 3)).astype(np.float32)
    normals = np.array([[0.0, 0.0, 1.0]], np.float32)
    tris = np.array(
        [[3 * i, 3 * i + 1, 3 * i + 2, 0, 0, 0, 0] for i in range(n_tri)],
        np.int32,
    )
    scene = Scene(
        materials=[Material((0.5, 0.5, 0.5), 0.5, 0.0, (0, 0, 0))],
        spheres=[Sphere(pos=(0, 0, -2), radius=0.5, material_id=0)],
        planes=[
            Plane(
                pos=(-2, -1, -4), right=(4, 0, 0), forward=(0, 0, 4),
                material_id=0,
            )
        ],
        meshes=PackedMeshes(
            vertices=vertices, normals=normals, triangles=tris
        ),
        camera=Camera(pos=[0, 0, 1], yaw=0, pitch=0, fov_y=1.2),
    )
    ds = build_device_scene(scene, pad_to=8)
    # 180 tris pad to 192 (TRI_CHUNK multiples) because the sphere and
    # plane lanes push the total past MAX_UNROLL_PRIMS.
    assert ds.tri_valid.shape[0] % pallas_intersect.TRI_CHUNK == 0
    assert pallas_intersect._chunked_applicable(ds)
    # interpret mode is on via the autouse fixture
    assert pallas_intersect.sweep_supported(ds)
    assert pallas_intersect.chunked_trace_supported(ds)


def test_chunked_culls_preserve_results(assets_dir):
    """The per-lane chunk culls (best-t bound, live mask, occlusion
    early-exit) are exact: live lanes' closest results and masked lanes'
    occlusion results are bitwise identical with and without the masks,
    under adversarial rays — origins inside the mesh bounds, exactly
    axis-parallel directions (slab 0*inf NaN handling), and rays whose
    first hit is the near plane (tiny best_t bounds)."""
    import os as _os

    import jax.numpy as jnp

    from rsoderh_raytracing_tpu import load_scene
    from rsoderh_raytracing_tpu.ops import intersect, pallas_intersect as pint
    from rsoderh_raytracing_tpu.scene.device import build_device_scene

    scene = load_scene(_os.path.join(assets_dir, "scenes", "suzanne.toml"))
    ds = build_device_scene(scene)
    assert pint._use_chunked(ds)

    rng = np.random.default_rng(11)
    n = 512
    ro = rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    # axis-parallel rays: exact zero components
    rd[:48] = 0.0
    rd[0:16, 0] = 1.0
    rd[16:32, 1] = -1.0
    rd[32:48, 2] = 1.0
    # rays from below aimed up through the ground plane (near first hit)
    ro[48:96] = np.array([0.0, -3.0, 0.0], np.float32)
    rd[48:96] = np.array([0.0, 1.0, 0.0], np.float32)
    # DISTANT origins (hit t ~ 1e3): t-proportional fp error dwarfs the
    # chunk AABBs' spatial inflation there, so the best-t cull must take
    # distance-scaled slack (chunk_slab_mask) to stay exact.
    far = rng.uniform(500.0, 2000.0, size=(48, 1)).astype(np.float32)
    fdir = rng.normal(size=(48, 3)).astype(np.float32)
    fdir /= np.linalg.norm(fdir, axis=-1, keepdims=True)
    aim = rng.uniform(-1.0, 1.0, size=(48, 3)).astype(np.float32)
    ro[96:144] = fdir * far
    rd[96:144] = aim - ro[96:144]
    rd[96:144] /= np.linalg.norm(rd[96:144], axis=-1, keepdims=True)
    live = rng.integers(0, 2, size=n).astype(np.int32)

    n_pad = -(-n // pint.BLOCK) * pint.BLOCK

    def tile1(v, fill):
        c = np.concatenate(
            [v, np.full((n_pad - n,), fill, v.dtype)]
        )
        return jnp.asarray(c.reshape(n_pad // pint.LANES, pint.LANES))

    ro_t = tuple(tile1(ro[:, k], np.float32(1.0)) for k in range(3))
    rd_t = tuple(tile1(rd[:, k], np.float32(1.0)) for k in range(3))
    live_t = tile1(live, np.int32(0))

    # closest: unmasked vs live-masked, bitwise on live lanes
    t0, ty0, ix0 = (
        np.asarray(x).reshape(-1)[:n]
        for x in pint.chunked_closest_tiles(ds, ro_t, rd_t)
    )
    t1, ty1, ix1 = (
        np.asarray(x).reshape(-1)[:n]
        for x in pint.chunked_closest_tiles(ds, ro_t, rd_t, live_mask=live_t)
    )
    m = live != 0
    np.testing.assert_array_equal(ty1[m], ty0[m])
    np.testing.assert_array_equal(ix1[m], ix0[m])
    np.testing.assert_array_equal(t1[m], t0[m])

    # closest (with its always-on best-t cull) vs the XLA dense sweep
    t_x, ty_x, ix_x = map(np.asarray, intersect._sweep_xla(ds, ro, rd))
    np.testing.assert_array_equal(ty0, ty_x)
    hit = ty_x >= 0
    assert hit.sum() > 50 and (ty_x == 2).sum() > 10
    np.testing.assert_array_equal(ix0[hit], ix_x[hit])
    np.testing.assert_allclose(t0[hit], t_x[hit], rtol=1e-5)

    # occlusion: unmasked vs masked (+ early-exit), bitwise on masked lanes
    (occ0,) = (
        np.asarray(x).reshape(-1)[:n]
        for x in [pint.chunked_any_tiles(ds, ro_t, rd_t)]
    )
    (occ1,) = (
        np.asarray(x).reshape(-1)[:n]
        for x in [pint.chunked_any_tiles(ds, ro_t, rd_t, hit_mask=live_t)]
    )
    np.testing.assert_array_equal(occ1[m], occ0[m])
    np.testing.assert_array_equal(occ0 != 0, ty_x >= 0)


def test_suzanne_hi_on_chunked_path(assets_dir):
    """The lifted chunked ceiling (MAX_CHUNKED_TRIS) keeps a >10k-triangle
    scene on the kernel path: suzanne_hi (15,488 tris, 242 chunks) is
    chunk-applicable and its closest sweep matches the XLA dense sweep."""
    import os as _os

    from rsoderh_raytracing_tpu import load_scene
    from rsoderh_raytracing_tpu.ops import intersect, pallas_intersect
    from rsoderh_raytracing_tpu.scene.device import build_device_scene

    scene = load_scene(
        _os.path.join(assets_dir, "scenes", "suzanne_hi.toml")
    )
    assert scene.meshes.triangles.shape[0] == 15488
    ds = build_device_scene(scene)
    assert ds.tri_valid.shape[0] == 15488  # 242 chunks exactly
    assert pallas_intersect._chunked_applicable(ds)
    assert pallas_intersect._use_chunked(ds)
    assert pallas_intersect.chunked_trace_supported(ds)

    ro, _ = _random_rays(128, seed=9)
    ro[:, 2] += 6.0
    # aim at the head (jittered) so triangle hits are plentiful
    rng = np.random.default_rng(10)
    target = rng.normal(0.0, 0.4, size=(128, 3)).astype(np.float32)
    rd = target - ro
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    t_p, ty_p, ix_p = map(
        np.asarray, pallas_intersect.closest_sweep(ds, ro, rd)
    )
    t_x, ty_x, ix_x = map(np.asarray, intersect._sweep_xla(ds, ro, rd))
    np.testing.assert_array_equal(ty_p, ty_x)
    hit = ty_x >= 0
    assert (ty_x == 2).sum() > 5
    np.testing.assert_array_equal(ix_p[hit], ix_x[hit])
    np.testing.assert_allclose(t_p[hit], t_x[hit], rtol=1e-5)


def test_spheres_asset_on_sphere_window_path(assets_dir):
    """The 1000-sphere benchmark asset (assets/scenes/spheres.toml,
    the recorded 31.4 Mrays/s config) rides the sphere-window chunked
    path — a gate change must not silently drop it to the composed
    sweep — and its closest sweep matches the XLA dense sweep."""
    import os as _os

    from rsoderh_raytracing_tpu import load_scene
    from rsoderh_raytracing_tpu.ops import intersect, pallas_intersect
    from rsoderh_raytracing_tpu.scene.device import build_device_scene

    scene = load_scene(_os.path.join(assets_dir, "scenes", "spheres.toml"))
    assert len(scene.spheres) == 1000
    ds = build_device_scene(scene)
    assert ds.sph_radius.shape[0] == 1024  # 16 sphere chunks exactly
    assert pallas_intersect._chunk_spheres(ds)
    assert pallas_intersect._chunked_applicable(ds)
    assert pallas_intersect.chunked_trace_supported(ds)

    # rays from the scene camera's side aimed into the cloud
    ro, _ = _random_rays(128, seed=15)
    ro[:, 1] += 10.0
    ro[:, 2] += 32.0
    rng = np.random.default_rng(16)
    target = rng.normal(0.0, 4.0, size=(128, 3)).astype(np.float32)
    rd = target - ro
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    t_p, ty_p, ix_p = map(
        np.asarray, pallas_intersect.closest_sweep(ds, ro, rd)
    )
    t_x, ty_x, ix_x = map(np.asarray, intersect._sweep_xla(ds, ro, rd))
    np.testing.assert_array_equal(ty_p, ty_x)
    hit = ty_x >= 0
    assert (ty_x == 0).sum() > 20  # plenty of sphere winners
    np.testing.assert_array_equal(ix_p[hit], ix_x[hit])
    tight = hit & ~_grazing_sphere(ds, ro, rd, ty_x, ix_x)
    np.testing.assert_allclose(t_p[tight], t_x[tight], rtol=1e-4, atol=1e-4)


def test_beyond_ceiling_falls_back_loudly(tiny_env):
    """A scene past MAX_CHUNKED_TRIS renders on the composed XLA sweep
    with a RuntimeWarning naming the cliff (the round-2 silent-fallback
    gap)."""
    import pytest as _pytest

    from rsoderh_raytracing_tpu.ops import pallas_intersect, pallas_wavefront
    from rsoderh_raytracing_tpu.render.integrator import camera_pytree
    from rsoderh_raytracing_tpu.render.wavefront import render_wavefront
    from rsoderh_raytracing_tpu.scene.camera import Camera
    from rsoderh_raytracing_tpu.scene.device import build_device_scene
    from rsoderh_raytracing_tpu.scene.types import (
        Material,
        PackedMeshes,
        Scene,
    )

    n_tri = pallas_intersect.MAX_CHUNKED_TRIS + 64
    rng = np.random.default_rng(3)
    centers = rng.uniform(-4.0, 4.0, size=(n_tri, 3)).astype(np.float32)
    vertices = np.concatenate(
        [
            centers,
            centers + np.float32([0.1, 0, 0]),
            centers + np.float32([0, 0.1, 0]),
        ],
        axis=0,
    ).astype(np.float32)
    normals = np.array([[0.0, 0.0, 1.0]], np.float32)
    tris = np.stack(
        [
            np.arange(n_tri),
            np.arange(n_tri) + n_tri,
            np.arange(n_tri) + 2 * n_tri,
            np.zeros(n_tri, np.int64),
            np.zeros(n_tri, np.int64),
            np.zeros(n_tri, np.int64),
            np.zeros(n_tri, np.int64),
        ],
        axis=-1,
    ).astype(np.int32)
    scene = Scene(
        materials=[Material((0.5, 0.5, 0.5), 0.8, 0.0, (0, 0, 0))],
        spheres=[],
        planes=[],
        meshes=PackedMeshes(
            vertices=vertices, normals=normals, triangles=tris
        ),
        camera=Camera(pos=[0, 0, 8], yaw=0, pitch=0, fov_y=1.0),
    )
    ds = build_device_scene(scene)
    assert not pallas_intersect._chunked_applicable(ds)
    assert not pallas_wavefront.supported(ds)  # interpret mode is on
    cam = camera_pytree(scene.camera)
    with _pytest.warns(RuntimeWarning, match="chunked ceiling"):
        img = np.asarray(
            render_wavefront(ds, tiny_env, cam, np.uint32(0), (4, 4), 1, 2)
        )
    assert np.isfinite(img).all()


def test_shortlist_grid_bit_identical(monkeypatch, assets_dir):
    """The per-tile chunk shortlist (scalar-prefetch grid, engaged above
    SHORTLIST_MIN_CHUNKS) is a conservative first level over the
    per-lane culls: results must be BIT-identical with it disabled,
    including rays whose tiles have mixed signs, axis-parallel
    directions, and origins inside the mesh bounds."""
    import jax.numpy as jnp

    from rsoderh_raytracing_tpu import load_scene
    from rsoderh_raytracing_tpu.ops import pallas_intersect as pint
    from rsoderh_raytracing_tpu.scene.device import build_device_scene

    scene = load_scene(
        os.path.join(assets_dir, "scenes", "suzanne_hi.toml")
    )
    ds = build_device_scene(scene)
    n_chunks = ds.tri_valid.shape[0] // pint.TRI_CHUNK

    rng = np.random.default_rng(21)
    n = 512
    ro = rng.uniform(-2.0, 2.0, size=(n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd[:32] = 0.0
    rd[0:16, 1] = 1.0
    rd[16:32, 2] = -1.0
    # a non-finite LIVE lane must not poison its tile's shortlist (the
    # pre-pass boxes lanes with min/max; NaN would empty the box and
    # silently drop every other lane's triangle hits)
    ro[40] = np.nan
    rd[41, 0] = np.nan
    live = rng.integers(0, 2, size=n).astype(np.int32)
    live[40] = 1
    live[41] = 1

    n_pad = -(-n // pint.BLOCK) * pint.BLOCK

    def tile1(v, fill):
        c = np.concatenate([v, np.full((n_pad - n,), fill, v.dtype)])
        return jnp.asarray(c.reshape(n_pad // pint.LANES, pint.LANES))

    ro_t = tuple(tile1(ro[:, k], np.float32(1.0)) for k in range(3))
    rd_t = tuple(tile1(rd[:, k], np.float32(1.0)) for k in range(3))
    live_t = tile1(live, np.int32(0))

    grid_rays = (n_pad // pint.LANES) // pint.SUBLANES
    assert pint._use_shortlist(n_chunks, grid_rays)
    # The shortlist itself lives in SMEM; past the budget the call must
    # leave the FLAT list (it now groups chunks instead — tested below)
    # rather than blow the 1 MB compile. Budget math uses the ALLOCATED
    # row size: SMEM pads each of the T tile rows to a 512 B multiple.
    too_many_tiles = (
        pint.SHORTLIST_SMEM_BUDGET // pint._smem_row_bytes(4 * n_chunks) + 1
    )
    assert not pint._use_shortlist(n_chunks, too_many_tiles)
    grouped = pint._shortlist_group(n_chunks, too_many_tiles)
    assert grouped > 1
    assert too_many_tiles * pint._smem_row_bytes(
        4 * (-(-n_chunks // grouped))
    ) <= pint.SHORTLIST_SMEM_BUDGET

    with_sl = [
        np.asarray(x)
        for x in pint.chunked_closest_tiles(ds, ro_t, rd_t, live_mask=live_t)
    ]
    occ_sl = np.asarray(
        pint.chunked_any_tiles(ds, ro_t, rd_t, hit_mask=live_t)
    )

    monkeypatch.setenv("RT_DISABLE_SHORTLIST", "1")
    without = [
        np.asarray(x)
        for x in pint.chunked_closest_tiles(ds, ro_t, rd_t, live_mask=live_t)
    ]
    occ_no = np.asarray(
        pint.chunked_any_tiles(ds, ro_t, rd_t, hit_mask=live_t)
    )
    m = tile1(live, np.int32(0))
    m = np.asarray(m).reshape(-1) != 0
    for a, b in zip(with_sl, without):
        np.testing.assert_array_equal(
            a.reshape(-1)[m], b.reshape(-1)[m]
        )
    np.testing.assert_array_equal(
        occ_sl.reshape(-1)[m], occ_no.reshape(-1)[m]
    )

    # mask-less route (closest_sweep/any_sweep -> _chunked_call): padded
    # lanes join the shortlist box; every lane must stay bit-identical
    monkeypatch.delenv("RT_DISABLE_SHORTLIST")
    no_mask_sl = [
        np.asarray(x)
        for x in pint.chunked_closest_tiles(ds, ro_t, rd_t)
    ]
    occ_nm_sl = np.asarray(pint.chunked_any_tiles(ds, ro_t, rd_t))
    monkeypatch.setenv("RT_DISABLE_SHORTLIST", "1")
    no_mask = [
        np.asarray(x)
        for x in pint.chunked_closest_tiles(ds, ro_t, rd_t)
    ]
    occ_nm = np.asarray(pint.chunked_any_tiles(ds, ro_t, rd_t))
    for a, b in zip(no_mask_sl, no_mask):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(occ_nm_sl, occ_nm)

    # Front-to-back closest ordering (RT_SHORTLIST_F2B=1): visit order
    # only affects exact cross-chunk same-type t ties (none exist for
    # random rays against a real mesh — and sphere-vs-other ties are
    # order-independent via the equal-t override), so the winner tuple
    # stays bit-identical with the plain grid here. (The occlusion
    # kernel is ALWAYS front-to-back — OR-accumulation is order-free —
    # and the occ_* comparisons above already pin that.)
    monkeypatch.delenv("RT_DISABLE_SHORTLIST")
    monkeypatch.setenv("RT_SHORTLIST_F2B", "1")
    f2b = [
        np.asarray(x)
        for x in pint.chunked_closest_tiles(ds, ro_t, rd_t, live_mask=live_t)
    ]
    for a, b in zip(f2b, without):
        np.testing.assert_array_equal(
            a.reshape(-1)[m], b.reshape(-1)[m]
        )

    # Grouped shortlist (RT_SHORTLIST_GROUP=4 — the regime where the
    # flat list exceeds the SMEM budget): group-union reachability is
    # COARSER than flat (a superset of groups is listed), each listed
    # group sweeps its 4 chunks behind their own per-chunk slab culls,
    # so results stay bit-identical. The occlusion kernel is grouped
    # AND front-to-back here (any_only forces f2b).
    monkeypatch.delenv("RT_SHORTLIST_F2B")
    monkeypatch.setenv("RT_SHORTLIST_GROUP", "4")
    assert pint._shortlist_group(n_chunks, 1) == 4
    grp = [
        np.asarray(x)
        for x in pint.chunked_closest_tiles(ds, ro_t, rd_t, live_mask=live_t)
    ]
    occ_grp = np.asarray(
        pint.chunked_any_tiles(ds, ro_t, rd_t, hit_mask=live_t)
    )
    for a, b in zip(grp, without):
        np.testing.assert_array_equal(
            a.reshape(-1)[m], b.reshape(-1)[m]
        )
    np.testing.assert_array_equal(
        occ_grp.reshape(-1)[m], occ_no.reshape(-1)[m]
    )


def test_f2b_shortlist_multi_tile_negative_axis():
    """Regression: the front-to-back entry key's negative-axis branch
    must broadcast (T, C, 3) — a wrong axis ([:, None] on the chunk
    bounds) crashed every MULTI-tile call (T != C) and silently keyed
    1-tile calls off chunk 0's bound; the 1-tile kernel tests never saw
    either (order is bit-transparent). Two tiles, three chunks, a -z
    ray tile (neg branch) and a +z tile that reaches nothing."""
    import jax.numpy as jnp

    from rsoderh_raytracing_tpu.ops import pallas_intersect as pint

    bounds = jnp.asarray(
        [
            # chunk 0: far (z in [-10, -9]), 1: mid, 2: near
            [-1.0, -1.0, -10.0, 1.0, 1.0, -9.0],
            [-1.0, -1.0, -5.0, 1.0, 1.0, -4.0],
            [-1.0, -1.0, -2.0, 1.0, 1.0, -1.0],
        ],
        jnp.float32,
    )

    def tiles(vals):
        # two tiles of SUBLANES rows each
        return jnp.concatenate(
            [
                jnp.full((pint.SUBLANES, pint.LANES), v, jnp.float32)
                for v in vals
            ],
            axis=0,
        )

    ro_t = (tiles([0.0, 0.0]), tiles([0.0, 0.0]), tiles([0.0, 0.0]))
    rd_t = (tiles([0.0, 0.0]), tiles([0.0, 0.0]), tiles([-1.0, 1.0]))
    sl, ct = pint.chunk_shortlist(
        bounds, ro_t + rd_t, None, pint.SUBLANES, front_to_back=True
    )
    assert sl.shape == (2, 3) and ct.shape == (2,)
    assert int(ct[0]) == 3 and list(np.asarray(sl)[0]) == [2, 1, 0]
    assert int(ct[1]) == 0


def test_f2b_tie_break_restores_index_order_winner(monkeypatch):
    """RT_SHORTLIST_F2B visits chunks nearest-first, so on an exact
    cross-chunk same-type t tie the kernel's compiled lowest-index
    tie-break must restore the chunk-index-order (= composed) winner
    bitwise. The scene makes the tie REAL and the reorder PROVABLE: one
    triangle duplicated bit-identically into chunks 35 and 40, with
    chunk 40's filler parked nearer the camera so the front-to-back
    shortlist provably visits the higher-index copy first."""
    import jax.numpy as jnp

    from rsoderh_raytracing_tpu.ops import pallas_intersect as pint
    from rsoderh_raytracing_tpu.scene.camera import Camera
    from rsoderh_raytracing_tpu.scene.device import build_device_scene
    from rsoderh_raytracing_tpu.scene.types import (
        Material,
        PackedMeshes,
        Scene,
    )

    monkeypatch.setenv("RT_DISABLE_MORTON", "1")  # keep input chunk layout

    n_chunks = 41
    n_tri = n_chunks * pint.TRI_CHUNK
    lo_chunk, hi_chunk = 35, 40
    lo_slot = lo_chunk * pint.TRI_CHUNK
    hi_slot = hi_chunk * pint.TRI_CHUNK

    # filler triangles sit off-axis (x ~ 20) so the +z probe ray misses
    # them; chunk 40's filler sits NEAR the origin (z ~ 2) so its AABB
    # slab entry sorts before chunk 35's (z = 5) front-to-back.
    v0 = np.tile(np.float32([20.0, 0.0, 50.0]), (n_tri, 1))
    v0[hi_slot:hi_slot + pint.TRI_CHUNK, 2] = 2.0
    v0 += np.linspace(0, 0.5, n_tri, dtype=np.float32)[:, None]
    v1 = v0 + np.float32([0.1, 0.0, 0.0])
    v2 = v0 + np.float32([0.0, 0.1, 0.0])
    dup = (
        np.float32([-1.0, -1.0, 5.0]),
        np.float32([3.0, -1.0, 5.0]),
        np.float32([-1.0, 3.0, 5.0]),
    )
    for arr, v in zip((v0, v1, v2), dup):
        arr[lo_slot] = v
        arr[hi_slot] = v

    vertices = np.concatenate([v0, v1, v2], axis=0).astype(np.float32)
    normals = np.array([[0.0, 0.0, 1.0]], np.float32)
    idx = np.arange(n_tri)
    zeros = np.zeros(n_tri, np.int64)
    tris = np.stack(
        [idx, idx + n_tri, idx + 2 * n_tri, zeros, zeros, zeros, zeros],
        axis=-1,
    ).astype(np.int32)
    scene = Scene(
        materials=[Material((0.5, 0.5, 0.5), 0.8, 0.0, (0, 0, 0))],
        spheres=[],
        planes=[],
        meshes=PackedMeshes(
            vertices=vertices, normals=normals, triangles=tris
        ),
        camera=Camera(pos=[0, 0, 0], yaw=0, pitch=0, fov_y=1.0),
    )
    ds = build_device_scene(scene)
    # the tie is real: both copies pack to bit-identical constants
    for a in (ds.tri_a, ds.tri_edge0, ds.tri_edge1):
        np.testing.assert_array_equal(
            np.asarray(a[lo_slot]), np.asarray(a[hi_slot])
        )

    # every lane is the same +z probe ray through both copies
    def tile(x):
        return jnp.full((pint.SUBLANES, pint.LANES), x, jnp.float32)

    ro_t = (tile(0.0), tile(0.0), tile(0.0))
    rd_t = (tile(0.0), tile(0.0), tile(1.0))

    # the front-to-back pre-pass provably visits 40 before 35
    assert pint._use_shortlist(n_chunks, 1)
    bounds = pint.chunk_bounds(ds)
    sl, ct = pint.chunk_shortlist(
        bounds, ro_t + rd_t, None, pint.SUBLANES, front_to_back=True
    )
    assert int(np.asarray(ct)[0]) == n_chunks
    order = list(np.asarray(sl)[0][:2])
    assert order == [hi_chunk, lo_chunk]

    monkeypatch.setenv("RT_DISABLE_SHORTLIST", "1")
    base = [
        np.asarray(x) for x in pint.chunked_closest_tiles(ds, ro_t, rd_t)
    ]
    monkeypatch.delenv("RT_DISABLE_SHORTLIST")
    monkeypatch.setenv("RT_SHORTLIST_F2B", "1")
    f2b = [
        np.asarray(x) for x in pint.chunked_closest_tiles(ds, ro_t, rd_t)
    ]

    # index order keeps the LOW copy; f2b + tie-break must match bitwise
    assert base[1].flat[0] == 2 and base[2].flat[0] == lo_slot
    for a, b in zip(f2b, base):
        np.testing.assert_array_equal(a, b)

    # grouped + front-to-back: the dup copies land in groups 8 and 10
    # (chunks 35, 40 at group 4); group 10's near filler still sorts it
    # first, and the tie-break must still restore the low-index winner
    gb = pint.group_chunk_bounds(bounds, 4)
    sl_g, _ = pint.chunk_shortlist(
        gb, ro_t + rd_t, None, pint.SUBLANES, front_to_back=True
    )
    g_order = list(np.asarray(sl_g)[0][:2])
    assert g_order == [hi_chunk // 4, lo_chunk // 4]
    monkeypatch.setenv("RT_SHORTLIST_GROUP", "4")
    f2b_grp = [
        np.asarray(x) for x in pint.chunked_closest_tiles(ds, ro_t, rd_t)
    ]
    for a, b in zip(f2b_grp, base):
        np.testing.assert_array_equal(a, b)

    # G=16 over 41 chunks: 3 entries, the last group pads 7 sub-chunk
    # slots past C — stressing the jc < n_chunks guard and the window
    # table's zero-padding (valid=0) together with the tie-break
    monkeypatch.setenv("RT_SHORTLIST_GROUP", "16")
    f2b_g16 = [
        np.asarray(x) for x in pint.chunked_closest_tiles(ds, ro_t, rd_t)
    ]
    for a, b in zip(f2b_g16, base):
        np.testing.assert_array_equal(a, b)


# -- sphere chunk windows (many-sphere scenes on the kernel path) --------------


def _sphere_cloud_scene(n_spheres, n_tris=0, seed=7, with_plane=True):
    """Scene with a random sphere cloud (+ optional small random tris and
    a ground plane) for the sphere-window kernel tests."""
    from rsoderh_raytracing_tpu.scene.camera import Camera
    from rsoderh_raytracing_tpu.scene.types import (
        Material,
        PackedMeshes,
        Plane,
        Scene,
        Sphere,
    )

    rng = np.random.default_rng(seed)
    spheres = [
        Sphere(
            pos=rng.uniform(-8.0, 8.0, 3),
            radius=float(rng.uniform(0.1, 0.6)),
            material_id=0,
        )
        for _ in range(n_spheres)
    ]
    planes = (
        [
            Plane(
                pos=[-20.0, -9.0, -20.0],
                forward=[0.0, 0.0, 40.0],
                right=[40.0, 0.0, 0.0],
                material_id=0,
            )
        ]
        if with_plane
        else []
    )
    if n_tris:
        centers = rng.uniform(-6.0, 6.0, size=(n_tris, 3)).astype(np.float32)
        vertices = np.concatenate(
            [
                centers,
                centers + np.float32([1.5, 0, 0]),
                centers + np.float32([0, 1.5, 0]),
            ],
            axis=0,
        ).astype(np.float32)
        normals = np.array([[0.0, 0.0, 1.0]], np.float32)
        tris = np.stack(
            [
                np.arange(n_tris),
                np.arange(n_tris) + n_tris,
                np.arange(n_tris) + 2 * n_tris,
                np.zeros(n_tris, np.int64),
                np.zeros(n_tris, np.int64),
                np.zeros(n_tris, np.int64),
                np.zeros(n_tris, np.int64),
            ],
            axis=-1,
        ).astype(np.int32)
        meshes = PackedMeshes(
            vertices=vertices, normals=normals, triangles=tris
        )
    else:
        meshes = PackedMeshes.empty()
    return Scene(
        materials=[Material((0.7, 0.6, 0.5), 0.5, 0.0, (0, 0, 0))],
        spheres=spheres,
        planes=planes,
        meshes=meshes,
        camera=Camera(pos=[0, 0, 20], yaw=0, pitch=0, fov_y=1.2),
    )


def test_sphere_chunked_matches_xla():
    """A >unroll-budget sphere cloud streams as sphere chunk windows on
    the chunked kernel path (the reference handles any sphere count via
    its BVH, src/bvh.rs:13-28) and matches the XLA sweep: winner types
    and indices exactly, t at sweep tolerance, occlusion exactly."""
    from rsoderh_raytracing_tpu.ops import intersect, pallas_intersect
    from rsoderh_raytracing_tpu.scene.device import build_device_scene

    ds = build_device_scene(_sphere_cloud_scene(300))
    assert ds.sph_radius.shape[0] == 320  # padded to whole windows
    assert pallas_intersect._chunk_spheres(ds)
    assert pallas_intersect._chunked_applicable(ds)
    assert pallas_intersect._use_chunked(ds)
    assert pallas_intersect.sweep_supported(ds)
    assert pallas_intersect.chunked_trace_supported(ds)

    ro, rd = _random_rays(300, seed=11)
    t_p, ty_p, ix_p = map(
        np.asarray, pallas_intersect.closest_sweep(ds, ro, rd)
    )
    t_x, ty_x, ix_x = map(np.asarray, intersect._sweep_xla(ds, ro, rd))
    np.testing.assert_array_equal(ty_p, ty_x)
    hit = ty_x >= 0
    assert (ty_x == 0).sum() > 20  # plenty of sphere winners
    np.testing.assert_array_equal(ix_p[hit], ix_x[hit])
    tight = hit & ~_grazing_sphere(ds, ro, rd, ty_x, ix_x)
    np.testing.assert_allclose(t_p[tight], t_x[tight], rtol=1e-4, atol=1e-4)

    a = np.asarray(pallas_intersect.any_sweep(ds, ro, rd))
    np.testing.assert_array_equal(a, ty_x >= 0)


def _grazing_sphere(ds, ro, rd, ty, ix):
    """Lanes whose winner is a NEAR-TANGENT sphere hit: the quadratic's
    b^2-4ac cancellation amplifies fma-contraction ulps unboundedly
    there, so t comparisons exclude them (winner identity stays exact)."""
    pos = np.asarray(ds.sph_pos)
    r = np.asarray(ds.sph_radius)
    safe_ix = np.clip(ix, 0, pos.shape[0] - 1)
    oc = pos[safe_ix] - ro
    tca = (oc * rd).sum(-1)
    d2 = (oc * oc).sum(-1) - tca**2
    return (ty == 0) & (np.abs(d2 - r[safe_ix] ** 2) < 1e-3)


def test_sphere_tri_mixed_chunks_match_xla():
    """Triangle and sphere windows share one chunk grid (tri chunks
    first, then sphere chunks): a mixed cloud matches the XLA sweep."""
    from rsoderh_raytracing_tpu.ops import intersect, pallas_intersect
    from rsoderh_raytracing_tpu.scene.device import build_device_scene

    ds = build_device_scene(_sphere_cloud_scene(300, n_tris=128))
    assert pallas_intersect._chunk_spheres(ds)
    assert pallas_intersect._use_chunked(ds)
    assert ds.tri_valid.shape[0] == 128

    ro, rd = _random_rays(300, seed=12)
    t_p, ty_p, ix_p = map(
        np.asarray, pallas_intersect.closest_sweep(ds, ro, rd)
    )
    t_x, ty_x, ix_x = map(np.asarray, intersect._sweep_xla(ds, ro, rd))
    np.testing.assert_array_equal(ty_p, ty_x)
    hit = ty_x >= 0
    assert (ty_x == 0).sum() > 10 and (ty_x == 2).sum() > 3
    np.testing.assert_array_equal(ix_p[hit], ix_x[hit])
    tight = hit & ~_grazing_sphere(ds, ro, rd, ty_x, ix_x)
    np.testing.assert_allclose(t_p[tight], t_x[tight], rtol=1e-4, atol=1e-4)

    a = np.asarray(pallas_intersect.any_sweep(ds, ro, rd))
    np.testing.assert_array_equal(a, ty_x >= 0)


def test_sphere_chunk_culls_and_shortlist_preserve_results(monkeypatch):
    """Per-lane culls and the per-tile shortlist stay result-preserving
    on sphere windows: a 2176-sphere cloud (34 chunks, shortlist
    engaged) with live masks, axis-parallel rays, far origins, and a
    non-finite live lane is bit-identical to the shortlist-disabled
    kernels on every live lane."""
    import jax.numpy as jnp

    from rsoderh_raytracing_tpu.ops import pallas_intersect as pint
    from rsoderh_raytracing_tpu.scene.device import build_device_scene

    ds = build_device_scene(_sphere_cloud_scene(2150, seed=13))
    n_chunks = ds.sph_radius.shape[0] // pint.TRI_CHUNK
    assert n_chunks == 34 and pint._chunk_spheres(ds)

    rng = np.random.default_rng(14)
    n = 512
    ro = rng.uniform(-9.0, 9.0, size=(n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd[:16] = 0.0
    rd[0:8, 1] = 1.0
    rd[8:16, 0] = -1.0
    far = rng.uniform(500.0, 2000.0, size=(24, 1)).astype(np.float32)
    fdir = rng.normal(size=(24, 3)).astype(np.float32)
    fdir /= np.linalg.norm(fdir, axis=-1, keepdims=True)
    ro[16:40] = fdir * far
    rd[16:40] = -fdir
    ro[40] = np.nan
    live = rng.integers(0, 2, size=n).astype(np.int32)
    live[40] = 1

    n_pad = -(-n // pint.BLOCK) * pint.BLOCK

    def tile1(v, fill):
        c = np.concatenate([v, np.full((n_pad - n,), fill, v.dtype)])
        return jnp.asarray(c.reshape(n_pad // pint.LANES, pint.LANES))

    ro_t = tuple(tile1(ro[:, k], np.float32(1.0)) for k in range(3))
    rd_t = tuple(tile1(rd[:, k], np.float32(1.0)) for k in range(3))
    live_t = tile1(live, np.int32(0))
    grid_rays = (n_pad // pint.LANES) // pint.SUBLANES
    assert pint._use_shortlist(n_chunks, grid_rays)

    with_sl = [
        np.asarray(x)
        for x in pint.chunked_closest_tiles(ds, ro_t, rd_t, live_mask=live_t)
    ]
    occ_sl = np.asarray(
        pint.chunked_any_tiles(ds, ro_t, rd_t, hit_mask=live_t)
    )
    monkeypatch.setenv("RT_DISABLE_SHORTLIST", "1")
    without = [
        np.asarray(x)
        for x in pint.chunked_closest_tiles(ds, ro_t, rd_t, live_mask=live_t)
    ]
    occ_no = np.asarray(
        pint.chunked_any_tiles(ds, ro_t, rd_t, hit_mask=live_t)
    )
    m = np.asarray(tile1(live, np.int32(0))).reshape(-1) != 0
    for a, b in zip(with_sl, without):
        np.testing.assert_array_equal(a.reshape(-1)[m], b.reshape(-1)[m])
    np.testing.assert_array_equal(
        occ_sl.reshape(-1)[m], occ_no.reshape(-1)[m]
    )

    # Grouped shortlist over a MIXED grid: 2 triangle + 34 sphere chunks
    # at G=4 makes group 0 STRADDLE the triangle/sphere window boundary
    # (sub-chunks 0-1 triangles, 2-3 spheres) — the per-sub-chunk kind
    # branch must keep results bit-identical to the plain grid.
    ds_mix = build_device_scene(
        _sphere_cloud_scene(2150, seed=13, n_tris=128)
    )
    assert ds_mix.tri_valid.shape[0] // pint.TRI_CHUNK == 2
    assert pint._chunk_spheres(ds_mix)
    monkeypatch.delenv("RT_DISABLE_SHORTLIST")
    monkeypatch.setenv("RT_SHORTLIST_GROUP", "4")
    mix_grp = [
        np.asarray(x)
        for x in pint.chunked_closest_tiles(ds_mix, ro_t, rd_t, live_mask=live_t)
    ]
    occ_mix_grp = np.asarray(
        pint.chunked_any_tiles(ds_mix, ro_t, rd_t, hit_mask=live_t)
    )
    monkeypatch.delenv("RT_SHORTLIST_GROUP")
    monkeypatch.setenv("RT_DISABLE_SHORTLIST", "1")
    mix_plain = [
        np.asarray(x)
        for x in pint.chunked_closest_tiles(ds_mix, ro_t, rd_t, live_mask=live_t)
    ]
    occ_mix_plain = np.asarray(
        pint.chunked_any_tiles(ds_mix, ro_t, rd_t, hit_mask=live_t)
    )
    for a, b in zip(mix_grp, mix_plain):
        np.testing.assert_array_equal(a.reshape(-1)[m], b.reshape(-1)[m])
    np.testing.assert_array_equal(
        occ_mix_grp.reshape(-1)[m], occ_mix_plain.reshape(-1)[m]
    )


def test_sphere_cloud_path_boundaries(tiny_env):
    """Path selection around the sphere-window gates: small clouds stay
    on the unrolled sweep, big clouds ride sphere chunks, clouds past
    MAX_CHUNKED_SPHERES fall back loudly to the composed sweep."""
    import warnings

    import pytest as _pytest

    from rsoderh_raytracing_tpu.ops import pallas_intersect, pallas_wavefront
    from rsoderh_raytracing_tpu.render.integrator import camera_pytree
    from rsoderh_raytracing_tpu.render.wavefront import render_wavefront
    from rsoderh_raytracing_tpu.scene.device import build_device_scene

    small = build_device_scene(_sphere_cloud_scene(100))
    assert not pallas_intersect._chunk_spheres(small)
    assert not pallas_intersect._use_chunked(small)
    assert pallas_intersect.sweep_supported(small)  # unrolled

    big = build_device_scene(_sphere_cloud_scene(200))
    assert pallas_intersect._chunk_spheres(big)
    assert pallas_intersect._use_chunked(big)

    over_scene = _sphere_cloud_scene(
        pallas_intersect.MAX_CHUNKED_SPHERES + 1, with_plane=True
    )
    over = build_device_scene(over_scene)
    assert not pallas_intersect._chunked_applicable(over)
    assert not pallas_wavefront.supported(over)
    cam = camera_pytree(over_scene.camera)
    with _pytest.warns(RuntimeWarning, match="sphere lanes exceed"):
        img = np.asarray(
            render_wavefront(
                over, tiny_env, cam, np.uint32(0), (4, 4), 1, 2
            )
        )
    assert np.isfinite(img).all()


def test_raised_chunked_ceiling_routing():
    """Round-4 ceiling raise (VERDICT round-3 #3): scenes up to 262,144
    padded triangle lanes route onto the chunked kernel path — the only
    size-dependent SMEM resident is the 24 B/chunk bounds table (96 KB
    at 4,096 chunks; the 247,808-triangle suzanne_xhi asset exercises
    the raised range on hardware — PERFORMANCE.md). Past the
    ceiling the routing predicate must refuse so the composed fallback
    (and its RuntimeWarning) still trips. Routing-predicate level: the
    kernels themselves are chunk-count-invariant (the grid dimension is
    data-derived), so the existing interpret-mode parity tests cover
    their semantics."""
    import numpy as np

    from rsoderh_raytracing_tpu.ops import pallas_intersect
    from rsoderh_raytracing_tpu.scene.camera import Camera
    from rsoderh_raytracing_tpu.scene.device import build_device_scene
    from rsoderh_raytracing_tpu.scene.types import (
        Material,
        PackedMeshes,
        Scene,
    )

    def scene_with(n_tri):
        rng_ = np.random.default_rng(3)
        vertices = rng_.normal(size=(64 * 3, 3)).astype(np.float32)
        normals = np.array([[0.0, 0.0, 1.0]], np.float32)
        # reuse a small vertex pool; triangle COUNT is what matters here
        tris = np.array(
            [
                [3 * (i % 64), 3 * (i % 64) + 1, 3 * (i % 64) + 2, 0, 0, 0, 0]
                for i in range(n_tri)
            ],
            np.int32,
        )
        scene = Scene(
            materials=[Material((0.5, 0.5, 0.5), 0.5, 0.0, (0, 0, 0))],
            spheres=[],
            planes=[],
            meshes=PackedMeshes(
                vertices=vertices, normals=normals, triangles=tris
            ),
            camera=Camera(pos=[0, 0, 1], yaw=0, pitch=0, fov_y=1.2),
        )
        return build_device_scene(scene, pad_to=8)

    assert pallas_intersect.MAX_CHUNKED_TRIS == 262144

    ds = scene_with(247808)  # suzanne_xhi's exact count
    assert ds.tri_valid.shape[0] == 247808  # divides TRI_CHUNK exactly
    assert pallas_intersect.chunked_trace_supported(ds)

    over = scene_with(pallas_intersect.MAX_CHUNKED_TRIS + 1)
    assert not pallas_intersect.chunked_trace_supported(over)
    assert not pallas_intersect.sweep_supported(over)


def test_dual_bound_capacity_search_preserves_inrange_decisions(
    monkeypatch,
):
    """The round-5 SHORTLIST_TOTAL_SMEM_BUDGET bound (list + bounds
    table, added for the raised-ceiling regime) must change NO decision
    within the default 262,144-lane ceiling — PERFORMANCE.md claims
    this via an exhaustive old-vs-new scan; this test IS that scan,
    committed. Three parts: (a) the analytic invariant — for every
    in-range chunk count the bounds table's allocation fits the slack
    between the two budgets, so list<=512K implies total<=640K; (b)
    literal old-vs-new equality over every in-range chunk count x a
    tile ladder spanning 128^2..4096^2-class grids; (c) past the
    ceiling the total bound really does bind (the decision CHANGES vs
    the single-bound search) — the regime the fix exists for."""
    from rsoderh_raytracing_tpu.ops import pallas_intersect as pint

    for var in (
        "RT_DISABLE_SHORTLIST",
        "RT_SHORTLIST_GROUP",
        "RT_DISABLE_GROUP_SHORTLIST",
    ):
        monkeypatch.delenv(var, raising=False)

    def old_search(n_chunks, n_tiles):
        # the round-4 single-bound search (list allocation only)
        if n_chunks <= pint.SHORTLIST_MIN_CHUNKS:
            return 0
        g = 1
        while g <= pint.MAX_SHORTLIST_GROUP:
            n_entries = -(-n_chunks // g)
            sl = n_tiles * pint._smem_row_bytes(n_entries * 4)
            if sl <= pint.SHORTLIST_SMEM_BUDGET:
                return g
            g *= 2
        return 0

    default_ceiling_chunks = 262144 // pint.TRI_CHUNK  # 4,096 at TC=64
    slack = pint.SHORTLIST_TOTAL_SMEM_BUDGET - pint.SHORTLIST_SMEM_BUDGET
    for n_chunks in range(1, default_ceiling_chunks + 1):
        assert 6 * pint._smem_row_bytes(n_chunks * 4) <= slack  # (a)

    tile_ladder = (
        list(range(1, 65))
        + [96, 128, 192, 256, 384, 512, 768, 1024, 2048, 4096, 65536]
    )
    for n_chunks in range(1, default_ceiling_chunks + 1):
        for n_tiles in tile_ladder:  # (b)
            assert pint._shortlist_group(n_chunks, n_tiles) == old_search(
                n_chunks, n_tiles
            )

    # (c) suzanne_xxhi's 15,488 chunks at a 256^2-class grid: the old
    # search picked the flat list (500 KB alone) whose +366 KB bounds
    # table measured HTTP 500 at compile; the dual bound degrades to
    # G=2 (607 KB total, the measured-good 0.11 Mrays/s config).
    assert old_search(15488, 8) == 1
    assert pint._shortlist_group(15488, 8) == 2


def test_auto_intersector_routing(monkeypatch, assets_dir, tiny_env):
    """intersector='auto' (the Renderer/CLI default) rides the kernel
    paths while any covers the scene; past EVERY kernel ceiling the
    pick is backend-dependent and measured (round 5): on CPU it
    attaches the flat BVH (walk 3.3x faster than the dense sweep at
    15k tris), on TPU it keeps the composed dense sweep (991k tris:
    sweep 0.011 vs walk 0.002 Mrays/s — the reference is O(log P) at
    any size through its per-thread BVH, shader.wgsl:469-564, but the
    per-lane gather walk is the measured loser on this toolchain)."""
    import warnings as _warnings

    import jax.numpy as jnp

    from rsoderh_raytracing_tpu import load_scene
    from rsoderh_raytracing_tpu.ops import pallas_intersect
    from rsoderh_raytracing_tpu.render.integrator import camera_pytree
    from rsoderh_raytracing_tpu.render.renderer import Renderer
    from rsoderh_raytracing_tpu.render.wavefront import render_wavefront

    # production gates: the opt-in fori_loop sweep (module fixture turns
    # it on for the loop-variant tests) would cover the shrunk-ceiling
    # scene below and mask the routing decision under test
    monkeypatch.delenv("RT_PALLAS_LOOP", raising=False)
    from rsoderh_raytracing_tpu.scene.camera import Camera
    from rsoderh_raytracing_tpu.scene.device import build_device_scene
    from rsoderh_raytracing_tpu.scene.types import (
        Material,
        PackedMeshes,
        Scene,
    )

    # Count-based predicate: fused unroll, chunked grid, past-ceiling.
    ckp = pallas_intersect.counts_kernel_path
    assert ckp(8, 8, 24)  # fused unroll
    assert ckp(8, 8, 976 + 48)  # suzanne-shaped: chunked grid
    assert ckp(0, 8, pallas_intersect.MAX_CHUNKED_TRIS)  # at the ceiling
    assert not ckp(0, 8, pallas_intersect.MAX_CHUNKED_TRIS + 64)
    assert ckp(1024, 8, 64)  # sphere cloud: sphere chunk windows
    assert not ckp(1024, 8, 65)  # non-chunk-divisible triangle lanes
    assert not ckp(8, 256, 64)  # plane unroll crowds out the window

    # Kernel-path scene: auto leaves the BVH off.
    scene = load_scene(os.path.join(assets_dir, "scenes", "suzanne.toml"))
    ds_auto = build_device_scene(scene, with_bvh="auto")
    assert ds_auto.bvh is None
    assert pallas_intersect.sweep_supported(ds_auto)
    r = Renderer(scene, width=8, height=8)
    assert r.intersector == "sweep"
    assert r.device_scene.bvh is None

    # Past-ceiling scene (both boundaries shrunk so the test stays
    # small): on CPU auto attaches the BVH at its own historical
    # boundary (scene.device.CPU_BVH_ABOVE_LANES — deliberately NOT the
    # TPU kernel ceiling, which round 5 raised), the render runs the
    # traversal path, and the dense-sweep cliff warning does NOT fire.
    import rsoderh_raytracing_tpu.scene.device as _dev

    monkeypatch.setattr(pallas_intersect, "MAX_CHUNKED_TRIS", 256)
    monkeypatch.setattr(_dev, "CPU_BVH_ABOVE_LANES", 256)
    rng_ = np.random.default_rng(7)
    centers = rng_.uniform(-2.0, 2.0, size=(512, 3)).astype(np.float32)
    vertices = np.concatenate(
        [
            centers,
            centers + np.float32([0.2, 0, 0]),
            centers + np.float32([0, 0.2, 0]),
        ],
        axis=0,
    ).astype(np.float32)
    normals = np.array([[0.0, 0.0, 1.0]], np.float32)
    idx = np.arange(512)
    tris = np.stack(
        [idx, idx + 512, idx + 1024] + [np.zeros(512, np.int64)] * 4,
        axis=-1,
    ).astype(np.int32)
    big = Scene(
        materials=[Material((0.5, 0.5, 0.5), 0.8, 0.0, (0, 0, 0))],
        spheres=[],
        planes=[],
        meshes=PackedMeshes(
            vertices=vertices, normals=normals, triangles=tris
        ),
        camera=Camera(pos=[0, 0, 6], yaw=0, pitch=0, fov_y=1.0),
    )
    ds_big = build_device_scene(big, with_bvh="auto")
    assert ds_big.bvh is not None
    # On a non-CPU backend, auto keeps the (measured-faster) dense
    # sweep past the ceiling; RT_BVH_ABOVE_TRIS still forces the walk.
    import jax as _jax

    with monkeypatch.context() as mp:
        mp.setattr(_jax, "default_backend", lambda: "tpu")
        assert build_device_scene(big, with_bvh="auto").bvh is None
        mp.setenv("RT_BVH_ABOVE_TRIS", "256")
        assert build_device_scene(big, with_bvh="auto").bvh is not None
    # explicit 'sweep' still takes (and warns on) the dense fallback
    ds_sweep = build_device_scene(big, with_bvh=False)
    assert ds_sweep.bvh is None
    assert not pallas_intersect.sweep_supported(ds_sweep)

    cam = camera_pytree(big.camera)
    with _warnings.catch_warnings():
        _warnings.simplefilter("error", RuntimeWarning)
        img = np.asarray(
            render_wavefront(
                ds_big, tiny_env, cam, jnp.uint32(0), (4, 4), 1, 2
            )
        )
    assert np.isfinite(img).all()
