"""Intersection math vs hand-computed values + reference edge semantics."""

import numpy as np
import pytest

from rsoderh_raytracing_tpu.ops import geometry as geo


def v(*rows):
    return np.asarray(rows, dtype=np.float32)


def test_sphere_basic_hit():
    ro = v([0, 0, 5])
    rd = v([0, 0, -1])
    t = geo.sphere_distances(
        ro, rd, v([0, 0, 0]), np.float32([1.0]), np.array([True])
    )
    assert t[0, 0] == pytest.approx(4.0, abs=1e-5)


def test_sphere_miss_and_invalid_lane():
    ro = v([0, 3, 5])
    rd = v([0, 0, -1])
    t = geo.sphere_distances(
        ro, rd, v([0, 0, 0], [0, 3, 0]), np.float32([1.0, 1.0]),
        np.array([True, False]),
    )
    assert t[0, 0] >= geo.INF  # misses
    assert t[0, 1] >= geo.INF  # would hit but masked invalid


def test_sphere_inside_flip_and_epsilon():
    # Ray starting at the center: t = radius, normal flipped inward.
    ro = v([0, 0, 0])
    rd = v([0, 0, -1])
    t = geo.sphere_distances(
        ro, rd, v([0, 0, 0]), np.float32([2.0]), np.array([True])
    )
    assert t[0, 0] == pytest.approx(2.0, abs=1e-5)
    point = ro + rd * t[0, 0]
    n = geo.sphere_normal(ro, point, v([0, 0, 0]), np.float32([2.0]))
    np.testing.assert_allclose(n[0], [0, 0, 1], atol=1e-5)  # flipped inward

    # Origin ON the surface: closest root is ~0 < EPS -> far root chosen.
    ro2 = v([0, 0, 2])
    t2 = geo.sphere_distances(
        ro2, rd, v([0, 0, 0]), np.float32([2.0]), np.array([True])
    )
    assert t2[0, 0] == pytest.approx(4.0, abs=1e-4)


def test_plane_hit_bounds_and_quirky_flip():
    # default.toml ground: pos (-4,0,-5), forward (0,0,10), right (10,0,0)
    from rsoderh_raytracing_tpu.scene.types import Plane

    plane = Plane(
        pos=[-4, 0, -5], forward=[0, 0, 10], right=[10, 0, 0], material_id=0
    )
    pos = plane.pos[None]
    normal = plane.normal()[None]
    bcm = plane.base_change_matrix()[None]
    valid = np.array([True])

    ro = v([0, 2, 0])
    rd = v([0, -1, 0])
    t = geo.plane_distances(ro, rd, pos, normal, bcm, valid)
    assert t[0, 0] == pytest.approx(2.0, abs=1e-5)

    # Outside the finite extent -> miss.
    ro_out = v([20, 2, 0])
    t = geo.plane_distances(ro_out, rd, pos, normal, bcm, valid)
    assert t[0, 0] >= geo.INF

    # Parallel ray -> miss.
    t = geo.plane_distances(v([0, 2, 0]), v([1, 0, 0]), pos, normal, bcm, valid)
    assert t[0, 0] >= geo.INF

    # Reference quirk: normal flips when dot(ORIGIN, normal) < 0 — i.e.
    # by the origin's position, not the ray direction (shader.wgsl:393-397).
    n_above = geo.plane_normal_for_ray(v([0, 2, 0]), normal[0][None])
    np.testing.assert_allclose(n_above[0], [0, 1, 0], atol=1e-6)
    n_below = geo.plane_normal_for_ray(v([0, -2, 0]), normal[0][None])
    np.testing.assert_allclose(n_below[0], [0, -1, 0], atol=1e-6)


def test_triangle_hit_barycentric_normal():
    a = v([0, 0, 0])
    b = v([1, 0, 0])
    c = v([0, 1, 0])
    e0 = b - a
    e1 = c - a
    valid = np.array([True])

    ro = v([0.25, 0.25, 1.0])
    rd = v([0, 0, -1])
    t = geo.triangle_distances(ro, rd, a, e0, e1, valid)
    assert t[0, 0] == pytest.approx(1.0, abs=1e-6)

    # Distinct per-corner normals: interpolation at (u, v) = (0.25, 0.25).
    n0 = v([0, 0, 1])[0]
    n1 = v([1, 0, 0])[0]
    n2 = v([0, 1, 0])[0]
    n = geo.triangle_hit_attributes(
        ro, rd, a, e0, e1, n0[None], n1[None], n2[None]
    )
    expected = 0.5 * np.array([0, 0, 1]) + 0.25 * np.array([1, 0, 0]) + 0.25 * np.array([0, 1, 0])
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(n[0], expected, atol=1e-5)

    # Backface: reversed ray from behind flips the normal toward the ray.
    ro_back = v([0.25, 0.25, -1.0])
    rd_back = v([0, 0, 1])
    n_back = geo.triangle_hit_attributes(
        ro_back, rd_back, a, e0, e1, n0[None], n0[None], n0[None]
    )
    np.testing.assert_allclose(n_back[0], [0, 0, -1], atol=1e-5)


def test_triangle_miss_outside():
    a, e0, e1 = v([0, 0, 0]), v([1, 0, 0]), v([0, 1, 0])
    valid = np.array([True])
    t = geo.triangle_distances(
        v([0.9, 0.9, 1.0]), v([0, 0, -1]), a, e0, e1, valid
    )
    assert t[0, 0] >= geo.INF  # u+v > 1


def test_aabb_slab_basic():
    ro = v([0, 0, 5])
    rd = v([0, 0, -1])
    inv = 1.0 / rd
    assert geo.ray_intersects_bounds(
        ro, inv, v([-1, -1, -1]), v([1, 1, 1])
    )[0]
    assert not geo.ray_intersects_bounds(
        ro, inv, v([2, 2, -1]), v([3, 3, 1])
    )[0]
    # Origin inside the box counts as a hit (t range [0, inf)).
    assert geo.ray_intersects_bounds(
        v([0, 0, 0]), inv, v([-1, -1, -1]), v([1, 1, 1])
    )[0]


def test_aabb_flat_box_parallel_ray_reference_semantics():
    """A ray exactly parallel to a zero-thickness AABB misses it unless the
    origin lies exactly in its plane — the WGSL inf/NaN behavior the
    reference's linear-scan fallback exists to paper over."""
    flat_min = v([-1, 0, -1])[0]
    flat_max = v([1, 0, 1])[0]
    rd = v([1, 0, 0])
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(rd != 0, 1.0 / rd, np.inf).astype(np.float32)

    # Origin above the plane: rejected.
    assert not geo.ray_intersects_bounds(
        v([-2, 0.5, 0]), inv, flat_min[None], flat_max[None]
    )[0]
    # Origin exactly in the plane: NaN slab ignored -> accepted.
    assert geo.ray_intersects_bounds(
        v([-2, 0.0, 0]), inv, flat_min[None], flat_max[None]
    )[0]


def test_fast_formulation_matches_naive(house_scene):
    """The expanded (matmul-style) sweep must agree with the direct
    per-pair formulation on hits and distances."""
    from rsoderh_raytracing_tpu.scene.device import build_device_scene

    ds = build_device_scene(house_scene)
    rng = np.random.default_rng(3)
    n = 2048
    ro = rng.uniform(-8, 8, size=(n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)

    pairs = [
        (
            geo.sphere_distances(ro, rd, ds.sph_pos, ds.sph_radius, ds.sph_valid),
            geo.sphere_distances_fast(ro, rd, ds),
        ),
        (
            geo.plane_distances(
                ro, rd, ds.pln_pos, ds.pln_normal, ds.pln_bcm, ds.pln_valid
            ),
            geo.plane_distances_fast(ro, rd, ds),
        ),
        (
            geo.triangle_distances(
                ro, rd, ds.tri_a, ds.tri_edge0, ds.tri_edge1, ds.tri_valid
            ),
            geo.triangle_distances_fast(ro, rd, ds),
        ),
    ]
    for naive, fast in pairs:
        naive, fast = np.asarray(naive), np.asarray(fast)
        hit_n, hit_f = naive < 1e38, fast < 1e38
        assert (hit_n == hit_f).mean() > 0.9999
        both = hit_n & hit_f
        np.testing.assert_allclose(fast[both], naive[both], rtol=1e-4)
