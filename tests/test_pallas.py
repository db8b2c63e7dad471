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


def test_budget_gates():
    """Medium scenes use the fori_loop variant; scenes beyond
    MAX_LOOP_PRIMS fall back to XLA."""
    from rsoderh_raytracing_tpu.ops import pallas_intersect
    from rsoderh_raytracing_tpu.scene.camera import Camera
    from rsoderh_raytracing_tpu.scene.device import build_device_scene
    from rsoderh_raytracing_tpu.scene.types import (
        Material,
        PackedMeshes,
        Scene,
        Sphere,
    )

    rng = np.random.default_rng(3)

    def sphere_scene(count):
        return build_device_scene(
            Scene(
                materials=[Material((1, 1, 1), 1, 0, (0, 0, 0))],
                spheres=[
                    Sphere(
                        pos=rng.uniform(-10, 10, 3), radius=0.5, material_id=0
                    )
                    for _ in range(count)
                ],
                planes=[],
                meshes=PackedMeshes.empty(),
                camera=Camera(pos=[0, 0, 0], yaw=0, pitch=0, fov_y=1.0),
            )
        )

    medium = sphere_scene(pallas_intersect.MAX_UNROLL_PRIMS + 8)
    assert pallas_intersect.sweep_supported(medium)
    assert pallas_intersect._use_loop(medium)

    huge = sphere_scene(pallas_intersect.MAX_LOOP_PRIMS + 8)
    assert not pallas_intersect.sweep_supported(huge)


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


def test_loop_variant_matches_xla_sphere_cloud():
    """The fori_loop variant (opt-in; used when chunking doesn't apply)
    matches the XLA sweep on a >unroll-budget sphere cloud."""
    from rsoderh_raytracing_tpu.ops import intersect, pallas_intersect
    from rsoderh_raytracing_tpu.scene.camera import Camera
    from rsoderh_raytracing_tpu.scene.device import build_device_scene
    from rsoderh_raytracing_tpu.scene.types import (
        Material,
        PackedMeshes,
        Scene,
        Sphere,
    )

    rng = np.random.default_rng(7)
    scene = Scene(
        materials=[Material((1, 1, 1), 1, 0, (0, 0, 0))],
        spheres=[
            Sphere(pos=rng.uniform(-10, 10, 3), radius=0.6, material_id=0)
            for _ in range(256)
        ],
        planes=[],
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
