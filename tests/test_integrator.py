"""Integrator-level tests: ray gen, miss radiance closed form, emission,
accumulation/reset, determinism."""

import numpy as np
import pytest

from rsoderh_raytracing_tpu.ops import bsdf as B
from rsoderh_raytracing_tpu.ops import envmap, rng
from rsoderh_raytracing_tpu.render.integrator import (
    camera_pytree,
    generate_camera_rays,
    render_sample,
)
from rsoderh_raytracing_tpu.scene.camera import Camera
from rsoderh_raytracing_tpu.scene.device import build_device_scene
from rsoderh_raytracing_tpu.scene.types import Material, PackedMeshes, Scene, Sphere


def _empty_scene(camera=None, materials=None, spheres=()):
    return Scene(
        materials=list(materials or [Material((1, 1, 1), 1.0, 0.0, (0, 0, 0))]),
        spheres=list(spheres),
        planes=[],
        meshes=PackedMeshes.empty(),
        camera=camera
        or Camera(pos=[0, 0, 0], yaw=0.0, pitch=0.0, fov_y=np.radians(90)),
    )


def test_camera_ray_directions_center_and_fov():
    cam = Camera(pos=[1, 2, 3], yaw=0.0, pitch=0.0, fov_y=np.radians(90))
    width = height = 64
    n = width * height
    x = np.tile(np.arange(width, dtype=np.int32), height)
    y = np.repeat(np.arange(height, dtype=np.int32), width)
    state = rng.seed(
        (y * width + x).astype(np.uint32), np.zeros(n, np.uint32)
    )
    state, ro, rd = generate_camera_rays(
        state, x, y, camera_pytree(cam), (width, height)
    )
    ro, rd = np.asarray(ro), np.asarray(rd)
    np.testing.assert_allclose(ro[0], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(rd, axis=-1), 1.0, atol=1e-5)
    # All rays point forward (-z) for an axis-aligned camera.
    assert (rd[:, 2] < 0).all()
    # fov: the top edge's |y/-z| slope ~ sin(45deg) scaled by the
    # reference's sin-convention (max_y = sin(fov/2)).
    top_rows = rd[y < 1]
    slope = np.abs(top_rows[:, 1] / top_rows[:, 2])
    assert slope.max() <= np.sin(np.radians(45.0)) * 1.05


def test_empty_scene_matches_closed_form(uniform_env):
    """With no geometry every ray escapes at bounce 0:
    image = sky * power_heuristic(1, env_pdf(dir)) exactly."""
    scene = _empty_scene()
    ds = build_device_scene(scene)
    img = np.asarray(
        render_sample(
            ds, uniform_env, camera_pytree(scene.camera), np.uint32(0), (32, 32)
        )
    )

    # Recompute the closed form with identical RNG.
    width = height = 32
    x = np.tile(np.arange(width, dtype=np.int32), height)
    y = np.repeat(np.arange(height, dtype=np.int32), width)
    state = rng.seed((y * width + x).astype(np.uint32), np.zeros(x.size, np.uint32))
    state, ro, rd = generate_camera_rays(
        state, x, y, camera_pytree(scene.camera), (width, height)
    )
    sky = np.asarray(envmap.sky_light(uniform_env, rd))
    pdf = np.asarray(envmap.direction_pdf(uniform_env, rd))
    expected = sky * np.asarray(B.power_heuristic(1.0, pdf))[:, None]
    np.testing.assert_allclose(
        img.reshape(-1, 3), expected, rtol=1e-5, atol=1e-6
    )


def test_emissive_sphere_direct(uniform_env):
    """A pure emitter adds its emission with throughput 1 at bounce 0."""
    emissive = Material((1, 1, 1), 1.0, 0.0, (5.0, 3.0, 1.0))
    scene = _empty_scene(
        materials=[emissive],
        spheres=[Sphere(pos=[0, 0, -3], radius=1.0, material_id=0)],
    )
    ds = build_device_scene(scene)
    img = np.asarray(
        render_sample(
            ds, uniform_env, camera_pytree(scene.camera), np.uint32(0), (64, 64)
        )
    )
    center = img[30:34, 30:34].reshape(-1, 3)
    # Emission plus non-negative bounce light: every center pixel >= emission.
    assert (center >= np.float32([5.0, 3.0, 1.0]) - 1e-4).all()


def test_render_deterministic(uniform_env):
    scene = _empty_scene(
        spheres=[Sphere(pos=[0, 0, -3], radius=1.0, material_id=0)]
    )
    ds = build_device_scene(scene)
    cam = camera_pytree(scene.camera)
    a = np.asarray(render_sample(ds, uniform_env, cam, np.uint32(3), (16, 16)))
    b = np.asarray(render_sample(ds, uniform_env, cam, np.uint32(3), (16, 16)))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(render_sample(ds, uniform_env, cam, np.uint32(4), (16, 16)))
    assert np.abs(a - c).max() > 0  # different sample -> different jitter


def test_film_accumulation_and_reset():
    from rsoderh_raytracing_tpu.render.film import Film

    film = Film(4, 4)
    film.add_sample(np.full((4, 4, 3), 2.0, np.float32))
    film.add_sample(np.full((4, 4, 3), 4.0, np.float32))
    np.testing.assert_allclose(film.mean_radiance(), 3.0)
    assert film.sample_count == 2
    film.reset()
    assert film.sample_count == 0
    np.testing.assert_allclose(np.asarray(film.cumulative), 0.0)


def test_film_checkpoint_roundtrip(tmp_path):
    from rsoderh_raytracing_tpu.render.film import Film

    film = Film(4, 4)
    film.add_sample(np.random.default_rng(0).random((4, 4, 3)).astype(np.float32))
    film.add_sample(np.random.default_rng(1).random((4, 4, 3)).astype(np.float32))
    path = str(tmp_path / "ckpt.npz")
    film.save_checkpoint(path)

    film2 = Film(4, 4)
    film2.load_checkpoint(path)
    assert film2.sample_count == 2
    np.testing.assert_allclose(
        np.asarray(film2.cumulative), np.asarray(film.cumulative)
    )


def test_renderer_progressive_reset(uniform_env, tmp_path):
    """Camera motion resets accumulation (the reference's hash contract,
    src/state.rs:774-789)."""
    from rsoderh_raytracing_tpu.env.environment import (
        Environment,
        EnvironmentMaps,
    )
    from rsoderh_raytracing_tpu.render.renderer import Renderer

    tex = np.ones((8, 16, 3), dtype=np.float32)
    envs = EnvironmentMaps([Environment.from_texture("u", tex)])
    scene = _empty_scene()
    r = Renderer(scene, width=8, height=8, environments=envs)
    r.step()
    r.step()
    assert r.film.sample_count == 2
    r.camera = Camera(
        pos=[0, 0, 0.5], yaw=0.0, pitch=0.0, fov_y=scene.camera.fov_y
    )
    r.step()
    assert r.film.sample_count == 1  # reset happened
    r.step()
    assert r.film.sample_count == 2  # still accumulating

    # Environment switch also resets.
    envs.environments.append(Environment.from_texture("v", tex * 2))
    r.next_environment()
    r.step()
    assert r.film.sample_count == 1
