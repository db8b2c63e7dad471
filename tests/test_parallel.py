"""Sharded rendering on the 8-device virtual CPU mesh.

Key property: sharded output EQUALS the sequential single-chip renders
summed, because lanes are seeded by global (pixel, sample) indices."""

import jax
import numpy as np
import pytest

from rsoderh_raytracing_tpu.parallel.sharding import (
    ShardedRenderer,
    make_mesh,
    render_spp_sharded,
)
from rsoderh_raytracing_tpu.render.integrator import camera_pytree, render_sample
from rsoderh_raytracing_tpu.scene.camera import Camera
from rsoderh_raytracing_tpu.scene.device import build_device_scene
from rsoderh_raytracing_tpu.scene.types import (
    Material,
    PackedMeshes,
    Scene,
    Sphere,
)


@pytest.fixture(scope="module")
def small_scene():
    return Scene(
        materials=[
            Material((0.8, 0.7, 0.6), 0.5, 0.0, (0, 0, 0)),
            Material((1, 1, 1), 1.0, 0.0, (2, 2, 2)),
        ],
        spheres=[
            Sphere(pos=[0, 0, -3], radius=1.0, material_id=0),
            Sphere(pos=[2, 1, -4], radius=0.8, material_id=1),
        ],
        planes=[],
        meshes=PackedMeshes.empty(),
        camera=Camera(pos=[0, 0, 0], yaw=0, pitch=0, fov_y=np.radians(90)),
    )


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sample_sharded_equals_sequential(small_scene, uniform_env):
    ds = build_device_scene(small_scene)
    cam = camera_pytree(small_scene.camera)
    res = (16, 16)

    mesh = make_mesh(n_devices=8, tile=1)
    summed = np.asarray(
        render_spp_sharded(ds, uniform_env, cam, 0, mesh, res, 4)
    )

    seq = np.zeros_like(summed)
    for s in range(8):
        seq += np.asarray(
            render_sample(ds, uniform_env, cam, np.uint32(s), res, 4)
        )
    np.testing.assert_allclose(summed, seq, rtol=1e-4, atol=1e-4)


def test_tile_sharded_equals_sequential(small_scene, uniform_env):
    ds = build_device_scene(small_scene)
    cam = camera_pytree(small_scene.camera)
    res = (16, 16)

    mesh = make_mesh(n_devices=8, tile=4)  # 4 tiles x 2 samples
    summed = np.asarray(
        render_spp_sharded(ds, uniform_env, cam, 0, mesh, res, 4)
    )
    seq = sum(
        np.asarray(render_sample(ds, uniform_env, cam, np.uint32(s), res, 4))
        for s in range(2)
    )
    np.testing.assert_allclose(summed, seq, rtol=1e-4, atol=1e-4)


def test_sharded_renderer_wrapper(small_scene, uniform_env):
    from rsoderh_raytracing_tpu.env.environment import (
        Environment,
        EnvironmentMaps,
    )
    from rsoderh_raytracing_tpu.render.renderer import Renderer

    tex = np.ones((8, 16, 3), dtype=np.float32)
    envs = EnvironmentMaps([Environment.from_texture("u", tex)])
    inner = Renderer(small_scene, width=16, height=16, environments=envs)
    sharded = ShardedRenderer.wrap(inner, "dp:8")
    sharded.step()
    assert inner.film.sample_count == 8
    img = sharded.film.mean_radiance()
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()


def test_mesh_validation():
    with pytest.raises(ValueError, match="does not divide"):
        make_mesh(n_devices=8, tile=3)
