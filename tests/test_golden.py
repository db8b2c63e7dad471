"""Golden-image regression + Monte Carlo sanity for the full pipeline.

The reference repo ships no test suite and its HDRIs are stripped, so
the goldens here are self-generated (CPU, fixed procedural sky, fixed
RNG streams) and guard against silent estimator regressions; statistical
tests check the estimator's convergence behavior independent of goldens.
"""

import os

import numpy as np
import pytest

from rsoderh_raytracing_tpu.env.environment import Environment, device_environment
from rsoderh_raytracing_tpu.env.hdr_io import procedural_sky
from rsoderh_raytracing_tpu.render.integrator import camera_pytree
from rsoderh_raytracing_tpu.render.wavefront import render_wavefront
from rsoderh_raytracing_tpu.scene.device import build_device_scene

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _golden_env():
    return device_environment(
        Environment.from_texture(
            "golden_sky", procedural_sky(256, 128, sun_radius=0.05)
        )
    )


def _render(scene, width=64, height=64, spp=8, bounces=4):
    ds = build_device_scene(scene)
    img = render_wavefront(
        ds,
        _golden_env(),
        camera_pytree(scene.camera),
        np.uint32(0),
        (width, height),
        np.uint32(spp),
        bounces,
    )
    return np.asarray(img) / spp


@pytest.mark.parametrize("name", ["default", "house"])
def test_golden_image(name, assets_dir):
    from rsoderh_raytracing_tpu import load_scene

    scene = load_scene(os.path.join(assets_dir, "scenes", f"{name}.toml"))
    img = _render(scene)
    path = os.path.join(GOLDEN_DIR, f"{name}_64_8spp.npy")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, img)
        pytest.skip(f"golden created: {path}")
    golden = np.load(path)
    rmse = float(np.sqrt(np.mean((img - golden) ** 2)))
    scale = float(np.sqrt(np.mean(golden**2)))
    assert rmse / scale < 5e-4, f"relative RMSE {rmse / scale:.2e} vs golden"


def test_furnace_reflectance_bounded(uniform_env):
    """Uniform radiance-1 environment around a white diffuse sphere: pixel
    radiance must stay near 1 (a bit below — the BSDF's single-scatter
    GGX + 0.04 dielectric Fresnel loses some energy; never above)."""
    from rsoderh_raytracing_tpu.scene.camera import Camera
    from rsoderh_raytracing_tpu.scene.types import (
        Material,
        PackedMeshes,
        Scene,
        Sphere,
    )

    scene = Scene(
        materials=[Material((1, 1, 1), 1.0, 0.0, (0, 0, 0))],
        spheres=[Sphere(pos=[0, 0, -2.5], radius=1.0, material_id=0)],
        planes=[],
        meshes=PackedMeshes.empty(),
        camera=Camera(pos=[0, 0, 0], yaw=0, pitch=0, fov_y=np.radians(60)),
    )
    ds = build_device_scene(scene)
    img = (
        np.asarray(
            render_wavefront(
                ds,
                uniform_env,
                camera_pytree(scene.camera),
                np.uint32(0),
                (32, 32),
                np.uint32(64),
                10,
            )
        )
        / 64.0
    )
    center = img[12:20, 12:20]  # sphere fills the center
    assert center.mean() > 0.75
    assert center.mean() < 1.02
    # Background pixels see the env directly (weighted by the MIS quirk
    # for primary rays; uniform env pdf is < 1 so weight ~ 1).
    corner = img[0:2, 0:2]
    assert np.all(corner > 0.5)


def test_mc_convergence(default_scene):
    """Disjoint sample ranges agree within shrinking Monte Carlo noise."""
    ds = build_device_scene(default_scene)
    env = _golden_env()
    cam = camera_pytree(default_scene.camera)

    def mean_of(base, spp):
        img = render_wavefront(
            ds, env, cam, np.uint32(base), (48, 48), np.uint32(spp), 6
        )
        return np.asarray(img) / spp

    a4, b4 = mean_of(0, 4), mean_of(4, 4)
    a16, b16 = mean_of(100, 16), mean_of(116, 16)
    rmse4 = np.sqrt(np.mean((a4 - b4) ** 2))
    rmse16 = np.sqrt(np.mean((a16 - b16) ** 2))
    # 4x the samples -> ~2x lower noise between independent estimates.
    assert rmse16 < rmse4 * 0.75
    # And the two high-spp estimates agree within typical path-tracing
    # noise for 16 spp with a small bright sun (fireflies dominate).
    scale = np.sqrt(np.mean(a16**2))
    assert rmse16 / scale < 0.35
