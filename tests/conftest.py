"""Test configuration: force CPU with 8 virtual devices so sharding tests
run without a TPU pod (the standard JAX fake-backend analog)."""

import os

# The environment presets JAX_PLATFORMS=axon (the real TPU) and a
# sitecustomize imports jax at interpreter startup, so env vars are too
# late here — use jax.config, which works any time before backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

ASSETS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")


@pytest.fixture(scope="session")
def assets_dir():
    return ASSETS


@pytest.fixture(scope="session")
def default_scene():
    from rsoderh_raytracing_tpu import load_scene

    return load_scene(os.path.join(ASSETS, "scenes", "default.toml"))


@pytest.fixture(scope="session")
def house_scene():
    from rsoderh_raytracing_tpu import load_scene

    return load_scene(os.path.join(ASSETS, "scenes", "house.toml"))


@pytest.fixture(scope="session")
def tiny_env():
    """A small deterministic environment for fast device tests."""
    from rsoderh_raytracing_tpu.env.environment import (
        Environment,
        device_environment,
    )
    from rsoderh_raytracing_tpu.env.hdr_io import procedural_sky

    # Sun radius must be a few texels wide at 64x32 or the disk falls
    # between texel centers and the map has no bright pixels at all.
    tex = procedural_sky(64, 32, sun_intensity=50.0, sun_radius=0.15)
    return device_environment(Environment.from_texture("tiny", tex))


@pytest.fixture(scope="session")
def uniform_env():
    """Constant radiance-1 environment (furnace configurations)."""
    from rsoderh_raytracing_tpu.env.environment import (
        Environment,
        device_environment,
    )

    tex = np.ones((16, 32, 3), dtype=np.float32)
    return device_environment(Environment.from_texture("uniform", tex))
