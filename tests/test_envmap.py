"""Environment sampling: uv mapping, bilinear fetch, pdf consistency."""

import numpy as np
import pytest

from rsoderh_raytracing_tpu.ops import envmap, rng


def test_uv_direction_roundtrip():
    rnd = np.random.default_rng(0)
    uv = rnd.uniform(0.02, 0.98, size=(512, 2)).astype(np.float32)
    d = np.asarray(envmap.equirect_uv_to_direction(uv))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    uv_back = np.asarray(envmap.direction_to_equirect_uv(d))
    # The device PI (3.14159) differs slightly from math.pi, so the
    # roundtrip carries a small systematic error — bounded, not exact.
    np.testing.assert_allclose(uv_back, uv, atol=5e-5)


def test_uv_conventions():
    # +x axis -> u=0.5 (atan2(0,1)=0), equator v=0.5.
    uv = np.asarray(
        envmap.direction_to_equirect_uv(np.float32([[1, 0, 0]]))
    )[0]
    assert uv[0] == pytest.approx(0.5, abs=1e-6)
    assert uv[1] == pytest.approx(0.5, abs=1e-4)
    # Straight up -> v=0.
    uv = np.asarray(
        envmap.direction_to_equirect_uv(np.float32([[0, 1, 0]]))
    )[0]
    assert uv[1] == pytest.approx(0.0, abs=1e-4)


def test_bilinear_sample_matches_manual():
    tex = np.arange(4 * 8 * 3, dtype=np.float32).reshape(4, 8, 3)
    # Exactly at texel center (1.5+0.5)/8, (2+0.5)/4 -> texel (1.5? no:
    # u*W-0.5 = 1.5 -> x0=1, fx=0.5 blend of texels 1 and 2 on row 2.
    uv = np.float32([[(2.0) / 8.0, (2.5) / 4.0]])
    got = np.asarray(envmap.bilinear_sample(tex, uv))[0]
    expected = 0.5 * tex[2, 1] + 0.5 * tex[2, 2]
    np.testing.assert_allclose(got, expected, rtol=1e-5)
    # Clamp at edges: uv beyond [0,1] clamps to border texels.
    uv_edge = np.float32([[0.0, 0.0]])
    got_edge = np.asarray(envmap.bilinear_sample(tex, uv_edge))[0]
    np.testing.assert_allclose(got_edge, tex[0, 0], rtol=1e-5)


def test_sample_environment_pdf_consistency(tiny_env):
    """direction_pdf(sampled direction) ~= returned pdf (same pixel)."""
    n = 4096
    state = rng.seed(
        np.arange(n, dtype=np.uint32), np.zeros(n, dtype=np.uint32)
    )
    state, direction, radiance, pdf = envmap.sample_environment(state, tiny_env)
    direction = np.asarray(direction)
    pdf = np.asarray(pdf)
    assert (pdf > 0).all()
    pdf2 = np.asarray(envmap.direction_pdf(tiny_env, direction))
    # The jittered uv can land in a neighboring pixel after the
    # direction->uv roundtrip, so compare only the (vast) majority.
    match = np.isclose(pdf, pdf2, rtol=2e-2)
    assert match.mean() > 0.95


def test_pdf_integrates_to_one(tiny_env):
    """MC integral of the env pdf over the sphere ~= 1."""
    n = 200_000
    rnd = np.random.default_rng(1)
    z = rnd.uniform(-1, 1, size=n).astype(np.float32)
    phi = rnd.uniform(0, 2 * np.pi, size=n).astype(np.float32)
    r = np.sqrt(np.maximum(0, 1 - z * z))
    dirs = np.stack(
        [r * np.cos(phi), z, r * np.sin(phi)], axis=-1
    ).astype(np.float32)
    pdf = np.asarray(envmap.direction_pdf(tiny_env, dirs))
    integral = pdf.mean() * 4 * np.pi
    assert integral == pytest.approx(1.0, rel=0.05)


def test_sampling_favors_bright_pixels(tiny_env):
    """Sampled directions concentrate around the sun."""
    n = 8192
    state = rng.seed(
        np.arange(n, dtype=np.uint32), np.full(n, 7, dtype=np.uint32)
    )
    _, direction, radiance, pdf = envmap.sample_environment(state, tiny_env)
    radiance = np.asarray(radiance)
    # The device env carries only the RGBE quad (no f32 image); rebuild
    # the fixture's texture host-side for the comparison mean.
    from rsoderh_raytracing_tpu.env.hdr_io import procedural_sky, rgbe_quantize

    tex = rgbe_quantize(
        procedural_sky(64, 32, sun_intensity=50.0, sun_radius=0.15)
    )
    tex_mean = float(tex.mean())
    # Importance sampling oversamples bright texels: mean sampled radiance
    # far exceeds the texture mean.
    assert radiance.mean() > 2.0 * tex_mean


def test_debug_alias_scatter_on_device(default_scene):
    """dev_index 2 runs on device with the device RNG (two draws per
    sample, shader.wgsl:1314-1332) and concentrates mass like the pmf."""
    import numpy as np

    from rsoderh_raytracing_tpu.render.renderer import Renderer

    r = Renderer(default_scene, width=16, height=12)
    img = r.debug_alias_scatter(draws_per_pixel=4)
    env = r.environments[0]
    assert img.shape == (env.height, env.width, 3)
    total = img[..., 0].sum()
    np.testing.assert_allclose(total, 16 * 12 * 4 * 0.1 / 4, rtol=1e-3)
    # mass distribution tracks the alias pmf at coarse granularity
    pmf = np.asarray(env.alias.pmf).reshape(env.height, env.width)
    top_rows = pmf.sum(axis=1).argsort()[-64:]
    uniform_share = 64.0 / env.height
    assert img[..., 0][top_rows].sum() > 2.0 * uniform_share * total
