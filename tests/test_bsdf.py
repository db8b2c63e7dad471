"""BSDF properties: frames, sampling pdfs, energy bounds, white furnace."""

import numpy as np
import pytest

from rsoderh_raytracing_tpu.ops import bsdf as B
from rsoderh_raytracing_tpu.ops import rng


def _mat(color=(1, 1, 1), roughness=1.0, metallic=0.0, emission=(0, 0, 0), n=1):
    color = np.tile(np.float32(color), (n, 1))
    return B.make_bsdf_material(
        color,
        np.full(n, roughness, np.float32),
        np.full(n, metallic, np.float32),
        np.tile(np.float32(emission), (n, 1)),
    )


def test_frame_orthonormal():
    rng_np = np.random.default_rng(0)
    normals = rng_np.normal(size=(256, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    t, b, n = B.make_frame(normals)
    t, b, n = np.asarray(t), np.asarray(b), np.asarray(n)
    for a, c in [(t, b), (t, n), (b, n)]:
        assert np.abs((a * c).sum(-1)).max() < 1e-5
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(b, axis=-1), 1.0, atol=1e-5)
    # Right-handed: t x b = n
    np.testing.assert_allclose(np.cross(t, b), n, atol=1e-5)


def test_frame_roundtrip():
    rng_np = np.random.default_rng(1)
    normals = rng_np.normal(size=(64, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    vecs = rng_np.normal(size=(64, 3)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    frame = B.make_frame(normals)
    local = B.to_frame_local(frame, vecs)
    back = B.to_frame_world(frame, np.asarray(local))
    np.testing.assert_allclose(back, vecs, atol=1e-4)


def test_material_derived_quantities():
    m = _mat(color=(0.8, 0.6, 0.4), roughness=0.5, metallic=0.0)
    np.testing.assert_allclose(np.asarray(m.alpha), 0.25, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m.f0)[0], [0.04] * 3, atol=1e-6)
    m2 = _mat(color=(0.8, 0.6, 0.4), roughness=0.0, metallic=1.0)
    np.testing.assert_allclose(np.asarray(m2.alpha), 0.001, rtol=1e-6)  # floor
    np.testing.assert_allclose(np.asarray(m2.f0)[0], [0.8, 0.6, 0.4], atol=1e-6)
    # kd = color*(1-metallic)*(1-max(f0))
    kd = np.asarray(B.surface_kd(m))[0]
    np.testing.assert_allclose(kd, np.float32([0.8, 0.6, 0.4]) * 0.96, rtol=1e-5)


def test_cosine_hemisphere_pdf_consistency():
    u = np.random.default_rng(2).uniform(size=(4096, 2)).astype(np.float32)
    wi = np.asarray(B.sample_cosine_hemisphere(u))
    assert (wi[:, 2] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(wi, axis=-1), 1.0, atol=1e-4)
    # Mean of cos(theta) under cosine-weighted sampling = 2/3.
    assert abs(wi[:, 2].mean() - 2 / 3) < 0.01
    pdf = np.asarray(B.pdf_cosine_hemisphere(wi))
    np.testing.assert_allclose(pdf, wi[:, 2] / B.PI, rtol=1e-5)


def test_ggx_d_normalization():
    """Integral of D(h) cos(h) over the hemisphere must be ~1."""
    n = 200_000
    rnd = np.random.default_rng(3)
    # Uniform hemisphere directions
    z = rnd.uniform(size=n)
    phi = rnd.uniform(0, 2 * np.pi, size=n)
    r = np.sqrt(1 - z * z)
    for alpha in (0.1, 0.3, 1.0):
        d = np.asarray(B.d_ggx(z.astype(np.float32), np.float32(alpha)))
        integral = (d * z).mean() * 2 * np.pi  # MC over hemisphere
        assert integral == pytest.approx(1.0, rel=0.05)


def test_vndf_sampling_pdf_consistency():
    """Empirical density of VNDF-sampled half vectors ~ its analytic pdf:
    check via the weak-but-robust statistic E[1/pdf] ~= solid angle of
    the sampled support (here: hemisphere cap where pdf > 0)."""
    n = 100_000
    state = rng.seed(
        np.arange(n, dtype=np.uint32), np.zeros(n, dtype=np.uint32)
    )
    state, u1 = rng.next_uniform(state)
    state, u2 = rng.next_uniform(state)
    u = np.stack([np.asarray(u1), np.asarray(u2)], axis=-1)
    wo = np.tile(
        np.float32([0.3, 0.0, np.sqrt(1 - 0.09)]), (n, 1)
    )
    alpha = np.full(n, 0.5, np.float32)
    h = np.asarray(B.sample_ggx_visible_half_vector(u, wo, alpha))
    np.testing.assert_allclose(np.linalg.norm(h, axis=-1), 1.0, atol=1e-4)
    assert (h[:, 2] >= 0).all()
    pdf = np.asarray(B.pdf_ggx_half_vector_visible(h, wo, alpha))
    assert (pdf > 0).mean() > 0.999
    # E_h~p [ f(h)/p(h) ] = integral f dh for any f; take f = D*G1*max(0,wo.h)/wo.z
    # which IS p, so the ratio is 1 — instead validate first moment of h.z
    # against a quadrature estimate using importance weights.
    w = 1.0 / np.maximum(pdf, 1e-9)
    cap_area = w.mean()  # ~ area of support under p
    assert 0.5 < cap_area < 2 * np.pi + 0.5


def test_eval_energy_bounded():
    """White-furnace-ish: integral of f*cos over hemisphere <= ~1 for a
    white, non-emissive material."""
    n = 200_000
    rnd = np.random.default_rng(5)
    z = rnd.uniform(size=n).astype(np.float32)
    phi = rnd.uniform(0, 2 * np.pi, size=n).astype(np.float32)
    r = np.sqrt(1 - z * z)
    wi = np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)
    wo = np.tile(np.float32([0, 0, 1]), (n, 1))
    for rough in (0.2, 0.5, 1.0):
        mat = _mat(color=(1, 1, 1), roughness=rough, metallic=0.0, n=n)
        f = np.asarray(B.bsdf_eval_local(wo, wi, mat))
        integral = (f * z[:, None]).mean(axis=0) * 2 * np.pi
        assert integral.max() < 1.15  # microfacet single-scatter <= ~1


def test_pdf_mixture_integrates_to_one():
    """bsdf_pdf_local over the hemisphere integrates to ~1."""
    n = 400_000
    rnd = np.random.default_rng(6)
    z = rnd.uniform(size=n).astype(np.float32)
    phi = rnd.uniform(0, 2 * np.pi, size=n).astype(np.float32)
    r = np.sqrt(1 - z * z)
    wi = np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)
    wo = np.tile(np.float32([0.4, 0.2, np.sqrt(1 - 0.2)]), (n, 1))
    mat = _mat(color=(0.9, 0.9, 0.9), roughness=0.6, metallic=0.5, n=n)
    pdf = np.asarray(B.bsdf_pdf_local(wo, wi, mat))
    integral = pdf.mean() * 2 * np.pi
    # The specular lobe loses the below-horizon part of its reflected-wi
    # mass (those samples get pdf 0 and terminate, as in the reference),
    # so the mixture integrates to slightly UNDER one — never over.
    assert 0.85 < integral < 1.02

    # A pure-diffuse material has no horizon loss: integral ~= 1.
    mat_d = _mat(color=(0.9, 0.9, 0.9), roughness=1.0, metallic=0.0, n=n)
    pdf_d = np.asarray(B.bsdf_pdf_local(wo, wi, mat_d))
    integral_d = pdf_d.mean() * 2 * np.pi
    assert integral_d == pytest.approx(1.0, rel=0.05)


def test_bsdf_sample_errors_and_validity():
    n = 8
    state = rng.seed(
        np.arange(n, dtype=np.uint32), np.zeros(n, dtype=np.uint32)
    )
    normal = np.tile(np.float32([0, 1, 0]), (n, 1))
    rd = np.tile(np.float32([0, -1, 0]), (n, 1))  # straight down onto floor
    mat = _mat(roughness=1.0, n=n)
    state, s = B.bsdf_sample(state, rd, normal, mat)
    d = np.asarray(s.direction)
    assert not np.asarray(s.zero_direction).any()
    assert (np.asarray(s.pdf) > 0).all()
    assert ((d * normal).sum(-1) > 0).all()  # above surface

    # Grazing-from-below: dot(n, wo) <= 0 -> zero-dir error, blue debug.
    rd_below = np.tile(np.float32([0, 1, 0]), (n, 1))
    state, s2 = B.bsdf_sample(state, rd_below, normal, mat)
    assert np.asarray(s2.zero_direction).all()
    np.testing.assert_allclose(
        np.asarray(s2.scattering), np.tile([0, 0, 1.0], (n, 1)), atol=1e-6
    )
    assert (np.asarray(s2.pdf) == 0).all()


def test_power_heuristic():
    assert float(B.power_heuristic(1.0, 1.0)) == pytest.approx(0.5)
    assert float(B.power_heuristic(1.0, 0.0)) == pytest.approx(1.0)
    assert float(B.power_heuristic(0.0, 1.0)) == pytest.approx(0.0)
    assert float(B.power_heuristic(2.0, 1.0)) == pytest.approx(0.8)
