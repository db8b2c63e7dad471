"""Alias table invariants and sampling distribution."""

import numpy as np

from rsoderh_raytracing_tpu.env.alias_table import (
    build_alias_table,
    build_weights_by_luminance,
)


def test_pmf_sums_to_one():
    weights = np.random.default_rng(0).uniform(0.0, 5.0, size=1000)
    table = build_alias_table(weights.astype(np.float32))
    assert abs(float(table.pmf.sum()) - 1.0) < 1e-3
    # Entries either carry their true pmf or are float-roundoff leftovers
    # assigned the identity default 1/length (reference:
    # src/environments.rs:161-183 logs these as "left over pixels").
    true_pmf = weights / weights.sum()
    is_true = np.isclose(table.pmf, true_pmf, rtol=2e-3, atol=1e-7)
    is_leftover = np.isclose(table.pmf, 1.0 / len(weights), rtol=1e-6)
    assert (is_true | is_leftover).all()
    assert is_true.mean() > 0.99  # leftovers are rare


def test_probabilities_in_unit_range():
    weights = np.random.default_rng(1).exponential(1.0, size=512)
    table = build_alias_table(weights.astype(np.float32))
    assert (table.probability >= 0).all()
    assert (table.probability <= 1.0 + 1e-6).all()
    assert (table.alias_index >= 0).all()
    assert (table.alias_index < 512).all()


def test_sampling_frequency_matches_weights():
    """Draw from the table exactly as the device does; empirical counts
    must match the weight distribution."""
    rng = np.random.default_rng(2)
    weights = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32)
    table = build_alias_table(weights)

    n = 200_000
    u1 = rng.uniform(size=n)
    u2 = rng.uniform(size=n)
    idx = np.minimum((u1 * 4).astype(int), 3)
    accept = u2 < table.probability[idx]
    final = np.where(accept, idx, table.alias_index[idx])
    counts = np.bincount(final, minlength=4) / n
    np.testing.assert_allclose(counts, weights / weights.sum(), atol=0.01)


def test_constant_image_gives_identity_entries():
    weights = np.ones(64, dtype=np.float32)
    table = build_alias_table(weights)
    np.testing.assert_allclose(table.probability, 1.0)
    np.testing.assert_allclose(table.pmf, 1.0 / 64.0, rtol=1e-6)


def test_luminance_sin_theta_weighting():
    img = np.ones((8, 4, 3), dtype=np.float32)
    weights = build_weights_by_luminance(img).reshape(8, 4)
    # Rows near the poles get tiny weight; the equator rows the largest.
    assert weights[0, 0] < weights[3, 0]
    assert weights[7, 0] < weights[4, 0]
    np.testing.assert_allclose(weights[3], weights[4], rtol=1e-5)
    # Luminance coefficients
    img2 = np.zeros((2, 1, 3), dtype=np.float32)
    img2[..., 1] = 1.0  # pure green
    w2 = build_weights_by_luminance(img2)
    assert abs(w2[0] / np.sin(np.pi * 0.25) - 0.7152) < 1e-4
