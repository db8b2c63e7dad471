"""ACES tonemap behavior (reference: src/shaders/hdr.wgsl:3-22)."""

import numpy as np
import pytest

from rsoderh_raytracing_tpu.ops.tonemap import aces_tonemap, linear_to_srgb


def test_range_and_monotonic():
    x = np.linspace(0, 20, 256, dtype=np.float32)[:, None] * np.ones(3)
    y = np.asarray(aces_tonemap(x))
    assert (y >= 0).all() and (y <= 1).all()
    assert (np.diff(y[:, 0]) >= -1e-6).all()  # monotone per channel
    # Black maps to ~0, big values saturate to ~1.
    assert y[0].max() < 0.01
    assert y[-1].min() > 0.99


def test_negative_highlighted_magenta():
    y = np.asarray(aces_tonemap(np.float32([[-0.1, 0.5, 0.5]])))[0]
    np.testing.assert_allclose(y, [1, 0, 1], atol=1e-7)


def test_known_midpoint():
    """ACES fitted curve: lum 0.18 maps into a mid-gray-ish region."""
    y = np.asarray(aces_tonemap(np.float32([[0.18, 0.18, 0.18]])))[0]
    assert 0.1 < y[0] < 0.3
    np.testing.assert_allclose(y[0], y[1], atol=1e-6)


def test_srgb_transfer():
    y = np.asarray(linear_to_srgb(np.float32([0.0, 0.0031308, 0.5, 1.0])))
    assert y[0] == 0.0
    assert y[1] == pytest.approx(0.0031308 * 12.92, rel=1e-5)
    assert y[2] == pytest.approx(0.7353569, rel=1e-4)
    assert y[3] == pytest.approx(1.0, rel=1e-6)
