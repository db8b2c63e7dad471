"""Native C++ builders vs numpy fallbacks (skipped if g++ unavailable)."""

import numpy as np
import pytest

from rsoderh_raytracing_tpu.accel import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_alias_table_native_matches_python():
    from rsoderh_raytracing_tpu.env.alias_table import _build_python

    rng = np.random.default_rng(0)
    weights = rng.uniform(0.0, 5.0, size=4096).astype(np.float32)
    probabilities = (
        weights * np.float32(len(weights)) / np.float32(weights.sum())
    ).astype(np.float32)

    prob_n, alias_n, pmf_n, leftover = native.build_alias_table_native(
        probabilities
    )
    table_p = _build_python(probabilities)

    np.testing.assert_array_equal(alias_n, table_p.alias_index)
    np.testing.assert_allclose(prob_n, table_p.probability, rtol=1e-6)
    np.testing.assert_allclose(pmf_n, table_p.pmf, rtol=1e-6)
    assert leftover < len(weights) * 0.01


def test_bvh_native_matches_python(house_scene):
    from rsoderh_raytracing_tpu.accel.bvh import (
        _build_python,
        scene_primitive_bounds,
    )

    mins, maxs, types, indices = scene_primitive_bounds(house_scene)
    native_out = native.build_bvh_native(mins, maxs)
    py_out = _build_python(mins, maxs)

    n_min, n_max, payload, count, axis, order, depth = native_out
    p_min, p_max, p_payload, p_count, p_axis, p_order, p_depth = py_out

    np.testing.assert_allclose(n_min, p_min, rtol=1e-6)
    np.testing.assert_allclose(n_max, p_max, rtol=1e-6)
    np.testing.assert_array_equal(payload, p_payload)
    np.testing.assert_array_equal(count, p_count)
    np.testing.assert_array_equal(axis, p_axis)
    np.testing.assert_array_equal(order, p_order)
    assert depth == p_depth


def test_bvh_native_large_random():
    rng = np.random.default_rng(1)
    centers = rng.uniform(-100, 100, size=(5000, 3)).astype(np.float32)
    half = rng.uniform(0.01, 1.0, size=(5000, 1)).astype(np.float32)
    mins = centers - half
    maxs = centers + half

    from rsoderh_raytracing_tpu.accel.bvh import (
        build_bvh_from_bounds,
        validate_bvh,
    )

    bvh = build_bvh_from_bounds(
        mins, maxs, np.zeros(5000, np.int32), np.arange(5000, dtype=np.int32)
    )
    validate_bvh(bvh, mins, maxs)
    assert bvh.depth < 64
