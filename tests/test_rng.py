"""RNG parity with the reference's WGSL hash (shader.wgsl:605-661)."""

import numpy as np

from rsoderh_raytracing_tpu.ops import rng

M32 = 0xFFFFFFFF


def ref_next(state: int):
    """Plain-Python model of random_u32_uniform."""
    state = (state * 747796405 + 2891336453) & M32
    result = (((state >> ((state >> 28) + 4)) ^ state) * 277803737) & M32
    result = (result >> 22) ^ result
    return state, result


def ref_seed(pixel: int, sample: int) -> int:
    state = 0
    state ^= pixel
    state, _ = ref_next(state)
    state ^= sample
    state, _ = ref_next(state)
    return state


def test_u32_stream_matches_reference_model():
    states = np.array([0, 1, 12345, 0xDEADBEEF], dtype=np.uint32)
    s, r = rng.next_u32(states)
    for i, st in enumerate([0, 1, 12345, 0xDEADBEEF]):
        exp_s, exp_r = ref_next(st)
        assert int(s[i]) == exp_s
        assert int(r[i]) == exp_r
    # Multiple consecutive draws
    st = 42
    jst = np.uint32(42)
    for _ in range(16):
        st, exp = ref_next(st)
        jst, got = rng.next_u32(jst)
        assert int(got) == exp
        assert int(jst) == st


def test_seed_matches_reference_model():
    pixels = np.array([0, 7, 511, 1 << 20], dtype=np.uint32)
    samples = np.array([0, 1, 2, 1000], dtype=np.uint32)
    got = rng.seed(pixels, samples)
    for i in range(4):
        assert int(got[i]) == ref_seed(int(pixels[i]), int(samples[i]))


def test_uniform_range_and_mean():
    states = rng.seed(
        np.arange(20000, dtype=np.uint32), np.zeros(20000, dtype=np.uint32)
    )
    _, u = rng.next_uniform(states)
    u = np.asarray(u)
    assert (u >= 0).all() and (u <= 1.0).all()
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1 / 12) < 0.005


def test_in_circle_uniformity():
    states = rng.seed(
        np.arange(20000, dtype=np.uint32), np.zeros(20000, dtype=np.uint32)
    )
    _, pts = rng.next_in_circle(states)
    pts = np.asarray(pts)
    r = np.linalg.norm(pts, axis=-1)
    assert (r <= 1.0).all()
    # E[r] for uniform disk = 2/3
    assert abs(r.mean() - 2 / 3) < 0.01


def test_on_sphere_uniformity():
    states = rng.seed(
        np.arange(20000, dtype=np.uint32), np.ones(20000, dtype=np.uint32)
    )
    _, pts = rng.next_on_sphere(states)
    pts = np.asarray(pts)
    norms = np.linalg.norm(pts, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert np.abs(pts.mean(axis=0)).max() < 0.02
