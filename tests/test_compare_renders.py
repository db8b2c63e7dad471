"""RMSE harness: loading paths and threshold behavior."""

import numpy as np
import pytest

import sys
import os

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)
import compare_renders  # noqa: E402


def test_npy_compare(tmp_path, capsys):
    a = np.random.default_rng(0).random((8, 8, 3))
    np.save(tmp_path / "a.npy", a)
    np.save(tmp_path / "b.npy", a + 0.001)
    code = compare_renders.main.__wrapped__ if hasattr(
        compare_renders.main, "__wrapped__"
    ) else None
    rc = compare_renders.main_with_args = None
    # invoke via argv
    sys.argv = [
        "compare",
        str(tmp_path / "a.npy"),
        str(tmp_path / "b.npy"),
        "--max-relative-rmse",
        "0.01",
    ]
    assert compare_renders.main() == 0
    out = capsys.readouterr().out
    assert "relative rmse" in out


def test_threshold_failure(tmp_path, capsys):
    a = np.random.default_rng(1).random((8, 8, 3))
    np.save(tmp_path / "a.npy", a)
    np.save(tmp_path / "b.npy", a * 2.0)
    sys.argv = [
        "compare",
        str(tmp_path / "a.npy"),
        str(tmp_path / "b.npy"),
        "--max-relative-rmse",
        "0.01",
    ]
    assert compare_renders.main() == 1


def test_png_roundtrip_compare(tmp_path):
    """PNG path: write with our encoder, decode with the harness."""
    from rsoderh_raytracing_tpu.ops.tonemap import linear_to_srgb
    from rsoderh_raytracing_tpu.utils.png import write_png

    img = np.random.default_rng(2).random((16, 24, 3)).astype(np.float32)
    # PNGs store sRGB (the renderer encodes before writing); the harness
    # decodes back to linear.
    write_png(str(tmp_path / "img.png"), np.asarray(linear_to_srgb(img)))
    decoded = compare_renders.load(str(tmp_path / "img.png"))
    assert decoded.shape == (16, 24, 3)
    # 8-bit quantization leaves ~0.5/255 in sRGB space.
    assert np.abs(decoded - img).max() < 0.02


def test_npz_checkpoint_compare(tmp_path):
    cumulative = np.random.default_rng(3).random((4, 4, 3)).astype(np.float32)
    counts = np.full((4, 4), 2, np.uint32)
    np.savez(
        tmp_path / "film.npz", cumulative=cumulative, counts=counts,
        sample_count=2,
    )
    loaded = compare_renders.load(str(tmp_path / "film.npz"))
    np.testing.assert_allclose(loaded, cumulative / 2.0, rtol=1e-6)


def test_shape_mismatch_exits(tmp_path):
    np.save(tmp_path / "a.npy", np.zeros((4, 4, 3)))
    np.save(tmp_path / "b.npy", np.zeros((5, 5, 3)))
    sys.argv = ["compare", str(tmp_path / "a.npy"), str(tmp_path / "b.npy")]
    with pytest.raises(SystemExit):
        compare_renders.main()
