"""Radiance HDR I/O and procedural sky determinism."""

import numpy as np
import pytest

from rsoderh_raytracing_tpu.env import hdr_io


def test_hdr_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 1, size=(16, 32, 3)) ** 2 * 50).astype(np.float32)
    path = str(tmp_path / "test.hdr")
    hdr_io.write_hdr(path, img)
    back = hdr_io.read_hdr(path)
    assert back.shape == img.shape
    # RGBE shares one exponent across channels: ~1% relative on the
    # max channel, absolute quantum ~max/128 on small channels.
    np.testing.assert_allclose(back, img, rtol=0.01, atol=float(img.max()) / 100)


def test_hdr_rle_scanlines(tmp_path):
    """Synthesize an adaptive-RLE file and decode it."""
    width, height = 16, 2
    img = np.zeros((height, width, 3), np.float32)
    img[0] = [1.0, 0.5, 0.25]  # constant row -> run-length encodable
    img[1, :, 0] = np.linspace(0.1, 1.0, width)  # varying row

    rgbe = hdr_io.float_to_rgbe(img)
    payload = bytearray()
    for y in range(height):
        payload += bytes([2, 2, width >> 8, width & 0xFF])
        for ch in range(4):
            row = rgbe[y, :, ch]
            if np.all(row == row[0]):
                payload += bytes([128 + width, int(row[0])])  # run
            else:
                payload += bytes([width]) + row.tobytes()  # literal
    data = (
        b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
        + f"-Y {height} +X {width}\n".encode()
        + bytes(payload)
    )
    path = tmp_path / "rle.hdr"
    path.write_bytes(data)
    back = hdr_io.read_hdr(str(path))
    np.testing.assert_allclose(back, img, rtol=0.01, atol=float(img.max()) / 100)


def test_load_image_npy(tmp_path):
    img = np.random.default_rng(1).random((8, 8, 3)).astype(np.float32)
    path = str(tmp_path / "env.npy")
    np.save(path, img)
    np.testing.assert_array_equal(hdr_io.load_image(path), img)


def test_load_image_rejects_bad_shape(tmp_path):
    path = str(tmp_path / "bad.npy")
    np.save(path, np.zeros((8, 8), np.float32))
    with pytest.raises(ValueError, match="expected"):
        hdr_io.load_image(path)


def test_procedural_sky_deterministic():
    a = hdr_io.procedural_sky(64, 32, sun_radius=0.15)
    b = hdr_io.procedural_sky(64, 32, sun_radius=0.15)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (32, 64, 3)
    assert (a >= 0).all()
    # Sun pixel much brighter than the median sky.
    assert a.max() > 50 * np.median(a)


def test_environment_set_cycling():
    from rsoderh_raytracing_tpu.env.environment import (
        Environment,
        EnvironmentMaps,
    )

    tex = np.ones((4, 8, 3), np.float32)
    envs = EnvironmentMaps(
        [Environment.from_texture(n, tex) for n in ("a", "b", "c")]
    )
    assert envs.next_index(0) == 1
    assert envs.next_index(2) == 0  # wraps (src/camera.rs:271-278)


def test_rle_hdr_roundtrip(tmp_path):
    """The adaptive-RLE writer round-trips exactly through the reader
    (values land on the RGBE-quantized grid by construction)."""
    rng = np.random.default_rng(3)
    img = (rng.random((48, 80, 3)) * 300).astype(np.float32)
    path = str(tmp_path / "rt.hdr")
    hdr_io.write_hdr(path, img)
    back = hdr_io.read_hdr(path)
    np.testing.assert_array_equal(back, hdr_io.rgbe_quantize(img))
    # Narrow images fall back to flat scanlines.
    narrow = img[:, :4]
    hdr_io.write_hdr(path, narrow)
    np.testing.assert_array_equal(
        hdr_io.read_hdr(path), hdr_io.rgbe_quantize(narrow)
    )


def test_default_hdri_assets_load(assets_dir):
    """assets/hdri ships the two default 2k environments as real Radiance
    files, loaded in the reference's order (src/state.rs:119-122)."""
    import os

    from rsoderh_raytracing_tpu.env.environment import (
        DEFAULT_ENVIRONMENT_NAMES,
        load_default_environments,
    )

    hdri_dir = os.path.join(assets_dir, "hdri")
    assert sorted(os.listdir(hdri_dir)) == [
        "passendorf_snow_2k.hdr",
        "winter_lake_01_2k.hdr",
    ]
    envs = load_default_environments(hdri_dir)
    assert [e.name for e in envs.environments] == list(
        DEFAULT_ENVIRONMENT_NAMES
    )
    for env in envs.environments:
        assert env.texture.shape == (1024, 2048, 3)
        assert env.texture.max() > 10.0  # a sun exists


def test_corrupt_rle_raises_not_hangs(tmp_path):
    """A zero literal count or truncation in the adaptive-RLE stream
    raises a clean error instead of looping forever / IndexError."""
    import numpy as np
    import pytest

    from rsoderh_raytracing_tpu.env.hdr_io import read_hdr

    width, height = 8, 2
    header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
    header += f"-Y {height} +X {width}\n".encode()
    # Scanline marker then a zero-count literal: would never advance.
    body = bytes([2, 2, 0, width, 0])
    p = tmp_path / "corrupt.hdr"
    p.write_bytes(header + body)
    with pytest.raises(ValueError, match="corrupt RLE|truncated RLE"):
        read_hdr(str(p))

    # Truncated stream: marker promises data that is not there.
    body2 = bytes([2, 2, 0, width, 130])
    p2 = tmp_path / "trunc.hdr"
    p2.write_bytes(header + body2)
    with pytest.raises(ValueError, match="truncated RLE"):
        read_hdr(str(p2))
