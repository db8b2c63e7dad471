"""CLI surface: flags, exit codes, end-to-end tiny render, checkpoints."""

import os
import subprocess
import sys

import numpy as np
import pytest

from rsoderh_raytracing_tpu.cli import main


def _tiny_args(assets_dir, tmp_path, extra=()):
    return [
        "--scene",
        os.path.join(assets_dir, "scenes", "default.toml"),
        "--resolution",
        "24x16",
        "--spp",
        "2",
        "--max-bounces",
        "3",
        "--output",
        str(tmp_path / "out.png"),
        "--quiet",
        *extra,
    ]


def test_cli_renders_png(assets_dir, tmp_path):
    assert main(_tiny_args(assets_dir, tmp_path)) == 0
    png = (tmp_path / "out.png").read_bytes()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_cli_renders_linear_hdr(assets_dir, tmp_path):
    """--output x.hdr writes LINEAR radiance as Radiance RGBE: the file
    must read back (through the same codec that loads environments) as
    exactly the RGBE quantization of the film's mean radiance — not the
    tonemapped display image."""
    from rsoderh_raytracing_tpu.env.hdr_io import read_hdr, rgbe_quantize
    from rsoderh_raytracing_tpu.render.renderer import Renderer
    from rsoderh_raytracing_tpu.scene.toml_loader import load_scene

    args = _tiny_args(assets_dir, tmp_path)
    args[args.index("--output") + 1] = str(tmp_path / "out.hdr")
    assert main(args) == 0
    img = read_hdr(str(tmp_path / "out.hdr"))
    assert img.shape == (16, 24, 3) and np.isfinite(img).all()

    # Same render in-process: the CLI's file must be the RGBE-quantized
    # mean radiance of an identical film (RNG streams are deterministic
    # per (pixel, sample), so the two renders agree bitwise).
    scene = load_scene(
        os.path.join(assets_dir, "scenes", "default.toml")
    )
    r = Renderer(scene, width=24, height=16, max_bounces=3)
    r.render(spp=2, progress=False)
    expect = rgbe_quantize(
        np.asarray(r.film.mean_radiance(), np.float32)
    )
    np.testing.assert_array_equal(img, expect)
    assert img.max() > 0.0


def test_cli_bad_keyboard_layout_exit_2(assets_dir, tmp_path, capsys):
    code = main(
        _tiny_args(assets_dir, tmp_path, extra=["--movement-keys", "wasd"])
    )
    assert code == 2
    assert "Invalid keyboard config" in capsys.readouterr().err


def test_cli_missing_scene_exit_1(tmp_path, capsys):
    code = main(
        [
            "--scene",
            str(tmp_path / "nope.toml"),
            "--quiet",
            "--output",
            str(tmp_path / "o.png"),
        ]
    )
    assert code == 1
    assert "Couldn't open scene" in capsys.readouterr().err


def test_cli_bad_resolution_exit_2(assets_dir, tmp_path, capsys):
    code = main(
        _tiny_args(assets_dir, tmp_path, extra=["--resolution", "banana"])
    )
    assert code == 2
    assert "Invalid --resolution" in capsys.readouterr().err


def test_cli_state_overrides_camera(assets_dir, tmp_path):
    from rsoderh_raytracing_tpu.scene.camera import Camera

    state = Camera(
        pos=[5.0, 2.0, 8.0], yaw=0.5, pitch=-0.2, fov_y=1.4
    ).serialize()
    # Rendering with a moved camera must produce a different image.
    a = tmp_path / "a.png"
    b = tmp_path / "b.png"
    assert main(_tiny_args(assets_dir, tmp_path)) == 0
    os.rename(tmp_path / "out.png", a)
    assert (
        main(_tiny_args(assets_dir, tmp_path, extra=["--state", state])) == 0
    )
    os.rename(tmp_path / "out.png", b)
    assert a.read_bytes() != b.read_bytes()


def test_cli_checkpoint_roundtrip(assets_dir, tmp_path):
    ckpt = str(tmp_path / "film.npz")
    assert (
        main(_tiny_args(assets_dir, tmp_path, extra=["--save-checkpoint", ckpt]))
        == 0
    )
    with np.load(ckpt) as z:
        assert z["cumulative"].shape == (16, 24, 3)
        assert int(z["sample_count"]) == 2

    # Resume adds more samples on top.
    assert (
        main(_tiny_args(assets_dir, tmp_path, extra=["--checkpoint", ckpt]))
        == 0
    )


def test_cli_devices_sharded(assets_dir, tmp_path):
    out = tmp_path / "out.png"
    code = main(
        [
            "--scene",
            os.path.join(assets_dir, "scenes", "default.toml"),
            "--resolution",
            "16x16",
            "--spp",
            "8",
            "--max-bounces",
            "3",
            "--devices",
            "dp:4",
            "--output",
            str(out),
            "--quiet",
        ]
    )
    assert code == 0
    assert out.exists()


def test_module_entrypoint_help():
    result = subprocess.run(
        [sys.executable, "-m", "rsoderh_raytracing_tpu", "--help"],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert result.returncode == 0
    assert "--scene" in result.stdout


def test_checkpoint_state_stamp_mismatch(tmp_path, default_scene):
    """A checkpoint saved under one camera refuses to load under another
    (silent blending would double-expose)."""
    import numpy as np
    import pytest

    from rsoderh_raytracing_tpu.render.renderer import Renderer

    p = str(tmp_path / "ck.npz")
    r = Renderer(default_scene, width=16, height=16)
    r.step_batch(2)
    r.save_checkpoint(p)

    from rsoderh_raytracing_tpu.scene.camera import Camera

    r2 = Renderer(default_scene, width=16, height=16)
    r2.camera = Camera(
        pos=np.asarray(r2.camera.pos) + [1.0, 0.0, 0.0],
        yaw=r2.camera.yaw,
        pitch=r2.camera.pitch,
        fov_y=r2.camera.fov_y,
    )
    with pytest.raises(ValueError, match="different"):
        r2.load_checkpoint(p)

    # Same state: loads and reports the saved progress.
    r3 = Renderer(default_scene, width=16, height=16)
    r3.load_checkpoint(p)
    assert r3.film.sample_count == 2


def test_exact_mode_spp_is_total(default_scene):
    """render(mode='exact') treats spp as the TOTAL target: resuming at
    64 with spp=64 is a no-op, spp=66 adds exactly 2."""
    from rsoderh_raytracing_tpu.render.renderer import Renderer

    r = Renderer(default_scene, width=16, height=16)
    r.step_batch(4)
    r.render(spp=4)
    assert r.film.sample_count == 4
    r.render(spp=6)
    assert r.film.sample_count == 6
