"""Camera model, base64 state codec, controller physics, key layout."""

import math

import numpy as np
import pytest

from rsoderh_raytracing_tpu.scene.camera import (
    Camera,
    CameraController,
    KeyboardLayout,
)


def test_rot_transform_identity():
    cam = Camera(pos=[0, 0, 0], yaw=0.0, pitch=0.0, fov_y=1.0)
    np.testing.assert_allclose(cam.rot_transform(), np.eye(3), atol=1e-7)


def test_rot_transform_yaw_then_pitch():
    cam = Camera(pos=[0, 0, 0], yaw=math.pi / 2, pitch=0.0, fov_y=1.0)
    rot = cam.rot_transform()
    # -z (camera forward) maps to -x under yaw=+90deg about y.
    np.testing.assert_allclose(rot @ [0, 0, -1], [-1, 0, 0], atol=1e-6)

    cam = Camera(pos=[0, 0, 0], yaw=0.0, pitch=math.pi / 2, fov_y=1.0)
    rot = cam.rot_transform()
    # pitch=+90deg about x maps -z to +y (looking up).
    np.testing.assert_allclose(rot @ [0, 0, -1], [0, 1, 0], atol=1e-6)


def test_serialize_roundtrip():
    cam = Camera(pos=[1.5, -2.0, 3.25], yaw=0.7, pitch=-0.3, fov_y=1.745)
    out = Camera.deserialize(cam.serialize())
    np.testing.assert_allclose(out.pos, cam.pos)
    assert out.yaw == pytest.approx(cam.yaw, abs=1e-7)
    assert out.pitch == pytest.approx(cam.pitch, abs=1e-7)
    assert out.fov_y == pytest.approx(cam.fov_y, abs=1e-7)


def test_serialize_format_is_24_le_bytes():
    # Layout must match the reference (src/camera.rs:30-49): pos.xyz,
    # yaw, pitch, fov_y as little-endian f32, standard base64.
    import base64
    import struct

    cam = Camera(pos=[1.0, 2.0, 3.0], yaw=0.5, pitch=0.25, fov_y=1.5)
    raw = base64.standard_b64decode(cam.serialize())
    assert len(raw) == 24
    assert struct.unpack("<6f", raw) == (1.0, 2.0, 3.0, 0.5, 0.25, 1.5)


def test_deserialize_wrong_length():
    with pytest.raises(ValueError, match="not 24 bytes"):
        Camera.deserialize("AAAA")


def test_state_hash_changes_on_move():
    a = Camera(pos=[0, 0, 0], yaw=0.0, pitch=0.0, fov_y=1.0)
    b = Camera(pos=[0, 0, 1e-6], yaw=0.0, pitch=0.0, fov_y=1.0)
    assert a.state_hash() != b.state_hash()
    assert a.state_hash() == Camera(
        pos=[0, 0, 0], yaw=0.0, pitch=0.0, fov_y=1.0
    ).state_hash()


def test_controller_accelerates_and_stops():
    cam = Camera(pos=[0, 0, 0], yaw=0.0, pitch=0.0, fov_y=1.0)
    ctl = CameraController()
    ctl.set_key("forward", True)
    for _ in range(100):
        cam = ctl.update(cam, 0.05)
    # Forward is -z at yaw 0; max speed 3 u/s over 5s with accel ramp.
    assert cam.pos[2] < -10.0
    speed = np.linalg.norm(ctl.velocity)
    assert speed == pytest.approx(3.0, abs=1e-3)

    ctl.set_key("forward", False)
    for _ in range(100):
        cam = ctl.update(cam, 0.05)
    assert np.linalg.norm(ctl.velocity) == 0.0  # friction stops it


def test_controller_mouse_turn():
    cam = Camera(pos=[0, 0, 0], yaw=0.0, pitch=0.0, fov_y=1.0)
    ctl = CameraController()
    ctl.add_mouse_delta(40.0, -20.0)  # 0.25 deg/px
    cam = ctl.update(cam, 0.016)
    assert cam.yaw == pytest.approx(math.radians(-10.0), abs=1e-6)
    assert cam.pitch == pytest.approx(math.radians(5.0), abs=1e-6)


def test_keyboard_layout_parse():
    layout = KeyboardLayout.parse_config("wasdqe", "cpe")
    assert layout.forward == "w" and layout.up == "e"
    with pytest.raises(ValueError, match="expected 6"):
        KeyboardLayout.parse_config("wasd", "cpe")
    with pytest.raises(ValueError, match="expected 3"):
        KeyboardLayout.parse_config("wasdqe", "cp")
