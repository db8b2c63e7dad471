"""Host scene layer: TOML loading, material resolution, plane precompute.

Expected counts derive from the reference assets
(SURVEY.md section 6: default.toml = 10 spheres + 1 plane + 12 cube tris;
house.toml = 2 spheres + 2 planes + 5 OBJ meshes)."""

import math
import os

import numpy as np
import pytest

from rsoderh_raytracing_tpu.scene.toml_loader import SceneError, load_scene
from rsoderh_raytracing_tpu.scene.types import Plane


def test_default_scene_counts(default_scene):
    assert len(default_scene.materials) == 6
    assert len(default_scene.spheres) == 10
    assert len(default_scene.planes) == 1
    assert len(default_scene.meshes.triangles) == 12  # cube: 6 quads -> 12


def test_house_scene_counts(house_scene):
    assert len(house_scene.materials) == 8
    assert len(house_scene.spheres) == 2
    assert len(house_scene.planes) == 2
    assert len(house_scene.meshes.triangles) == 52


def test_material_resolution(default_scene):
    # default.toml: first sphere is orange_plastic (material index 0)
    assert default_scene.spheres[0].material_id == 0
    # markers use material "marker" (index 3)
    assert default_scene.spheres[4].material_id == 3


def test_camera_degrees_to_radians(default_scene):
    assert default_scene.camera.fov_y == pytest.approx(math.radians(100.0))
    assert default_scene.camera.yaw == 0.0
    np.testing.assert_allclose(default_scene.camera.pos, [0.0, 1.0, 3.0])


def test_missing_material_error(tmp_path):
    bad = tmp_path / "bad.toml"
    bad.write_text(
        """
[[material]]
name = "a"
color = [1,1,1]
roughness = 1
metallic = 0
emission = [0,0,0]
[[object]]
[object.Sphere]
material = "missing"
pos = [0,0,0]
radius = 1
[camera]
pos = [0,0,0]
yaw = 0.0
pitch = 0.0
fov_y = 90.0
"""
    )
    with pytest.raises(SceneError, match="Material 'missing' does not exist"):
        load_scene(str(bad))


def test_mesh_path_relative_to_toml(tmp_path, assets_dir):
    # The mesh path resolves relative to the TOML file, not the CWD
    # (reference: src/scene.rs:407-412).
    scene_file = tmp_path / "scene.toml"
    cube = os.path.relpath(
        os.path.join(assets_dir, "cube.obj"), str(tmp_path)
    )
    scene_file.write_text(
        f"""
[[material]]
name = "m"
color = [1,1,1]
roughness = 1
metallic = 0
emission = [0,0,0]
[[object]]
[object.Mesh]
material = "m"
path = "{cube}"
[camera]
pos = [0,0,0]
yaw = 0.0
pitch = 0.0
fov_y = 90.0
"""
    )
    scene = load_scene(str(scene_file))
    assert len(scene.meshes.triangles) == 12


def test_plane_precompute():
    # default.toml ground plane: pos (-4,0,-5), forward (0,0,10), right (10,0,0)
    plane = Plane(
        pos=[-4, 0, -5], forward=[0, 0, 10], right=[10, 0, 0], material_id=0
    )
    normal = plane.normal()
    # forward x right = (0,0,10) x (10,0,0) = (0,100,0) -> +y
    np.testing.assert_allclose(normal, [0, 1, 0], atol=1e-6)

    bcm = plane.base_change_matrix()
    # bcm maps world offsets into {right, normal, forward} coordinates:
    # corner pos+forward+right must land at (1, 0, 1).
    corner = plane.forward + plane.right
    np.testing.assert_allclose(bcm @ corner, [1, 0, 1], atol=1e-5)
    np.testing.assert_allclose(bcm @ plane.forward, [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(bcm @ normal, [0, 1, 0], atol=1e-5)


def test_duplicate_scene_flag_last_wins(assets_dir, capsys):
    # CLI parity: --scene repeatable, last wins (src/cli.rs:23-25,37).
    from rsoderh_raytracing_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["--scene", "a.toml", "--scene", "b.toml"]
    )
    assert args.scene[-1] == "b.toml"


def test_missing_camera_raises_scene_error(tmp_path):
    """Schema gaps surface as SceneError (the loader's contract), not
    raw KeyError tracebacks."""
    import pytest

    from rsoderh_raytracing_tpu.scene.toml_loader import (
        SceneError,
        load_scene,
    )

    p = tmp_path / "no_camera.toml"
    p.write_text('[[material]]\nname = "m"\ncolor = [1, 1, 1]\n'
                 "roughness = 0.5\nmetallic = 0.0\nemission = [0, 0, 0]\n")
    with pytest.raises(SceneError, match="missing required field"):
        load_scene(str(p))


def test_obj_out_of_range_indices_raise():
    import pytest

    from rsoderh_raytracing_tpu.scene.mesh import MeshError, load_obj

    src = "v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\nf 1//1 2//1 4//1\n"
    with pytest.raises(MeshError, match="vertex index out of range"):
        load_obj(src, 0)
    src0 = "v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\nf 0//1 2//1 3//1\n"
    with pytest.raises(MeshError, match="vertex index out of range"):
        load_obj(src0, 0)
