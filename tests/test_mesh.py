"""OBJ parsing: fan triangulation, normals requirement, packing."""

import os

import numpy as np
import pytest

from rsoderh_raytracing_tpu.scene.mesh import MeshError, load_obj
from rsoderh_raytracing_tpu.scene.types import PackedMeshes


def _read(assets_dir, name):
    with open(os.path.join(assets_dir, name)) as f:
        return f.read()


def test_cube_quads_fan_triangulated(assets_dir):
    mesh = load_obj(_read(assets_dir, "cube.obj"), material_id=3)
    assert mesh.vertices.shape == (8, 3)
    assert mesh.normals.shape == (6, 3)
    assert mesh.triangles.shape == (12, 7)  # 6 quads -> 12 triangles
    assert (mesh.triangles[:, 6] == 3).all()
    # Fan order: quad (a,b,c,d) -> (a,b,c), (a,c,d)
    # First face of cube.obj: f 1/1/1 2/2/1 4/3/1 3/4/1
    np.testing.assert_array_equal(mesh.triangles[0, 0:3], [0, 1, 3])
    np.testing.assert_array_equal(mesh.triangles[1, 0:3], [0, 3, 2])


def test_suzanne_triangle_count(assets_dir):
    mesh = load_obj(_read(assets_dir, "suzanne.obj"), material_id=0)
    assert mesh.triangles.shape[0] == 968
    assert mesh.normals.shape[0] == 507


def test_missing_normals_raises():
    src = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
    with pytest.raises(MeshError, match="baked normals"):
        load_obj(src, 0)


def test_pack_meshes_offsets(assets_dir):
    cube = load_obj(_read(assets_dir, "cube.obj"), material_id=0)
    cube2 = load_obj(_read(assets_dir, "cube.obj"), material_id=1)
    packed = PackedMeshes.pack([cube, cube2])
    assert packed.vertices.shape == (16, 3)
    assert packed.normals.shape == (12, 3)
    assert packed.triangles.shape == (24, 7)
    # Second mesh's indices are offset by the first mesh's pool sizes.
    np.testing.assert_array_equal(
        packed.triangles[12, 0:3], cube.triangles[0, 0:3] + 8
    )
    np.testing.assert_array_equal(
        packed.triangles[12, 3:6], cube.triangles[0, 3:6] + 6
    )
    assert (packed.triangles[:12, 6] == 0).all()
    assert (packed.triangles[12:, 6] == 1).all()


def test_triangle_vertices_dereference(assets_dir):
    cube = load_obj(_read(assets_dir, "cube.obj"), material_id=0)
    tv = cube.triangle_vertices()
    assert tv.shape == (12, 3, 3)
    # All cube corners are at +-1.
    assert np.abs(tv).max() == 1.0
