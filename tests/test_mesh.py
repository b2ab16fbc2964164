"""Mesh extraction: marching tetrahedra on an analytic sphere."""
import numpy as np

from nerf_tpu.utils.mesh import extract_mesh, marching_tetrahedra, save_obj, save_ply


def test_sphere_surface():
    def density(pts):
        return 10.0 * (1.0 - np.linalg.norm(pts, axis=-1))  # level 0 at r=1

    verts, faces = extract_mesh(density, level=0.0,
                                bbox=((-1.5,) * 3, (1.5,) * 3), resolution=48)
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=-1)
    # all vertices near the unit sphere
    assert np.abs(r - 1.0).max() < 0.08, np.abs(r - 1.0).max()
    assert faces.max() < len(verts)
    # surface area of the triangle soup ~ 4*pi
    tri = verts[faces]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1
    ).sum()
    assert abs(area - 4 * np.pi) / (4 * np.pi) < 0.1, area


def test_empty_field():
    field = np.zeros((8, 8, 8), np.float32)
    verts, faces = marching_tetrahedra(field, 0.5, np.zeros(3), np.ones(3))
    assert len(verts) == 0 and len(faces) == 0


def test_export(tmp_path):
    def density(pts):
        return 1.0 - np.linalg.norm(pts, axis=-1)

    verts, faces = extract_mesh(density, 0.0, ((-1.2,) * 3, (1.2,) * 3), 16)
    save_ply(str(tmp_path / "m.ply"), verts, faces)
    save_obj(str(tmp_path / "m.obj"), verts, faces)
    assert (tmp_path / "m.ply").stat().st_size > 100
    head = (tmp_path / "m.ply").read_bytes()[:3]
    assert head == b"ply"
