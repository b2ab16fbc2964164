"""COLMAP I/O round-trip tests (mirrors the toolbox's own test strategy)."""
import subprocess
import sys
import json
import numpy as np

from nerf_tpu.utils.colmap import (
    Camera, Image, Point3D, image_c2w, qvec2rotmat, rotmat2qvec,
    read_cameras_bin, read_cameras_txt, read_images_bin, read_images_txt,
    read_points3d_bin, write_cameras_bin, write_cameras_txt,
    write_images_bin, write_images_txt, write_points3d_bin,
)


def _model():
    rng = np.random.RandomState(0)
    cams = {1: Camera(1, "PINHOLE", 800, 600,
                      np.array([700.0, 710.0, 400.0, 300.0]))}
    imgs = {}
    for i in range(1, 4):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        q *= np.sign(q[0]) if q[0] != 0 else 1
        imgs[i] = Image(i, q, rng.randn(3), 1, f"img_{i}.png",
                        rng.rand(5, 2) * 100,
                        rng.randint(-1, 10, 5).astype(np.int64))
    pts = {7: Point3D(7, rng.randn(3), np.array([10, 20, 30]), 0.5,
                      np.array([1, 2]), np.array([0, 1]))}
    return cams, imgs, pts


def test_quaternion_roundtrip():
    rng = np.random.RandomState(1)
    for _ in range(10):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        q *= np.sign(q[0]) if q[0] != 0 else 1
        R = qvec2rotmat(q)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(rotmat2qvec(R), q, atol=1e-8)


def test_bin_roundtrip(tmp_path):
    cams, imgs, pts = _model()
    write_cameras_bin(str(tmp_path / "cameras.bin"), cams)
    write_images_bin(str(tmp_path / "images.bin"), imgs)
    write_points3d_bin(str(tmp_path / "points3D.bin"), pts)
    cams2 = read_cameras_bin(str(tmp_path / "cameras.bin"))
    imgs2 = read_images_bin(str(tmp_path / "images.bin"))
    pts2 = read_points3d_bin(str(tmp_path / "points3D.bin"))
    np.testing.assert_allclose(cams2[1].params, cams[1].params)
    for i in imgs:
        np.testing.assert_allclose(imgs2[i].qvec, imgs[i].qvec)
        np.testing.assert_allclose(imgs2[i].xys, imgs[i].xys)
        assert imgs2[i].name == imgs[i].name
    np.testing.assert_allclose(pts2[7].xyz, pts[7].xyz)


def test_txt_roundtrip(tmp_path):
    cams, imgs, _ = _model()
    write_cameras_txt(str(tmp_path / "cameras.txt"), cams)
    write_images_txt(str(tmp_path / "images.txt"), imgs)
    cams2 = read_cameras_txt(str(tmp_path / "cameras.txt"))
    imgs2 = read_images_txt(str(tmp_path / "images.txt"))
    np.testing.assert_allclose(cams2[1].params, cams[1].params)
    for i in imgs:
        np.testing.assert_allclose(imgs2[i].qvec, imgs[i].qvec, atol=1e-12)


def test_c2w_inverts_world2cam():
    _, imgs, _ = _model()
    im = imgs[1]
    c2w = image_c2w(im)
    R = qvec2rotmat(im.qvec)
    # world->cam of the camera center must be the origin
    center = c2w[:3, 3]
    np.testing.assert_allclose(R @ center + im.tvec, 0, atol=1e-12)


def test_colmap2nerf_cli(tmp_path):
    cams, imgs, pts = _model()
    write_cameras_txt(str(tmp_path / "cameras.txt"), cams)
    write_images_txt(str(tmp_path / "images.txt"), imgs)
    out = tmp_path / "transforms.json"
    subprocess.run(
        [sys.executable, "scripts/colmap2nerf.py", "--model_dir",
         str(tmp_path), "--out", str(out)],
        check=True, capture_output=True,
    )
    data = json.loads(out.read_text())
    assert len(data["frames"]) == 3
    assert "camera_angle_x" in data
    m = np.asarray(data["frames"][0]["transform_matrix"])
    assert m.shape == (4, 4)


def test_points3d_txt_roundtrip(tmp_path):
    from nerf_tpu.utils.colmap import (
        Point3D, read_points3d_txt, write_points3d_txt,
    )

    pts = {
        7: Point3D(id=7, xyz=np.array([0.1, -2.5, 3.0]),
                   rgb=np.array([10, 20, 30], np.uint8), error=0.5,
                   image_ids=np.array([1, 2], np.int64),
                   point2D_idxs=np.array([4, 9], np.int64)),
        9: Point3D(id=9, xyz=np.array([1.0, 2.0, -3.5]),
                   rgb=np.array([255, 0, 128], np.uint8), error=1.25,
                   image_ids=np.array([3], np.int64),
                   point2D_idxs=np.array([0], np.int64)),
    }
    p = str(tmp_path / "points3D.txt")
    write_points3d_txt(p, pts)
    got = read_points3d_txt(p)
    assert set(got) == {7, 9}
    for k in pts:
        np.testing.assert_allclose(got[k].xyz, pts[k].xyz)
        np.testing.assert_array_equal(got[k].rgb, pts[k].rgb)
        assert got[k].error == pts[k].error
        np.testing.assert_array_equal(got[k].image_ids, pts[k].image_ids)


def test_dense_array_roundtrip(tmp_path):
    """COLMAP dense depth/normal map format (read_write_dense.py parity)."""
    from nerf_tpu.utils.colmap import read_array, write_array

    rng = np.random.RandomState(0)
    depth = rng.rand(5, 7).astype(np.float32)          # [H, W]
    normal = rng.rand(5, 7, 3).astype(np.float32)      # [H, W, 3]
    for name, arr in [("d.bin", depth), ("n.bin", normal)]:
        p = str(tmp_path / name)
        write_array(p, arr)
        got = read_array(p)
        assert got.shape == arr.shape
        np.testing.assert_allclose(got, arr)
    # header check: W&H&C&
    with open(str(tmp_path / "d.bin"), "rb") as f:
        assert f.read(6) == b"7&5&1&"


def test_fused_vis_roundtrip(tmp_path):
    """fused.ply + fused.ply.vis (read_write_fused_vis.py parity)."""
    from nerf_tpu.utils.colmap import MeshPoint, read_fused, write_fused

    rng = np.random.RandomState(1)
    pts = [
        MeshPoint(position=rng.rand(3).astype(np.float32),
                  normal=rng.rand(3).astype(np.float32),
                  color=rng.randint(0, 255, 3).astype(np.uint8),
                  visible_image_idxs=np.asarray(v, np.uint32))
        for v in ([0, 3, 5], [], [1])
    ]
    ply, vis = str(tmp_path / "fused.ply"), str(tmp_path / "fused.ply.vis")
    write_fused(pts, ply, vis)
    got = read_fused(ply, vis)
    assert len(got) == 3
    for a, b in zip(got, pts):
        np.testing.assert_allclose(a.position, b.position)
        np.testing.assert_allclose(a.normal, b.normal)
        np.testing.assert_array_equal(a.color, b.color)
        np.testing.assert_array_equal(a.visible_image_idxs,
                                      b.visible_image_idxs)


def test_colmap_database_roundtrip(tmp_path):
    """COLMAP SQLite schema (database.py parity): cameras, images,
    keypoints, descriptors, matches, two-view geometry, pair ids."""
    from nerf_tpu.utils.colmap_database import (
        COLMAPDatabase, image_ids_to_pair_id, pair_id_to_image_ids,
    )

    db = COLMAPDatabase.connect(str(tmp_path / "db.db"))
    db.create_tables()
    rng = np.random.RandomState(2)

    cam1 = db.add_camera(model=1, width=800, height=600,
                         params=[500.0, 400.0, 300.0, 0.1])
    cam2 = db.add_camera(model=0, width=640, height=480,
                         params=[400.0, 320.0, 240.0])
    im1 = db.add_image("a.png", cam1)
    im2 = db.add_image("b.png", cam2)

    kp1 = rng.rand(32, 2).astype(np.float32) * 800
    desc1 = rng.randint(0, 256, (32, 128)).astype(np.uint8)
    db.add_keypoints(im1, kp1)
    db.add_descriptors(im1, desc1)
    matches = rng.randint(0, 32, (10, 2)).astype(np.uint32)
    db.add_matches(im2, im1, matches)  # reversed ids: columns must swap
    db.add_two_view_geometry(im1, im2, matches)
    db.commit()

    cams = db.read_cameras()
    assert cams[cam1]["width"] == 800
    np.testing.assert_allclose(cams[cam2]["params"], [400.0, 320.0, 240.0])
    imgs = db.read_images()
    assert imgs[im1]["name"] == "a.png" and imgs[im2]["camera_id"] == cam2
    np.testing.assert_allclose(db.read_keypoints(im1), kp1)
    np.testing.assert_array_equal(db.read_descriptors(im1), desc1)
    # matches stored canonically (smaller id first); reading back with the
    # same reversed order returns the original column order
    np.testing.assert_array_equal(db.read_matches(im2, im1), matches)
    np.testing.assert_array_equal(db.read_matches(im1, im2),
                                  matches[:, ::-1])

    pid = image_ids_to_pair_id(im2, im1)
    assert pair_id_to_image_ids(pid) == (min(im1, im2), max(im1, im2))
    db.close()


def _tiny_model():
    from nerf_tpu.utils.colmap import Camera, Image, Point3D, rotmat2qvec

    rng = np.random.RandomState(5)
    cams = {1: Camera(id=1, model="SIMPLE_PINHOLE", width=64, height=48,
                      params=np.array([50.0, 32.0, 24.0]))}
    imgs = {}
    for i in (1, 2):
        theta = 0.3 * i
        R = np.array([[np.cos(theta), -np.sin(theta), 0],
                      [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
        imgs[i] = Image(id=i, qvec=rotmat2qvec(R),
                        tvec=rng.rand(3), camera_id=1, name=f"im{i}.png")
    pts = {3: Point3D(id=3, xyz=np.array([0.5, -0.25, 2.0]),
                      rgb=np.array([200, 100, 50], np.uint8), error=0.1,
                      image_ids=np.array([1, 2]),
                      point2D_idxs=np.array([7, 9]))}
    return cams, imgs, pts


def test_export_bundler_and_nvm(tmp_path):
    from nerf_tpu.utils.colmap import qvec2rotmat
    from nerf_tpu.utils.colmap_export import write_bundler, write_nvm

    cams, imgs, pts = _tiny_model()
    bpath = str(tmp_path / "bundle.out")
    write_bundler(bpath, cams, imgs, pts, list_path=str(tmp_path / "list.txt"))
    lines = open(bpath).read().splitlines()
    assert lines[0].startswith("# Bundle file v0.3")
    n_cam, n_pts = (int(x) for x in lines[1].split())
    assert n_cam == 2 and n_pts == 1
    # camera block: f-line + 3 R rows + t; flip-yz applied consistently
    f0 = float(lines[2].split()[0])
    assert f0 == 50.0
    R_read = np.array([[float(v) for v in lines[2 + r].split()]
                       for r in (1, 2, 3)])
    want = np.diag([1.0, -1.0, -1.0]) @ qvec2rotmat(imgs[1].qvec)
    np.testing.assert_allclose(R_read, want, atol=1e-8)
    # point block: xyz / rgb / track of 2 views
    assert lines[-1].split()[0] == "2"
    assert open(str(tmp_path / "list.txt")).read().split() == [
        "im1.png", "im2.png"]

    npath = str(tmp_path / "model.nvm")
    write_nvm(npath, cams, imgs, pts)
    nl = open(npath).read().splitlines()
    assert nl[0] == "NVM_V3" and int(nl[2]) == 2
    # camera center = -R^T t
    rec = nl[3].split()
    c_read = np.array([float(v) for v in rec[6:9]])
    R = qvec2rotmat(imgs[1].qvec)
    np.testing.assert_allclose(c_read, -R.T @ imgs[1].tvec, atol=1e-8)


def test_export_inliers_and_merge_ply(tmp_path):
    from nerf_tpu.utils.colmap import MeshPoint, write_fused, read_fused
    from nerf_tpu.utils.colmap_database import COLMAPDatabase
    from nerf_tpu.utils.colmap_export import (
        export_inlier_matches, export_inlier_pairs, merge_ply_files,
    )

    db = COLMAPDatabase.connect(str(tmp_path / "db.db"))
    db.create_tables()
    cam = db.add_camera(0, 64, 48, [50.0, 32.0, 24.0])
    i1, i2 = db.add_image("a.png", cam), db.add_image("b.png", cam)
    rng = np.random.RandomState(6)
    m = rng.randint(0, 30, (20, 2)).astype(np.uint32)
    db.add_two_view_geometry(i1, i2, m)
    db.commit()

    mp = str(tmp_path / "matches.txt")
    export_inlier_matches(db, mp, min_num_matches=15)
    lines = open(mp).read().splitlines()
    assert lines[0] == "a.png b.png 20" and len(lines) == 21
    # threshold filters the pair out
    export_inlier_matches(db, mp, min_num_matches=25)
    assert open(mp).read() == ""
    pp = str(tmp_path / "pairs.txt")
    export_inlier_pairs(db, pp)
    assert open(pp).read().strip() == "a.png b.png"

    # PLY merge: two fused clouds -> one with summed vertex count
    def cloud(n, seed):
        r = np.random.RandomState(seed)
        return [MeshPoint(position=r.rand(3).astype(np.float32),
                          normal=r.rand(3).astype(np.float32),
                          color=r.randint(0, 255, 3).astype(np.uint8),
                          visible_image_idxs=np.zeros(0, np.uint32))
                for _ in range(n)]

    c1, c2 = cloud(3, 1), cloud(2, 2)
    for name, c in (("a", c1), ("b", c2)):
        write_fused(c, str(tmp_path / f"{name}.ply"),
                    str(tmp_path / f"{name}.ply.vis"))
    merged = str(tmp_path / "merged.ply")
    merge_ply_files([str(tmp_path / "a.ply"), str(tmp_path / "b.ply")], merged)
    # write a matching .vis so read_fused can parse the merged cloud
    write_fused(c1 + c2, str(tmp_path / "ref.ply"),
                str(tmp_path / "merged.ply.vis"))
    got = read_fused(merged, str(tmp_path / "merged.ply.vis"))
    assert len(got) == 5
    np.testing.assert_allclose(got[3].position, c2[0].position)
