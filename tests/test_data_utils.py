"""Tests for nerf_tpu.utils.data_utils (reference src/utils/data_utils.py)."""
import numpy as np
import pytest

from nerf_tpu.utils import data_utils as du


def test_read_cam_file(tmp_path):
    ext = np.arange(16, dtype=np.float32).reshape(4, 4)
    ixt = np.arange(9, dtype=np.float32).reshape(3, 3) + 1
    lines = ["extrinsic"]
    lines += [" ".join(str(v) for v in row) for row in ext]
    lines += ["", "intrinsic"]
    lines += [" ".join(str(v) for v in row) for row in ixt]
    lines += ["", "425.0 2.5"]
    p = tmp_path / "cam.txt"
    p.write_text("\n".join(lines) + "\n")

    K, E, dmin = du.read_cam_file(str(p))
    np.testing.assert_allclose(E, ext)
    np.testing.assert_allclose(K, ixt)
    assert dmin == 425.0
    K, E, dmin, dmax = du.read_pmn_cam_file(str(p))
    assert (dmin, dmax) == (425.0, 2.5)


def test_load_matrix_and_nsvf_intrinsics(tmp_path):
    p = tmp_path / "m.txt"
    p.write_text("1 0 0\n0 2 0\n0 0 1\n")
    m = du.load_matrix(str(p))
    assert m.shape == (3, 3) and m[1, 1] == 2

    out = du.load_nsvf_intrinsics(str(p))
    assert out.shape == (4, 4) and out[3, 3] == 1 and out[1, 1] == 2

    # single-line "f cx cy 0" form
    q = tmp_path / "i.txt"
    q.write_text("100.0 50.0 40.0 0\n")
    out = du.load_nsvf_intrinsics(str(q))
    assert out[0, 0] == 100 and out[0, 2] == 50 and out[1, 2] == 40
    out = du.load_nsvf_intrinsics(str(q), invert_y=True)
    assert out[1, 1] == -100

    # 1x16 flattened form
    r = tmp_path / "f.txt"
    r.write_text(" ".join(str(float(v)) for v in range(16)))
    assert du.load_nsvf_intrinsics(str(r)).shape == (4, 4)


def test_load_K_Rt_from_P_roundtrip():
    # build P = K [R | -R C] from known components, check recovery
    K = np.array([[500.0, 0, 320], [0, 480, 240], [0, 0, 1]])
    aa = 0.4
    R = np.array([[np.cos(aa), -np.sin(aa), 0],
                  [np.sin(aa), np.cos(aa), 0],
                  [0, 0, 1.0]])
    C = np.array([1.0, -2.0, 3.0])
    P = K @ np.concatenate([R, (-R @ C)[:, None]], axis=1)

    intr, pose = du.load_K_Rt_from_P(P=P)
    np.testing.assert_allclose(intr[:3, :3], K, atol=1e-6)
    np.testing.assert_allclose(pose[:3, :3], R.T, atol=1e-6)
    np.testing.assert_allclose(pose[:3, 3], C, atol=1e-5)


def test_load_ply_binary_and_ascii(tmp_path):
    verts = np.array([[0, 0, 0], [1, 2, 3], [-1, 0.5, 2]], np.float32)
    from nerf_tpu.utils.mesh import save_ply

    p = tmp_path / "v.ply"
    save_ply(str(p), verts, np.zeros((0, 3), np.int32))
    np.testing.assert_allclose(du.load_ply(str(p)), verts)

    q = tmp_path / "a.ply"
    body = "\n".join(f"{x} {y} {z} 0.5" for x, y, z in verts)
    q.write_text(
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float conf\nend_header\n" + body + "\n")
    np.testing.assert_allclose(du.load_ply(str(q)), verts)


def test_tensor_roundtrip():
    rgb = (np.random.RandomState(0).rand(8, 6, 3) * 255).astype(np.uint8)
    chw = du.to_tensor(rgb)
    assert chw.shape == (3, 8, 6)
    back = du.to_img(chw)
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 1


def test_resize_image_rescales_intrinsics():
    img = np.random.RandomState(0).rand(40, 40, 3).astype(np.float32)
    mask = (img[..., 0] > 0.5).astype(np.uint8)
    ixt = np.array([[100.0, 0, 20], [0, 100, 20], [0, 0, 1]])
    img2, mask2, ixt2 = du.resize_image(img, mask, ixt, (20, 20))
    assert img2.shape == (20, 20, 3) and mask2.shape == (20, 20)
    assert ixt2[0, 0] == 50 and ixt2[1, 1] == 50 and ixt2[0, 2] == 10
    imgs, masks, ixt3 = du.resize_images([img, img], [mask, mask], ixt, (20, 20))
    assert len(imgs) == 2 and ixt3[0, 0] == 50


def test_gaussian_heatmap_drawing():
    # radius keeps IoU >= overlap for the worst shifted box
    r = du.gaussian_radius((10, 10), 0.7)
    assert 0 < r < 10

    g = du.gaussian2D((7, 7), sigma=1.0)
    assert g[3, 3] == 1.0 and g[0, 0] < g[3, 3]
    # correlated gaussian is asymmetric across the diagonal pair
    gr = du.gaussian2D((7, 7), sigma=(1, 1), rho=0.5)
    assert gr[2, 2] > gr[2, 4]

    hm = np.zeros((20, 20), np.float32)
    du.draw_umich_gaussian(hm, (10, 10), 3)
    assert hm[10, 10] == 1.0 and hm[0, 0] == 0.0
    # stamping near the border crops instead of erroring
    du.draw_umich_gaussian(hm, (0, 0), 3)
    assert hm[0, 0] == 1.0
    du.draw_distribution(hm, (15, 5), 2.0, 1.0, 0.0, 3)
    assert hm[5, 15] == 1.0
    du.draw_heatmap_np(hm, (4, 16), (2, 2))
    assert hm[16, 4] == 1.0

    prob = du.compute_gaussian_1d(np.array([0.0, 1.0, 100.0]), sigma=1)
    assert prob[0] == 1.0 and prob[1] < 1.0


def test_affine_transform_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    center = np.array([30.0, 40.0], np.float32)
    t = du.get_affine_transform(center, 50.0, 30.0, (64, 64))
    # oracle: same three-point correspondence through cv2
    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src_dir = du.get_dir([0, -25.0], np.pi * 30.0 / 180)
    src[0], src[1] = center, center + src_dir
    dst[0], dst[1] = [32, 32], [32, 32 + -32]
    src[2] = du.get_3rd_point(src[0], src[1])
    dst[2] = du.get_3rd_point(dst[0], dst[1])
    ref = cv2.getAffineTransform(src, dst)
    np.testing.assert_allclose(t, ref, atol=1e-4)

    inv = du.get_affine_transform(center, 50.0, 30.0, (64, 64), inv=1)
    pts = np.array([[1.0, 2.0], [10.0, 20.0]])
    back = du.affine_transform(du.affine_transform(pts, t), inv)
    np.testing.assert_allclose(back, pts, atol=1e-3)


def test_homography_and_border_and_clip():
    H = np.diag([2.0, 2.0, 1.0])
    out = du.homography_transform(np.array([[1.0, 2.0]]), H)
    np.testing.assert_allclose(out, [[2.0, 4.0]])

    assert du.get_border(128, np.array([100, 100])) == 32

    boxes = np.array([[-5.0, -5.0, 200.0, 300.0]])
    clipped = du.clip_to_image(boxes.copy(), 100, 150)
    np.testing.assert_allclose(clipped, [[0, 0, 149, 99]])


def test_color_aug_in_place():
    rng = np.random.RandomState(0)
    img = rng.rand(16, 16, 3).astype(np.float32)
    orig = img.copy()
    eig_val = np.array([0.2141788, 0.01817699, 0.00341571], np.float32)
    eig_vec = np.array([[-0.58752847, -0.69563484, 0.41340352],
                        [-0.5832747, 0.00994535, -0.81221408],
                        [-0.56089297, 0.71832671, 0.41158938]], np.float32)
    du.color_aug(rng, img, eig_val, eig_vec)
    assert img.shape == orig.shape and not np.allclose(img, orig)

    blurred = du.gaussian_blur(orig.copy(), sigma=2.0)
    assert blurred.std() < orig.std()

    v = du.truncated_normal(0.0, 1.0, -0.1, 0.1, np.random.RandomState(1))
    assert -0.1 <= v <= 0.1


def test_heatmap_nms_and_topk():
    rng = np.random.RandomState(0)
    heat = rng.rand(2, 3, 16, 16).astype(np.float32)
    kept = du.heatmap_nms(heat)
    # survivors are exactly the 3x3 local maxima
    for b in range(2):
        for c in range(3):
            ys, xs = np.nonzero(kept[b, c])
            for y, x in zip(ys, xs):
                patch = heat[b, c, max(0, y - 1):y + 2, max(0, x - 1):x + 2]
                assert heat[b, c, y, x] == patch.max()

    score, inds, clses, ys, xs = du.topk(heat, K=5)
    assert score.shape == (2, 5)
    # the global argmax is the first entry
    for b in range(2):
        assert score[b, 0] == heat[b].max()
        c, y, x = int(clses[b, 0]), int(ys[b, 0]), int(xs[b, 0])
        assert heat[b, c, y, x] == heat[b].max()
        assert int(inds[b, 0]) == y * 16 + x
    # scores sorted descending
    assert np.all(np.diff(score, axis=1) <= 0)


def test_mask_helpers():
    gt = np.zeros((10, 10, 1), np.uint8)
    gt[2:5, 2:5] = 1
    poly = np.array([[2, 2], [2, 4], [4, 4], [4, 2]])
    inter = du.inter_from_poly(poly, gt, 10, 10)
    assert inter > 0

    mask = np.zeros((10, 10), np.uint8)
    mask[3:7, 3:7] = 1
    edge = du.get_edge(mask)
    assert edge[3, 3] == 1 and edge[4, 4] == 0 and edge.sum() == 12


def test_base_utils_pickle_and_load_object(tmp_path):
    from nerf_tpu.utils.ray_utils import load_object, read_pickle, save_pickle

    p = tmp_path / "sub" / "x.pkl"
    save_pickle({"a": [1, 2, 3]}, str(p))
    assert read_pickle(str(p)) == {"a": [1, 2, 3]}

    od = load_object("collections.OrderedDict", {})
    assert type(od).__name__ == "OrderedDict"
    frac = load_object("fractions.Fraction", {"numerator": 3},
                       denominator=4)
    assert float(frac) == 0.75
