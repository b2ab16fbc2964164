"""Host-side data/geometry helpers (reference parity: src/utils/data_utils.py).

Functional re-implementation of the reference's data-utility surface: MVS
camera-file readers (ref :13-39), NSVF matrix/intrinsics loaders (ref
:123-162), projection-matrix decomposition (ref :577-598, done here with a
numpy RQ factorization instead of OpenCV), CenterNet-style gaussian heatmap
drawing (ref :163-267), affine/homography warps (ref :269-330), photometric
color augmentation (ref :338-398), detection post-processing — heatmap NMS,
top-k, bbox clipping (ref :503-547, numpy instead of torch), PLY point
loading (ref :549-555) and imagenet tensor normalization (ref :80-92).

These are host-side (numpy) by design: on TPU the hot path keeps arrays
device-resident, and the reference's ``to_cuda`` batch mover (ref :557-574)
has no equivalent here.
"""
from __future__ import annotations

import random

import numpy as np

from .vis_utils import mean_rgb, std_rgb

# ---------------------------------------------------------------------------
# camera / matrix file IO


def _matrix_from_lines(lines, rows, cols):
    vals = [float(v) for ln in lines for v in ln.split()]
    return np.asarray(vals, np.float32).reshape(rows, cols)


def read_cam_file(filename):
    """MVSNet-style cam.txt: 'extrinsic' 4x4, 'intrinsic' 3x3, depth line.

    Returns (intrinsics[3,3], extrinsics[4,4], depth_min). Ref :13-24.
    """
    with open(filename) as f:
        lines = [ln.rstrip() for ln in f]
    extrinsics = _matrix_from_lines(lines[1:5], 4, 4)
    intrinsics = _matrix_from_lines(lines[7:10], 3, 3)
    depth_min = float(lines[11].split()[0])
    return intrinsics, extrinsics, depth_min


def read_pmn_cam_file(filename):
    """Like :func:`read_cam_file` but also returns depth_max. Ref :27-39."""
    intrinsics, extrinsics, depth_min = read_cam_file(filename)
    with open(filename) as f:
        lines = [ln.rstrip() for ln in f]
    depth_max = float(lines[11].split()[1])
    return intrinsics, extrinsics, depth_min, depth_max


def load_matrix(path):
    """Whitespace matrix file; drops 2-column header/footer rows. Ref :123-129."""
    rows = [[float(w) for w in ln.split()] for ln in open(path) if ln.strip()]
    if rows and len(rows[0]) == 2:
        rows = rows[1:]
    if rows and len(rows[-1]) == 2:
        rows = rows[:-1]
    return np.asarray(rows, np.float32)


def load_nsvf_intrinsics(filepath, invert_y=False):
    """NSVF intrinsics: a 3x3 / 4x4 / 1x16 matrix file, or a single
    ``f cx cy _`` line. Always returns a 4x4. Ref :132-162."""
    try:
        m = load_matrix(filepath)
        if m.shape == (3, 3):
            out = np.eye(4, dtype=np.float32)
            out[:3, :3] = m
            return out
        if m.size == 16:
            return m.reshape(4, 4)
        if m.shape == (4, 4):
            return m
    except ValueError:
        pass
    with open(filepath) as f:
        fx, cx, cy, _ = map(float, f.readline().split())
    fy = -fx if invert_y else fx
    out = np.eye(4, dtype=np.float32)
    out[0, 0], out[1, 1], out[0, 2], out[1, 2] = fx, fy, cx, cy
    return out


def _rq(M):
    """RQ decomposition of a 3x3 matrix via a flipped QR."""
    J = np.flipud(np.eye(3, dtype=M.dtype))
    Q, R = np.linalg.qr((J @ M).T)
    return J @ R.T @ J, J @ Q.T  # (upper-triangular, orthonormal)


def load_K_Rt_from_P(filename=None, P=None):
    """Decompose a 3x4 projection matrix into intrinsics + c2w pose.

    Equivalent to the reference's cv2.decomposeProjectionMatrix path
    (ref :577-598) but via numpy RQ: P = K [R | t]; the returned pose is
    camera-to-world (R^T, camera center). Returns (intrinsics[4,4], pose[4,4]).
    """
    if P is None:
        lines = [ln.split() for ln in open(filename).read().splitlines() if ln]
        if len(lines) == 4:
            lines = lines[1:]
        P = np.asarray([row[:4] for row in lines], np.float32).squeeze()
    P = np.asarray(P, np.float64)
    K, R = _rq(P[:3, :3])
    # fix signs so K's diagonal is positive (absorb into R)
    sign = np.diag(np.sign(np.diag(K)))
    K, R = K @ sign, sign @ R
    if np.linalg.det(R) < 0:
        K, R = -K, -R
    center = -np.linalg.inv(P[:3, :3]) @ P[:3, 3]
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K / K[2, 2]
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.T
    pose[:3, 3] = center
    return intrinsics, pose


_PLY_DTYPES = {
    b"float": "<f4", b"float32": "<f4", b"double": "<f8", b"float64": "<f8",
    b"uchar": "u1", b"uint8": "u1", b"char": "i1", b"int8": "i1",
    b"short": "<i2", b"ushort": "<u2", b"int": "<i4", b"int32": "<i4",
    b"uint": "<u4", b"uint32": "<u4",
}


def load_ply(path):
    """Load the [N,3] xyz array of a PLY vertex cloud (ascii or
    binary_little_endian). Ref :549-555 (plyfile-based there)."""
    with open(path, "rb") as f:
        fmt, n_vertex, fields = None, 0, []
        in_vertex = False
        while True:
            line = f.readline().strip()
            if line.startswith(b"format"):
                fmt = line.split()[1]
            elif line.startswith(b"element"):
                in_vertex = line.split()[1] == b"vertex"
                if in_vertex:
                    n_vertex = int(line.split()[-1])
            elif line.startswith(b"property") and in_vertex:
                _, typ, name = line.split()[:3]
                fields.append((name.decode(), _PLY_DTYPES[typ]))
            elif line == b"end_header":
                break
        if fmt == b"ascii":
            rows = [f.readline().split() for _ in range(n_vertex)]
            data = np.asarray(rows, np.float64)
            idx = {name: i for i, (name, _) in enumerate(fields)}
            return np.stack([data[:, idx[k]] for k in "xyz"],
                            axis=-1).astype(np.float32)
        rec = np.dtype(fields)
        data = np.frombuffer(f.read(rec.itemsize * n_vertex), rec)
        return np.stack([data[k] for k in "xyz"], axis=-1).astype(np.float32)


# ---------------------------------------------------------------------------
# imagenet-normalized tensor conversion (ref :80-92); CHW float <-> HWC uint8


def to_tensor(rgb):
    rgb = rgb.astype(np.float32) / 255.0
    rgb = (rgb - mean_rgb) / std_rgb
    return rgb.transpose(2, 0, 1)


def to_img(chw):
    hwc = np.asarray(chw).transpose(1, 2, 0) * std_rgb + mean_rgb
    return np.clip(hwc * 255.0, 0, 255).astype(np.uint8)


def resize_image(img, mask, ixt, input_size):
    """Bilinear image + nearest mask resize, rescaling intrinsics. Ref :109-121."""
    import cv2

    ori_h, ori_w = img.shape[:2]
    tar_h, tar_w = input_size
    img = cv2.resize(img, input_size, interpolation=cv2.INTER_LINEAR)
    mask = cv2.resize(mask.astype(np.uint8), input_size,
                      interpolation=cv2.INTER_NEAREST)
    ixt = np.array(ixt, np.float32)
    ixt[0, [0, 2]] *= tar_h / ori_h
    ixt[1, [1, 2]] *= tar_w / ori_w
    return img, mask, ixt


def resize_images(imgs, masks, ixt, input_size):
    """Vector form of :func:`resize_image` sharing one intrinsic. Ref :94-107.

    The shared intrinsic is scaled once from the FIRST image's size (the
    reference scales the shared ixt once) — well-defined for empty input
    and mixed-size batches alike."""
    out_i, out_m = [], []
    new_ixt = np.array(ixt, np.float32)
    for i, (img, mask) in enumerate(zip(imgs, masks)):
        img, mask, scaled = resize_image(img, mask, np.array(ixt), input_size)
        if i == 0:
            new_ixt = scaled
        out_i.append(img)
        out_m.append(mask)
    return out_i, out_m, new_ixt


# ---------------------------------------------------------------------------
# gaussian heatmaps (CenterNet residue; ref :163-267)


def gaussian_radius(det_size, min_overlap=0.7):
    """Radius such that any center within it keeps IoU >= min_overlap."""
    h, w = det_size
    # three quadratic cases: both corners move / one inside / one outside
    coeffs = [
        (1.0, h + w, w * h * (1 - min_overlap) / (1 + min_overlap)),
        (4.0, 2 * (h + w), (1 - min_overlap) * w * h),
        (4.0 * min_overlap, -2 * min_overlap * (h + w), (min_overlap - 1) * w * h),
    ]
    radii = []
    for a, b, c in coeffs:
        disc = b * b - 4 * a * c
        if disc < 0:
            continue
        radii.append((b + np.sqrt(disc)) / 2)
    return min(radii)


def gaussian2D(shape, sigma=(1, 1), rho=0.0):
    if not isinstance(sigma, (tuple, list)):
        sigma = (sigma, sigma)
    sx, sy = sigma
    m, n = [(s - 1.0) / 2.0 for s in shape]
    y, x = np.ogrid[-m:m + 1, -n:n + 1]
    energy = (x * x) / (sx * sx) - 2 * rho * x * y / (sx * sy) + (y * y) / (sy * sy)
    h = np.exp(-energy / (2 * (1 - rho * rho)))
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    return h


def _paste_max(heatmap, gaussian, center, radius, k=1.0):
    """max-composite a (2r+1)² stamp at integer center, cropped to bounds."""
    x, y = int(center[0]), int(center[1])
    H, W = heatmap.shape[:2]
    l, r = min(x, radius), min(W - x, radius + 1)
    t, b = min(y, radius), min(H - y, radius + 1)
    if r + l <= 0 or b + t <= 0:
        return heatmap
    region = heatmap[y - t:y + b, x - l:x + r]
    stamp = gaussian[radius - t:radius + b, radius - l:radius + r]
    np.maximum(region, stamp * k, out=region)
    return heatmap


def draw_umich_gaussian(heatmap, center, radius, k=1):
    d = 2 * radius + 1
    return _paste_max(heatmap, gaussian2D((d, d), sigma=d / 6), center, radius, k)


def draw_distribution(heatmap, center, sigma_x, sigma_y, rho, radius, k=1):
    d = 2 * radius + 1
    g = gaussian2D((d, d), (sigma_x / 3, sigma_y / 3), rho)
    return _paste_max(heatmap, g, center, radius, k)


def draw_heatmap_np(hm, point, box_size):
    """point: [x, y]; stamps a gaussian of radius box_size[0]. Ref :247-254."""
    radius = max(0, int(box_size[0]))
    return draw_umich_gaussian(hm, np.asarray(point, np.int32), radius)


def compute_gaussian_1d(dmap, sigma=1):
    """dmap entries are distances; returns unnormalized gaussian probs."""
    prob = np.exp(-dmap / (2 * sigma * sigma))
    prob[prob < np.finfo(prob.dtype).eps * prob.max()] = 0
    return prob


# ---------------------------------------------------------------------------
# affine / homography warps (ref :269-330)


def get_3rd_point(a, b):
    direct = a - b
    return b + np.array([-direct[1], direct[0]], dtype=np.float32)


def get_dir(src_point, rot_rad):
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    return [src_point[0] * cs - src_point[1] * sn,
            src_point[0] * sn + src_point[1] * cs]


def _solve_affine(src, dst):
    """2x3 affine mapping three src points onto three dst points."""
    A = np.concatenate([src, np.ones((3, 1), np.float32)], axis=1)
    return np.linalg.solve(A, dst).T.astype(np.float32)  # [2,3]


def get_affine_transform(center, scale, rot, output_size,
                         shift=np.array([0, 0], dtype=np.float32), inv=0):
    """Center/scale/rotation crop transform (CenterNet convention)."""
    if not isinstance(scale, (np.ndarray, list)):
        scale = np.array([scale, scale], dtype=np.float32)
    src_w, (dst_w, dst_h) = scale[0], output_size
    rot_rad = np.pi * rot / 180
    src_dir = get_dir([0, src_w * -0.5], rot_rad)
    dst_dir = np.array([0, dst_w * -0.5], np.float32)

    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0] = center + scale * shift
    src[1] = center + src_dir + scale * shift
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = dst[0] + dst_dir
    src[2] = get_3rd_point(src[0], src[1])
    dst[2] = get_3rd_point(dst[0], dst[1])
    return _solve_affine(dst, src) if inv else _solve_affine(src, dst)


def affine_transform(pt, t):
    """pt: [n, 2] through a 2x3 affine."""
    return np.asarray(pt) @ t[:, :2].T + t[:, 2]


def homography_transform(pt, H):
    """pt: [n, 2] through a 3x3 homography (perspective divide)."""
    pt = np.concatenate([pt, np.ones([len(pt), 1])], axis=1) @ H.T
    return pt[..., :2] / pt[..., 2:]


def get_border(border, size):
    """Largest border//2^k that leaves an interior (ref :331-335)."""
    i = 1
    while np.any(size - border // i <= border // i):
        i *= 2
    return border // i


def clip_to_image(bbox, h, w):
    """Clamp [x1,y1,x2,y2] boxes to image bounds (ref :542-546, numpy)."""
    bbox = np.asarray(bbox)
    bbox[..., :2] = np.maximum(bbox[..., :2], 0)
    bbox[..., 2] = np.minimum(bbox[..., 2], w - 1)
    bbox[..., 3] = np.minimum(bbox[..., 3], h - 1)
    return bbox


# ---------------------------------------------------------------------------
# photometric augmentation (ref :338-398); images are float HWC in-place


def grayscale(image):
    """BT.601 luma (reference uses cv2 BGR->GRAY; same weights)."""
    b, g, r = image[..., 0], image[..., 1], image[..., 2]
    return 0.114 * b + 0.587 * g + 0.299 * r


def blend_(alpha, image1, image2):
    image1 *= alpha
    image1 += image2 * (1 - alpha)


def lighting_(data_rng, image, alphastd, eigval, eigvec):
    alpha = data_rng.normal(scale=alphastd, size=(3,))
    image += np.dot(eigvec, eigval * alpha)


def saturation_(data_rng, image, gs, gs_mean, var):
    blend_(1.0 + data_rng.uniform(-var, var), image, gs[:, :, None])


def brightness_(data_rng, image, gs, gs_mean, var):
    image *= 1.0 + data_rng.uniform(-var, var)


def contrast_(data_rng, image, gs, gs_mean, var):
    blend_(1.0 + data_rng.uniform(-var, var), image, gs_mean)


def color_aug(data_rng, image, eig_val, eig_vec):
    fns = [brightness_, contrast_, saturation_]
    random.shuffle(fns)
    gs = grayscale(image)
    gs_mean = gs.mean()
    for f in fns:
        f(data_rng, image, gs, gs_mean, 0.4)
    lighting_(data_rng, image, 0.1, eig_val, eig_vec)


def gaussian_blur(image, sigma):
    """Per-channel gaussian blur, mirror boundary (ref :387-398)."""
    from scipy import ndimage

    if image.ndim == 2:
        image[:, :] = ndimage.gaussian_filter(image, sigma, mode="mirror")
    else:
        for c in range(image.shape[2]):
            image[:, :, c] = ndimage.gaussian_filter(
                image[:, :, c], sigma, mode="mirror")
    return image


def truncated_normal(mean, sigma, low, high, data_rng=None):
    if data_rng is None:
        data_rng = np.random.RandomState()
    return np.clip(data_rng.normal(mean, sigma), low, high)


# ---------------------------------------------------------------------------
# detection post-processing (ref :503-540), numpy instead of torch


def heatmap_nms(heat, kernel=3):
    """Keep only local maxima of [b,c,h,w] heatmaps (ref _nms :503-510)."""
    from scipy import ndimage

    hmax = ndimage.maximum_filter(heat, size=(1, 1, kernel, kernel),
                                  mode="constant")
    return heat * (hmax == heat)


def gather_feat(feat, ind):
    """feat [b,n,d] gathered at ind [b,k] -> [b,k,d] (ref :513-521)."""
    return np.take_along_axis(feat, ind[..., None].repeat(feat.shape[2], 2), 1)


def topk(scores, K=40):
    """Top-K peaks of [b,c,h,w] score maps.

    Returns (score, inds, clses, ys, xs), each [b,K] (ref _topk :524-539).
    """
    b, c, h, w = scores.shape
    flat = scores.reshape(b, c, -1)
    part = np.argpartition(-flat, K - 1, axis=2)[:, :, :K]
    part_scores = np.take_along_axis(flat, part, 2)
    order = np.argsort(-part_scores, axis=2)
    topk_inds = np.take_along_axis(part, order, 2)          # [b,c,K]
    topk_scores = np.take_along_axis(part_scores, order, 2)

    ys = (topk_inds // w).astype(np.float32)
    xs = (topk_inds % w).astype(np.float32)

    flat_all = topk_scores.reshape(b, -1)
    part2 = np.argpartition(-flat_all, K - 1, axis=1)[:, :K]
    order2 = np.argsort(-np.take_along_axis(flat_all, part2, 1), axis=1)
    topk_ind = np.take_along_axis(part2, order2, 1)          # [b,K]
    topk_score = np.take_along_axis(flat_all, topk_ind, 1)
    topk_clses = (topk_ind // K).astype(np.int32)
    sel = lambda a: gather_feat(a.reshape(b, -1, 1), topk_ind)[..., 0]
    return (topk_score, sel(topk_inds).astype(np.int64), topk_clses,
            sel(ys), sel(xs))


# ---------------------------------------------------------------------------
# mask intersection helpers (ref :400-425)


def inter_from_mask(pred, gt):
    return np.logical_and(pred.astype(bool), gt.astype(bool)).sum()


def draw_poly(mask, poly):
    import cv2

    cv2.fillPoly(mask, [np.asarray(poly, np.int32)], 255)
    return mask


def inter_from_poly(poly, gt, width, height):
    mask_small = draw_poly(np.zeros((height, width), np.uint8), poly)
    return inter_from_mask(mask_small, gt[..., 0] if gt.ndim == 3 else gt)


def get_edge(mask):
    """Mask minus its 3x3 erosion = one-pixel inner edge (ref :257-259)."""
    from scipy import ndimage

    eroded = ndimage.grey_erosion(mask, size=(3, 3))
    return mask - eroded
