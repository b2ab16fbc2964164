"""ZJU light-stage multi-camera dataset (dynamic human capture).

Parity surface: reference ``src/datasets/light_stage.py`` — an annots.npy
rig description ({cams: {K,R,T,D}, ims: per-frame image lists}), per-frame
SMPL vertices defining world bounds, foreground masks, camera/frame range
selection ``[start, end, skip]``, and ray batches that mix foreground
(mask-guided) and background (world-bbox-projected) pixels for training and
full-image rays for testing. Rays carry the frame's latent index in the
7th column. Re-designed host-side in plain NumPy (no torch DataLoader);
the arrays feed the device-side samplers directly.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np


def _undistort(img: np.ndarray, K: np.ndarray, D: np.ndarray) -> np.ndarray:
    if D is None or not np.any(np.abs(D) > 1e-12):
        return img
    try:
        import cv2

        return cv2.undistort(img, np.asarray(K, np.float64),
                             np.asarray(D, np.float64))
    except ImportError:  # pragma: no cover - cv2 is present in this image
        return img


def project_bbox(wbbox: np.ndarray, K: np.ndarray, ext: np.ndarray,
                 H: int, W: int) -> Tuple[np.ndarray, np.ndarray]:
    """Project the 8 world-bbox corners -> (2D bbox [x0,y0,x1,y1], HxW mask).

    The mask marks the convex screen-space bbox of the projected corners
    (the sampling region for background rays).
    """
    from ..utils.vis_utils import get_bbox_2d, get_bound_2d_mask

    bounds = np.asarray(wbbox, np.float64).reshape(2, 3)
    bb = get_bbox_2d(bounds, K, ext)
    x0, y0 = max(int(np.floor(bb[0])), 0), max(int(np.floor(bb[1])), 0)
    x1 = min(int(np.ceil(bb[2])), W - 1)
    y1 = min(int(np.ceil(bb[3])), H - 1)
    return (np.array([x0, y0, x1, y1]),
            get_bound_2d_mask(bounds, K, ext, H, W))


class LightStageDataset:
    def __init__(
        self,
        data_root: str,
        split: str = "train",
        cameras: Tuple[int, int, int] = (0, -1, 1),
        frames: Tuple[int, int, int] = (0, -1, 1),
        train_frames: Optional[Tuple[int, int, int]] = None,
        input_ratio: float = 1.0,
        n_rays: int = 1024,
        vertices_dir: str = "new_vertices",
        seed: int = 0,
    ):
        self.data_root = data_root
        self.split = split
        self.input_ratio = float(input_ratio)
        self.n_rays = int(n_rays)
        self._rng = np.random.RandomState(seed)

        annots = np.load(os.path.join(data_root, "annots.npy"),
                         allow_pickle=True).item()
        self.cams = annots["cams"]
        num_cams = len(self.cams["K"])
        c0, c1, cs = cameras
        c1 = num_cams if c1 == -1 else c1
        self.render_cameras = np.arange(num_cams)[c0:c1:cs]

        num_frames = len(annots["ims"])
        f0, f1, fs = frames
        f1 = num_frames if f1 == -1 else f1
        t0, t1, ts = train_frames if train_frames is not None else frames
        t1 = num_frames if t1 == -1 else t1
        training_frames = np.arange(num_frames)[t0:t1:ts].tolist()

        self.items: List[Dict] = []
        bboxs = []
        for fi in np.arange(num_frames)[f0:f1:fs]:
            # latent index = position within the TRAIN frame schedule
            latent = training_frames.index(fi) if fi in training_frames else 0
            for ci in self.render_cameras:
                self.items.append(dict(
                    img_path=os.path.join(
                        data_root, annots["ims"][fi]["ims"][ci]),
                    frame_index=int(fi), camera_index=int(ci),
                    latent_index=int(latent),
                ))
            vpath = os.path.join(data_root, vertices_dir, f"{fi}.npy")
            verts = np.load(vpath)
            bboxs.append(np.concatenate(
                [verts.min(0) - 0.05, verts.max(0) + 0.05]))
        bboxs = np.stack(bboxs)
        self.wbbox = np.concatenate(
            [bboxs[:, :3].min(0), bboxs[:, 3:6].max(0)]).astype(np.float32)
        self._cache: Dict[int, Tuple] = {}
        self._region_cache: Dict[int, Tuple] = {}

    def __len__(self) -> int:
        return len(self.items)

    def _mask_path(self, img_path: str) -> str:
        rel = os.path.relpath(img_path, self.data_root)
        for cand in (
            os.path.join(self.data_root, "mask_cihp", rel),
            os.path.join(self.data_root, "mask", rel),
            os.path.join(self.data_root, rel.replace("images", "mask")),
        ):
            p = os.path.splitext(cand)[0] + ".png"
            if os.path.exists(p):
                return p
        raise FileNotFoundError(f"no mask for {img_path}")

    def _read(self, index: int):
        if index in self._cache:
            return self._cache[index]
        item = self.items[index]
        import imageio.v2 as imageio

        img = imageio.imread(item["img_path"]).astype(np.float32) / 255.0
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, -1)
        img = img[..., :3]
        msk = imageio.imread(self._mask_path(item["img_path"]))
        if msk.ndim == 3:
            msk = msk[..., 0]
        msk = (msk != 0).astype(np.uint8)

        ci = item["camera_index"]
        K = np.asarray(self.cams["K"][ci], np.float64).copy()
        D_list = self.cams.get("D")
        D = (np.asarray(D_list[ci], np.float64)
             if D_list is not None else np.zeros(5))
        img = _undistort(img, K, D)
        msk = _undistort(msk, K, D)

        if self.input_ratio != 1.0:
            try:
                import cv2

                img = cv2.resize(img, None, fx=self.input_ratio,
                                 fy=self.input_ratio)
                msk = cv2.resize(msk, None, fx=self.input_ratio,
                                 fy=self.input_ratio,
                                 interpolation=cv2.INTER_NEAREST)
            except ImportError:  # pragma: no cover
                step = int(round(1.0 / self.input_ratio))
                img, msk = img[::step, ::step], msk[::step, ::step]
            K[:2] *= self.input_ratio

        img = img * (msk > 0)[..., None]  # black out background
        nz = msk.nonzero()
        fg_bbox = (np.array([nz[1].min() - 1, nz[0].min() - 1,
                             nz[1].max() + 1, nz[0].max() + 1])
                   if nz[0].size else np.array([0, 0, msk.shape[1] - 1,
                                                msk.shape[0] - 1]))

        R = np.asarray(self.cams["R"][ci], np.float64)
        T = np.asarray(self.cams["T"][ci], np.float64).reshape(3) / 1000.0
        ext = np.eye(4)
        ext[:3, :3], ext[:3, 3] = R, T
        out = (img.astype(np.float32), msk, K.astype(np.float32),
               ext.astype(np.float32), fg_bbox)
        self._cache[index] = out
        return out

    def _sample_region(self, bbox, region_mask, count, H, W, oversample=4):
        x = self._rng.randint(max(int(bbox[0]), 0),
                              min(int(bbox[2]) + 1, W),
                              size=oversample * count)
        y = self._rng.randint(max(int(bbox[1]), 0),
                              min(int(bbox[3]) + 1, H),
                              size=oversample * count)
        ok = region_mask[y, x] == 1
        return x[ok][:count], y[ok][:count]

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        item = self.items[index]
        img, msk, K, ext, fg_bbox = self._read(index)
        H, W = img.shape[:2]

        if self.split == "train":
            fg_num = self.n_rays // 2
            bg_num = self.n_rays - fg_num
            px_f, py_f = self._sample_region(fg_bbox, msk, fg_num, H, W)
            # the projected world bbox is constant per camera — cache it
            ci = item["camera_index"]
            if ci not in self._region_cache:
                self._region_cache[ci] = project_bbox(
                    self.wbbox, K, ext, H, W)
            bb2d, region = self._region_cache[ci]
            px_b, py_b = self._sample_region(bb2d, region, bg_num, H, W)
            px = np.concatenate([px_f, px_b])
            py = np.concatenate([py_f, py_b])
            rgb = img[py, px]
        else:
            px, py = np.meshgrid(np.arange(W), np.arange(H))
            px, py = px.reshape(-1), py.reshape(-1)
            rgb = img.reshape(-1, 3)

        c2w = np.linalg.inv(ext)
        rays_o = np.broadcast_to(c2w[:3, 3], (len(px), 3))
        d = np.stack([px, py, np.ones_like(px)], -1).astype(np.float64)
        d = d @ np.linalg.inv(K).T @ c2w[:3, :3].T
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        rays_t = np.full((len(px), 1), item["latent_index"], np.float64)
        rays = np.concatenate([rays_o, d, rays_t], -1).astype(np.float32)
        return {
            "rays": rays,
            "rgb": rgb.astype(np.float32),
            "wbounds": self.wbbox,
            "meta": {"H": H, "W": W, "item": item},
        }
