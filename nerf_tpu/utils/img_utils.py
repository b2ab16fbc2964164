"""Image utilities.

Parity surface: reference ``src/utils/img_utils.py`` (horizontal/vertical
concat, depth/disparity colormap viz) and ``vis_utils.py`` (to8b).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def to8b(x: np.ndarray) -> np.ndarray:
    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)


def horizon_concat(images: Sequence[np.ndarray], pad: int = 0,
                   pad_value: float = 1.0) -> np.ndarray:
    """Concatenate images left-to-right, padding heights to the max."""
    images = [np.asarray(im) for im in images]
    H = max(im.shape[0] for im in images)
    out = []
    for im in images:
        if im.ndim == 2:
            im = im[..., None].repeat(3, -1)
        if im.shape[0] < H:
            fill = np.full((H - im.shape[0], *im.shape[1:]), pad_value,
                           im.dtype)
            im = np.concatenate([im, fill], axis=0)
        out.append(im)
        if pad:
            out.append(np.full((H, pad, im.shape[-1]), pad_value, im.dtype))
    if pad:
        out.pop()
    return np.concatenate(out, axis=1)


def vertical_concat(images: Sequence[np.ndarray], pad: int = 0,
                    pad_value: float = 1.0) -> np.ndarray:
    return np.swapaxes(
        horizon_concat([np.swapaxes(im, 0, 1) for im in images], pad,
                       pad_value), 0, 1)


def colorize_depth(depth: np.ndarray, near: float = None, far: float = None,
                   cmap: str = "jet") -> np.ndarray:
    """Depth map -> rgb visualization in [0,1] (img_utils.py:321 analog)."""
    d = np.asarray(depth, np.float32)
    lo = near if near is not None else np.percentile(d[np.isfinite(d)], 1)
    hi = far if far is not None else np.percentile(d[np.isfinite(d)], 99)
    t = np.clip((d - lo) / max(hi - lo, 1e-8), 0, 1)
    try:
        import matplotlib.cm as cm

        return np.asarray(cm.get_cmap(cmap)(t))[..., :3].astype(np.float32)
    except Exception:
        return np.stack([t, t, t], axis=-1)


def read_pfm(path):
    """Read a PFM (portable float map) -> (array [H,W(,3)], scale).

    Parity surface: reference ``src/utils/data_utils.py::read_pfm``. PFM
    stores bottom-to-top rows; sign of the scale encodes endianness.
    """
    with open(path, "rb") as f:
        header = f.readline().strip()
        if header == b"PF":
            channels = 3
        elif header == b"Pf":
            channels = 1
        else:
            raise ValueError(f"{path}: not a PFM file (header {header!r})")
        line = f.readline().strip()
        while line.startswith(b"#"):
            line = f.readline().strip()
        w, h = (int(v) for v in line.split())
        scale = float(f.readline().strip())
        dtype = "<f4" if scale < 0 else ">f4"
        data = np.frombuffer(f.read(4 * w * h * channels), dtype)
    shape = (h, w, 3) if channels == 3 else (h, w)
    return np.ascontiguousarray(data.reshape(shape)[::-1]), abs(scale)


def write_pfm(path, image, scale=1.0):
    """Write a PFM file (little-endian; rows stored bottom-to-top)."""
    image = np.asarray(image, np.float32)
    if image.ndim == 3 and image.shape[2] == 3:
        header = b"PF"
    elif image.ndim == 2 or (image.ndim == 3 and image.shape[2] == 1):
        header = b"Pf"
        image = image.reshape(image.shape[0], image.shape[1])
    else:
        raise ValueError(f"unsupported PFM shape {image.shape}")
    with open(path, "wb") as f:
        f.write(header + b"\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        f.write(f"{-abs(scale)}\n".encode())
        f.write(image[::-1].astype("<f4").tobytes())
