"""Image I/O with graceful backend fallback (cv2 -> PIL).

Handles the formats the reference pipeline reads/writes: 8-bit RGB PNGs,
16-bit depth/probability PNGs (offline.cc:64-83), and RGBA render dumps.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - environment probing
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

try:  # pragma: no cover
    from PIL import Image

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


def read_image(path: str, unchanged: bool = False) -> np.ndarray:
    """Read an image. unchanged=True preserves 16-bit single channel
    (cv2.IMREAD_UNCHANGED semantics). RGB images return channels in RGB
    order."""
    if _HAS_CV2:
        flag = cv2.IMREAD_UNCHANGED if unchanged else cv2.IMREAD_COLOR
        img = cv2.imread(path, flag)
        if img is None:
            raise FileNotFoundError(path)
        if img.ndim == 3 and img.shape[2] >= 3:
            img = img[..., [2, 1, 0] + list(range(3, img.shape[2]))]
        return img
    if _HAS_PIL:
        img = Image.open(path)
        if not unchanged and img.mode not in ("RGB", "RGBA"):
            img = img.convert("RGB")
        return np.asarray(img)
    raise RuntimeError("no image backend available (cv2 or PIL)")


def write_image(path: str, img: np.ndarray) -> None:
    """Write an image; accepts u8 RGB/RGBA/gray or u16 gray."""
    img = np.asarray(img)
    if _HAS_CV2:
        out = img
        if img.ndim == 3 and img.shape[2] >= 3:
            out = img[..., [2, 1, 0] + list(range(3, img.shape[2]))]
        if not cv2.imwrite(path, out):
            raise IOError(f"failed to write {path}")
        return
    if _HAS_PIL:
        Image.fromarray(img).save(path)
        return
    raise RuntimeError("no image backend available (cv2 or PIL)")
