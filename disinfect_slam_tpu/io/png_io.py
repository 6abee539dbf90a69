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


def encode_png(img: np.ndarray) -> bytes:
    """Encode u8 gray/RGB/RGBA to in-memory PNG bytes (for HTTP serving,
    the browser-viewer analogue of GLImage8UC4::LoadCuda->Draw,
    reference utils/gl/image.h:27-56)."""
    img = np.ascontiguousarray(img)
    if _HAS_CV2:
        out = img
        if img.ndim == 3 and img.shape[2] >= 3:
            out = np.ascontiguousarray(img[..., [2, 1, 0] + list(range(3, img.shape[2]))])
        ok, buf = cv2.imencode(".png", out)
        if not ok:
            raise IOError("cv2.imencode failed")
        return buf.tobytes()
    if _HAS_PIL:
        import io

        b = io.BytesIO()
        Image.fromarray(img).save(b, format="PNG")
        return b.getvalue()
    return _encode_png_stdlib(img)


def _encode_png_stdlib(img: np.ndarray) -> bytes:
    """Minimal pure-stdlib PNG encoder (u8 gray/RGB/RGBA), used only when
    neither cv2 nor PIL is importable."""
    import struct
    import zlib

    if img.dtype != np.uint8:
        raise ValueError("stdlib PNG encoder supports uint8 only")
    if img.ndim == 2:
        color_type, arr = 0, img[..., None]
    elif img.shape[2] == 3:
        color_type, arr = 2, img
    elif img.shape[2] == 4:
        color_type, arr = 6, img
    else:
        raise ValueError(f"unsupported channel count {img.shape}")
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


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
