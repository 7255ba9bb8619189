"""Image output: linear float image -> gamma-corrected 8-bit file.

Mirrors the reference's save path (LiteImage::SaveImage with gamma,
main.cpp:53; stb jpg quality 100, main.cpp:80): clamp to [0, 1], apply
1/gamma, quantize to uint8 (round-half-away like the reference's
``uint8(v * 255 + 0.5)`` convention), append alpha=1 for RGBA outputs.

Uses the native C++ writer (libraymarch_host) when built, else the pure
Python encoder.
"""

from __future__ import annotations

import os

import numpy as np

from . import png as _png


def to_uint8(img: np.ndarray, gamma: float = 1.0) -> np.ndarray:
    """[H, W, 3] float linear -> [H, W, 3] uint8 with gamma correction."""
    img = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
    if gamma != 1.0:
        img = img ** (1.0 / gamma)
    return (img * 255.0 + 0.5).astype(np.uint8)


#: stb-parity JPEG quality (constants.h:30)
JPEG_QUALITY = 100


def save_image(path: str, img: np.ndarray, gamma: float = 1.0) -> None:
    """Save a linear float image to PNG / PPM / JPEG (by extension).

    All three formats are dependency-free: JPEG (the reference's GPU
    output format, main.cpp:80, stb quality 100) uses the clean-room
    baseline encoder in io.jpeg."""
    data = to_uint8(img, gamma)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".ppm":
        _png.write_ppm(path, data)
        return
    if ext in (".jpg", ".jpeg"):
        from .jpeg import write_jpeg

        write_jpeg(path, data[..., :3], JPEG_QUALITY)
        return
    if ext not in (".png", ""):
        raise ValueError(f"unsupported image format: {ext} "
                         "(png, ppm, jpg are supported)")
    try:
        from ..native import native_write_png
        if native_write_png(path, data):
            return
    except Exception:
        pass
    _png.write_png(path, data)
