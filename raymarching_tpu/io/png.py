"""Minimal dependency-free PNG encoder (and PPM, for debugging).

Replaces the reference's vendored stb_image_write / LiteImage SaveImage
(main.cpp:53, main.cpp:80) with a clean-room encoder: 8-bit RGB/RGBA,
zlib-deflated scanlines, filter type 0.  A faster zlib-backed C++ writer
lives in native/ (io.image picks it when built).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """img: [H, W, 3|4] uint8 -> PNG bytes."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError(f"expected [H, W, 3|4] uint8, got "
                         f"{img.shape} {img.dtype}")
    h, w, c = img.shape
    color_type = 2 if c == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * c)], axis=1)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def write_png(path: str, img: np.ndarray, compress_level: int = 6) -> None:
    with open(path, "wb") as f:
        f.write(encode_png(img, compress_level))


def write_ppm(path: str, img: np.ndarray) -> None:
    """img: [H, W, 3] uint8 -> binary PPM."""
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(img[..., :3].tobytes())
