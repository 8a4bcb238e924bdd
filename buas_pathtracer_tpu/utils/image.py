"""Image output: BMP (reference parity) + PNG (convenience).

``write_bmp`` ports the reference's 32bpp top-down BITMAPINFOHEADER writer
(assets.cpp:671-724, used by "Take picture").  ``write_png`` is a minimal
zlib-based PNG encoder so renders can be viewed anywhere.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def write_bmp(path: str, rgba: np.ndarray) -> None:
    """rgba: (H, W, 4) uint8.  Stored BGRA, top-down (negative height),
    matching write_bitmap (assets.cpp:671-724)."""
    h, w, _ = rgba.shape
    bgra = rgba[..., [2, 1, 0, 3]].astype(np.uint8)
    pixel_bytes = bgra.tobytes()

    # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_bytes), 0, 0, 14 + 40)
    info_header = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0,
                              len(pixel_bytes), 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(file_header)
        f.write(info_header)
        f.write(pixel_bytes)


def write_png(path: str, rgb: np.ndarray) -> None:
    """rgb: (H, W, 3) or (H, W, 4) uint8."""
    rgb = np.asarray(rgb)
    if rgb.dtype != np.uint8:
        rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    h, w = rgb.shape[:2]
    channels = rgb.shape[2]
    color_type = 6 if channels == 4 else 2

    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data +
                struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))
