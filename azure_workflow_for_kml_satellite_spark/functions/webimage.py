"""Small web-image formats: BMP (really decoded) and WebP (header really
parsed; VP8/VP8L pixel data needs a codec this container doesn't have).

Companions to functions/png.py, functions/jpeg.py and functions/gif.py.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed BMP (BITMAPINFOHEADER or later) → HxWxC uint8.
    8-bit palette, 24-bit BGR and 32-bit BGRA; bottom-up or top-down rows;
    4-byte row padding. Raises ValueError otherwise (quarantined upstream)."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP payload")
    (pixel_offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if width <= 0 or height == 0 or planes != 1:
        raise ValueError("invalid BMP dimensions")
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) unsupported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = height < 0
    height = abs(height)
    palette = None
    if bpp == 8:
        (n_colors,) = struct.unpack_from("<I", data, 46)
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(data, np.uint8, n_colors * 4, pal_off).reshape(-1, 4)
        palette = pal[:, 2::-1]  # BGRA quad → RGB
    row_bytes = (width * bpp // 8 + 3) // 4 * 4
    need = pixel_offset + row_bytes * height
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data, np.uint8, row_bytes * height, pixel_offset).reshape(
        height, row_bytes
    )
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        idx = rows[:, :width]
        if int(idx.max()) >= len(palette):
            raise ValueError("BMP index outside palette")
        return np.ascontiguousarray(palette[idx])
    nch = bpp // 8
    px = rows[:, : width * nch].reshape(height, width, nch)
    if nch == 3:
        return np.ascontiguousarray(px[..., ::-1])  # BGR → RGB
    return np.ascontiguousarray(px[..., [2, 1, 0, 3]])  # BGRA → RGBA


def webp_dimensions(data: bytes) -> tuple[int, int, str]:
    """Real WebP header parse → (width, height, variant) for the lossy
    ('VP8 '), lossless ('VP8L') and extended ('VP8X') layouts. The pixel
    bitstream itself needs libwebp, which this container lacks."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    fourcc = data[12:16]
    if fourcc == b"VP8 ":
        # frame tag (3) + start code 9D 01 2A + 14-bit w / 14-bit h
        if len(data) < 30 or data[23:26] != b"\x9d\x01\x2a":
            raise ValueError("bad VP8 key frame header")
        w, h = struct.unpack_from("<HH", data, 26)
        return (w & 0x3FFF, h & 0x3FFF, "VP8")
    if fourcc == b"VP8L":
        if len(data) < 25 or data[20] != 0x2F:
            raise ValueError("bad VP8L signature")
        (bits,) = struct.unpack_from("<I", data, 21)
        return ((bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1, "VP8L")
    if fourcc == b"VP8X":
        if len(data) < 30:
            raise ValueError("truncated VP8X header")
        w = int.from_bytes(data[24:27], "little") + 1
        h = int.from_bytes(data[27:30], "little") + 1
        return (w, h, "VP8X")
    raise ValueError(f"unknown WebP chunk {fourcc!r}")
