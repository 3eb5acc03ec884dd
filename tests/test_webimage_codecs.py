"""Pure-codec vectors for the web-image decoders: decode_png_any
(all colour types / bit depths / Adam7) and the GIF LZW codec."""

import struct
import zlib

import numpy as np


def _chunk(tag, data):
    c = tag + data
    return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))


def _make_png(w, h, depth, ctype, raw_rows, interlace=0, plte=None, trns=None):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    return out + _chunk(b"IDAT", zlib.compress(raw_rows)) + _chunk(b"IEND", b"")


def test_png_any_matches_strict_on_rgba():
    from azure_workflow_for_kml_satellite_spark.functions.png import (
        decode_png,
        decode_png_any,
        encode_png_rgba,
    )

    img = np.random.default_rng(5).integers(0, 256, (23, 31, 4), dtype=np.uint8)
    enc = encode_png_rgba(img)
    a, ca = decode_png_any(enc)
    s, cs = decode_png(enc)
    assert ca == cs == 4 and np.array_equal(a, s) and np.array_equal(a, img)


def test_png_any_gray_palette_lowdepth_16bit():
    from azure_workflow_for_kml_satellite_spark.functions.png import decode_png_any

    rng = np.random.default_rng(5)
    # grayscale 8-bit
    g = rng.integers(0, 256, (9, 14), dtype=np.uint8)
    rows = b"".join(b"\x00" + g[r].tobytes() for r in range(9))
    a, c = decode_png_any(_make_png(14, 9, 8, 0, rows))
    assert c == 1 and np.array_equal(a[..., 0], g)
    # palette 4-bit + tRNS alpha
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], np.uint8)
    idx = rng.integers(0, 4, (7, 11), dtype=np.uint8)

    def pack4(row):
        padded = row if len(row) % 2 == 0 else np.append(row, 0)
        return bytes(((padded[0::2] << 4) | padded[1::2]).astype(np.uint8))

    rows = b"".join(b"\x00" + pack4(idx[r]) for r in range(7))
    png = _make_png(
        11, 7, 4, 3, rows, plte=pal.tobytes(), trns=bytes([255, 128, 255, 0])
    )
    a, c = decode_png_any(png)
    assert c == 4 and np.array_equal(a[..., :3], pal[idx])
    assert np.array_equal(a[..., 3], np.array([255, 128, 255, 0], np.uint8)[idx])
    # grayscale 1-bit scales to full range
    b1 = rng.integers(0, 2, (5, 19), dtype=np.uint8)
    rows = b"".join(b"\x00" + np.packbits(b1[r]).tobytes() for r in range(5))
    a, c = decode_png_any(_make_png(19, 5, 1, 0, rows))
    assert c == 1 and np.array_equal(a[..., 0], b1 * 255)
    # 16-bit RGB keeps the high byte
    hi = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    lo = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    v16 = (hi.astype(np.uint16) << 8) | lo
    rows = b"".join(b"\x00" + v16[r].astype(">u2").tobytes() for r in range(4))
    a, c = decode_png_any(_make_png(6, 4, 16, 2, rows))
    assert c == 3 and np.array_equal(a, hi)
    # gray+alpha
    ga = rng.integers(0, 256, (6, 5, 2), dtype=np.uint8)
    rows = b"".join(b"\x00" + ga[r].tobytes() for r in range(6))
    a, c = decode_png_any(_make_png(5, 6, 8, 4, rows))
    assert c == 2 and np.array_equal(a, ga)


def test_png_any_adam7_equals_progressive_assembly():
    from azure_workflow_for_kml_satellite_spark.functions.png import (
        _ADAM7,
        decode_png_any,
    )

    rng = np.random.default_rng(5)
    for h, w in ((21, 17), (8, 8), (1, 1), (3, 9), (16, 2)):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        passes = b""
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            passes += b"".join(b"\x00" + sub[r].tobytes() for r in range(sub.shape[0]))
        a, c = decode_png_any(_make_png(w, h, 8, 2, passes, interlace=1))
        assert c == 3 and np.array_equal(a, img), (h, w)


def test_png_any_rejects_corrupt():
    from azure_workflow_for_kml_satellite_spark.functions.png import decode_png_any

    assert decode_png_any(b"\x89PNG\r\n\x1a\n" + b"junk") is None
    assert decode_png_any(_make_png(6, 4, 16, 2, b"short")) is None


def test_gif_lzw_roundtrip_growth_and_clear():
    from azure_workflow_for_kml_satellite_spark.functions.gif import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = np.random.default_rng(11)
    # 100k symbols forces many width bumps AND the clear-on-full path
    for mcs, n, length in ((2, 4, 50), (4, 16, 5000), (8, 256, 100_000)):
        data = bytes(rng.integers(0, n, length, dtype=np.uint8))
        assert _lzw_decode(mcs, _lzw_encode(mcs, data), length) == data


def test_gif_roundtrip_interlace_transparency_animation():
    from azure_workflow_for_kml_satellite_spark.functions.gif import (
        decode_gif,
        decode_gif_frames,
        encode_gif,
    )

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = (rng.integers(0, 256, (37, 53), dtype=np.uint8) % 6).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif([idx], pal)), pal[idx])
    assert np.array_equal(decode_gif(encode_gif([idx], pal, interlace=True)), pal[idx])
    # transparency: untouched canvas keeps alpha 0
    idx2 = idx.copy()
    idx2[:5, :5] = 7
    img_t = decode_gif(encode_gif([idx2], pal, transparent=7))
    assert img_t.shape[2] == 4
    assert (img_t[:5, :5, 3] == 0).all() and (img_t[10:, 10:, 3] == 255).all()
    assert np.array_equal(img_t[10:, 10:, :3], pal[idx2][10:, 10:])
    # animation: per-frame delays + composed canvases
    pal4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [9, 9, 9]], np.uint8)
    frames = [np.full((10, 10), i, np.uint8) for i in (0, 1, 2)]
    w, h, out = decode_gif_frames(encode_gif(frames, pal4, delays_ms=[100, 200, 300]))
    assert (w, h) == (10, 10) and [d for d, _ in out] == [100, 200, 300]
    assert np.array_equal(out[1][1][..., :3], pal4[frames[1]])


def test_gif_rejects_corrupt():
    import pytest

    from azure_workflow_for_kml_satellite_spark.functions.gif import (
        decode_gif,
        encode_gif,
    )

    pal = np.zeros((4, 3), np.uint8)
    ok = encode_gif([np.zeros((6, 6), np.uint8)], pal)
    for bad in (b"notagif", b"GIF89a" + b"\x00" * 5, ok[:20]):
        with pytest.raises((ValueError, IndexError, struct.error)):
            decode_gif(bad)
