"""Small web-image formats: BMP and baseline TIFF (really decoded), WebP
lossless (VP8L pixels really decoded via functions/vp8l.py) AND lossy
(VP8 keyframes really decoded via functions/vp8.py, bit-exact against
libwebp), ICO, and SVG root dimensions.

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
    ('VP8 '), lossless ('VP8L') and extended ('VP8X') layouts."""
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


def decode_webp(data: bytes) -> "np.ndarray":
    """WebP pixel decode: VP8L payloads (bare or inside a VP8X extended
    container) via the from-scratch functions/vp8l.py codec; lossy VP8
    keyframes via the from-scratch functions/vp8.py decoder (bit-exact YUV
    vs libwebp; RGB via the BT.601 integer conversion). → HxWx4 uint8
    RGBA."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    from azure_workflow_for_kml_satellite_spark.functions.vp8l import decode_vp8l

    pos = 12
    alph_body = None
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8X" and len(body) >= 1 and body[0] & 0x02:
            # animated: first composited frame is the still-image view
            return decode_webp_frames(data)[2][0][1]
        if fourcc == b"ALPH":
            alph_body = body  # precedes the VP8 chunk in VP8X containers
        elif fourcc == b"VP8L":
            return decode_vp8l(body)
        elif fourcc == b"VP8 ":
            from azure_workflow_for_kml_satellite_spark.functions.vp8 import (
                decode_vp8,
                yuv_to_rgb,
            )

            y, u, v = decode_vp8(body)
            rgb = yuv_to_rgb(y, u, v)
            h, w = rgb.shape[:2]
            if alph_body is not None:
                alpha = decode_alph(alph_body, w, h)[..., None]
            else:
                alpha = np.full((h, w, 1), 255, dtype=np.uint8)
            return np.concatenate([rgb, alpha], axis=2)
        pos += 8 + size + (size & 1)
    raise ValueError("WebP has no decodable image chunk")


def decode_webp_luma(data: bytes) -> "np.ndarray":
    """Luma plane of a WebP payload, HxW uint8. Convenience helper used by
    the VP8 differential tests (tests/test_vp8.py) to compare the native Y
    plane against libwebp without chroma upsampling or RGB conversion.
    NOT on the metadata path — image_metadata computes mean_luma over the
    full decode_webp RGBA, matching every other format's pipeline."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8 ":
            from azure_workflow_for_kml_satellite_spark.functions.vp8 import decode_vp8

            return decode_vp8(body)[0]
        if fourcc == b"VP8L":
            from azure_workflow_for_kml_satellite_spark.functions.vp8l import decode_vp8l

            rgba = decode_vp8l(body).astype(np.uint32)
            return (
                (299 * rgba[..., 0] + 587 * rgba[..., 1] + 114 * rgba[..., 2]) // 1000
            ).astype(np.uint8)
        pos += 8 + size + (size & 1)
    raise ValueError("WebP has no decodable image chunk")


def _packbits(data: bytes, max_out: int | None = None) -> bytes:
    """TIFF PackBits RLE decode (output capped at ``max_out`` so RLE bombs
    cannot balloon memory past the declared strip size)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        if max_out is not None and len(out) >= max_out:
            break
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1 bytes
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:  # repeat next byte 257-c times
            if i >= n:
                raise ValueError("truncated PackBits run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out)


_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TIFF_TYPE_FMT = {1: "B", 3: "H", 4: "I"}


def decode_tiff(data: bytes) -> np.ndarray:
    """Baseline stripped TIFF → HxWxC uint8. 8-bit grayscale (photometric
    0/1), RGB(A) and palette (ColorMap) images, chunky planar layout,
    compression none/deflate/PackBits, horizontal predictor, both byte
    orders. LZW/JPEG-in-TIFF/tiled/deep variants raise ValueError
    (quarantined upstream). Distinct from functions/geotiff.py, which
    round-trips the engine's own float32 NDVI export profile."""
    import zlib

    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    (magic,) = struct.unpack_from(e + "H", data, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (ifd_off,) = struct.unpack_from(e + "I", data, 4)
    if ifd_off + 2 > len(data):
        raise ValueError("truncated TIFF IFD")
    (n_tags,) = struct.unpack_from(e + "H", data, ifd_off)
    tags: dict[int, tuple[int, int, bytes]] = {}
    for i in range(n_tags):
        base = ifd_off + 2 + i * 12
        tag, typ, cnt = struct.unpack_from(e + "HHI", data, base)
        tags[tag] = (typ, cnt, data[base + 8 : base + 12])

    def values(tag: int, default=None):
        if tag not in tags:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        typ, cnt, raw = tags[tag]
        size = _TIFF_TYPE_SIZE.get(typ)
        fmt = _TIFF_TYPE_FMT.get(typ)
        if size is None or fmt is None:
            raise ValueError(f"unsupported TIFF value type {typ} (tag {tag})")
        total = size * cnt
        if total <= 4:
            buf = raw[:total]
        else:
            (off,) = struct.unpack(e + "I", raw)
            buf = data[off : off + total]
            if len(buf) < total:
                raise ValueError("truncated TIFF value")
        return list(struct.unpack(e + fmt * cnt, buf))

    w, h = values(256)[0], values(257)[0]
    if w <= 0 or h <= 0 or w > (1 << 20) or h > (1 << 20) or w * h > (1 << 28):
        # the upper bounds stop hostile headers from ballooning executor
        # memory before any strip data is even validated
        raise ValueError("invalid or implausible TIFF dimensions")
    spp = values(277, [1])[0]
    bps = values(258, [8] * spp)
    comp = values(259, [1])[0]
    photo = values(262)[0]
    planar = values(284, [1])[0]
    pred = values(317, [1])[0]
    rps = values(278, [h])[0] or h
    offs = values(273)
    cnts = values(279)
    if any(b != 8 for b in bps) or not 1 <= spp <= 4:
        raise ValueError(f"unsupported TIFF sample layout bps={bps} spp={spp}")
    if planar != 1:
        raise ValueError("planar (non-chunky) TIFF unsupported")
    if comp not in (1, 8, 32946, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if pred not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {pred}")
    if photo not in (0, 1, 2, 3):
        raise ValueError(f"unsupported TIFF photometric {photo}")
    if len(offs) != len(cnts):
        raise ValueError("TIFF strip tables disagree")
    row_bytes = w * spp
    img = np.zeros((h, row_bytes), dtype=np.uint8)
    row = 0
    for off, cnt in zip(offs, cnts):
        if row >= h:
            break
        chunk = data[off : off + cnt]
        if len(chunk) < cnt:
            raise ValueError("truncated TIFF strip")
        nrows = min(rps, h - row)
        need = nrows * row_bytes
        if comp in (8, 32946):
            try:
                # bound the inflate so a deflate-bomb strip cannot balloon
                # executor memory past the declared strip size
                chunk = zlib.decompressobj().decompress(chunk, need)
            except zlib.error as exc:
                raise ValueError(f"bad TIFF deflate strip: {exc}") from exc
        elif comp == 32773:
            chunk = _packbits(chunk, need)
        if len(chunk) < need:
            raise ValueError("short TIFF strip")
        img[row : row + nrows] = np.frombuffer(chunk, np.uint8, need).reshape(
            nrows, row_bytes
        )
        row += nrows
    if row < h:
        raise ValueError("TIFF strips cover fewer rows than ImageLength")
    px = img.reshape(h, w, spp)
    if pred == 2:  # horizontal differencing, per sample lane, mod 256
        px = np.add.accumulate(px, axis=1, dtype=np.uint8)
    if photo == 3:  # palette: ColorMap holds 16-bit triples, keep high byte
        cmap = values(320)
        n_ent = 1 << bps[0]
        if spp != 1 or len(cmap) < 3 * n_ent:
            raise ValueError("malformed TIFF palette")
        lut = (
            np.array(cmap[: 3 * n_ent], dtype=np.uint16).reshape(3, n_ent).T >> 8
        ).astype(np.uint8)
        return np.ascontiguousarray(lut[px[..., 0]])
    if photo == 0:  # white-is-zero grayscale
        px = 255 - px
    return np.ascontiguousarray(px)


def _decode_ico_dib(dib: bytes) -> np.ndarray:
    """ICO-embedded DIB: BITMAPINFOHEADER with DOUBLED height (XOR pixel
    image + 1-bit AND transparency mask), no BITMAPFILEHEADER."""
    if len(dib) < 40:
        raise ValueError("truncated ICO DIB")
    (hdr_size,) = struct.unpack_from("<I", dib, 0)
    width, height2 = struct.unpack_from("<ii", dib, 4)
    planes, bpp = struct.unpack_from("<HH", dib, 12)
    (compression,) = struct.unpack_from("<I", dib, 16)
    if hdr_size < 40 or compression != 0 or planes != 1:
        raise ValueError("unsupported ICO DIB layout")
    if width <= 0 or height2 <= 0 or height2 % 2:
        raise ValueError("invalid ICO DIB dimensions")
    height = height2 // 2
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported ICO bit depth {bpp}")
    pos = hdr_size
    palette = None
    if bpp == 8:
        (n_colors,) = struct.unpack_from("<I", dib, 32)
        n_colors = n_colors or 256
        pal = np.frombuffer(dib, np.uint8, n_colors * 4, pos).reshape(-1, 4)
        palette = pal[:, 2::-1]
        pos += n_colors * 4
    row_bytes = (width * bpp // 8 + 3) // 4 * 4
    need = row_bytes * height
    if len(dib) < pos + need:
        raise ValueError("truncated ICO pixel data")
    rows = np.frombuffer(dib, np.uint8, need, pos).reshape(height, row_bytes)[::-1]
    pos += need
    if bpp == 8:
        if int(rows[:, :width].max()) >= len(palette):
            raise ValueError("ICO index outside palette")
        rgb = palette[rows[:, :width]]
        alpha = None
    elif bpp == 24:
        rgb = rows[:, : width * 3].reshape(height, width, 3)[..., ::-1]
        alpha = None
    else:  # 32-bit BGRA carries its own alpha
        px = rows[:, : width * 4].reshape(height, width, 4)
        return np.ascontiguousarray(px[..., [2, 1, 0, 3]])
    # 1-bit AND mask rows (also 4-byte aligned, bottom-up): 1 = transparent
    mask_row_bytes = ((width + 7) // 8 + 3) // 4 * 4
    mneed = mask_row_bytes * height
    if len(dib) >= pos + mneed:
        mrows = np.frombuffer(dib, np.uint8, mneed, pos).reshape(height, mask_row_bytes)[::-1]
        bits = np.unpackbits(mrows, axis=1)[:, :width]
        a = np.where(bits == 1, 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.dstack([rgb, a]))
    return np.ascontiguousarray(rgb)


def decode_ico(data: bytes) -> np.ndarray:
    """ICO container → largest image decoded (PNG-compressed entries via
    decode_png_any, classic DIB entries via the doubled-height BMP path)."""
    if len(data) < 6 or data[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO payload")
    (count,) = struct.unpack_from("<H", data, 4)
    if count == 0:
        raise ValueError("ICO has no images")
    best = None
    for i in range(count):
        base = 6 + 16 * i
        if base + 16 > len(data):
            raise ValueError("truncated ICO directory")
        w, h = data[base], data[base + 1]
        w, h = w or 256, h or 256
        size, off = struct.unpack_from("<II", data, base + 8)
        if best is None or w * h > best[0]:
            best = (w * h, off, size)
    _, off, size = best
    body = data[off : off + size]
    if len(body) < size:
        raise ValueError("truncated ICO image data")
    if body[:8] == b"\x89PNG\r\n\x1a\n":
        from azure_workflow_for_kml_satellite_spark.functions.png import decode_png_any

        decoded = decode_png_any(body)
        if decoded is None:
            raise ValueError("corrupt PNG inside ICO")
        return decoded[0]
    return _decode_ico_dib(body)


_SVG_NUM = r"([0-9]*\.?[0-9]+)"


def svg_dimensions(data: bytes) -> tuple[int, int]:
    """Real SVG root-element dimension parse (width/height attributes in
    px/unitless, else viewBox). Rasterization needs a renderer this
    container lacks — callers stub pixels honestly, like WebP."""
    import re

    s = data[:4096].decode("utf-8", errors="replace")
    m = re.search(r"<svg\b[^>]*>", s, re.DOTALL)
    if not m:
        raise ValueError("no <svg> root element")
    tag = m.group(0)
    dims = []
    for attr in ("width", "height"):
        am = re.search(rf'{attr}\s*=\s*["\']{_SVG_NUM}(px)?["\']', tag)
        dims.append(float(am.group(1)) if am else None)
    if dims[0] and dims[1]:
        return int(round(dims[0])), int(round(dims[1]))
    # min-x/min-y may be negative (common in icon viewBoxes); width/height
    # are non-negative per spec
    vb = re.search(
        rf'viewBox\s*=\s*["\']\s*[+-]?{_SVG_NUM}[ ,]+[+-]?{_SVG_NUM}[ ,]+{_SVG_NUM}[ ,]+{_SVG_NUM}',
        tag,
    )
    if vb:
        return int(round(float(vb.group(3)))), int(round(float(vb.group(4))))
    raise ValueError("SVG has no parseable dimensions")


def _alpha_unfilter(a: np.ndarray, method: int) -> np.ndarray:
    """Inverse of the ALPH-chunk prediction filters (WebP container spec):
    0 none, 1 horizontal (left; first column predicts from above),
    2 vertical (above; first row predicts from left), 3 gradient
    (clip(left + above - above_left), borders as horizontal/vertical)."""
    if method == 0:
        return a
    h, w = a.shape
    # (x + y) mod 256 chained along an axis == prefix sum mod 256, so the
    # purely-directional filters are np.cumsum — the alpha plane can be up
    # to 4M pixels under the decode bound and per-pixel Python loops here
    # cost minutes (round-5 ADVICE).
    if method == 1:  # left; first column predicts from above
        res = a.astype(np.int64)
        res[:, 0] = np.cumsum(res[:, 0]) & 0xFF
        return (np.cumsum(res, axis=1) & 0xFF).astype(np.uint8)
    if method == 2:  # above; first row predicts from left
        res = a.astype(np.int64)
        res[0] = np.cumsum(res[0]) & 0xFF
        return (np.cumsum(res, axis=0) & 0xFF).astype(np.uint8)
    if method == 3:
        # gradient clip() breaks prefix-sum linearity and carries a true
        # sequential dependence on the left neighbour, so rows iterate in
        # Python — but over plain int lists (row 0 is pure-horizontal →
        # cumsum), ~30x the throughput of per-pixel numpy scalar indexing.
        res = a.astype(np.int64)
        out = np.empty((h, w), dtype=np.int64)
        out[0] = np.cumsum(res[0]) & 0xFF
        prev = out[0].tolist()
        for y in range(1, h):
            row = res[y].tolist()
            cur = [0] * w
            left = (row[0] + prev[0]) & 0xFF
            cur[0] = left
            for x in range(1, w):
                g = left + prev[x] - prev[x - 1]
                if g < 0:
                    g = 0
                elif g > 255:
                    g = 255
                left = (row[x] + g) & 0xFF
                cur[x] = left
            out[y] = cur
            prev = cur
        return out.astype(np.uint8)
    raise ValueError(f"unknown ALPH filter method {method}")


def decode_alph(body: bytes, w: int, h: int) -> np.ndarray:
    """Decode a WebP ALPH chunk → (h, w) uint8 alpha plane. Header byte
    (LSB first): bits 0-1 compression (0 raw, 1 lossless), 2-3 filtering,
    4-5 pre-processing (level reduction — encoding-side hint, nothing to
    invert), 6-7 reserved."""
    if not body:
        raise ValueError("empty ALPH chunk")
    hdr = body[0]
    compression = hdr & 3
    filtering = (hdr >> 2) & 3
    payload = body[1:]
    if compression == 0:
        if len(payload) < w * h:
            raise ValueError("truncated raw ALPH payload")
        plane = np.frombuffer(payload, np.uint8, w * h).reshape(h, w)
    elif compression == 1:
        from azure_workflow_for_kml_satellite_spark.functions.vp8l import (
            decode_vp8l_alpha,
        )

        plane = decode_vp8l_alpha(payload, w, h)
    else:
        raise ValueError(f"reserved ALPH compression method {compression}")
    return _alpha_unfilter(plane, filtering)


def _blend_frame(canvas: np.ndarray, frame: np.ndarray, x: int, y: int, blend: bool) -> None:
    """Composite ``frame`` onto ``canvas`` at (x, y). ``blend=False``
    overwrites the rectangle; ``blend=True`` alpha-blends per the WebP
    container spec formula (integer, round-half-up via +den//2)."""
    fh, fw = frame.shape[:2]
    region = canvas[y : y + fh, x : x + fw]
    if not blend:
        region[:] = frame
        return
    sa = frame[..., 3:4].astype(np.uint32)
    da = region[..., 3:4].astype(np.uint32)
    oa = sa * 255 + da * (255 - sa)  # out alpha numerator (den 255)
    src = frame[..., :3].astype(np.uint32)
    dst = region[..., :3].astype(np.uint32)
    num = src * sa * 255 + dst * da * (255 - sa)
    safe = np.maximum(oa, 1)
    rgb = (num + safe // 2) // safe
    region[..., :3] = np.clip(rgb, 0, 255).astype(np.uint8)
    region[..., 3:4] = ((oa + 127) // 255).astype(np.uint8)


def decode_webp_frames(data: bytes, max_frames: int = 256):
    """Demux + decode an ANIMATED WebP (VP8X + ANIM/ANMF): returns
    (canvas_w, canvas_h, [(duration_ms, composited RGBA canvas), ...]).
    Each ANMF's embedded VP8/VP8L (+ALPH) frame decodes through the same
    bit-exact codecs as still images; compositing follows the container
    spec (alpha-blend vs overwrite, dispose-to-background). Raises
    ValueError for non-animated or malformed payloads."""
    if len(data) < 30 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    if data[12:16] != b"VP8X":
        raise ValueError("not an extended (VP8X) WebP")
    flags = data[20]
    if not flags & 0x02:
        raise ValueError("WebP has no animation flag")
    cw = int.from_bytes(data[24:27], "little") + 1
    ch = int.from_bytes(data[27:30], "little") + 1
    if cw * ch > (1 << 24):
        raise ValueError("animated WebP canvas exceeds decode budget")
    canvas = np.zeros((ch, cw, 4), dtype=np.uint8)  # init: transparent black
    bg = (0, 0, 0, 0)
    frames = []
    pos = 12 + 8 + int.from_bytes(data[16:20], "little") + (
        int.from_bytes(data[16:20], "little") & 1
    )
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"ANIM":
            if len(body) < 6:
                raise ValueError("truncated ANIM chunk")
            b, g, r, a = body[0], body[1], body[2], body[3]  # BGRA order
            bg = (r, g, b, a)
        elif fourcc == b"ANMF":
            if len(frames) >= max_frames:
                raise ValueError("animated WebP exceeds frame budget")
            if len(body) < 16:
                raise ValueError("truncated ANMF chunk")
            fx = int.from_bytes(body[0:3], "little") * 2
            fy = int.from_bytes(body[3:6], "little") * 2
            fw = int.from_bytes(body[6:9], "little") + 1
            fh = int.from_bytes(body[9:12], "little") + 1
            dur = int.from_bytes(body[12:15], "little")
            fflags = body[15]
            no_blend = bool(fflags & 0x02)
            dispose_bg = bool(fflags & 0x01)
            if fx + fw > cw or fy + fh > ch:
                raise ValueError("ANMF frame rectangle outside canvas")
            # frame payload = sub-chunks: optional ALPH, then VP8/VP8L;
            # wrap them in a minimal container and reuse decode_webp
            sub = body[16:]
            wrapped = (
                b"RIFF"
                + (4 + len(sub)).to_bytes(4, "little")
                + b"WEBP"
                + sub
            )
            frame = decode_webp(wrapped)
            if frame.shape[:2] != (fh, fw):
                raise ValueError("ANMF frame bitstream dims disagree with header")
            _blend_frame(canvas, frame, fx, fy, blend=not no_blend)
            frames.append((dur, canvas.copy()))
            if dispose_bg:
                canvas[fy : fy + fh, fx : fx + fw] = bg
        pos += 8 + size + (size & 1)
    if not frames:
        raise ValueError("animated WebP has no frames")
    return cw, ch, frames
