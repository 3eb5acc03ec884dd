"""Minimal single-band float32 GeoTIFF codec (SURVEY.md §2.9 R3).

The reference exports NDVI rasters as single-band float32 GeoTIFFs with
NaN nodata and deflate compression via rasterio (reference:
enrichment/ndvi.py:239-255 — profile: count=1, dtype='float32', nodata=nan,
compress='deflate'). rasterio/GDAL are not installed here, so this module
writes/reads the same artifact with a from-scratch classic-TIFF
implementation:

- little-endian classic TIFF, one deflate-compressed strip;
- GeoTIFF georeferencing: ModelPixelScale + ModelTiepoint (north-up) and a
  GeoKeyDirectory declaring geographic EPSG:4326, PixelIsArea;
- GDAL_NODATA ascii tag "nan" so GDAL-based readers honor the nodata.

The layout follows the public TIFF 6.0 and GeoTIFF 1.1 specifications; any
GDAL/rasterio install can open the output (not testable in this container —
round-trip is asserted with this module's own reader instead).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# TIFF tag ids
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259  # 8 = zlib/deflate ("Adobe deflate")
_PHOTOMETRIC = 262  # 1 = BlackIsZero
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_SAMPLE_FORMAT = 339  # 3 = IEEE float
_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922
_GEO_KEY_DIRECTORY = 34735
_GDAL_NODATA = 42113

_T_SHORT, _T_LONG, _T_DOUBLE, _T_ASCII = 3, 4, 12, 2
_TYPE_SIZE = {_T_SHORT: 2, _T_LONG: 4, _T_DOUBLE: 8, _T_ASCII: 1}


def write_geotiff_f32(
    arr: np.ndarray, west: float, north: float, px_x: float, px_y: float
) -> bytes:
    """Serialize a 2-D float32 array as a north-up EPSG:4326 GeoTIFF.

    (west, north) is the outer corner of pixel (0, 0); px_x/px_y are pixel
    sizes in degrees (px_y positive, applied southward)."""
    a = np.ascontiguousarray(arr, dtype=np.float32)
    h, w = a.shape
    strip = zlib.compress(a.tobytes(), 6)

    # data layout: header(8) | strip | IFD | external values
    strip_off = 8
    ifd_off = strip_off + len(strip)

    geokeys = [
        1, 1, 0, 3,          # KeyDirectoryVersion, KeyRevision, Minor, NumberOfKeys
        1024, 0, 1, 2,       # GTModelTypeGeoKey = 2 (Geographic)
        1025, 0, 1, 1,       # GTRasterTypeGeoKey = 1 (PixelIsArea)
        2048, 0, 1, 4326,    # GeographicTypeGeoKey = EPSG:4326
    ]
    nodata_ascii = b"nan\x00"
    entries: list[tuple[int, int, int, bytes]] = [
        (_IMAGE_WIDTH, _T_LONG, 1, struct.pack("<I", w)),
        (_IMAGE_LENGTH, _T_LONG, 1, struct.pack("<I", h)),
        (_BITS_PER_SAMPLE, _T_SHORT, 1, struct.pack("<H", 32)),
        (_COMPRESSION, _T_SHORT, 1, struct.pack("<H", 8)),
        (_PHOTOMETRIC, _T_SHORT, 1, struct.pack("<H", 1)),
        (_STRIP_OFFSETS, _T_LONG, 1, struct.pack("<I", strip_off)),
        (_SAMPLES_PER_PIXEL, _T_SHORT, 1, struct.pack("<H", 1)),
        (_ROWS_PER_STRIP, _T_LONG, 1, struct.pack("<I", h)),
        (_STRIP_BYTE_COUNTS, _T_LONG, 1, struct.pack("<I", len(strip))),
        (_SAMPLE_FORMAT, _T_SHORT, 1, struct.pack("<H", 3)),
        (_MODEL_PIXEL_SCALE, _T_DOUBLE, 3, struct.pack("<3d", px_x, px_y, 0.0)),
        (
            _MODEL_TIEPOINT,
            _T_DOUBLE,
            6,
            struct.pack("<6d", 0.0, 0.0, 0.0, west, north, 0.0),
        ),
        (_GEO_KEY_DIRECTORY, _T_SHORT, len(geokeys), struct.pack(f"<{len(geokeys)}H", *geokeys)),
        (_GDAL_NODATA, _T_ASCII, len(nodata_ascii), nodata_ascii),
    ]

    n = len(entries)
    ext_off = ifd_off + 2 + n * 12 + 4
    ifd = struct.pack("<H", n)
    ext = b""
    for tag, typ, count, val in entries:  # tags are already ascending
        if len(val) <= 4:
            ifd += struct.pack("<HHI", tag, typ, count) + val.ljust(4, b"\x00")
        else:
            ifd += struct.pack("<HHII", tag, typ, count, ext_off + len(ext))
            ext += val
    ifd += struct.pack("<I", 0)  # next-IFD = none

    header = struct.pack("<2sHI", b"II", 42, ifd_off)
    return header + strip + ifd + ext


def read_geotiff_f32(data: bytes) -> tuple[np.ndarray, float, float, float, float]:
    """Parse a GeoTIFF written by write_geotiff_f32 (or any LE classic TIFF
    with one deflate float32 strip). Returns (array, west, north, px_x, px_y)."""
    order, magic, ifd_off = struct.unpack_from("<2sHI", data, 0)
    if order != b"II" or magic != 42:
        raise ValueError("not a little-endian classic TIFF")
    (n,) = struct.unpack_from("<H", data, ifd_off)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n):
        tag, typ, count, raw = struct.unpack_from("<HHII", data, ifd_off + 2 + i * 12)
        tags[tag] = (typ, count, raw)

    def _values(tag):
        typ, count, raw = tags[tag]
        size = _TYPE_SIZE[typ] * count
        if size <= 4:
            buf = struct.pack("<I", raw)[:size]
        else:
            buf = data[raw : raw + size]
        fmt = {_T_SHORT: "H", _T_LONG: "I", _T_DOUBLE: "d", _T_ASCII: "c"}[typ]
        return struct.unpack(f"<{count}{fmt}", buf)

    w = _values(_IMAGE_WIDTH)[0]
    h = _values(_IMAGE_LENGTH)[0]
    if _values(_COMPRESSION)[0] != 8 or _values(_SAMPLE_FORMAT)[0] != 3:
        raise ValueError("expected one deflate float32 band")
    off = _values(_STRIP_OFFSETS)[0]
    cnt = _values(_STRIP_BYTE_COUNTS)[0]
    arr = np.frombuffer(zlib.decompress(data[off : off + cnt]), dtype="<f4").reshape(h, w)
    px_x, px_y, _ = _values(_MODEL_PIXEL_SCALE)
    _, _, _, west, north, _ = _values(_MODEL_TIEPOINT)
    return arr, west, north, px_x, px_y
