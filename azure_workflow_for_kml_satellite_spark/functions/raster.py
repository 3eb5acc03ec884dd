"""Raster kernels + deterministic synthetic tile provider (SURVEY.md §2.9).

The reference reads Cloud-Optimized GeoTIFF windows over HTTP
(reference: fulfilment.py:237-295, ndvi.py:463-484) and computes NDVI band
math + stats in numpy (ndvi.py:189-236, 401-447). rasterio is not installed
here and there is no network, so this engine pairs the *same numpy math* with
a deterministic synthetic band provider in the spirit of the reference's own
stub imagery provider (reference: treesight/providers/stub.py:36-80,
tests/tiff_helpers.py:12-69): band values are a pure integer-hash function of
(scene_id, band, pixel row, pixel col), so any executor — and the sequential
oracle — regenerates identical pixels for a given window with no I/O.

Synthetic scenes are EPSG:4326 north-up grids anchored at the scene bbox
top-left; the reference's bbox CRS transform (geo.py:85-104) is the identity
in that case, preserving its windowing semantics.

NDVI rasters travel between stages as a tiny self-describing binary codec
(``pack_raster``/``unpack_raster``) playing the float32-GeoTIFF role
(ndvi.py:239-255) without rasterio.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from azure_workflow_for_kml_satellite_spark.constants import (
    LANDSAT_QA_CLOUD_BITS,
    VALID_SCL_CLASSES,
)

# ── deterministic hash fields ────────────────────────────────────────────────
#
# uint32 murmur3-fmix pipeline with reusable scratch buffers and out= ufuncs.
# Two environment facts drive this shape (measured, see BENCH notes):
# this container's numpy dispatches uint64 right_shift to a scalar loop
# (~40x slower than every other elementwise op), and fresh large allocations
# page-fault at ~170 MB/s — so the generator avoids uint64 shifts entirely
# and recycles per-band scratch arrays across windows.

_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)


def scene_seed(scene_id: str) -> int:
    """Stable 32-bit seed from a scene id (crc32 of bytes)."""
    return zlib.crc32(scene_id.encode("utf-8")) & 0xFFFFFFFF


_SCRATCH: dict[str, np.ndarray] = {}


def _scratch(slot: str, n: int, dtype) -> np.ndarray:
    """Reused flat buffer per (slot); valid until the slot's next request.
    Each Python worker has its own module state, so this is task-safe."""
    buf = _SCRATCH.get(slot)
    if buf is None or buf.size < n or buf.dtype != np.dtype(dtype):
        buf = np.empty(int(n * 5 // 4) + 16, dtype)
        _SCRATCH[slot] = buf
    return buf[:n]


def _hash_grid(seed: int, band: int, row0: int, row1: int, col0: int, col1: int,
               slot: str = "h") -> np.ndarray:
    """uint32 hash for every pixel of a window; pixel-position pure (the
    value depends only on (seed, band, absolute row, absolute col), never on
    the window placement). Returns a view of a scratch buffer — consume it
    before the next _hash_grid call with the same slot."""
    hh, ww = row1 - row0, col1 - col0
    n = hh * ww
    rows = (np.arange(row0, row1, dtype=np.uint32) * _M1)[:, None]
    cols = (np.arange(col0, col1, dtype=np.uint32) * _M2)[None, :]
    s = np.uint32((int(seed) ^ (int(band) * 0x27D4EB2F)) & 0xFFFFFFFF)
    h = _scratch(slot, n, np.uint32).reshape(hh, ww)
    tmp = _scratch(slot + "_t", n, np.uint32).reshape(hh, ww)
    np.bitwise_xor(rows, cols, out=h)
    np.bitwise_xor(h, s, out=h)
    # murmur3 fmix32 rounds
    np.right_shift(h, 16, out=tmp)
    np.bitwise_xor(h, tmp, out=h)
    np.multiply(h, _M1, out=h)
    np.right_shift(h, 13, out=tmp)
    np.bitwise_xor(h, tmp, out=h)
    np.multiply(h, _M2, out=h)
    np.right_shift(h, 16, out=tmp)
    np.bitwise_xor(h, tmp, out=h)
    return h


# ── scene grid + windowing ───────────────────────────────────────────────────

DEG_PER_METRE = 1.0 / 111_320.0


def grid_shape(bbox: list[float], resolution_m: float) -> tuple[int, int]:
    """(height, width) of a scene raster covering bbox at resolution_m."""
    px = resolution_m * DEG_PER_METRE
    h = max(1, int(round((bbox[3] - bbox[1]) / px)))
    w = max(1, int(round((bbox[2] - bbox[0]) / px)))
    return h, w


def window_from_bounds(
    scene_bbox: list[float],
    resolution_m: float,
    read_bbox: list[float],
) -> tuple[int, int, int, int] | None:
    """Pixel window (row0, row1, col0, col1) for read_bbox, clamped to the
    scene raster — the role of rasterio.windows.from_bounds + clamp
    (reference: ndvi.py:474-478). Floor/ceil semantics: any pixel touching
    the bbox is included.
    """
    px = resolution_m * DEG_PER_METRE
    h, w = grid_shape(scene_bbox, resolution_m)
    x0, y1 = scene_bbox[0], scene_bbox[3]
    import math

    col0 = max(0, min(w, int(math.floor((read_bbox[0] - x0) / px))))
    col1 = max(0, min(w, int(math.ceil((read_bbox[2] - x0) / px))))
    row0 = max(0, min(h, int(math.floor((y1 - read_bbox[3]) / px))))
    row1 = max(0, min(h, int(math.ceil((y1 - read_bbox[1]) / px))))
    if col1 <= col0 or row1 <= row0:
        return None
    return row0, row1, col0, col1


def grid_shape_m(bbox_m: list[float], resolution_m: float) -> tuple[int, int]:
    """(height, width) of a PROJECTED-CRS scene raster (bbox in metres,
    pixel size = resolution_m in CRS units — the UTM-scene grid)."""
    h = max(1, int(round((bbox_m[3] - bbox_m[1]) / resolution_m)))
    w = max(1, int(round((bbox_m[2] - bbox_m[0]) / resolution_m)))
    return h, w


def window_from_bounds_m(
    scene_bbox_m: list[float],
    resolution_m: float,
    read_bbox_m: list[float],
) -> tuple[int, int, int, int] | None:
    """Metric-grid variant of ``window_from_bounds`` for projected (UTM)
    scenes: identical floor/ceil + clamp semantics, pixel size in metres."""
    import math

    px = resolution_m
    h, w = grid_shape_m(scene_bbox_m, resolution_m)
    x0, y1 = scene_bbox_m[0], scene_bbox_m[3]
    col0 = max(0, min(w, int(math.floor((read_bbox_m[0] - x0) / px))))
    col1 = max(0, min(w, int(math.ceil((read_bbox_m[2] - x0) / px))))
    row0 = max(0, min(h, int(math.floor((y1 - read_bbox_m[3]) / px))))
    row1 = max(0, min(h, int(math.ceil((y1 - read_bbox_m[1]) / px))))
    if col1 <= col0 or row1 <= row0:
        return None
    return row0, row1, col0, col1


# uint8-indexed validity table for the SCL mask (see ndvi_s2): one gather
# replaces np.isin's sort/search on every window
_SCL_VALID_LUT = np.zeros(256, dtype=np.bool_)
_SCL_VALID_LUT[list(VALID_SCL_CLASSES)] = True

# Band codes for the hash field
BAND_RED = 1
BAND_NIR = 2
BAND_SCL = 3
BAND_QA = 4
BAND_CLASS = 5

# SCL class table indexed by h%10: 30% invalid (9=cloud, 8=cloud-prob, 3=shadow),
# 70% valid surface classes {2,4,5,6} (reference: ndvi.py:98-103).
_SCL_TABLE = np.array([9, 8, 3, 4, 5, 6, 2, 4, 5, 4], dtype=np.uint8)
# Landsat QA_PIXEL values indexed by h%10: 30% flagged via bits 1/3/4 of the
# clear mask 0b00111010 (reference: ndvi.py:274-276).
_QA_TABLE = np.array([2, 8, 16, 0, 0, 0, 0, 0, 0, 0], dtype=np.uint16)
# Land-cover class codes for classification tiles (WorldCover-style,
# reference: eudr.py:229-241): 0=nodata sprinkled at ~2%.
_CLASS_TABLE = np.array([10, 10, 10, 20, 30, 40, 50, 60, 80, 95], dtype=np.uint8)

# Exact divisibility via modular inverse (odd d): x % d == 0  ⟺
# (x * d⁻¹ mod 2³²) ≤ ⌊(2³² − 1) / d⌋. One u32 multiply + compare replaces
# np.mod, which this numpy build runs ~10x slower than multiply (measured
# 0.43 vs 3.9 Gelem/s) — the nodata masks only need the divisibility bit.
_INV97 = np.uint32(pow(97, -1, 2**32))
_THR97 = np.uint32((2**32 - 1) // 97)
_INV101 = np.uint32(pow(101, -1, 2**32))
_THR101 = np.uint32((2**32 - 1) // 101)
_INV53 = np.uint32(pow(53, -1, 2**32))
_THR53 = np.uint32((2**32 - 1) // 53)


def gen_band(
    seed: int, band: int, window: tuple[int, int, int, int]
) -> np.ndarray:
    """Deterministic synthetic band pixels for a window of a scene raster.

    Returns a fresh (owned) array; all intermediate work runs in scratch
    buffers with out= ufuncs (see _hash_grid docstring for why)."""
    row0, row1, col0, col1 = window
    hh, ww = row1 - row0, col1 - col0
    n = hh * ww
    h = _hash_grid(seed, band, row0, row1, col0, col1)
    t32 = _scratch("gb32", n, np.uint32).reshape(hh, ww)
    mask = _scratch("gbmask", n, np.bool_).reshape(hh, ww)
    if band == BAND_RED:
        np.right_shift(h, 8, out=t32)
        np.mod(t32, np.uint32(1200), out=t32)
        np.add(t32, np.uint32(300), out=t32)
        vals = t32.astype(np.uint16)
        np.multiply(h, _INV97, out=h)  # h % 97 == 0 ⟺ h·97⁻¹ ≤ _THR97
        np.less_equal(h, _THR97, out=mask)
        vals[mask] = 0  # ~1% nodata
        return vals
    if band == BAND_NIR:
        # Smooth vegetation gradient + noise so NDVI has spatial structure.
        # (13·row + 7·col + seed%1000) % 100 is separable: reduce each 1-D
        # term mod 100 first, then one conditional subtract folds the sum
        # (< 200) — replaces the full-2D np.mod (the slow op, see above).
        rmod = (np.arange(row0, row1, dtype=np.uint32) * np.uint32(13)
                + np.uint32(int(seed) % 1000)) % np.uint32(100)
        cmod = (np.arange(col0, col1, dtype=np.uint32) * np.uint32(7)) % np.uint32(100)
        veg = _scratch("gbveg", n, np.uint32).reshape(hh, ww)
        np.add(rmod[:, None], cmod[None, :], out=veg)
        np.greater_equal(veg, np.uint32(100), out=mask)
        np.subtract(veg, np.uint32(100), out=veg, where=mask)
        np.multiply(veg, np.uint32(55), out=veg)
        np.right_shift(h, 8, out=t32)
        np.mod(t32, np.uint32(900), out=t32)
        np.add(t32, veg, out=t32)
        np.add(t32, np.uint32(400), out=t32)
        vals = t32.astype(np.uint16)
        np.multiply(h, _INV101, out=h)
        np.less_equal(h, _THR101, out=mask)
        vals[mask] = 0  # ~1% nodata
        return vals
    if band in (BAND_SCL, BAND_QA, BAND_CLASS):
        np.mod(h, np.uint32(10), out=t32)
        if band == BAND_SCL:
            return _SCL_TABLE[t32]
        if band == BAND_QA:
            return _QA_TABLE[t32]
        out = _CLASS_TABLE[t32]
        np.multiply(h, _INV53, out=h)
        np.less_equal(h, _THR53, out=mask)
        out[mask] = 0  # ~2% nodata class code
        return out
    raise ValueError(f"unknown band code {band}")


def read_window_bands(
    scene_id: str,
    scene_bbox: list[float],
    resolution_m: float,
    read_bbox: list[float],
    collection: str,
) -> dict[str, np.ndarray] | None:
    """Windowed 'COG read' of the synthetic scene: returns the band arrays the
    NDVI kernels need. S2: red/nir at resolution_m + scl at 2x pixel size
    (20 m vs 10 m — exercises the categorical resample path, ndvi.py:166-180).
    Landsat: red/nir/qa all at resolution_m.
    """
    seed = scene_seed(scene_id)
    win = window_from_bounds(scene_bbox, resolution_m, read_bbox)
    if win is None:
        return None
    out = {
        "red": gen_band(seed, BAND_RED, win),
        "nir": gen_band(seed, BAND_NIR, win),
    }
    if collection == "sentinel-2-l2a":
        scl_win = window_from_bounds(scene_bbox, resolution_m * 2, read_bbox)
        if scl_win is not None:
            out["scl"] = gen_band(seed, BAND_SCL, scl_win)
    elif collection == "landsat-c2-l2":
        out["qa"] = gen_band(seed, BAND_QA, win)
    return out


def read_window_bands_utm(
    scene_id: str,
    scene_bbox_m: list[float],
    resolution_m: float,
    read_bbox_m: list[float],
) -> dict[str, np.ndarray] | None:
    """Windowed read of the UTM-gridded sentinel variant of a scene (the
    reference reads every COG on its native UTM grid after transforming the
    AOI bbox into the scene CRS, fulfilment.py:264-271). Distinct raster
    content from the geographic variant (seed is salted with ':utm');
    red/nir at resolution_m, SCL at 2x pixel size, all in CRS metres."""
    seed = scene_seed(scene_id + ":utm")
    win = window_from_bounds_m(scene_bbox_m, resolution_m, read_bbox_m)
    if win is None:
        return None
    out = {
        "red": gen_band(seed, BAND_RED, win),
        "nir": gen_band(seed, BAND_NIR, win),
    }
    scl_win = window_from_bounds_m(scene_bbox_m, resolution_m * 2, read_bbox_m)
    if scl_win is not None:
        out["scl"] = gen_band(seed, BAND_SCL, scl_win)
    return out


def read_class_window(
    layer_name: str, read_bbox: list[float], resolution_m: float
) -> np.ndarray | None:
    """Windowed read of a synthetic GLOBAL classification mosaic (WorldCover /
    IO-LULC / ALOS-FNF role, reference: pipeline/eudr.py:244-398, 472-563,
    619-719). Global pixel indexing (anchored at lon -180 / lat +90) keeps
    values window-pure; the layer name seeds the hash so years/products
    differ."""
    px = resolution_m * DEG_PER_METRE
    import math

    col0 = int(math.floor((read_bbox[0] + 180.0) / px))
    col1 = int(math.ceil((read_bbox[2] + 180.0) / px))
    row0 = int(math.floor((90.0 - read_bbox[3]) / px))
    row1 = int(math.ceil((90.0 - read_bbox[1]) / px))
    if col1 <= col0 or row1 <= row0:
        return None
    seed = scene_seed(layer_name)
    return gen_band(seed, BAND_CLASS, (row0, row1, col0, col1))


def class_histogram(classes: np.ndarray) -> list[dict]:
    """Class histogram excluding nodata code 0: pixel counts + area_pct (2dp)
    sorted desc by count (reference: eudr.py:773-843; F8 nodata exclusion).
    Ties broken by class code asc for determinism."""
    vals, counts = np.unique(classes, return_counts=True)
    keep = vals != 0
    vals, counts = vals[keep], counts[keep]
    total = int(counts.sum())
    if total == 0:
        return []
    rows = [
        {
            "class_code": int(v),
            "pixel_count": int(c),
            "area_pct": round(100.0 * int(c) / total, 2),
        }
        for v, c in zip(vals, counts)
    ]
    rows.sort(key=lambda r: (-r["pixel_count"], r["class_code"]))
    return rows


# ── reference numpy kernels ──────────────────────────────────────────────────


def _resample_indices(
    src_shape: tuple[int, int], target_shape: tuple[int, int]
) -> tuple[np.ndarray, np.ndarray]:
    """Pixel-centre nearest-neighbour index arrays; cached — window shapes
    repeat across the frames of an AOI and across same-sized AOIs, and the
    arrays depend only on the two shapes."""
    key = (src_shape, target_shape)
    cached = _RESAMPLE_IDX.get(key)
    if cached is not None:
        return cached
    row_scale = src_shape[0] / target_shape[0]
    col_scale = src_shape[1] / target_shape[1]
    row_idx = np.rint((np.arange(target_shape[0]) + 0.5) * row_scale - 0.5).astype(int)
    col_idx = np.rint((np.arange(target_shape[1]) + 0.5) * col_scale - 0.5).astype(int)
    np.clip(row_idx, 0, src_shape[0] - 1, out=row_idx)
    np.clip(col_idx, 0, src_shape[1] - 1, out=col_idx)
    if len(_RESAMPLE_IDX) > 4096:
        _RESAMPLE_IDX.clear()  # bound worker memory; shapes rarely exceed this
    _RESAMPLE_IDX[key] = (row_idx, col_idx)
    return row_idx, col_idx


_RESAMPLE_IDX: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}


def resample_nearest(src: np.ndarray, target_shape: tuple[int, int]) -> np.ndarray:
    """Categorical nearest-neighbour resample, pixel-centre mapping
    (reference: ndvi.py:487-510 — must match exactly: affects masked counts)."""
    if src.shape == tuple(target_shape):
        return src
    row_idx, col_idx = _resample_indices(src.shape, tuple(target_shape))
    return src[np.ix_(row_idx, col_idx)]


def _ndvi_core(red_raw: np.ndarray, nir_raw: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(ndvi, base validity mask) with scratch buffers + out= ufuncs.

    Produces BIT-IDENTICAL values to the reference's expression
    ``np.where(denom>0, (nir-red)/denom, nan)`` with
    ``valid = (red_raw>0)&(nir_raw>0)&isfinite(ndvi)`` (ndvi.py:206-211) —
    same float32 operations per element, just without fresh temporaries
    (the raster stages are memory-bandwidth-bound)."""
    hh, ww = red_raw.shape
    n = hh * ww
    red = _scratch("ndf_red", n, np.float32).reshape(hh, ww)
    nir = _scratch("ndf_nir", n, np.float32).reshape(hh, ww)
    den = _scratch("ndf_den", n, np.float32).reshape(hh, ww)
    ndvi = _scratch("ndf_out", n, np.float32).reshape(hh, ww)
    pos = _scratch("ndf_pos", n, np.bool_).reshape(hh, ww)
    vm = _scratch("ndf_vm", n, np.bool_).reshape(hh, ww)
    t = _scratch("ndf_t", n, np.bool_).reshape(hh, ww)
    np.copyto(red, red_raw, casting="unsafe")
    np.copyto(nir, nir_raw, casting="unsafe")
    np.add(nir, red, out=den)
    np.greater(den, 0, out=pos)
    np.subtract(nir, red, out=ndvi)  # numerator in the output buffer
    ndvi_full = ndvi
    np.divide(ndvi_full, den, out=ndvi_full, where=pos)
    np.logical_not(pos, out=t)
    ndvi_full[t] = np.nan  # reference: np.where(denom>0, ..., nan)
    # valid = red_raw>0 & nir_raw>0 & isfinite(ndvi)
    np.greater(red_raw, 0, out=vm)
    np.greater(nir_raw, 0, out=t)
    np.logical_and(vm, t, out=vm)
    np.isfinite(ndvi_full, out=t)
    np.logical_and(vm, t, out=vm)
    return ndvi_full, vm


def ndvi_s2(
    red_raw: np.ndarray, nir_raw: np.ndarray, scl: np.ndarray | None
) -> tuple[np.ndarray, np.ndarray, int]:
    """Sentinel-2 NDVI + validity mask + SCL masked count
    (reference: ndvi.py:158-215 pure-python path, incl. shape-mismatch trim)."""
    if red_raw.shape != nir_raw.shape:
        min_h = min(red_raw.shape[0], nir_raw.shape[0])
        min_w = min(red_raw.shape[1], nir_raw.shape[1])
        red_raw = red_raw[:min_h, :min_w]
        nir_raw = nir_raw[:min_h, :min_w]
    scl_mask = resample_nearest(scl, red_raw.shape) if scl is not None else None
    ndvi, valid_mask = _ndvi_core(red_raw, nir_raw)
    scl_masked_count = 0
    if scl_mask is not None:
        # identical semantics to np.isin(scl_mask, VALID_SCL_CLASSES) but a
        # 256-entry table gather instead of a sort/search — np.isin measured
        # ~24% of this whole kernel on 12.5k-px windows
        scl_valid = _SCL_VALID_LUT[scl_mask]
        scl_masked_count = int(np.sum(valid_mask & ~scl_valid))
        np.logical_and(valid_mask, scl_valid, out=valid_mask)
    return ndvi, valid_mask, scl_masked_count


def ndvi_landsat(
    red_raw: np.ndarray, nir_raw: np.ndarray, qa: np.ndarray | None
) -> tuple[np.ndarray, np.ndarray, int]:
    """Landsat NDVI + validity mask + QA masked count
    (reference: ndvi.py:376-411)."""
    if red_raw.shape != nir_raw.shape:
        min_h = min(red_raw.shape[0], nir_raw.shape[0])
        min_w = min(red_raw.shape[1], nir_raw.shape[1])
        red_raw = red_raw[:min_h, :min_w]
        nir_raw = nir_raw[:min_h, :min_w]
    ndvi, valid_mask = _ndvi_core(red_raw, nir_raw)
    qa_masked_count = 0
    if qa is not None:
        if qa.shape != red_raw.shape:
            qa = resample_nearest(qa, red_raw.shape)
        qa_mask = (qa.astype(np.uint16) & np.uint16(LANDSAT_QA_CLOUD_BITS)) == 0
        qa_masked_count = int(np.sum(valid_mask & ~qa_mask))
        np.logical_and(valid_mask, qa_mask, out=valid_mask)
    return ndvi, valid_mask, qa_masked_count


def ndvi_statistics(ndvi: np.ndarray, valid_mask: np.ndarray) -> dict | None:
    """Rounded stats over valid pixels (reference: ndvi.py:217-236). Returns
    None when no valid pixels (reference returns None → frame has no stat)."""
    return ndvi_statistics_from_values(ndvi[valid_mask], int(ndvi.size))


def ndvi_statistics_from_values(
    valid_pixels: np.ndarray, total_pixels: int
) -> dict | None:
    """The ndvi_statistics reductions over an already-compacted valid-pixel
    array (row-major order). The blocked window path concatenates per-block
    compactions into exactly the array ``ndvi[valid_mask]`` yields, so both
    entry points are bit-identical."""
    n = len(valid_pixels)
    if n == 0:
        return None
    from azure_workflow_for_kml_satellite_spark.functions import native as N

    if (
        N.available()
        and valid_pixels.dtype == np.float32
        and valid_pixels.flags["C_CONTIGUOUS"]
    ):
        # one fused C call (native.c §stats — bitwise np.mean/np.std and
        # np.sort's order statistics; tests/test_native_kernels.py pins it)
        mean, std, vmin, vmax, med_lo, med_hi, _, _ = N.stats_f32(valid_pixels)
        return {
            "mean": round(mean, 4),
            "min": round(vmin, 4),
            "max": round(vmax, 4),
            "std": round(std, 4),
            "median": round(float(_median_of_pair(med_lo, med_hi, n)), 4),
            "valid_pixels": int(n),
            "total_pixels": int(total_pixels),
        }
    s = np.sort(valid_pixels)
    return {
        "mean": round(float(np.mean(valid_pixels)), 4),
        "min": round(float(s[0]), 4),
        "max": round(float(s[-1]), 4),
        "std": round(float(np.std(valid_pixels)), 4),
        "median": round(float(_median_sorted(s)), 4),
        "valid_pixels": int(n),
        "total_pixels": int(total_pixels),
    }


def _median_sorted(s: np.ndarray):
    """np.median of a NaN-free array, taken from its sorted copy. Identical
    value: np.median partitions to the same order statistics this sorted
    array holds, then np.mean's the middle slice — reproduced verbatim here.
    (On this numpy build, SIMD np.sort beats introselect np.partition ~1.5x
    on the duplicate-heavy NDVI distribution, and the sorted array also gives
    min/max for free.)"""
    n = len(s)
    h = n // 2
    return np.mean(s[h - 1 : h + 1]) if n % 2 == 0 else np.mean(s[h : h + 1])


def _median_of_pair(med_lo: float, med_hi: float, n: int):
    """_median_sorted from the two middle order statistics (as produced by
    the native radix select): the same np.mean call on the same values, so
    the result is bit-identical to the sorted-slice path."""
    if n % 2 == 0:
        return np.mean(np.array([med_lo, med_hi], dtype=np.float32))
    return np.mean(np.array([med_hi], dtype=np.float32))


# ── cache-blocked window evaluation ─────────────────────────────────────────
#
# The window-size distribution is extremely skewed (sf0.1: p50 ≈ 12.6k px,
# p99 ≈ 1.2M px, max ≈ 7.8M px — roughly two thirds of all pixels live in the
# top 1% of rows). The full-window path streams ~13 scratch buffers of up to
# 31 MB each through DRAM per elementwise op; processed in ~45k-px row blocks
# the working set stays cache-resident and the same ops run 5-6x faster on
# monster windows (measured 2260 ms → 383 ms on a 2784² window) while small
# windows are unchanged (a single block). Every value is bit-identical: band
# pixels are window-placement pure, all kernel ops are elementwise (or
# row/col-index pure, for the SCL resample), and compaction per block
# concatenates to exactly the row-major ``ndvi[valid_mask]`` array.

_BLOCK_TARGET_PX = 45056


def _block_rows(width: int) -> int:
    return max(1, _BLOCK_TARGET_PX // max(1, width))


def iter_masked_ndvi_chunks(
    seed: int,
    collection: str,
    win: tuple[int, int, int, int],
    aux_win: tuple[int, int, int, int] | None,
    out_h: int | None = None,
    out_w: int | None = None,
):
    """Yield ``(ndvi, valid_mask, masked_count)`` row blocks of a window's
    NDVI, cache-blocked; bit-identical to gen_band + ndvi_s2/ndvi_landsat on
    the full window. ``aux_win`` is the SCL window (S2) or the QA window ==
    ``win`` (Landsat); ``out_h``/``out_w`` optionally trim to the top-left
    (the change-pair ``[:min_h, :min_w]`` semantics). Yielded arrays are
    scratch-backed — consume (or copy) before the next iteration."""
    r0, _r1, c0, _c1 = win
    h_full, w_full = win[1] - win[0], win[3] - win[2]
    h = h_full if out_h is None else out_h
    w = w_full if out_w is None else out_w
    use_qa = collection == "landsat-c2-l2"
    row_idx = col_idx = None
    if aux_win is not None and not use_qa:
        scl_shape = (aux_win[1] - aux_win[0], aux_win[3] - aux_win[2])
        # resample indices are computed against the FULL window shape (the
        # full path resamples before any trim), then sliced per block/trim
        row_idx, col_idx = _resample_indices(scl_shape, (h_full, w_full))
        if w != w_full:
            col_idx = col_idx[:w]
    br = _block_rows(w)
    for b0 in range(0, h, br):
        b1 = min(h, b0 + br)
        sub = (r0 + b0, r0 + b1, c0, c0 + w)
        red = gen_band(seed, BAND_RED, sub)
        nir = gen_band(seed, BAND_NIR, sub)
        ndvi, vm = _ndvi_core(red, nir)
        masked = 0
        if aux_win is not None:
            if use_qa:
                qa = gen_band(seed, BAND_QA, sub)
                ok = (qa.astype(np.uint16) & np.uint16(LANDSAT_QA_CLOUD_BITS)) == 0
            else:
                ri = row_idx[b0:b1]
                s0, s1 = int(ri[0]), int(ri[-1]) + 1
                sc = gen_band(
                    seed, BAND_SCL, (aux_win[0] + s0, aux_win[0] + s1, aux_win[2], aux_win[3])
                )
                ok = _SCL_VALID_LUT[sc[ri - s0][:, col_idx]]
            masked = int(np.sum(vm & ~ok))
            np.logical_and(vm, ok, out=vm)
        yield ndvi, vm, masked


def s2_aux_win(
    scene_bbox: list[float], resolution_m: float, read_bbox: list[float]
) -> tuple[int, int, int, int] | None:
    """SCL window for an S2 read (2x pixel size; reference: ndvi.py:166-180)."""
    return window_from_bounds(scene_bbox, resolution_m * 2, read_bbox)


# ── fused native kernels (functions/native.c; bit-identical fast path) ──────
#
# When the ctypes library is available the window/pair evaluators below feed
# the SAME numpy reductions from a single fused C pass (hash → band → NDVI →
# mask → row-major compaction), instead of ~30 elementwise numpy passes. The
# C mirror is exact (see native.c header); reductions never move out of
# numpy, so every downstream value is bit-identical either way. The numpy
# blocked path remains both the fallback and the differential oracle
# (tests/test_native_kernels.py).


def native_side_params(
    seed: int,
    collection: str,
    win: tuple[int, int, int, int],
    aux_win: tuple[int, int, int, int] | None,
    out_h: int,
    out_w: int,
):
    """(kind, r0, c0, aux_r0, aux_c0, row_idx, col_idx, seed%1000) for one
    side of a native kernel call. Resample indices are computed against the
    FULL window shape then trimmed — the numpy path's exact semantics."""
    from azure_workflow_for_kml_satellite_spark.functions import native as N

    r0, _r1, c0, _c1 = win
    if collection == "landsat-c2-l2":
        return N.KIND_LANDSAT, r0, c0, 0, 0, None, None, int(seed) % 1000
    if aux_win is None:
        return N.KIND_BARE, r0, c0, 0, 0, None, None, int(seed) % 1000
    h_full, w_full = win[1] - win[0], win[3] - win[2]
    scl_shape = (aux_win[1] - aux_win[0], aux_win[3] - aux_win[2])
    row_idx, col_idx = _resample_indices(scl_shape, (h_full, w_full))
    return (
        N.KIND_S2,
        r0,
        c0,
        aux_win[0],
        aux_win[2],
        np.ascontiguousarray(row_idx[:out_h]),
        np.ascontiguousarray(col_idx[:out_w]),
        int(seed) % 1000,
    )


def _i64p(arr):
    import ctypes

    if arr is None:
        return None
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def native_window_valid(
    seed: int,
    collection: str,
    win: tuple[int, int, int, int],
    aux_win: tuple[int, int, int, int] | None,
) -> tuple[np.ndarray, int]:
    """(valid NDVI values row-major — a scratch view, consume before the
    next call — , masked_count) for the full window, via the fused C pass.
    Caller must have checked native.available()."""
    import ctypes

    from azure_workflow_for_kml_satellite_spark.functions import native as N

    h, w = win[1] - win[0], win[3] - win[2]
    kind, r0, c0, ar0, ac0, ri, ci, s1000 = native_side_params(
        seed, collection, win, aux_win, h, w
    )
    buf = _scratch("nat_vals", h * w, np.float32)
    masked = ctypes.c_int64(0)
    n = N.LIB.kmlsat_window_valid(
        int(seed) & 0xFFFFFFFF, kind, r0, c0, h, w, ar0, ac0,
        _i64p(ri), _i64p(ci), s1000,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(masked),
    )
    return buf[: int(n)], int(masked.value)


def ndvi_window_stats_blocked(
    scene_id: str,
    scene_bbox: list[float],
    resolution_m: float,
    read_bbox: list[float],
    collection: str,
) -> tuple[dict | None, int] | None:
    """Windowed read + NDVI kernel + stats for one row, cache-blocked.
    Returns None when the window is empty (the ``bands is None`` case),
    else ``(stats | None, masked_count)`` — exactly the values the
    read_window_bands → ndvi_s2/ndvi_landsat → ndvi_statistics chain
    produces."""
    seed = scene_seed(scene_id)
    win = window_from_bounds(scene_bbox, resolution_m, read_bbox)
    if win is None:
        return None
    aux_win = win if collection == "landsat-c2-l2" else s2_aux_win(
        scene_bbox, resolution_m, read_bbox
    )
    total = (win[1] - win[0]) * (win[3] - win[2])
    from azure_workflow_for_kml_satellite_spark.functions import native as N

    if N.available():
        values, masked = native_window_valid(seed, collection, win, aux_win)
        if len(values) == 0:
            return None, masked
        return ndvi_statistics_from_values(values, total), masked
    parts: list[np.ndarray] = []
    masked = 0
    for ndvi, vm, m in iter_masked_ndvi_chunks(seed, collection, win, aux_win):
        masked += m
        vals = ndvi[vm]
        if len(vals):
            parts.append(vals)
    if not parts:
        return None, masked
    values = parts[0] if len(parts) == 1 else np.concatenate(parts)
    return ndvi_statistics_from_values(values, total), masked


def change_stats(
    ndvi_a: np.ndarray,
    ndvi_b: np.ndarray,
    pixel_area_ha: float,
    loss_threshold: float = -0.1,
    gain_threshold: float = 0.1,
) -> dict | None:
    """Per-pixel change metrics over jointly-finite pixels
    (reference: change_detection.py:64-116 pure-python path)."""
    min_h = min(ndvi_a.shape[0], ndvi_b.shape[0])
    min_w = min(ndvi_a.shape[1], ndvi_b.shape[1])
    ndvi_a = ndvi_a[:min_h, :min_w]
    ndvi_b = ndvi_b[:min_h, :min_w]
    valid = np.isfinite(ndvi_a) & np.isfinite(ndvi_b)
    if not np.any(valid):
        return None
    delta = np.where(valid, ndvi_b - ndvi_a, np.nan)
    valid_deltas = delta[valid]
    loss_mask = valid_deltas < loss_threshold
    gain_mask = valid_deltas > gain_threshold
    stable_mask = ~loss_mask & ~gain_mask
    n_valid = int(np.sum(valid))
    n_loss = int(np.sum(loss_mask))
    n_gain = int(np.sum(gain_mask))
    n_stable = int(np.sum(stable_mask))
    return {
        "mean_delta": round(float(np.mean(valid_deltas)), 4),
        "median_delta": round(float(np.median(valid_deltas)), 4),
        "std_delta": round(float(np.std(valid_deltas)), 4),
        "min_delta": round(float(np.min(valid_deltas)), 4),
        "max_delta": round(float(np.max(valid_deltas)), 4),
        "loss_ha": round(n_loss * pixel_area_ha, 2),
        "gain_ha": round(n_gain * pixel_area_ha, 2),
        "stable_ha": round(n_stable * pixel_area_ha, 2),
        "total_ha": round(n_valid * pixel_area_ha, 2),
        "loss_pct": round(n_loss / n_valid * 100, 1) if n_valid else 0.0,
        "gain_pct": round(n_gain / n_valid * 100, 1) if n_valid else 0.0,
        "valid_pixels": n_valid,
    }


def reproject_bilinear(
    src: np.ndarray,
    src_bbox: list[float],
    dst_bbox: list[float],
    dst_shape: tuple[int, int],
    src_crs: str = "EPSG:4326",
    dst_crs: str = "EPSG:4326",
) -> np.ndarray:
    """R5: continuous-band bilinear reprojection between north-up grids
    (the rasterio `reproject(..., Resampling.bilinear)` role, reference:
    fulfilment.py:321-354). Inverse mapping: each destination pixel centre is
    located in the source grid and sampled bilinearly; pixels outside the
    source coverage — and pixels whose 2×2 support touches NaN nodata —
    come out NaN, matching rasterio's nodata handling for float rasters.

    Same-CRS grids map affinely; differing CRSs transform the destination
    pixel centres into src_crs first, mirroring the reference — via pyproj
    when importable, else the vendored Karney transverse-Mercator
    (functions/tmerc.py, geographic↔UTM; the sandbox path). Other CRS
    families raise NotImplementedError — same upgrade rule as
    functions.geometry.transform_bbox."""
    sh, sw = src.shape
    dh, dw = dst_shape
    dpx = (dst_bbox[2] - dst_bbox[0]) / dw
    dpy = (dst_bbox[3] - dst_bbox[1]) / dh
    xs = dst_bbox[0] + (np.arange(dw) + 0.5) * dpx
    ys = dst_bbox[3] - (np.arange(dh) + 0.5) * dpy
    if src_crs != dst_crs:
        gx, gy = np.meshgrid(xs, ys)
        from azure_workflow_for_kml_satellite_spark.functions.geometry import (
            pyproj_import,
        )

        Transformer = pyproj_import("Transformer")
        if Transformer is not None:
            # only the IMPORT PROBE selects the fallback (a broken pyproj
            # must surface, not silently switch transforms)
            tr = Transformer.from_crs(dst_crs, src_crs, always_xy=True)
            gx, gy = tr.transform(gx, gy)
        else:
            from azure_workflow_for_kml_satellite_spark.functions.tmerc import (
                transform_grid_np,
            )

            gx, gy = transform_grid_np(gx, gy, dst_crs, src_crs)
    else:
        gx, gy = np.meshgrid(xs, ys)
    spx = (src_bbox[2] - src_bbox[0]) / sw
    spy = (src_bbox[3] - src_bbox[1]) / sh
    # coverage = destination centres inside the source bbox (edge pixels
    # sample with clamped support, like rasterio)
    inside = (
        (gx >= src_bbox[0]) & (gx <= src_bbox[2])
        & (gy >= src_bbox[1]) & (gy <= src_bbox[3])
    )
    # fractional source pixel coordinates of the destination centres
    fx = np.clip((gx - src_bbox[0]) / spx - 0.5, 0, sw - 1)
    fy = np.clip((src_bbox[3] - gy) / spy - 0.5, 0, sh - 1)
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    wx = (fx - x0).astype(np.float32)
    wy = (fy - y0).astype(np.float32)
    x0c = np.clip(x0, 0, sw - 1)
    y0c = np.clip(y0, 0, sh - 1)
    x1c = np.clip(x0 + 1, 0, sw - 1)
    y1c = np.clip(y0 + 1, 0, sh - 1)
    s = src.astype(np.float32, copy=False)
    v00 = s[y0c, x0c]
    v01 = s[y0c, x1c]
    v10 = s[y1c, x0c]
    v11 = s[y1c, x1c]
    out = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
    out[~inside] = np.nan
    return out


# ── raster codec (GeoTIFF stand-in) ─────────────────────────────────────────

_MAGIC = b"KSR1"


def pack_raster(arr: np.ndarray, pixel_size_m: float) -> bytes:
    """Serialize a float32 raster + pixel size; zlib-compressed (plays the
    deflate float32 GeoTIFF role, reference: ndvi.py:239-255)."""
    a = np.ascontiguousarray(arr, dtype=np.float32)
    header = struct.pack("<4sIId", _MAGIC, a.shape[0], a.shape[1], float(pixel_size_m))
    return header + zlib.compress(a.tobytes(), 6)


def unpack_raster(data: bytes) -> tuple[np.ndarray, float]:
    magic, h, w, px = struct.unpack_from("<4sIId", data, 0)
    if magic != _MAGIC:
        raise ValueError("bad raster magic")
    raw = zlib.decompress(data[struct.calcsize("<4sIId"):])
    return np.frombuffer(raw, dtype=np.float32).reshape(h, w), px
