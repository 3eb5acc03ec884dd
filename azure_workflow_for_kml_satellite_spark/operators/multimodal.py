"""Multimodal binary-column operators (task brief: image/audio/video as
opaque binary columns with typed metadata).

PNG payloads are REALLY decoded (the repo's from-scratch decoder,
functions/png.py — zlib inflate + all five filter types incl. Paeth), so
width/height/channels/mean_luma/phash are true pixel statistics for PNG
inputs. Other codecs (JPEG/audio/video — no PIL/ffmpeg in this container)
fall back to a deterministic stand-in, clearly marked: swapping
``_fake_decode_image`` for a PIL call is a one-function change; schemas,
Arrow batch shape, partitioning and UDF signatures are the real contract.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("phash", T.LongType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_image(data: bytes) -> np.ndarray:
    """bytes → HxWxC uint8. PNG: real decode via functions/png.py.
    Other formats: deterministic stand-in (no codecs in this container)."""
    if data[:8] == _PNG_MAGIC:
        from azure_workflow_for_kml_satellite_spark.functions.png import decode_png

        decoded = decode_png(data)
        if decoded is None:
            raise ValueError("corrupt or unsupported PNG payload")
        img, bpp = decoded
        return img
    return _fake_decode_image(data)


def _fake_decode_image(data: bytes) -> np.ndarray:
    """Deterministic stand-in for a non-PNG image decoder: derives a small
    uint8 HxWx3 array purely from the bytes. Replace with PIL.Image.open
    when a codec is available — the call-site contract (bytes → ndarray) is
    the real one."""
    if len(data) < 8:
        raise ValueError("truncated image payload")
    crc = zlib.crc32(data)
    h = 16 + crc % 48
    w = 16 + (crc >> 8) % 48
    rng = np.frombuffer(
        np.random.default_rng(crc).bytes(h * w * 3), dtype=np.uint8
    ).reshape(h, w, 3)
    return rng


def _phash(img: np.ndarray) -> int:
    """Tiny average-hash over an 8x8 downsample of the luma plane."""
    luma = img.mean(axis=2)
    hh, ww = luma.shape
    ys = (np.arange(8) * hh // 8).clip(0, hh - 1)
    xs = (np.arange(8) * ww // 8).clip(0, ww - 1)
    block = luma[np.ix_(ys, xs)]
    bits = (block > block.mean()).flatten()
    v = 0
    for i, b in enumerate(bits[:63]):  # 63 bits to stay in signed int64
        if b:
            v |= 1 << i
    return v


def image_metadata(df: DataFrame, id_col: str = "asset_id", bin_col: str = "payload") -> DataFrame:
    """binary column → typed image metadata rows (decode inside mapInPandas,
    Arrow-batched; errors quarantine per-row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in IMAGE_META_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf[id_col], pdf[bin_col]):
                try:
                    img = _decode_image(bytes(data))
                    rows.append(
                        {
                            "asset_id": aid,
                            "width": int(img.shape[1]),
                            "height": int(img.shape[0]),
                            "channels": int(img.shape[2]),
                            "mean_luma": round(float(img.mean()), 4),
                            "phash": _phash(img),
                            "decode_error": None,
                        }
                    )
                except ValueError as exc:
                    rows.append(
                        {
                            "asset_id": aid,
                            "width": None,
                            "height": None,
                            "channels": None,
                            "mean_luma": None,
                            "phash": None,
                            "decode_error": str(exc),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(columns=cols)

    return df.select(id_col, bin_col).mapInPandas(run, IMAGE_META_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame_phash", T.LongType()),
    ]
)


def video_frame_sample(
    df: DataFrame, every_ms: int = 1000, id_col: str = "asset_id", bin_col: str = "payload"
) -> DataFrame:
    """Video → sampled frame rows (1 per ``every_ms``). The decoder is the
    deterministic stub; the explode shape (1 asset → N frame rows) is the
    real contract for a UDTF-style frame sampler."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FRAME_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf[id_col], pdf[bin_col]):
                data = bytes(data)
                crc = zlib.crc32(data)
                duration_ms = 1000 + crc % 9000  # fake container header read
                n = max(1, duration_ms // every_ms)
                for i in range(int(n)):
                    frame = _fake_decode_image(data + i.to_bytes(4, "little"))
                    rows.append(
                        {
                            "asset_id": aid,
                            "frame_index": i,
                            "ts_ms": i * every_ms,
                            "frame_phash": _phash(frame),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(columns=cols)

    return df.select(id_col, bin_col).mapInPandas(run, FRAME_SCHEMA)
