"""Per-(geometry, frame, scene) NDVI statistics (SURVEY.md §2.4 A1, §2.9).

``mapInPandas`` over the spatial-join output: each row independently performs
a windowed band read of its scene (deterministic synthetic provider — the
COG-windowed-read role, reference: ndvi.py:463-484), runs the reference's
exact numpy NDVI + masking kernels (ndvi.py:189-236 for S2 incl. SCL
nearest-neighbour resample; ndvi.py:372-447 for Landsat QA_PIXEL), and emits
the rounded statistics struct.

Parity note (SURVEY.md §7.4 risk 1): each group's stats are computed inside
ONE udf call on the full window array — float32 reduction order is fixed and
identical to the sequential oracle, never a distributed aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from azure_workflow_for_kml_satellite_spark.functions import raster as R

_STAT_FIELDS = [
    T.StructField("ndvi_mean", T.DoubleType(), True),
    T.StructField("ndvi_min", T.DoubleType(), True),
    T.StructField("ndvi_max", T.DoubleType(), True),
    T.StructField("ndvi_std", T.DoubleType(), True),
    T.StructField("ndvi_median", T.DoubleType(), True),
    T.StructField("valid_pixels", T.LongType(), True),
    T.StructField("total_pixels", T.LongType(), True),
    T.StructField("masked_pixels", T.LongType(), True),
    T.StructField("ndvi_raster", T.BinaryType(), True),
]


def compute_ndvi_for_row(rec: dict, include_raster: bool = False) -> dict:
    """Band read + NDVI kernel for one (aoi, frame, scene) row.

    Read window = the AOI bbox (per-AOI enrichment semantics,
    reference: runner.py:488-572); scene search already used the buffered
    bbox. Returns null stats when the window is empty or no valid pixels
    (reference returns None → frame has no stat, ndvi.py:219-221).
    """
    read_bbox = [rec["min_lon"], rec["min_lat"], rec["max_lon"], rec["max_lat"]]
    scene_bbox = [rec["s_min_lon"], rec["s_min_lat"], rec["s_max_lon"], rec["s_max_lat"]]
    collection = rec["ndvi_collection"]
    bands = R.read_window_bands(
        rec["scene_id"], scene_bbox, rec["resolution_m"], read_bbox, collection
    )
    out = {
        "ndvi_mean": None,
        "ndvi_min": None,
        "ndvi_max": None,
        "ndvi_std": None,
        "ndvi_median": None,
        "valid_pixels": None,
        "total_pixels": None,
        "masked_pixels": None,
        "ndvi_raster": None,
    }
    if bands is None:
        return out
    if collection == "landsat-c2-l2":
        ndvi, mask, masked = R.ndvi_landsat(bands["red"], bands["nir"], bands.get("qa"))
    else:
        ndvi, mask, masked = R.ndvi_s2(bands["red"], bands["nir"], bands.get("scl"))
    stats = R.ndvi_statistics(ndvi, mask)
    if stats is None:
        return out
    out.update(
        {
            "ndvi_mean": stats["mean"],
            "ndvi_min": stats["min"],
            "ndvi_max": stats["max"],
            "ndvi_std": stats["std"],
            "ndvi_median": stats["median"],
            "valid_pixels": stats["valid_pixels"],
            "total_pixels": stats["total_pixels"],
            "masked_pixels": masked,
        }
    )
    if include_raster:
        import numpy as np

        from azure_workflow_for_kml_satellite_spark.functions.geotiff import (
            write_geotiff_f32,
        )

        # masked float32 GeoTIFF, NaN nodata, deflate — the reference's NDVI
        # export artifact byte-for-byte in role (enrichment/ndvi.py:239-255)
        ndvi_masked = np.where(mask, ndvi, np.nan)
        win = R.window_from_bounds(scene_bbox, rec["resolution_m"], read_bbox)
        px = rec["resolution_m"] * R.DEG_PER_METRE
        out["ndvi_raster"] = write_geotiff_f32(
            ndvi_masked,
            west=scene_bbox[0] + win[2] * px,
            north=scene_bbox[3] - win[0] * px,
            px_x=px,
            px_y=px,
        )
    return out


def ndvi_stats(best_scenes: DataFrame, include_raster: bool = False) -> DataFrame:
    """Append NDVI statistic columns to the (aoi, frame, best scene) rows.

    Column-wise inner loop (no per-row dict materialization): the stats are
    appended to the incoming Arrow batch as new columns — profiling showed
    row-dict conversion dominating over the pixel math itself."""
    schema = T.StructType(list(best_scenes.schema.fields) + _STAT_FIELDS)
    stat_names = [f.name for f in _STAT_FIELDS]
    needed = [
        "scene_id", "s_min_lon", "s_min_lat", "s_max_lon", "s_max_lat",
        "resolution_m", "ndvi_collection", "min_lon", "min_lat", "max_lon", "max_lat",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_cols: dict[str, list] = {n: [] for n in stat_names}
            for vals in zip(*(pdf[c].values for c in needed)):
                rec = dict(zip(needed, vals))
                st = compute_ndvi_for_row(rec, include_raster)
                for n in stat_names:
                    out_cols[n].append(st[n])
            out = pdf.copy()
            for n in stat_names:
                out[n] = pd.Series(out_cols[n], index=pdf.index, dtype=object)
            yield out

    return best_scenes.mapInPandas(run, schema)
