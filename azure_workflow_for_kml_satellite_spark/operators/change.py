"""Year-over-year NDVI change detection (SURVEY.md §2.3 J4, §2.4 A2/A3).

The reference stores each frame's NDVI GeoTIFF to blob and re-downloads
pairs for comparison (reference: change_detection.py:140-242). Spark-first
equivalent: pair consecutive same-season years with ``lag`` over a window
(W1), shuffle only the tiny scene/window *recipe* columns, and regenerate
both masked NDVI rasters deterministically inside the pairwise UDF — no
raster bytes ever shuffle (at 100 TB scale the raster re-read is the COG
windowed read the reference also pays).

Consecutive means adjacent in the year-sorted list within (aoi, season),
NOT year_b == year_a + 1 (reference: change_detection.py:190-197).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

from azure_workflow_for_kml_satellite_spark.constants import (
    CHANGE_GAIN_THRESHOLD,
    CHANGE_LOSS_THRESHOLD,
)
from azure_workflow_for_kml_satellite_spark.functions import raster as R

# Columns that let the UDF regenerate one frame's masked NDVI raster.
_RECIPE = [
    "scene_id",
    "s_min_lon",
    "s_min_lat",
    "s_max_lon",
    "s_max_lat",
    "resolution_m",
    "ndvi_collection",
    "min_lon",
    "min_lat",
    "max_lon",
    "max_lat",
]

_CHANGE_FIELDS = [
    T.StructField("mean_delta", T.DoubleType(), True),
    T.StructField("median_delta", T.DoubleType(), True),
    T.StructField("std_delta", T.DoubleType(), True),
    T.StructField("min_delta", T.DoubleType(), True),
    T.StructField("max_delta", T.DoubleType(), True),
    T.StructField("loss_ha", T.DoubleType(), True),
    T.StructField("gain_ha", T.DoubleType(), True),
    T.StructField("stable_ha", T.DoubleType(), True),
    T.StructField("total_ha", T.DoubleType(), True),
    T.StructField("loss_pct", T.DoubleType(), True),
    T.StructField("gain_pct", T.DoubleType(), True),
    T.StructField("valid_change_pixels", T.LongType(), True),
]


def masked_ndvi_for_recipe(rec: dict, prefix: str = "") -> tuple[np.ndarray, float] | None:
    """Regenerate the frame's masked NDVI raster (NaN outside valid) exactly
    as the NDVI stage wrote it (operators/ndvi.py; reference ndvi.py:239-241)."""
    p = lambda c: rec[prefix + c] if prefix else rec[c]
    scene_bbox = [p("s_min_lon"), p("s_min_lat"), p("s_max_lon"), p("s_max_lat")]
    read_bbox = [p("min_lon"), p("min_lat"), p("max_lon"), p("max_lat")]
    collection = p("ndvi_collection")
    bands = R.read_window_bands(
        p("scene_id"), scene_bbox, p("resolution_m"), read_bbox, collection
    )
    if bands is None:
        return None
    if collection == "landsat-c2-l2":
        ndvi, mask, _ = R.ndvi_landsat(bands["red"], bands["nir"], bands.get("qa"))
    else:
        ndvi, mask, _ = R.ndvi_s2(bands["red"], bands["nir"], bands.get("scl"))
    if not np.any(mask):
        return None
    return np.where(mask, ndvi, np.nan).astype(np.float32), float(p("resolution_m"))


def _recipe_windows(rec: dict, prefix: str):
    """(seed, collection, win, aux_win, resolution_m) for one side of a pair,
    or None when the read window is empty (the ``bands is None`` case)."""
    p = lambda c: rec[prefix + c]
    scene_bbox = [p("s_min_lon"), p("s_min_lat"), p("s_max_lon"), p("s_max_lat")]
    read_bbox = [p("min_lon"), p("min_lat"), p("max_lon"), p("max_lat")]
    res = p("resolution_m")
    win = R.window_from_bounds(scene_bbox, res, read_bbox)
    if win is None:
        return None
    collection = p("ndvi_collection")
    aux_win = win if collection == "landsat-c2-l2" else R.s2_aux_win(
        scene_bbox, res, read_bbox
    )
    return R.scene_seed(p("scene_id")), collection, win, aux_win, float(res)


def _native_pair_deltas(
    seed_a, coll_a, win_a, aux_a, seed_b, coll_b, win_b, aux_b, min_h, min_w
) -> np.ndarray:
    """Jointly-valid deltas via the fused C pair kernel — a scratch view,
    consumed by the reductions in the caller before any further call."""
    import ctypes

    from azure_workflow_for_kml_satellite_spark.functions import native as N

    ka, ar0, ac0, aar0, aac0, ari, aci, as1000 = R.native_side_params(
        seed_a, coll_a, win_a, aux_a, min_h, min_w
    )
    kb, br0, bc0, bar0, bac0, bri, bci, bs1000 = R.native_side_params(
        seed_b, coll_b, win_b, aux_b, min_h, min_w
    )
    buf = R._scratch("nat_deltas", min_h * min_w, np.float32)
    n = N.LIB.kmlsat_change_pair_valid(
        int(seed_a) & 0xFFFFFFFF, ka, ar0, ac0, aar0, aac0,
        R._i64p(ari), R._i64p(aci), as1000,
        int(seed_b) & 0xFFFFFFFF, kb, br0, bc0, bar0, bac0,
        R._i64p(bri), R._i64p(bci), bs1000,
        min_h, min_w,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return buf[: int(n)]


def change_stats_for_pair_blocked(
    rec: dict,
    loss_threshold: float,
    gain_threshold: float,
) -> dict | None:
    """Cache-blocked equivalent of masked_ndvi_for_recipe(a/b) +
    R.change_stats: both sides' NDVI chunks are regenerated block-by-block
    over the trimmed common shape and the delta compacted per block, so no
    full-window raster ever materializes. Bit-identical: band pixels are
    window-placement pure, the delta/selection ops elementwise, and the
    concatenated valid-delta array equals the full path's ``delta[valid]``
    (rows skipped by either path are skipped by both — an all-invalid side
    and an empty joint-valid set both yield None)."""
    wa = _recipe_windows(rec, "a_")
    wb = _recipe_windows(rec, "b_")
    if wa is None or wb is None:
        return None
    seed_a, coll_a, win_a, aux_a, res_a = wa
    seed_b, coll_b, win_b, aux_b, _res_b = wb
    min_h = min(win_a[1] - win_a[0], win_b[1] - win_b[0])
    min_w = min(win_a[3] - win_a[2], win_b[3] - win_b[2])
    from azure_workflow_for_kml_satellite_spark.functions import native as N

    if N.available():
        # fused C pass over both sides (functions/native.c): the compacted
        # delta array equals the blocked path's concatenation bit-for-bit,
        # and the fused C reductions are bitwise np.mean/np.std/np.sort
        # order statistics / f32-cast threshold counts (native.c §stats;
        # pinned in tests/test_native_kernels.py)
        valid_deltas = _native_pair_deltas(
            seed_a, coll_a, win_a, aux_a, seed_b, coll_b, win_b, aux_b,
            min_h, min_w,
        )
        n_valid = len(valid_deltas)
        if n_valid == 0:
            return None
        mean_d, std_d, min_d, max_d, med_lo, med_hi, n_loss, n_gain = N.stats_f32(
            valid_deltas, loss_threshold, gain_threshold
        )
        res_a_ha = abs(res_a * res_a) / 10_000
        n_stable = n_valid - n_loss - n_gain
        return {
            "mean_delta": round(mean_d, 4),
            "median_delta": round(float(R._median_of_pair(med_lo, med_hi, n_valid)), 4),
            "std_delta": round(std_d, 4),
            "min_delta": round(min_d, 4),
            "max_delta": round(max_d, 4),
            "loss_ha": round(n_loss * res_a_ha, 2),
            "gain_ha": round(n_gain * res_a_ha, 2),
            "stable_ha": round(n_stable * res_a_ha, 2),
            "total_ha": round(n_valid * res_a_ha, 2),
            "loss_pct": round(n_loss / n_valid * 100, 1) if n_valid else 0.0,
            "gain_pct": round(n_gain / n_valid * 100, 1) if n_valid else 0.0,
            "valid_pixels": n_valid,
        }
    else:
        ga = R.iter_masked_ndvi_chunks(seed_a, coll_a, win_a, aux_a, min_h, min_w)
        gb = R.iter_masked_ndvi_chunks(seed_b, coll_b, win_b, aux_b, min_h, min_w)
        parts: list[np.ndarray] = []
        n_valid = n_loss = n_gain = 0
        for ndvi_a, vm_a, _ in ga:
            # the chunk arrays are scratch-backed and side b's computation
            # will reuse the same buffers — materialize side a as its masked
            # raster (exactly the array the full path builds) before
            # advancing b
            a = np.where(vm_a, ndvi_a, np.nan)
            ndvi_b, vm_b, _ = next(gb)
            valid = np.isfinite(a)
            np.logical_and(valid, vm_b, out=valid)
            if not valid.any():
                continue
            np.subtract(ndvi_b, a, out=a)  # delta in the owned side-a buffer
            vals = a[valid]
            n = len(vals)
            n_valid += n
            n_loss += int(np.sum(vals < loss_threshold))
            n_gain += int(np.sum(vals > gain_threshold))
            parts.append(vals)
        if n_valid == 0:
            return None
        valid_deltas = parts[0] if len(parts) == 1 else np.concatenate(parts)
    pixel_area_ha = abs(res_a * res_a) / 10_000
    n_stable = n_valid - n_loss - n_gain
    s = np.sort(valid_deltas)  # order statistics: median/min/max (raster.py)
    return {
        "mean_delta": round(float(np.mean(valid_deltas)), 4),
        "median_delta": round(float(R._median_sorted(s)), 4),
        "std_delta": round(float(np.std(valid_deltas)), 4),
        "min_delta": round(float(s[0]), 4),
        "max_delta": round(float(s[-1]), 4),
        "loss_ha": round(n_loss * pixel_area_ha, 2),
        "gain_ha": round(n_gain * pixel_area_ha, 2),
        "stable_ha": round(n_stable * pixel_area_ha, 2),
        "total_ha": round(n_valid * pixel_area_ha, 2),
        "loss_pct": round(n_loss / n_valid * 100, 1) if n_valid else 0.0,
        "gain_pct": round(n_gain / n_valid * 100, 1) if n_valid else 0.0,
        "valid_pixels": n_valid,
    }


def season_changes(
    ndvi_df: DataFrame,
    loss_threshold: float = CHANGE_LOSS_THRESHOLD,
    gain_threshold: float = CHANGE_GAIN_THRESHOLD,
) -> DataFrame:
    """ndvi stats rows → one row per (aoi, season, year_from, year_to) with
    the reference's change metrics."""
    # coalesce (no shuffle) off the NDVI cache's fine raster grain before the
    # cheap window/pairing stages — same per-task-overhead fix as
    # ndvi_trend_per_aoi; the window's partitionBy/orderBy fully determines
    # the pairing, so partition merging cannot change the result
    par = ndvi_df.sparkSession.sparkContext.defaultParallelism
    has_stat = (
        ndvi_df.filter(F.col("ndvi_mean").isNotNull())
        .select("url", "feature_index", "season", "year", *_RECIPE)
        .coalesce(par)
    )
    w = Window.partitionBy("url", "feature_index", "season").orderBy("year")
    paired = has_stat.select(
        "url",
        "feature_index",
        "season",
        F.lag("year").over(w).alias("year_from"),
        F.col("year").alias("year_to"),
        *[F.lag(c).over(w).alias(f"a_{c}") for c in _RECIPE],
        *[F.col(c).alias(f"b_{c}") for c in _RECIPE],
    ).filter(F.col("year_from").isNotNull())
    # The window shuffle clumps one AOI's (heavy) pairs into one partition;
    # pair recompute cost varies 4 orders of magnitude (monster 200px² vs
    # mega 2800px² windows), so scatter rows before the pixel work. Fine
    # grain + key-hash, same policy the round-5 profile study picked for
    # the NDVI stage (BASELINE.md): hash on the full pair key declusters
    # same-AOI runs (measured 29.9 s vs 35-40 s round-robin at sf0.1).
    # Multiplier env-tunable (SPARK_GRAFT_CHANGE_GRAIN_X) — re-swept after
    # the round-8 shuffle-writer fix changed per-task costs.
    import os

    _grain_x = int(os.environ.get("SPARK_GRAFT_CHANGE_GRAIN_X", "8"))
    paired = paired.repartition(
        max(64, _grain_x * ndvi_df.sparkSession.sparkContext.defaultParallelism),
        F.col("url"), F.col("feature_index"), F.col("season"), F.col("year_to"),
    )

    key_cols = ["url", "feature_index", "season", "year_from", "year_to"]
    schema = T.StructType(
        [paired.schema[c] for c in key_cols]
        + [T.StructField("label", T.StringType(), True)]
        + _CHANGE_FIELDS
    )
    out_cols = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                # pixel area comes from raster a inside the blocked evaluator
                # (reference: change_detection.py:59,70-71)
                stats = change_stats_for_pair_blocked(
                    rec, loss_threshold, gain_threshold
                )
                if stats is None:
                    continue
                row = {k: rec[k] for k in key_cols}
                season = rec["season"]
                # reference: change_detection.py:235
                row["label"] = f"{season.capitalize()} {rec['year_from']} → {rec['year_to']}"
                row.update(
                    {
                        "mean_delta": stats["mean_delta"],
                        "median_delta": stats["median_delta"],
                        "std_delta": stats["std_delta"],
                        "min_delta": stats["min_delta"],
                        "max_delta": stats["max_delta"],
                        "loss_ha": stats["loss_ha"],
                        "gain_ha": stats["gain_ha"],
                        "stable_ha": stats["stable_ha"],
                        "total_ha": stats["total_ha"],
                        "loss_pct": stats["loss_pct"],
                        "gain_pct": stats["gain_pct"],
                        "valid_change_pixels": stats["valid_pixels"],
                    }
                )
                rows.append(row)
            yield pd.DataFrame(rows, columns=out_cols) if rows else pd.DataFrame(
                columns=out_cols
            )

    return paired.mapInPandas(run, schema)


def change_summary_per_aoi(changes: DataFrame) -> DataFrame:
    """A3: per-AOI rollup + trajectory classification
    (reference: change_detection.py:244-259).

    Computed with the shared pure kernel inside applyInPandas rather than
    Spark aggregates: the reference rounds with Python ``round`` (banker's),
    Spark's ``round`` is HALF_UP — on exact .5 boundaries they differ, so
    bit-for-bit parity requires the Python path (SURVEY.md §7.4 risk 1).
    Groups are tiny (≤ #seasons × #years rows)."""
    from azure_workflow_for_kml_satellite_spark.functions.metrics import change_summary

    schema = T.StructType(
        [
            changes.schema["url"],
            changes.schema["feature_index"],
            T.StructField("comparisons", T.LongType()),
            T.StructField("total_loss_ha", T.DoubleType()),
            T.StructField("total_gain_ha", T.DoubleType()),
            T.StructField("avg_mean_delta", T.DoubleType()),
            T.StructField("trajectory", T.StringType()),
        ]
    )

    from pyspark.sql.functions import pandas_udf

    out_t = T.StructType([f for f in schema.fields if f.name not in ("url", "feature_index")])

    @pandas_udf(out_t)
    def summary_udf(series: pd.Series) -> pd.DataFrame:
        rows = []
        for arr in series:
            # canonical accumulation order: seasons sorted, years ascending —
            # float sums are order-dependent and the reference iterates
            # sorted(season_groups) by year (change_detection.py:190-197);
            # sort_array on the struct gives exactly that order.
            s = change_summary(
                [x["mean_delta"] for x in arr],
                [x["loss_ha"] for x in arr],
                [x["gain_ha"] for x in arr],
            )
            rows.append(s)
        return pd.DataFrame(rows, columns=[f.name for f in out_t.fields])

    agg = (
        changes.select(
            "url", "feature_index", "season", "year_from", "year_to",
            "mean_delta", "loss_ha", "gain_ha",
        )
        .groupBy("url", "feature_index")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "season", "year_from", "year_to", "mean_delta", "loss_ha", "gain_ha"
                    )
                )
            ).alias("series")
        )
    )
    return agg.select(
        "url", "feature_index", summary_udf(F.col("series")).alias("s")
    ).select("url", "feature_index", "s.*")
