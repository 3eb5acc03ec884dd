"""Flood-gauge enrichment with source routing (SURVEY.md §2.1 S13, §2.2 F11;
reference: treesight/pipeline/enrichment/flood.py).

Routing is the reference's centroid rule (flood.py:24-31): UK bbox → EA,
contiguous-US bbox → USGS, anywhere else → no source. The external APIs
become a broadcast-joined gauges dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def flood_source_expr(lat_col: str = "centroid_lat", lon_col: str = "centroid_lon"):
    """F11 when/otherwise routing (reference: flood.py:24-31)."""
    lat, lon = F.col(lat_col), F.col(lon_col)
    is_uk = (lat >= 49.0) & (lat <= 61.0) & (lon >= -8.0) & (lon <= 2.0)
    is_us = (lat >= 24.0) & (lat <= 50.0) & (lon >= -125.0) & (lon <= -66.0)
    return F.when(is_uk, F.lit("ea")).when(is_us, F.lit("usgs")).otherwise(F.lit(None))


def flood_summary_per_aoi(aois: DataFrame, gauges: DataFrame) -> DataFrame:
    """Per-AOI gauge rollup from the routed source within the buffered bbox:
    gauge count, max level, nearest-station id is omitted (the reference
    truncates to 20 USGS / 50 EA rows — caps applied upstream)."""
    a = aois.select(
        "url",
        "feature_index",
        "buf_min_lon",
        "buf_min_lat",
        "buf_max_lon",
        "buf_max_lat",
        flood_source_expr().alias("flood_source"),
    )
    g = F.broadcast(gauges)
    joined = a.filter(F.col("flood_source").isNotNull()).join(
        g,
        (F.col("source") == F.col("flood_source"))
        & (F.col("longitude") >= F.col("buf_min_lon"))
        & (F.col("longitude") <= F.col("buf_max_lon"))
        & (F.col("latitude") >= F.col("buf_min_lat"))
        & (F.col("latitude") <= F.col("buf_max_lat")),
        "inner",
    )
    return joined.groupBy("url", "feature_index", "flood_source").agg(
        F.count("*").alias("n_gauges"),
        F.max("level_m").alias("max_level_m"),
    )
