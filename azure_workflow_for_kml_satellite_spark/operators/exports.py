"""Export formatters (SURVEY.md §2.1 S17-S19; reference: blueprints/export.py).

Re-expressed over the engine's DataFrames:
- GeoJSON (S17): one Feature per (aoi, frame) with the reference's property
  names (export.py:52-68) + a summary Point feature per AOI (export.py:86-106),
  assembled JVM-side with to_json over structs — one output row per AOI
  holding the FeatureCollection string.
- Per-frame CSV rows (S18): one row per frame with NDVI stats, weather
  aggregated into the frame [start,end] range (range join, export.py:180-196)
  and the change delta looked up by (season, year_to) (export.py:131-134).
- Per-AOI bulk CSV rows (S19): one row per AOI from the metrics tables.

The "CSV" operators return the row DataFrames; ``df.write.csv`` is the sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def frame_csv_rows(
    ndvi_df: DataFrame,
    season_changes: DataFrame,
    aois_with_region: DataFrame,
    weather: DataFrame,
) -> DataFrame:
    """S18: one row per (aoi, frame)."""
    # change delta lookup by (season, year_to) — reference export.py:131-134,198-200
    ch = season_changes.select(
        "url", "feature_index", "season",
        F.col("year_to").alias("year"),
        F.col("mean_delta").alias("ndvi_change_from_previous"),
    )
    # weather per frame window: range join daily rows into [start, end]
    w = aois_with_region.select(
        "url", "feature_index", F.col("region").alias("aoi_region")
    )
    nd = ndvi_df.join(w, ["url", "feature_index"], "left")
    # deterministic-exports discipline: date-ordered sequential folds
    # (shared helpers in operators/metrics.py); left-join misses surface as
    # null-d structs and are dropped before counting
    from azure_workflow_for_kml_satellite_spark.operators.metrics import (
        weather_series_agg,
        weather_series_fold,
    )

    valid = F.filter(F.col("series"), lambda x: x["d"].isNotNull())
    # null-safe like avg/sum: skip null observations, null result only
    # when nothing remains
    t_cnt = F.size(F.filter(valid, lambda x: x["temp_c"].isNotNull()))
    p_cnt = F.size(F.filter(valid, lambda x: x["precip_mm"].isNotNull()))
    t_sum = weather_series_fold(valid, "temp_c")
    p_sum = weather_series_fold(valid, "precip_mm")
    wx = (
        nd.select("url", "feature_index", "frame_id", "aoi_region", "start", "end")
        .join(
            weather,
            (F.col("aoi_region") == weather["region"])
            & (weather["date"] >= F.to_date("start"))
            & (weather["date"] <= F.to_date("end")),
            "left",
        )
        .groupBy("url", "feature_index", "frame_id")
        .agg(weather_series_agg().alias("series"))
        .select(
            "url",
            "feature_index",
            "frame_id",
            F.when(t_cnt > 0, F.round(t_sum / t_cnt, 1)).alias("mean_temp_c"),
            F.when(p_cnt > 0, F.round(p_sum, 1)).alias("total_precip_mm"),
        )
    )
    out = (
        nd.join(ch, ["url", "feature_index", "season", "year"], "left")
        .join(wx, ["url", "feature_index", "frame_id"], "left")
        .select(
            "url",
            "feature_index",
            F.col("frame_id").alias("frame_index"),
            F.concat_ws(
                " ", F.initcap("season"), F.col("year").cast("string")
            ).alias("label"),
            "year",
            "season",
            F.col("start").alias("start_date"),
            F.col("end").alias("end_date"),
            F.col("frame_collection").alias("collection"),
            "is_naip",
            F.col("scene_id").alias("ndvi_scene_id"),
            "resolution_m",
            F.col("cloud_cover").alias("cloud_cover_pct"),
            "ndvi_mean",
            "ndvi_min",
            "ndvi_max",
            "ndvi_std",
            "ndvi_change_from_previous",
            "mean_temp_c",
            "total_precip_mm",
        )
    )
    return out


def aoi_csv_rows(
    geom_metrics: DataFrame,
    trend: DataFrame,
    change_sum: DataFrame,
    weather_sum: DataFrame,
) -> DataFrame:
    """S19: one row per AOI from per_aoi_metrics (reference export.py:236-297)."""
    return (
        geom_metrics.join(trend, ["url", "feature_index"], "left")
        .join(change_sum, ["url", "feature_index"], "left")
        .join(weather_sum, ["url", "feature_index"], "left")
        .select(
            "url",
            "feature_index",
            "name",
            "area_ha",
            "area_km2",
            "perimeter_km",
            "compactness",
            F.col("centroid_lon_r").alias("centroid_lon"),
            F.col("centroid_lat_r").alias("centroid_lat"),
            "bbox_width_km",
            "bbox_height_km",
            "direction",
            "latest_mean",
            "health_class",
            "comparisons",
            "total_loss_ha",
            "total_gain_ha",
            "trajectory",
            "temp_mean_c",
            "precip_total_mm",
        )
    )


def geojson_per_aoi(aois: DataFrame, ndvi_df: DataFrame, change_sum: DataFrame) -> DataFrame:
    """S17: one row per AOI: (url, feature_index, geojson string).

    Feature properties mirror export.py:52-68; the summary Point feature
    carries the change-detection summary (export.py:86-106). Assembled with
    JVM-side to_json — no Python in the loop."""
    # Float properties are cast to fixed-scale decimals so the JSON number
    # rendering is locale/engine-independent (Jackson prints BigDecimal at
    # full scale; a raw double would format differently from the oracle's
    # Python rendering in exponent-range cases) — this makes the WHOLE
    # FeatureCollection string byte-hashable against the sequential oracle.
    frame_props = F.struct(
        F.col("frame_id").alias("frame_index"),
        F.concat_ws(" ", F.initcap("season"), F.col("year").cast("string")).alias("label"),
        "year",
        "season",
        F.col("start").alias("start_date"),
        F.col("end").alias("end_date"),
        F.col("frame_collection").alias("collection"),
        "is_naip",
        F.col("ndvi_mean").cast("decimal(20,4)").alias("ndvi_mean"),
        F.col("ndvi_min").cast("decimal(20,4)").alias("ndvi_min"),
        F.col("ndvi_max").cast("decimal(20,4)").alias("ndvi_max"),
        F.col("ndvi_std").cast("decimal(20,4)").alias("ndvi_std"),
        F.col("scene_id").alias("ndvi_scene_id"),
    )
    frames_per_aoi = ndvi_df.groupBy("url", "feature_index").agg(
        F.sort_array(F.collect_list(F.struct(F.col("frame_id").alias("_o"), frame_props.alias("p")))).alias("fp")
    ).select(
        "url", "feature_index", F.transform("fp", lambda s: s.p).alias("frame_props")
    )

    ring = F.transform(
        F.sequence(F.lit(0), (F.size("exterior") / 2 - 1).cast("int")),
        lambda i: F.array(
            F.element_at("exterior", (i * 2 + 1).cast("int")).cast("decimal(20,6)"),
            F.element_at("exterior", (i * 2 + 2).cast("int")).cast("decimal(20,6)"),
        ),
    )
    geom = F.struct(F.lit("Polygon").alias("type"), F.array(ring).alias("coordinates"))

    j = (
        aois.select("url", "feature_index", "exterior", "centroid_lon", "centroid_lat")
        .join(frames_per_aoi, ["url", "feature_index"], "left")
        .join(change_sum, ["url", "feature_index"], "left")
    )
    features = F.concat(
        F.coalesce(
            F.transform(
                "frame_props",
                lambda p: F.to_json(
                    F.struct(F.lit("Feature").alias("type"), geom.alias("geometry"), p.alias("properties"))
                ),
            ),
            F.array(),
        ),
        F.array(
            F.to_json(
                F.struct(
                    F.lit("Feature").alias("type"),
                    F.struct(
                        F.lit("Point").alias("type"),
                        F.array(
                            F.col("centroid_lon").cast("decimal(20,6)"),
                            F.col("centroid_lat").cast("decimal(20,6)"),
                        ).alias("coordinates"),
                    ).alias("geometry"),
                    F.struct(
                        F.lit("summary").alias("type"),
                        F.struct(
                            "comparisons",
                            F.col("total_loss_ha").cast("decimal(20,2)").alias("total_loss_ha"),
                            F.col("total_gain_ha").cast("decimal(20,2)").alias("total_gain_ha"),
                            F.col("avg_mean_delta").cast("decimal(20,4)").alias("avg_mean_delta"),
                            "trajectory",
                        ).alias("change_detection_summary"),
                    ).alias("properties"),
                )
            )
        ),
    )
    return j.select(
        "url",
        "feature_index",
        F.concat(
            F.lit('{"type": "FeatureCollection", "features": ['),
            F.concat_ws(", ", features),
            F.lit("]}"),
        ).alias("geojson"),
    )
