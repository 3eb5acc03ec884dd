"""Run-level gates (SURVEY.md §2.2 F10/F12/F13).

- multi-region gate: skip union-level mosaic/NDVI/EUDR when any two AOI
  centroids are > 500 km apart (reference: runner.py:578-617,
  constants.py:83);
- feature-count / tier gate (reference: ingestion.py:84-114).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from azure_workflow_for_kml_satellite_spark.constants import MULTI_REGION_THRESHOLD_KM

_R_KM = 6371.0


def _hav(lon1, lat1, lon2, lat2):
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(
        F.sin(dlon / 2), 2
    )
    return F.lit(2 * _R_KM) * F.atan2(F.sqrt(a), F.sqrt(F.lit(1.0) - a))


def is_multi_region(aois: DataFrame, threshold_km: float = MULTI_REGION_THRESHOLD_KM,
                    exact_limit: int = 10_000) -> bool:
    """True when some centroid pair is farther than threshold_km.

    Two-step: a free upper bound from the centroid bounding box (diagonal
    ≤ threshold ⇒ no pair can exceed it — one tiny agg); only if the bound
    is inconclusive and n is small, the exact O(n²) max via self-join
    (the reference's loop, runner.py:598-617). For larger n the diagonal
    check is decisive in practice because threshold ≪ region spans."""
    c = aois.select("centroid_lon", "centroid_lat")
    box = c.agg(
        F.min("centroid_lon").alias("lo_x"),
        F.min("centroid_lat").alias("lo_y"),
        F.max("centroid_lon").alias("hi_x"),
        F.max("centroid_lat").alias("hi_y"),
        F.count("*").alias("n"),
    ).collect()[0]
    if box["n"] < 2:
        return False
    # Rigorous upper bound on the max pairwise distance inside the box:
    # meridian leg + parallel leg at the latitude of the box edge closest to
    # the equator (where a degree of longitude is longest). The raw corner
    # diagonal is NOT an upper bound for wide, low-lat-span boxes away from
    # the equator — the equator-side edge pair can exceed it.
    import math

    lat_span_km = math.radians(box["hi_y"] - box["lo_y"]) * _R_KM
    if box["lo_y"] <= 0.0 <= box["hi_y"]:
        cos_min = 1.0
    else:
        cos_min = math.cos(math.radians(min(abs(box["lo_y"]), abs(box["hi_y"]))))
    lon_span_km = math.radians(box["hi_x"] - box["lo_x"]) * _R_KM * cos_min
    if lat_span_km + lon_span_km <= threshold_km:
        return False
    if box["n"] > exact_limit:
        return True  # bbox spans > threshold and n is huge → treat as multi-region
    a = c.select(F.col("centroid_lon").alias("x1"), F.col("centroid_lat").alias("y1"))
    b = c.select(F.col("centroid_lon").alias("x2"), F.col("centroid_lat").alias("y2"))
    mx = (
        a.crossJoin(b)
        .agg(F.max(_hav(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"))).alias("m"))
        .collect()[0]["m"]
    )
    return bool(mx > threshold_km)


def enforce_feature_limit(features: DataFrame, limit: int) -> DataFrame:
    """Tier gate (F13): error when a page yields more than ``limit`` features
    — rows beyond the limit are marked, mirroring enforce_aoi_limit
    (reference: ingestion.py:84-114) but as a quarantine column instead of
    failing the job."""
    counts = features.groupBy("url").agg(F.count("*").alias("_n"))
    return (
        features.join(counts, "url")
        .withColumn(
            "error",
            F.when(
                F.col("_n") > limit,
                F.concat(
                    F.lit("AOI limit exceeded: "), F.col("_n").cast("string"),
                    F.lit(f" features > limit {limit}"),
                ),
            ).otherwise(F.col("error")),
        )
        .drop("_n")
    )
