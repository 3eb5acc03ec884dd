"""Point-in-polygon join against protected areas (SURVEY.md §2.3 J8).

The reference queries an external WDPA API with the AOI centroid
(reference: pipeline/eudr.py:165-222); here the protected-areas table is a
broadcast dimension: bbox containment prefilter as column expressions, exact
ray-casting PIP (with holes support in functions/geometry.point_in_polygon)
inside an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from azure_workflow_for_kml_satellite_spark.functions.geometry import (
    point_in_ring,
    unflatten_ring,
)


@pandas_udf(T.BooleanType())
def _pip_udf(lon: pd.Series, lat: pd.Series, ring_flat: pd.Series) -> pd.Series:
    out = []
    for x, y, flat in zip(lon, lat, ring_flat):
        ring = unflatten_ring([float(v) for v in flat])
        out.append(point_in_ring(float(x), float(y), ring))
    return pd.Series(out)


def wdpa_overlap(aois: DataFrame, protected_areas: DataFrame) -> DataFrame:
    """One row per (aoi, containing protected area); AOIs with no overlap are
    absent (callers left-join or aggregate as needed)."""
    pa = F.broadcast(
        protected_areas.select(
            "wdpa_id",
            F.col("name").alias("pa_name"),
            "designation",
            "iucn_category",
            F.flatten(F.col("exterior")).alias("pa_ring"),
            F.col("min_lon").alias("pa_min_lon"),
            F.col("min_lat").alias("pa_min_lat"),
            F.col("max_lon").alias("pa_max_lon"),
            F.col("max_lat").alias("pa_max_lat"),
        )
    )
    cand = aois.select("url", "feature_index", "centroid_lon", "centroid_lat").join(
        pa,
        (F.col("centroid_lon") >= F.col("pa_min_lon"))
        & (F.col("centroid_lon") <= F.col("pa_max_lon"))
        & (F.col("centroid_lat") >= F.col("pa_min_lat"))
        & (F.col("centroid_lat") <= F.col("pa_max_lat")),
        "inner",
    )
    return cand.filter(
        _pip_udf(F.col("centroid_lon"), F.col("centroid_lat"), F.col("pa_ring"))
    ).select(
        "url", "feature_index", "wdpa_id", "pa_name", "designation", "iucn_category"
    )
