"""EUDR operators vs the sequential oracle at sf0.001 + flood routing."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _expected(name: str, cols: str = "*"):
    return duckdb.sql(
        f"SELECT {cols} FROM read_parquet('{SF_SMALL}/expected/{name}.parquet')"
    ).fetchall()


@pytest.fixture(scope="module")
def aois(spark):
    from azure_workflow_for_kml_satellite_spark.pipeline import build_aois

    return build_aois(spark, SF_SMALL).cache()


def test_worldcover_hist_matches(spark, aois):
    from azure_workflow_for_kml_satellite_spark.operators.eudr import (
        class_histogram_per_aoi,
    )

    got = {
        (r["url"], r["feature_index"], r["class_code"]): (r["pixel_count"], r["area_pct"], r["rank"])
        for r in class_histogram_per_aoi(aois).collect()
    }
    exp = _expected("worldcover_hist", "url, feature_index, class_code, pixel_count, area_pct, rank")
    assert len(got) == len(exp)
    for url, fi, cc, pc, pct, rank in exp:
        assert got[(url, fi, cc)] == (pc, pct, rank)


def test_landsat_baseline_matches(spark, aois):
    from azure_workflow_for_kml_satellite_spark.operators.eudr import landsat_baseline

    scenes = spark.read.parquet(f"{SF_SMALL}/scenes.parquet")
    got = {
        (r["url"], r["feature_index"], r["window_id"]): (r["scene_id"], r["ndvi_mean"])
        for r in landsat_baseline(aois, scenes).collect()
    }
    exp = _expected("landsat_baseline", "url, feature_index, window_id, scene_id, ndvi_mean")
    assert len(got) == len(exp)
    for url, fi, wid, sid, mean in exp:
        assert got[(url, fi, wid)] == (sid, mean), (url, fi, wid)


def test_determination_matches(spark, aois):
    from azure_workflow_for_kml_satellite_spark.operators.change import (
        change_summary_per_aoi,
        season_changes,
    )
    from azure_workflow_for_kml_satellite_spark.operators.eudr import (
        determination,
        lulc_tree_trend,
    )
    from azure_workflow_for_kml_satellite_spark.operators.pip import wdpa_overlap
    from azure_workflow_for_kml_satellite_spark.pipeline import build_ndvi, load_tables

    t = load_tables(spark, SF_SMALL)
    nd = build_ndvi(spark, SF_SMALL)
    ch = season_changes(nd).cache()
    det = determination(
        aois,
        change_summary_per_aoi(ch),
        ch,
        wdpa_overlap(aois, t["protected_areas"]),
        lulc_tree_trend(aois),
    )
    got = {
        (r["url"], r["feature_index"]): (r["deforestation_free"], r["confidence"], r["flags"])
        for r in det.collect()
    }
    exp = _expected("determination")
    assert len(got) == len(exp)
    mismatches = [
        (u, f, got[(u, f)], (df, c, fl))
        for u, f, df, c, fl in exp
        if got[(u, f)] != (df, c, fl)
    ]
    assert not mismatches, mismatches[:3]


def test_flood_routing(spark):
    from azure_workflow_for_kml_satellite_spark.operators.flood import (
        flood_summary_per_aoi,
    )

    # synthetic AOIs: one in CONUS near the gauge anchor, one UK, one Kenya
    rows = [
        ("us", 0, -100.0, 40.0),
        ("uk", 0, -2.0, 52.0),
        ("ke", 0, 36.8, -1.3),
    ]
    aois = spark.createDataFrame(
        [
            (u, f, lon - 1.8, lat - 1.8, lon + 1.8, lat + 1.8, lon, lat)
            for u, f, lon, lat in rows
        ],
        "url string, feature_index int, buf_min_lon double, buf_min_lat double,"
        " buf_max_lon double, buf_max_lat double, centroid_lon double, centroid_lat double",
    )
    gauges = spark.read.parquet(f"{SF_SMALL}/flood_gauges.parquet")
    got = {r["url"]: r for r in flood_summary_per_aoi(aois, gauges).collect()}
    assert got["us"]["flood_source"] == "usgs" and got["us"]["n_gauges"] > 0
    assert got["uk"]["flood_source"] == "ea" and got["uk"]["n_gauges"] > 0
    assert "ke" not in got  # no source routed → no row
