"""Data-driven broadcast-vs-salted selection in the cell spatial join
(round-2 VERDICT item 6): an inflated scene table must route through the
salted shuffle path and produce exactly the broadcast path's rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _inputs(spark):
    from azure_workflow_for_kml_satellite_spark.operators.aoi import prepare_aois
    from azure_workflow_for_kml_satellite_spark.operators.extract import (
        extract_features,
    )

    pages = spark.read.parquet(f"{SF_SMALL}/pages.parquet").limit(40)
    aois = prepare_aois(extract_features(pages))
    scenes = spark.read.parquet(f"{SF_SMALL}/scenes.parquet")
    frames = spark.read.parquet(f"{SF_SMALL}/frames.parquet")
    return aois, scenes, frames


def test_estimate_and_auto_choice(spark):
    from azure_workflow_for_kml_satellite_spark.operators.spatial_join import (
        MAX_BROADCAST_CELL_ROWS,
        estimate_scene_cell_rows,
        scene_frame_candidates,
    )

    _, scenes, frames = _inputs(spark)
    sf = scene_frame_candidates(scenes, frames, "2022-01-01", "2023-12-31")
    est = estimate_scene_cell_rows(sf)
    assert 0 < est <= MAX_BROADCAST_CELL_ROWS  # sf0.001 dim must broadcast


def test_salted_path_matches_broadcast_path(spark):
    from azure_workflow_for_kml_satellite_spark.operators.spatial_join import (
        scene_frame_candidates,
        spatial_join_best_scene,
        spatial_join_candidates,
    )

    aois, scenes, frames = _inputs(spark)
    sf = scene_frame_candidates(scenes, frames, "2022-01-01", "2023-12-31")

    cols = ["url", "feature_index", "frame_id", "scene_id"]
    bcast = sorted(
        tuple(r) for r in spatial_join_candidates(aois, sf, broadcast_scenes=True)
        .select(*cols).collect()
    )
    salted = sorted(
        tuple(r) for r in spatial_join_candidates(
            aois, sf, broadcast_scenes=False, salt=4
        ).select(*cols).collect()
    )
    assert bcast == salted and len(bcast) > 0

    # full J1+J2 with forced salted path matches the broadcast top-1 too
    best_b = sorted(
        tuple(r)
        for r in spatial_join_best_scene(
            aois, scenes, frames, "2022-01-01", "2023-12-31", broadcast_scenes=True
        ).select(*cols).collect()
    )
    best_s = sorted(
        tuple(r)
        for r in spatial_join_best_scene(
            aois, scenes, frames, "2022-01-01", "2023-12-31",
            broadcast_scenes=False, salt=4,
        ).select(*cols).collect()
    )
    assert best_b == best_s


def test_inflated_scene_table_routes_to_salted_path(spark, monkeypatch):
    """Replicating the dim past MAX_BROADCAST_CELL_ROWS (threshold lowered so
    the test stays fast) must flip the auto choice to the salted join and
    still return identical rows."""
    from azure_workflow_for_kml_satellite_spark.operators import spatial_join as SJ

    aois, scenes, frames = _inputs(spark)
    sf = SJ.scene_frame_candidates(scenes, frames, "2022-01-01", "2023-12-31")
    est = SJ.estimate_scene_cell_rows(sf)
    monkeypatch.setattr(SJ, "MAX_BROADCAST_CELL_ROWS", est - 1)

    auto = SJ.spatial_join_candidates(aois, sf)  # must pick the salted path
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "salt" in plan  # salted shuffle join, not broadcast
    cols = ["url", "feature_index", "frame_id", "scene_id"]
    got = sorted(tuple(r) for r in auto.select(*cols).collect())
    ref = sorted(
        tuple(r) for r in SJ.spatial_join_candidates(aois, sf, broadcast_scenes=True)
        .select(*cols).collect()
    )
    assert got == ref
