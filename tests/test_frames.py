"""Frame-plan semantics (reference: treesight/pipeline/enrichment/frames.py)."""

from azure_workflow_for_kml_satellite_spark.sources.frames import (
    build_frame_rows,
    filter_frames,
)


def test_winter_spans_year_boundary():
    frames = build_frame_rows(False, as_of_year=2024)
    w2022 = [f for f in frames if f["season"] == "winter" and f["year"] == 2022 and f["collection"] == "sentinel-2-l2a"]
    assert w2022[0]["start"] == "2021-12-01"
    assert w2022[0]["end"] == "2022-02-28"
    # leap year February
    w2024 = [f for f in frames if f["season"] == "winter" and f["year"] == 2024][0]
    assert w2024["end"] == "2024-02-29"


def test_landsat_years_and_asset():
    frames = build_frame_rows(False, as_of_year=2024)
    landsat = [f for f in frames if f["collection"] == "landsat-c2-l2"]
    assert sorted({f["year"] for f in landsat}) == [2013, 2014, 2015, 2016, 2017]
    assert all(f["asset"] == "red" and f["max_cloud"] == 30.0 for f in landsat)


def test_naip_variant_prefers_summer():
    frames = build_frame_rows(True, as_of_year=2024)
    naip_only = [f for f in frames if f["year"] in (2012, 2014, 2016) and f["is_naip"]]
    assert len(naip_only) >= 3  # 2012/2014/2016 NAIP-only summers
    summer_2020 = [f for f in frames if f["year"] == 2020 and f["season"] == "summer"][0]
    assert summer_2020["collection"] == "naip" and summer_2020["is_naip"]
    # NDVI source for NAIP frames is still Sentinel-2 (reference: runner.py:312-319)
    assert summer_2020["ndvi_collection"] == "sentinel-2-l2a"
    # non-NAIP variant never uses naip
    assert all(not f["is_naip"] for f in build_frame_rows(False, as_of_year=2024))


def test_date_filter_overlap_semantics():
    # reference: frames.py:247-253 — keep frames OVERLAPPING the window
    frames = build_frame_rows(False, as_of_year=2024)
    kept = filter_frames(frames, "2022-01-01", "2023-12-31")
    years = {f["year"] for f in kept}
    # winter 2022 starts 2021-12-01 (overlaps), winter 2024 starts 2023-12-01 (overlaps)
    assert 2022 in years and 2023 in years and 2024 in years
    assert all(not (f["end"] < "2022-01-01" or f["start"] > "2023-12-31") for f in kept)


def test_frame_ids_are_plan_positions():
    frames = build_frame_rows(False, as_of_year=2024)
    assert [f["frame_id"] for f in frames] == list(range(len(frames)))


def test_monthly_cadence():
    frames = build_frame_rows(False, cadence="monthly", as_of_year=2019)
    assert len(frames) == 24  # 2018, 2019 × 12 months
    m12 = [f for f in frames if f["season"] == "m12" and f["year"] == 2018][0]
    assert m12["start"] == "2018-12-01" and m12["end"] == "2018-12-31"
