"""Driver-contract smoke: entry() runs and queries()/oracle_sql() agree."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E


def test_queries_oracles_consistent():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 30
    # every oracle refers to an existing query
    assert set(oracles) <= set(qs)
    # round 3 oracled EVERY query: the approximate-ANN entries run at
    # provable-equality operating points (coverage band / n_probe ==
    # n_centroids) and the EUDR report exposes its content as report_text
    assert set(oracles) == set(qs)
    for name in ("q_ann_lsh", "q_ann_ivf", "q_eudr_report", "q_monthly_frames"):
        assert name in qs and name in oracles
    for name in ("q_minhash_lsh", "q_simhash", "q_simhash_pairs", "q_fingerprint",
                 "q_portfolio", "q_embed_near_dup_lsh"):
        assert name in qs and name in oracles
    # round-7 rotation: the driver verifies the FIRST 50 entries; the 13
    # queries with no driver row since r2-r5 are back in the window, the
    # round-7-touched gates (escape-table mp3 assets, decode_sample
    # broken-chain fix, LSH persist) stay in, and the rotated-out r5+r6 /
    # r3+r6 multi-green entries stay present (full-set local gate covers
    # them)
    in_window = list(qs)[:50]
    for name in (
        "q_audio_metadata", "q_video_frames", "q_embed_near_dup_lsh",
        "q_ann_lsh", "q_ann_ivf", "q_ann_topk", "q_embed_near_dup",
        "q_events_hourly", "q_sessionize", "q_pricing_summary",
        "q_top_customers", "q_cell_density", "q_tile_assignment",
        "q_knn_gauges_cells", "q_ngram_jaccard_capped",
        "q_dedup_clusters_star",
    ):
        assert name in in_window
    for name in ("q_page_text", "q_image_thumbnails", "q_geojson"):
        assert name in qs  # rotated out but still present + locally gated


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert {"url", "feature_index", "ndvi_mean", "scene_id"} <= set(df.columns)


def test_one_query_via_contract(spark):
    qs = E.queries()
    df = qs["q_dedup_exact"](spark, "/root/testdata/sf0.001")
    assert df.count() > 0
