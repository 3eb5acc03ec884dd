#!/usr/bin/env python
"""Per-task profile of the 10-year-window NDVI job (round-4 verdict item 7).

BASELINE.md records 0.581 scaling efficiency local[8]→local[32] for the
10-year window — the configuration a 100× scale-up most resembles. This
study answers WHY with per-task evidence: it runs the same
extract→join→NDVI job at both parallelism levels (and, at local[32], at
several partition grains incl. a salted repartition), and pulls true
per-task duration distributions from Spark's REST API. If task times are
uniform (no straggler tail, p95/p50 small) while aggregate throughput
still flattens, the bottleneck is the shared memory bus, not skew — and
no partition-grain change can fix a bus.

    PYTHONPATH=/root/repo python scripts/profile_10yr.py

One JSON line per configuration; summarized in BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"
DATE_START, DATE_END = "2014-01-01", "2023-12-31"
UI = "http://localhost:4040"


def api(path: str):
    with urllib.request.urlopen(f"{UI}/api/v1{path}", timeout=10) as r:
        return json.loads(r.read())


def heaviest_stage(app_id: str) -> dict:
    stages = api(f"/applications/{app_id}/stages?status=complete")
    return max(stages, key=lambda s: s.get("executorRunTime", 0))


def task_quantiles(app_id: str, stage: dict) -> dict:
    sid, att = stage["stageId"], stage["attemptId"]
    qs = "0.0,0.25,0.5,0.75,0.95,0.99,1.0"
    summ = api(
        f"/applications/{app_id}/stages/{sid}/{att}/taskSummary?quantiles={qs}"
    )
    return {
        "stage_id": sid,
        "n_tasks": stage["numCompleteTasks"],
        "stage_name": stage["name"].split("\n")[0][:70],
        "task_ms_quantiles": dict(
            zip(qs.split(","), [round(x, 1) for x in summ["executorRunTime"]])
        ),
        "executor_run_time_total_s": round(stage["executorRunTime"] / 1000, 1),
    }


def run_config(cores: int, grain: int | None, salt: bool) -> dict:
    import os

    from pyspark.sql import functions as F

    os.environ["SPARK_GRAFT_UI"] = "true"
    from azure_workflow_for_kml_satellite_spark import get_spark
    from azure_workflow_for_kml_satellite_spark.operators.ndvi import ndvi_stats
    from azure_workflow_for_kml_satellite_spark.operators.spatial_join import (
        spatial_join_best_scene,
    )
    from azure_workflow_for_kml_satellite_spark.pipeline import (
        build_aois,
        engine_dir,
        evict_memo,
        load_tables,
    )

    spark = get_spark("profile-10yr", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    ed = engine_dir(SF_DIR)
    t = load_tables(spark, ed)
    aois = build_aois(spark, ed)
    best = spatial_join_best_scene(aois, t["scenes"], t["frames"], DATE_START, DATE_END)
    if salt:
        # scatter heterogeneous (big-window next to small-window) rows by
        # hashing the natural key — every task gets a similar size mix
        best = best.repartition(grain, F.col("url"), F.col("frame_id"))
    elif grain:
        best = best.repartition(grain)
    nd = ndvi_stats(best)
    t0 = time.time()
    n = nd.count()
    wall = time.time() - t0
    stage = heaviest_stage(app_id)
    prof = task_quantiles(app_id, stage)
    out = {
        "cores": cores,
        "grain": grain,
        "salted": salt,
        "rows": n,
        "wall_sec": round(wall, 1),
        "rows_per_sec": round(n / wall, 1),
        **prof,
    }
    evict_memo()
    spark.stop()
    return out


def main() -> int:
    results = []
    for cores, grain, salt in (
        (8, None, False),
        (32, None, False),
        (32, 256, False),
        (32, 1024, False),
        (32, 256, True),
    ):
        r = run_config(cores, grain, salt)
        results.append(r)
        print(json.dumps(r), flush=True)
    base = results[0]
    for r in results[1:]:
        r_eff = r["rows_per_sec"] / (base["rows_per_sec"] * r["cores"] / base["cores"])
        print(
            json.dumps(
                {
                    "config": f"local[{r['cores']}] grain={r['grain']} salt={r['salted']}",
                    "efficiency_vs_local8": round(r_eff, 3),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
