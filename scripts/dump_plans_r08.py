"""Dump .explain('formatted') for the round-8-touched queries into
plans/r08/<query>_<tag>.txt. Run from any tree (PYTHONPATH decides which
implementation); pass the tag (before/after) and output dir.

    PYTHONPATH=<tree> python scripts/dump_plans_r08.py after /root/repo/plans/r08
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

TOUCHED = [
    "q_ndvi_stats",
    "q_season_changes",
    "q_ndvi_trend",
    "q_ann_topk",
    "q_ann_lsh",
    "q_ann_ivf",
    "q_embed_near_dup",
    "q_embed_near_dup_lsh",
    "q_ngram_jaccard",
]


def main() -> None:
    tag = sys.argv[1]
    out_dir = Path(sys.argv[2])
    out_dir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    import __spark_entry__ as entrymod
    from azure_workflow_for_kml_satellite_spark import get_spark

    spark = get_spark("plans-r08", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in TOUCHED:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # keep going; record the failure
            plan = f"EXPLAIN FAILED: {exc}\n"
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print("wrote", name, tag, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
