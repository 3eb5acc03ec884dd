#!/usr/bin/env python
"""spark-submit entry point for the engine (SURVEY.md §7 step 8; the
north rule's "run via spark-submit --py-files on a multi-executor
cluster ... resumable from checkpoint").

Build the --py-files archive once (no Spark needed):

    python scripts/submit_job.py --build-archive dist/awfks.zip

Run on a cluster — the archive ships the whole package to executors and
the session master comes from the launcher:

    spark-submit --master spark://head:7077 --py-files dist/awfks.zip \\
        scripts/submit_job.py --sf-dir data/sf0.01 --mode full \\
        --checkpoint-root /tmp/runs --run-id nightly-01

Run locally (plain python) with the same flags — the tuned local session
from ``get_spark`` is used instead.

Resume: re-running with the same ``--checkpoint-root``/``--run-id``
short-circuits completed stages from their parquet checkpoints and
resumes the partitioned NDVI stage mid-stage via the ledger's
left-anti join (plans/checkpoint.py). Without ``--checkpoint-root`` the
job runs stateless.

Modes (the reference's three entry points, pipeline.py EP1-EP3):
  full       pages → features → AOIs → spatial join → NDVI → change
  timelapse  pasted coordinates (--coords) → AOI → NDVI trend
  eudr       post-2020 window + WDPA/LULC layers → determination
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent


def build_archive(out_path: str) -> str:
    """Zip the package for --py-files (pure-Python, no build step)."""
    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    base = str(out.with_suffix("")) if out.suffix == ".zip" else str(out)
    made = shutil.make_archive(
        base, "zip", root_dir=REPO_ROOT, base_dir="azure_workflow_for_kml_satellite_spark"
    )
    return made


def make_session(app_name: str):
    """Under spark-submit the launcher supplies spark.master through the
    session builder's conf, so first try WITHOUT setting a master (a
    pre-JVM SparkConf() cannot see launcher properties — don't probe it);
    if no launcher master exists, getOrCreate raises and we fall back to
    the tuned local session. Same engine configs either way."""
    from azure_workflow_for_kml_satellite_spark import get_spark

    try:
        return get_spark(app_name, master="")
    except Exception as e:
        # Fall back ONLY for the no-launcher case ("A master URL must be
        # set in your configuration"); any other getOrCreate failure (bad
        # conf, cluster connect error) must surface, not silently degrade
        # the job to local mode on the driver.
        if "master url must be set" not in str(e).lower():
            raise
        return get_spark(app_name)


def run_full(spark, ed: str, args, cm) -> dict:
    from pyspark.sql import functions as F

    from azure_workflow_for_kml_satellite_spark.operators.aoi import prepare_aois
    from azure_workflow_for_kml_satellite_spark.operators.change import (
        change_summary_per_aoi,
        season_changes,
    )
    from azure_workflow_for_kml_satellite_spark.operators.extract import (
        extract_features,
    )
    from azure_workflow_for_kml_satellite_spark.operators.ndvi import ndvi_stats
    from azure_workflow_for_kml_satellite_spark.operators.spatial_join import (
        spatial_join_best_scene,
    )
    from azure_workflow_for_kml_satellite_spark.pipeline import load_tables

    t = load_tables(spark, ed)
    stage = cm.stage if cm else (lambda name, df: df)
    feats = stage("features", extract_features(t["pages"]))
    aois = stage("aois", prepare_aois(feats.filter(F.col("error").isNull())))
    best = stage(
        "best_scene",
        spatial_join_best_scene(
            aois, t["scenes"], t["frames"], args.date_start, args.date_end
        ),
    )
    nd = ndvi_stats(best)
    # the heavyweight stage is partitioned by year so a killed run resumes
    # mid-stage (only missing years recompute)
    nd = cm.partitioned_stage("ndvi", nd, "year") if cm else nd
    ch = stage("season_changes", season_changes(nd))
    summary = stage("change_summary", change_summary_per_aoi(ch))
    return {
        "features": feats.count(),
        "aois": aois.count(),
        "best_scene": best.count(),
        "ndvi": nd.count(),
        "season_changes": ch.count(),
        "change_summary": summary.count(),
    }


def run_timelapse_mode(spark, ed: str, args, cm) -> dict:
    from azure_workflow_for_kml_satellite_spark.pipeline import run_timelapse

    out = run_timelapse(spark, args.coords, ed, args.date_start, args.date_end)
    if cm:
        out = {k: cm.stage(f"timelapse_{k}", df) for k, df in out.items()}
    return {k: df.count() for k, df in out.items()}


def run_eudr_mode(spark, ed: str, args, cm) -> dict:
    from azure_workflow_for_kml_satellite_spark.pipeline import run_eudr

    out = run_eudr(spark, ed, args.date_end)
    if cm:
        out = {k: cm.stage(f"eudr_{k}", df) for k, df in out.items()}
    return {k: df.count() for k, df in out.items()}


def run_job(spark, args) -> dict:
    """Dispatch a parsed-args job on an existing session (tests call this
    directly; main() wraps it for spark-submit)."""
    from azure_workflow_for_kml_satellite_spark.pipeline import engine_dir
    from azure_workflow_for_kml_satellite_spark.plans.checkpoint import (
        CheckpointManager,
    )

    sf = args.sf_dir
    ed = sf if (Path(sf) / "pages.parquet").exists() else engine_dir(sf)
    cm = None
    if args.checkpoint_root:
        cm = CheckpointManager(
            spark,
            args.checkpoint_root,
            run_id=args.run_id,
            snapshot_id=args.snapshot_id,
        )
    t0 = time.time()
    runner = {"full": run_full, "timelapse": run_timelapse_mode, "eudr": run_eudr_mode}[
        args.mode
    ]
    counts = runner(spark, ed, args, cm)
    result = {
        "mode": args.mode,
        "sf_dir": ed,
        "wall_sec": round(time.time() - t0, 2),
        "counts": counts,
    }
    if cm:
        result["run_id"] = cm.run_id
        result["ledger_rows"] = cm.ledger().count()
    return result


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--sf-dir", default=str(REPO_ROOT / "data" / "sf0.001"))
    ap.add_argument("--mode", choices=("full", "timelapse", "eudr"), default="full")
    ap.add_argument("--date-start", default="2022-01-01")
    ap.add_argument("--date-end", default="2023-12-31")
    ap.add_argument("--coords", default="-1.30, 36.80", help="timelapse mode input")
    ap.add_argument("--checkpoint-root", default=None)
    ap.add_argument("--run-id", default=None)
    ap.add_argument(
        "--snapshot-id",
        type=int,
        default=None,
        help="resume the run AS OF this ledger snapshot (time travel): "
        "stages completed after it recompute, earlier ones short-circuit",
    )
    ap.add_argument(
        "--build-archive",
        default=None,
        metavar="ZIP",
        help="write the --py-files package archive and exit",
    )
    return ap.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.build_archive:
        print(build_archive(args.build_archive))
        return 0
    sys.path.insert(0, str(REPO_ROOT))  # plain-python runs; harmless under submit
    spark = make_session(f"kmlsat-{args.mode}")
    try:
        result = run_job(spark, args)
    finally:
        spark.stop()
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
