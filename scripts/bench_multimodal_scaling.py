"""Two-parallelism scaling evidence for the MULTIMODAL decode stages
(round-6 surface: from-scratch image/audio/video codecs inside
mapInPandas), complementing scripts/bench_scaling.py's geometry pipeline.

Replicates the deterministic asset tables K-fold (distinct asset_ids →
no dedup, same per-row work), runs each decode operator at local[N] and
local[4N] in fresh JVMs, and reports rows/s at both plus
    eff = throughput(4N) / (4 x throughput(N)).

These stages are embarrassingly parallel (per-asset decode, no shuffle),
so efficiency here isolates the *executor-side Python* scaling — the
partition sizing and Arrow batch shape — from the join/shuffle story the
geometry benchmark covers.

Usage: PYTHONPATH=/root/repo python scripts/bench_multimodal_scaling.py \
    [--n 8] [--k 24] [--sf sf0.001]
Appends markdown rows suitable for BASELINE.md to stdout.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def one_run(sf: str, cores: int, k: int, stages: str) -> dict:
    code = f"""
import json, sys, time
sys.path.insert(0, {str(REPO)!r})
import pyspark.sql.functions as F
from azure_workflow_for_kml_satellite_spark import get_spark
from azure_workflow_for_kml_satellite_spark.pipeline import engine_dir
from azure_workflow_for_kml_satellite_spark.operators.multimodal import (
    audio_metadata, image_metadata, video_frame_sample)  # noqa
spark = get_spark("mm-scaling", cores={cores})
spark.sparkContext.setLogLevel("ERROR")
ed = engine_dir("/root/testdata/" + {sf!r})
res = {{"cores": {cores}}}
reps = spark.range({k}).select(F.col("id").alias("rep"))
for name, fname, op in (("image", "images", image_metadata),
                        ("audio", "audio", audio_metadata),
                        ("video", "videos", video_frame_sample)):
    if name not in {stages!r}.split(","):
        continue
    t = spark.read.parquet(ed + "/" + fname + ".parquet")
    # grain is owned by the operator itself (image: cost_scatter; audio/
    # video: input partitioning) — no harness repartition, so the timed
    # region is the operator's real plan shape
    big = (t.crossJoin(reps)
            .withColumn("asset_id", F.concat_ws("_", "asset_id", "rep"))
            .select("asset_id", "payload"))
    n_assets = big.count()
    t0 = time.time()
    rows = op(big).count()
    wall = time.time() - t0
    res[name] = {{"assets": n_assets, "rows": rows, "wall_sec": round(wall, 2),
                  "assets_per_sec": round(n_assets / wall, 1)}}
print("RESULT " + json.dumps(res))
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no RESULT line; stderr tail: {out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--k", type=int, default=24)
    ap.add_argument("--sf", default="sf0.001")
    ap.add_argument("--stages", default="image,audio,video")
    ap.add_argument("--reps", type=int, default=1,
                    help="repeat each level, keep best throughput per stage")
    args = ap.parse_args()
    stage_list = args.stages.split(",")

    def best_run(cores: int) -> dict:
        best: dict = {}
        for _ in range(args.reps):
            r = one_run(args.sf, cores, args.k, args.stages)
            for name in stage_list:
                if name not in best or r[name]["assets_per_sec"] > best[name]["assets_per_sec"]:
                    best[name] = r[name]
        best["cores"] = cores
        return best

    lo = best_run(args.n)
    hi = best_run(4 * args.n)
    print(json.dumps({"lo": lo, "hi": hi}))
    for name in stage_list:
        eff = hi[name]["assets_per_sec"] / (4 * lo[name]["assets_per_sec"])
        print(
            f"| {name} decode x{args.k} | local[{args.n}] "
            f"{lo[name]['assets_per_sec']} assets/s | local[{4 * args.n}] "
            f"{hi[name]['assets_per_sec']} assets/s | eff {eff:.3f} |"
        )


if __name__ == "__main__":
    main()
