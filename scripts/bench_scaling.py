"""Two-parallelism-level scaling evidence (the north rule's N vs 4N
executor criterion, evidenced on local[N] vs local[4N] per BASELINE.json).

Runs the full KML→spatial-join→NDVI pipeline at two core counts on the SAME
input and reports throughput at both plus scaling efficiency
    eff = throughput(4N) / (4 × throughput(N)).

Usage: PYTHONPATH=/root/repo python scripts/bench_scaling.py [--sf-dir D] [--n 8]
Appends a markdown row suitable for BASELINE.md / BENCH notes to stdout.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def one_run(sf_dir: str, cores: int, date_start: str, date_end: str,
            stage: str = "pipeline", cluster: bool = False) -> dict:
    """Run the pipeline portion in a fresh process (fresh JVM) for a clean
    measurement. ``cluster=True`` uses local-cluster[execs,2,6144] — real
    executor PROCESSES with a real serialization/shuffle boundary, the
    closest single-box proxy to multi-node (round-6 verdict task 5) —
    with `cores` total cores split two per executor."""
    master = ""
    if cluster:
        execs = max(1, cores // 2)
        per = 2 if cores >= 2 else 1
        master = f"local-cluster[{execs},{per},6144]"
    code = f"""
import json, sys, time
sys.path.insert(0, {str(REPO)!r})
from azure_workflow_for_kml_satellite_spark import get_spark
from azure_workflow_for_kml_satellite_spark.pipeline import build_aois, engine_dir, load_tables
from azure_workflow_for_kml_satellite_spark.operators.spatial_join import spatial_join_best_scene
from azure_workflow_for_kml_satellite_spark.operators.ndvi import ndvi_stats
spark = get_spark("scaling", cores={cores}, master={master!r} or None)
spark.sparkContext.setLogLevel("ERROR")
ed = engine_dir({sf_dir!r})
t = load_tables(spark, ed)
aois = build_aois(spark, ed)
best = spatial_join_best_scene(aois, t["scenes"], t["frames"], {date_start!r}, {date_end!r})
if {stage!r} == "relational":
    target = best   # extraction + cell join + top-1 only (CPU/shuffle bound)
else:
    from azure_workflow_for_kml_satellite_spark.pipeline import _ndvi_repartition
    target = ndvi_stats(_ndvi_repartition(spark, best))
t0 = time.time()
n_stats = target.count()   # ONE action, end-to-end
wall = time.time() - t0
n_geoms = aois.count()  # outside the timed window
print("RESULT " + json.dumps({{"cores": {cores}, "wall_sec": round(wall,2),
    "geometries": n_geoms, "ndvi_rows": n_stats,
    "geoms_per_sec": round(n_geoms/wall, 2)}}))
spark.stop()
"""
    import os
    env = dict(os.environ, PYTHONPATH=str(REPO))  # executor python workers
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3600, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no RESULT line; stderr tail: {out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=2, help="runs per level; best throughput wins")
    # Default window ~40 frames/AOI (the reference default is the FULL frame
    # plan, runner.py; a long window makes compute dominate fixed job costs —
    # the regime a 1000-executor cluster actually runs in).
    ap.add_argument("--date-start", default="2016-01-01")
    ap.add_argument("--date-end", default="2025-12-31")
    ap.add_argument("--stage", default="pipeline", choices=["pipeline", "relational"])
    ap.add_argument("--local-cluster", action="store_true",
                    help="local-cluster[n/2,2,6144] executor PROCESSES "
                         "instead of local[n] threads")
    args = ap.parse_args()

    def best(cores: int) -> dict:
        runs = [one_run(args.sf_dir, cores, args.date_start, args.date_end,
                        args.stage, cluster=args.local_cluster)
                for _ in range(args.repeat)]
        return max(runs, key=lambda r: r["geoms_per_sec"])

    lo = best(args.n)
    hi = best(4 * args.n)
    eff = hi["geoms_per_sec"] / (4 * lo["geoms_per_sec"])
    report = {
        "sf_dir": args.sf_dir,
        "stage": args.stage,
        "N": args.n,
        "run_N": lo,
        "run_4N": hi,
        "scaling_efficiency": round(eff, 3),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(report, indent=2))
    mode = "local-cluster" if args.local_cluster else "local"
    print(
        f"\n| {Path(args.sf_dir).name} | {mode}[{args.n}] {lo['geoms_per_sec']} geom/s "
        f"| {mode}[{4*args.n}] {hi['geoms_per_sec']} geom/s | eff {report['scaling_efficiency']} |"
    )


if __name__ == "__main__":
    main()
