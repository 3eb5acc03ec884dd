"""CPU-pinning A/B for the NDVI leg (round-6 verdict task 7: chase or
formally bound the +-20% healthy-probe variance).

Topology facts this box reports (lscpu / sysfs, recorded 2026-08-18):
one socket, ONE NUMA node (0-31), no cpufreq interface, fixed 2.1 GHz —
i.e. there is no NUMA placement to tune and no in-guest frequency lever;
the remaining in-guest hypothesis is scheduler migration / cache churn,
which `taskset` pinning to a fixed CPU set can test. Host co-tenancy
(Firecracker guest) remains unpinnable from inside and is what the
memcpy probe in bench.py brackets.

Runs the same pipeline leg (extract -> AOI -> cell join -> top-1 -> NDVI,
2022-2023 window) R times unpinned and R times under `taskset -c 0-N-1`,
at local[N], and reports per-mode min/median/max + spread.

Usage: PYTHONPATH=/root/repo python scripts/bench_pinning.py [--n 16] [--r 3]
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def one_run(cores: int, pinned: bool, sf_dir: str) -> float:
    code = f"""
import json, sys, time
sys.path.insert(0, {str(REPO)!r})
from azure_workflow_for_kml_satellite_spark import get_spark
from azure_workflow_for_kml_satellite_spark.pipeline import (
    build_aois, engine_dir, load_tables, _ndvi_repartition)
from azure_workflow_for_kml_satellite_spark.operators.spatial_join import (
    spatial_join_best_scene)
from azure_workflow_for_kml_satellite_spark.operators.ndvi import ndvi_stats
spark = get_spark("pinning", cores={cores})
spark.sparkContext.setLogLevel("ERROR")
ed = engine_dir({sf_dir!r})
t = load_tables(spark, ed)
aois = build_aois(spark, ed)
best = spatial_join_best_scene(aois, t["scenes"], t["frames"],
                               "2022-01-01", "2023-12-31")
target = ndvi_stats(_ndvi_repartition(spark, best))
t0 = time.time()
n = target.count()
print("RESULT " + json.dumps({{"wall": round(time.time() - t0, 2), "rows": n}}))
spark.stop()
"""
    cmd = [sys.executable, "-c", code]
    if pinned:
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    import os

    env = dict(os.environ, PYTHONPATH=str(REPO))
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, env=env)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])["wall"]
    raise RuntimeError(out.stderr[-1500:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--r", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    res = {}
    # interleave modes so slow-band drift hits both arms equally
    walls = {"unpinned": [], "pinned": []}
    for i in range(args.r):
        for mode in ("unpinned", "pinned"):
            walls[mode].append(one_run(args.n, mode == "pinned", args.sf_dir))
            print(f"run {i} {mode}: {walls[mode][-1]}s", flush=True)
    for mode, w in walls.items():
        res[mode] = {
            "walls": w,
            "min": min(w),
            "median": statistics.median(w),
            "max": max(w),
            "spread_pct": round(100 * (max(w) - min(w)) / min(w), 1),
        }
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
