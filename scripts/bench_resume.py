#!/usr/bin/env python
"""End-to-end ledger kill+resume study at the bench operating point.

Round-4 verdict item 8: test_plans proves per-stage unit resumes; this
study proves the FULL pipeline property at sf0.1 — kill the job mid-NDVI
(SIGKILL, no cleanup), resume from the ledger, and verify the resumed
run's final tables are row-identical to an uninterrupted run's while
recomputing only the missing NDVI year-partitions.

    PYTHONPATH=/root/repo python scripts/bench_resume.py [--sf-dir DIR]

Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent


def content_hash(parquet_dir: Path) -> str:
    """Order-insensitive row-content hash of a checkpoint parquet table."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT md5(string_agg(h, '' ORDER BY h)) FROM ("
        f"SELECT md5(CAST(t AS VARCHAR)) AS h FROM read_parquet('{parquet_dir}/*.parquet') t)"
    ).fetchone()
    con.close()
    return rows[0]


def submit_cmd(sf_dir: str, ck_root: str, run_id: str) -> list[str]:
    return [
        sys.executable,
        str(REPO_ROOT / "scripts" / "submit_job.py"),
        "--sf-dir", sf_dir,
        "--mode", "full",
        "--date-start", "2016-01-01",  # 8 year-partitions: fine resume grain
        "--date-end", "2023-12-31",
        "--checkpoint-root", ck_root,
        "--run-id", run_id,
    ]


def ndvi_commits(ck_root: str, run_id: str) -> int:
    """Committed NDVI year-partitions so far (reads the ledger data files
    directly — snapshot isolation doesn't matter for a polling watcher)."""
    led = Path(ck_root) / run_id / "_ledger"
    if not led.exists():
        return 0
    import duckdb

    files = sorted(str(p) for p in led.glob("commit-*.parquet"))
    if not files:
        return 0
    con = duckdb.connect()
    try:
        (n,) = con.execute(
            "SELECT count(DISTINCT partition) FROM read_parquet(?) WHERE stage = 'ndvi'",
            [files],
        ).fetchone()
    except Exception:
        return 0  # a commit file mid-write — retry next poll
    finally:
        con.close()
    return int(n)


def run_to_completion(sf_dir: str, ck_root: str, run_id: str) -> float:
    env = {**os.environ, "PYTHONPATH": str(REPO_ROOT)}
    t0 = time.time()
    out = subprocess.run(
        submit_cmd(sf_dir, ck_root, run_id), env=env, capture_output=True, text=True
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError("submit_job failed")
    return time.time() - t0


def run_and_kill_mid_ndvi(sf_dir: str, ck_root: str, run_id: str) -> tuple[int, float]:
    """Start the job, SIGKILL it once the NDVI stage has committed some
    (but not all) year-partitions. Returns (ledger commits at kill, sec)."""
    env = {**os.environ, "PYTHONPATH": str(REPO_ROOT)}
    t0 = time.time()
    proc = subprocess.Popen(
        submit_cmd(sf_dir, ck_root, run_id),
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,  # kill the whole process group (JVM too)
    )
    commits_at_kill = 0
    try:
        while True:
            if proc.poll() is not None:
                raise RuntimeError("job finished before the mid-NDVI kill fired")
            n = ndvi_commits(ck_root, run_id)
            if n >= 5:  # most years durable, stage clearly mid-flight
                # at least one NDVI partition committed — kill NOW, mid-stage
                commits_at_kill = n
                os.killpg(proc.pid, signal.SIGKILL)
                break
            time.sleep(0.25)
    finally:
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            os.killpg(proc.pid, signal.SIGKILL)
    return commits_at_kill, time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="resume-study-")
    # A: uninterrupted baseline
    t_full = run_to_completion(args.sf_dir, tmp, "study-a")
    hashes_a = {
        t: content_hash(Path(tmp) / "study-a" / t)
        for t in ("season_changes", "change_summary")
    }

    # B: kill mid-NDVI, then resume
    commits_at_kill, t_until_kill = run_and_kill_mid_ndvi(args.sf_dir, tmp, "study-b")
    t_resume = run_to_completion(args.sf_dir, tmp, "study-b")
    hashes_b = {
        t: content_hash(Path(tmp) / "study-b" / t)
        for t in ("season_changes", "change_summary")
    }

    identical = hashes_a == hashes_b
    result = {
        "sf_dir": args.sf_dir,
        "full_run_sec": round(t_full, 1),
        "killed_after_sec": round(t_until_kill, 1),
        "ndvi_partitions_committed_at_kill": commits_at_kill,
        "resume_sec": round(t_resume, 1),
        "resume_saved_sec": round(t_full - t_resume, 1),
        "final_tables_row_identical": identical,
        "hashes": hashes_a,
        "checkpoint_root": tmp,
    }
    print(json.dumps(result))
    return 0 if identical and t_resume < t_full else 1


if __name__ == "__main__":
    sys.exit(main())
