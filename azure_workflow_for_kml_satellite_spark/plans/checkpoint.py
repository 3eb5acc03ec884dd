"""Stage checkpointing with per-partition lineage + metrics and resume
(the north rule's "every stage checkpoints per-partition lineage + metrics
... so runs resume mid-job").

The reference gets resumability from Durable Functions replay + claim-check
blobs (reference: blueprints/pipeline/orchestrator.py, storage/offload.py:23-106);
the Spark-native equivalent is a write-audit pattern:

- every stage writes its output as a (optionally partitioned) parquet table
  under ``<root>/<run_id>/<stage>/``;
- a ledger table ``<root>/<run_id>/_ledger/`` records one row per
  (stage, partition_value) with row counts, wall-clock and status —
  the role of the reference's ResourceAccumulator + pipeline_stats
  (resource_accumulator.py:17-105);
- on re-run, completed stages short-circuit to a read of the checkpoint;
  partitioned stages resume mid-stage with a **left-anti join** of the input
  against the ledger's completed partition values (SURVEY.md §2.3: "left-anti
  only for resume").

This module uses plain directory-parquet so it runs offline; on a cluster
the same interface fronts Iceberg tables (atomic commit + snapshot lineage)
— no Iceberg runtime jars are available in this sandbox.
"""

from __future__ import annotations

import json
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F


class CheckpointManager:
    def __init__(self, spark: SparkSession, root: str, run_id: str | None = None):
        self.spark = spark
        self.root = Path(root)
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.run_dir = self.root / self.run_id
        self.ledger_dir = self.run_dir / "_ledger"

    # ── ledger ──────────────────────────────────────────────────────────────

    def _ledger(self) -> DataFrame | None:
        if not self.ledger_dir.exists() or not any(self.ledger_dir.glob("*.json")):
            return None
        rows = []
        for p in sorted(self.ledger_dir.glob("*.json")):
            rows.extend(json.loads(p.read_text()))
        return self.spark.createDataFrame(rows) if rows else None

    def _append_ledger(self, rows: list[dict]) -> None:
        self.ledger_dir.mkdir(parents=True, exist_ok=True)
        (self.ledger_dir / f"{time.time_ns()}.json").write_text(json.dumps(rows))

    def ledger_rows(self) -> list[dict]:
        rows = []
        for p in sorted(self.ledger_dir.glob("*.json")) if self.ledger_dir.exists() else []:
            rows.extend(json.loads(p.read_text()))
        return rows

    def completed_partitions(self, stage: str) -> set[str]:
        return {
            r["partition"]
            for r in self.ledger_rows()
            if r["stage"] == stage and r["status"] == "completed"
        }

    def stage_completed(self, stage: str) -> bool:
        return any(
            r["stage"] == stage and r["partition"] == "__ALL__" and r["status"] == "completed"
            for r in self.ledger_rows()
        )

    # ── stages ──────────────────────────────────────────────────────────────

    def stage(self, name: str, df: DataFrame) -> DataFrame:
        """Checkpoint a whole stage. Completed → read back (skip recompute);
        otherwise compute, write, record per-output-file lineage metrics."""
        out = self.run_dir / name
        if self.stage_completed(name):
            return self.spark.read.parquet(str(out))
        t0 = time.time()
        df.write.mode("overwrite").parquet(str(out))
        duration = time.time() - t0
        back = self.spark.read.parquet(str(out))
        per_file = (
            back.groupBy(F.input_file_name().alias("file"))
            .count()
            .collect()
        )
        rows = [
            {
                "run_id": self.run_id,
                "stage": name,
                "partition": Path(r["file"]).name,
                "rows": r["count"],
                "duration_s": round(duration, 3),
                "status": "completed",
                "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            for r in per_file
        ]
        rows.append(
            {
                "run_id": self.run_id,
                "stage": name,
                "partition": "__ALL__",
                "rows": sum(r["count"] for r in per_file),
                "duration_s": round(duration, 3),
                "status": "completed",
                "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
        )
        self._append_ledger(rows)
        return back

    def partitioned_stage(
        self, name: str, df: DataFrame, partition_col: str
    ) -> DataFrame:
        """Checkpoint a stage partitioned by a column, resuming mid-stage:
        already-completed partition values are skipped via left-anti join of
        the INPUT against the ledger (only missing partitions recompute)."""
        out = self.run_dir / name
        done = self.completed_partitions(name)
        todo = df
        if done:
            done_df = self.spark.createDataFrame(
                [(v,) for v in done], [partition_col]
            )
            todo = df.join(F.broadcast(done_df), partition_col, "left_anti")
        t0 = time.time()
        # static partition overwrite so resume appends only new partitions
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        todo.write.mode("append").partitionBy(partition_col).parquet(str(out))
        duration = time.time() - t0
        back = self.spark.read.parquet(str(out))
        new_parts = (
            todo.groupBy(partition_col).count().collect()
        )
        rows = [
            {
                "run_id": self.run_id,
                "stage": name,
                "partition": str(r[partition_col]),
                "rows": r["count"],
                "duration_s": round(duration, 3),
                "status": "completed",
                "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            for r in new_parts
        ]
        if rows:
            self._append_ledger(rows)
        return back

    def metrics(self) -> DataFrame:
        """The per-partition metrics table (A11 analog)."""
        rows = self.ledger_rows()
        return self.spark.createDataFrame(rows) if rows else self.spark.createDataFrame(
            [], "run_id string, stage string, partition string, rows long, "
            "duration_s double, status string, ts string"
        )
