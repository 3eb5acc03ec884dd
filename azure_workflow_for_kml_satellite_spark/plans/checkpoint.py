"""Stage checkpointing with per-partition lineage + metrics and resume
(the north rule's "every stage checkpoints per-partition lineage + metrics
... so runs resume mid-job").

The reference gets resumability from Durable Functions replay + claim-check
blobs (reference: blueprints/pipeline/orchestrator.py, storage/offload.py:23-106);
the Spark-native equivalent is a write-audit pattern:

- every stage writes its output as a (optionally partitioned) parquet table
  under ``<root>/<run_id>/<stage>/``;
- a ledger TABLE ``<root>/<run_id>/_ledger/`` (parquet, append-only,
  Iceberg-shaped schema) records one row per (stage, partition_value) with
  row counts, wall-clock and status — the role of the reference's
  ResourceAccumulator + pipeline_stats (resource_accumulator.py:17-105).
  Being a table write rather than driver-side JSON files, the resume
  metadata itself scales with the job and is queryable like any dataset;
- on re-run, completed stages short-circuit to a read of the checkpoint;
  partitioned stages resume mid-stage with a **left-anti join** of the input
  against the ledger's completed partition values (SURVEY.md §2.3: "left-anti
  only for resume").

This module uses plain directory-parquet so it runs offline; on a cluster
the same interface fronts Iceberg tables (atomic commit + snapshot lineage)
— no Iceberg runtime jars are available in this sandbox.
"""

from __future__ import annotations

import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

LEDGER_SCHEMA = (
    "run_id string, stage string, partition string, rows long, "
    "duration_s double, status string, ts string"
)


class CheckpointManager:
    def __init__(self, spark: SparkSession, root: str, run_id: str | None = None):
        self.spark = spark
        self.root = Path(root)
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.run_dir = self.root / self.run_id
        self.ledger_dir = self.run_dir / "_ledger"

    # ── ledger ──────────────────────────────────────────────────────────────

    def ledger(self) -> DataFrame:
        """The ledger as a DataFrame (empty with the right schema if no row
        has been committed yet). Legacy driver-side JSON ledger files (the
        pre-table format) are migrated into the parquet ledger on first read
        — silently treating such a run as fresh would re-run completed
        stages and double-append already-completed partitions."""
        self._migrate_legacy_json()
        if self.ledger_dir.exists() and any(self.ledger_dir.glob("*.parquet")):
            return self.spark.read.schema(LEDGER_SCHEMA).parquet(str(self.ledger_dir))
        return self.spark.createDataFrame([], LEDGER_SCHEMA)

    def _migrate_legacy_json(self) -> None:
        """Convert leftover ``_ledger/*.json`` rows (one JSON object or a
        JSON list per file) into the parquet ledger, then rename the source
        file to ``_migrated_*.json`` (the ``_`` prefix keeps Spark's parquet
        file index from touching it) so migration is one-shot. Unreadable or
        schema-incompatible files raise instead of being dropped."""
        if not self.ledger_dir.exists():
            return
        legacy = sorted(
            p for p in self.ledger_dir.glob("*.json") if not p.name.startswith("_migrated_")
        )
        if not legacy:
            return
        import json

        field_names = [f.split()[0] for f in LEDGER_SCHEMA.split(", ")]
        rows: list[dict] = []
        for path in legacy:
            try:
                payload = json.loads(path.read_text())
            except (OSError, json.JSONDecodeError) as exc:
                raise RuntimeError(
                    f"incompatible ledger format: cannot parse legacy ledger file {path}"
                ) from exc
            for rec in payload if isinstance(payload, list) else [payload]:
                if not isinstance(rec, dict) or "stage" not in rec:
                    raise RuntimeError(
                        f"incompatible ledger format: unexpected record in {path}: {rec!r}"
                    )
                rows.append(
                    {
                        "run_id": rec.get("run_id", self.run_id),
                        "stage": rec["stage"],
                        "partition": str(rec.get("partition", "__ALL__")),
                        "rows": int(rec.get("rows", 0)),
                        "duration_s": float(rec.get("duration_s", 0.0)),
                        "status": rec.get("status", "completed"),
                        "ts": str(rec.get("ts", "")),
                    }
                )
        if rows:
            self._append_ledger([{k: r[k] for k in field_names} for r in rows])
        for path in legacy:
            path.rename(path.with_name(f"_migrated_{path.name}"))

    def _append_ledger(self, rows: list[dict]) -> None:
        # append-only parquet table: each commit is one new file (the
        # Iceberg-append analog); coalesce(1) keeps commits single-file
        (
            self.spark.createDataFrame(
                [
                    (
                        r["run_id"],
                        r["stage"],
                        r["partition"],
                        r["rows"],
                        r["duration_s"],
                        r["status"],
                        r["ts"],
                    )
                    for r in rows
                ],
                LEDGER_SCHEMA,
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(str(self.ledger_dir))
        )

    def ledger_rows(self) -> list[dict]:
        self._migrate_legacy_json()
        if not self.ledger_dir.exists() or not any(self.ledger_dir.glob("*.parquet")):
            return []
        return [r.asDict() for r in self.ledger().collect()]

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
        """The per-partition metrics table (A11 analog) — the ledger itself."""
        return self.ledger()
