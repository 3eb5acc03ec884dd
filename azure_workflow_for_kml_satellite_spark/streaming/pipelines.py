"""Structured Streaming pipelines.

- ``streaming_extract``: pages parquet stream → feature rows, the same
  mapInPandas extraction as batch (operators/extract.py) — Structured
  Streaming runs the identical plan incrementally, which is exactly the
  Spark-first replacement for the reference's one-orchestration-per-blob
  trigger (reference: blueprints/pipeline/blob_trigger.py).
- ``streaming_event_counts``: watermarked tumbling-window counts over an
  events stream (late rows beyond the watermark are dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from azure_workflow_for_kml_satellite_spark.operators.extract import (
    FEATURES_SCHEMA,
    extract_features,
)


def streaming_extract(spark: SparkSession, input_dir: str, pages_schema=None) -> DataFrame:
    """readStream over a directory of pages parquet → feature rows."""
    if pages_schema is None:
        pages_schema = (
            "url string, warc_ts timestamp, html binary, text string, lang string"
        )
    stream = spark.readStream.schema(pages_schema).parquet(input_dir)
    return extract_features(stream)


def streaming_event_counts(
    spark: SparkSession,
    input_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window event counts with a watermark for late data."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    ev = spark.readStream.schema(schema).parquet(input_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_stream_to_memory(df: DataFrame, name: str, mode: str = "update"):
    """Start the query into an in-memory sink and drain it (tests/demos)."""
    q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    return q


__all__ = ["streaming_extract", "streaming_event_counts", "run_stream_to_memory", "FEATURES_SCHEMA"]
