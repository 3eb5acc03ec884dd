"""Stage-boundary schema contracts (driver-side, zero-cost).

The reference validates its JSON IR between every orchestrator phase
(treesight/pipeline/contracts.py, applied at
blueprints/pipeline/orchestrator.py:34-38,76-157): each activity hand-off
asserts the payload carries the keys the next phase consumes, failing the
run immediately with a readable error instead of a deep late crash. The
Spark analog is a StructType check on each DataFrame hand-off: columns the
consumer stage relies on must exist with the expected Catalyst type.

Checks are subset-based (required columns, exact types), not whole-schema
equality: producers may legitimately carry extra columns (e.g.
``include_raster`` adds ``ndvi_raster``), and consumers only contract what
they read. The check inspects ``df.schema`` on the driver — no job runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class ContractError(TypeError):
    """A stage hand-off DataFrame does not satisfy the consumer's schema
    contract. Message carries the per-column diff."""


# required column → Catalyst simpleString type, per hand-off (the columns
# the downstream stage actually reads; see the consuming operators)
FEATURES = {
    "url": "string",
    "feature_index": "int",
    "name": "string",
    "exterior": "array<double>",
    "interior": "array<array<double>>",
    "dedup_key": "string",
    "error": "string",
}
AOIS = {
    "url": "string",
    "feature_index": "int",
    "name": "string",
    "exterior": "array<double>",
    "min_lon": "double",
    "min_lat": "double",
    "max_lon": "double",
    "max_lat": "double",
    "buf_min_lon": "double",
    "buf_min_lat": "double",
    "buf_max_lon": "double",
    "buf_max_lat": "double",
    "area_ha": "double",
    "centroid_lon": "double",
    "centroid_lat": "double",
    "has_naip": "boolean",
    "max_span_m": "double",
}
BEST_SCENES = {
    "url": "string",
    "feature_index": "int",
    "frame_id": "bigint",
    "naip_variant": "boolean",
    "year": "bigint",
    "season": "string",
    "ndvi_collection": "string",
    "scene_id": "string",
    "cloud_cover": "double",
    "s_min_lon": "double",
    "s_min_lat": "double",
    "s_max_lon": "double",
    "s_max_lat": "double",
    "resolution_m": "double",
}
NDVI = {
    "url": "string",
    "feature_index": "int",
    "frame_id": "bigint",
    "year": "bigint",
    "season": "string",
    "scene_id": "string",
    "ndvi_mean": "double",
    "ndvi_std": "double",
    "ndvi_median": "double",
    "valid_pixels": "bigint",
    "total_pixels": "bigint",
}
SEASON_CHANGES = {
    "url": "string",
    "feature_index": "int",
    "season": "string",
    "year_from": "bigint",
    "year_to": "bigint",
    "mean_delta": "double",
    "loss_ha": "double",
    "gain_ha": "double",
}


def expect(df: DataFrame, stage: str, required: dict[str, str]) -> DataFrame:
    """Assert ``df`` satisfies the ``required`` column→type contract for
    ``stage``; return ``df`` unchanged (composable at call sites). Raises
    ContractError listing every missing/mistyped column at once."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems = []
    for col, typ in required.items():
        if col not in actual:
            problems.append(f"missing column '{col}' (expected {typ})")
        elif actual[col] != typ:
            problems.append(f"column '{col}' is {actual[col]}, expected {typ}")
    if problems:
        raise ContractError(
            f"stage contract violated at '{stage}' hand-off:\n  "
            + "\n  ".join(problems)
            + f"\n  producer schema: {df.schema.simpleString()}"
        )
    return df
