"""Deterministic corpus sampling for training-data curation (task brief's
large-scale pipeline layer).

Both operators are pure column expressions keyed on xxhash64(doc_id), so any
executor — and a re-run months later — selects the same rows: reproducible
subsets without storing membership lists. No shuffle for the rate sample;
one shuffle (window by stratum) for the stratified quota.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def hash_sample(documents: DataFrame, rate_permille: int = 100) -> DataFrame:
    """Keep ~rate_permille/1000 of documents, chosen by hash bucket —
    deterministic, order-free, join-free (the standard reproducible-sampling
    idiom for 100 TB corpora; a rerun or a different partitioning picks the
    exact same rows)."""
    return documents.filter(
        F.pmod(F.xxhash64("doc_id"), F.lit(1000)) < F.lit(rate_permille)
    ).select("doc_id", "lang", "n_chars")


def stratified_sample(
    documents: DataFrame, stratum_col: str = "lang", per_stratum: int = 50
) -> DataFrame:
    """Per-stratum quota sample: rank docs inside each stratum by
    (xxhash64(doc_id), doc_id) and keep the first ``per_stratum`` — a
    deterministic 'fair mix' across languages/sources regardless of their
    raw frequencies (the curation counter to majority-language domination).
    One shuffle on the stratum key; quotas cap the per-stratum state."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.xxhash64("doc_id").asc(), F.col("doc_id").asc()
    )
    return (
        documents.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= per_stratum)
        .select(
            "doc_id",
            F.col(stratum_col).alias("stratum"),
            F.col("sample_rank").cast("long").alias("sample_rank"),
        )
    )
