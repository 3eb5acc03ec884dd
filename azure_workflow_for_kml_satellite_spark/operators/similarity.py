"""Similarity search over ``embeddings`` (task brief: brute-force cosine
top-k baseline + LSH-bucketed scale path).

- Brute force: cross join queries × corpus with the dot product as a JVM-side
  ``aggregate``/``zip_with`` expression, top-k via window rank. Exact; the
  baseline the oracle checks bit-for-bit (DuckDB list_cosine_similarity).
- LSH path: random-hyperplane signatures (deterministic hyperplanes from
  xxhash of (dim, plane)), candidates share a signature prefix bucket; top-k
  among candidates. Approximate; checked rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _cosine_expr(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(F.col(a), F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(F.col(b), F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def _cosine_vec(a, b):
    """Cosine column bit-identical to ``_cosine_expr`` but vectorized: the
    JVM higher-order fold is interpreted per element (~1 M lambda evals/s);
    this Arrow UDF reproduces the exact same float64 sequence — elementwise
    products then a SEQUENTIAL left-to-right sum (``np.cumsum`` is defined
    as the running fold, unlike ``np.sum``'s pairwise tree) — verified equal
    on 40k real pairs. Ragged batches fall back to a per-row loop with the
    identical ops."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _seq_dot(x: "np.ndarray") -> "np.ndarray":
        return np.cumsum(x, axis=1)[:, -1]

    def cos(ea: "pd.Series", eb: "pd.Series") -> "pd.Series":
        if len(ea) == 0:
            return pd.Series([], dtype="float64")
        try:
            ma = np.array(ea.tolist(), dtype=np.float64)
            mb = np.array(eb.tolist(), dtype=np.float64)
            if ma.ndim != 2 or mb.ndim != 2:
                raise ValueError
        except ValueError:  # ragged dims — per-row identical ops
            out = []
            for x, y in zip(ea, eb):
                x = np.asarray(x, dtype=np.float64)[None, :]
                y = np.asarray(y, dtype=np.float64)[None, :]
                out.append(
                    float(
                        _seq_dot(x * y)[0]
                        / (np.sqrt(_seq_dot(x * x)[0]) * np.sqrt(_seq_dot(y * y)[0]))
                    )
                )
            return pd.Series(out, dtype="float64")
        dot = _seq_dot(ma * mb)
        na = np.sqrt(_seq_dot(ma * ma))
        nb = np.sqrt(_seq_dot(mb * mb))
        return pd.Series(dot / (na * nb))

    return pandas_udf(cos, "double", PandasUDFType.SCALAR)(a, b)


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k neighbours for the given query vec_ids (self
    excluded). Queries are broadcast — corpus side never shuffles."""
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("q_emb"),
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("c_emb"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cosine_vec(F.col("q_emb"), F.col("c_emb")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _rh_signature(emb_col: str, planes: int = 16):
    """Random-hyperplane signature: plane p's normal component for dim d is a
    deterministic pseudo-gaussian from xxhash64(d, p) (sum of two uniform
    mixes, centered); sign of the dot product is bit p. Dimensionality comes
    from F.size(emb_col) per row — no driver-side action needed."""
    bits = []
    for p in range(planes):
        comp = F.aggregate(
            F.zip_with(
                F.col(emb_col),
                F.sequence(F.lit(0), F.size(emb_col) - 1),
                lambda v, d: v
                * ((F.pmod(F.xxhash64(d, F.lit(p)), F.lit(2001)) - F.lit(1000.0)) / 1000.0),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(comp > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with cosine ≥ τ,
    a < b. Exact all-pairs — the correctness baseline; the scale path for
    this operator is lsh_topk's banded signature buckets (candidates) with
    this exact cosine as the verify step."""
    a = embeddings.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").cast("array<double>").alias("e_a"),
    )
    b = embeddings.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").cast("array<double>").alias("e_b"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _cosine_vec(F.col("e_a"), F.col("e_b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def _rh_band_buckets(emb_col: str, planes: int, bands: int):
    """Array of ``bands`` bucket strings "band:value" — each band packs
    ``planes // bands`` hyperplane sign bits. Pure column expressions
    (signature bits never materialize as a >63-bit integer)."""
    rows = planes // bands

    def _component(p: int):
        return lambda v, d: v * (
            (F.pmod(F.xxhash64(d, F.lit(p)), F.lit(2001)) - F.lit(1000.0)) / 1000.0
        )

    out = []
    for bi in range(bands):
        val = F.lit(0)
        for ri in range(rows):
            comp = F.aggregate(
                F.zip_with(
                    F.col(emb_col),
                    F.sequence(F.lit(0), F.size(emb_col) - 1),
                    _component(bi * rows + ri),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            val = val + F.when(comp > 0, F.lit(1 << ri)).otherwise(F.lit(0))
        out.append(F.concat_ws(":", F.lit(bi), val.cast("string")))
    return F.array(*out)


def _plane_weights(embeddings: DataFrame, planes: int):
    """dim × planes hyperplane-component matrix, computed with the SAME
    column expressions the per-element lambda uses (xxhash64 on int32 pairs,
    pmod 2001, centered /1000) so every value is bit-identical; the
    xxhash64 primitive only exists JVM-side, hence one tiny spark job over
    range(dim). Returns None on an empty table. The dim probe is a LIMIT 1
    read, not a scan."""
    import numpy as np

    first = embeddings.select(F.size("embedding").alias("d")).first()
    if first is None or first["d"] is None:
        return None
    dim = int(first["d"])
    spark = embeddings.sparkSession
    cols = [
        (
            (F.pmod(F.xxhash64(F.col("d"), F.lit(p)), F.lit(2001)) - F.lit(1000.0))
            / 1000.0
        ).alias(f"p{p}")
        for p in range(planes)
    ]
    rows = (
        spark.range(dim)
        .select(F.col("id").cast("int").alias("d"))
        .select("d", *cols)
        .orderBy("d")
        .collect()
    )
    return np.array([[r[f"p{p}"] for p in range(planes)] for r in rows], dtype=np.float64)


def _rh_components(mat, weights):
    """Per-plane fold components for a (n × dim) batch: elementwise products
    then the SEQUENTIAL left-to-right sum (np.cumsum last element) per plane —
    the exact float64 sequence of the zip_with/aggregate expression."""
    import numpy as np

    n, dim = mat.shape
    comps = np.empty((n, weights.shape[1]), dtype=np.float64)
    for p in range(weights.shape[1]):
        comps[:, p] = np.cumsum(mat * weights[:dim, p], axis=1)[:, -1]
    return comps


def _rh_band_buckets_vec(emb_col, planes: int, bands: int, weights):
    """Vectorized ``_rh_band_buckets``: same band:value strings from the
    precomputed plane-weight matrix. The JVM higher-order fold is interpreted
    per element — at the near-dup operating point (~96 planes) that is ~12 M
    lambda evals per 2k vectors; this Arrow UDF is bit-identical (weights
    from ``_plane_weights``, folds via ``_rh_components``). Rows longer than
    the sampled dim raise a named error (uniform-dim corpus expected)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    rows_per = planes // bands
    dim = weights.shape[0]

    def _bucket_rows(comps):
        bits = comps > 0
        out = []
        for i in range(bits.shape[0]):
            row = []
            for bi in range(bands):
                val = 0
                for ri in range(rows_per):
                    if bits[i, bi * rows_per + ri]:
                        val += 1 << ri
                row.append(f"{bi}:{val}")
            out.append(row)
        return out

    def buckets(vs: "pd.Series") -> "pd.Series":
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        lens = np.fromiter((len(v) for v in vs), dtype=np.int64, count=len(vs))
        if lens.max() > dim:
            raise ValueError(
                f"embedding dim {lens.max()} exceeds sampled dim {dim}; "
                "vectorized LSH requires a uniform-dim corpus"
            )
        if lens.min() == lens.max() == dim:
            mat = np.array(vs.tolist(), dtype=np.float64)
            return pd.Series(_bucket_rows(_rh_components(mat, weights)))
        out = []
        for v in vs:  # ragged: identical per-row ops on the sliced matrix
            m = np.asarray(v, dtype=np.float64)[None, :]
            out.extend(_bucket_rows(_rh_components(m, weights)))
        return pd.Series(out)

    return pandas_udf(buckets, "array<string>", PandasUDFType.SCALAR)(emb_col)


def _rh_signature_vec(emb_col, planes: int, weights):
    """Vectorized ``_rh_signature``: identical integer signature from the
    precomputed plane-weight matrix (same fold parity as
    ``_rh_band_buckets_vec``)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    dim = weights.shape[0]

    def sig(vs: "pd.Series") -> "pd.Series":
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        lens = np.fromiter((len(v) for v in vs), dtype=np.int64, count=len(vs))
        if lens.max() > dim:
            raise ValueError(
                f"embedding dim {lens.max()} exceeds sampled dim {dim}; "
                "vectorized LSH requires a uniform-dim corpus"
            )
        if lens.min() == lens.max() == dim:
            bits = _rh_components(np.array(vs.tolist(), dtype=np.float64), weights) > 0
        else:
            bits = np.zeros((len(vs), planes), dtype=bool)
            for i, v in enumerate(vs):
                m = np.asarray(v, dtype=np.float64)[None, :]
                bits[i] = _rh_components(m, weights)[0] > 0
        out = np.zeros(len(vs), dtype=np.int64)
        for p in range(planes):
            out |= bits[:, p].astype(np.int64) << p
        return pd.Series(out)

    return pandas_udf(sig, "long", PandasUDFType.SCALAR)(emb_col)


def lsh_band_shape(
    threshold: float, target_recall: float = 0.99999, max_bands: int = 64
) -> tuple[int, int]:
    """(rows_per_band, bands) for random-hyperplane LSH at a cosine threshold.

    Per-bit agreement for a pair at cosine τ is p = 1 − acos(τ)/π; a band of
    r bits matches w.p. p^r and recall over b bands is 1 − (1 − p^r)^b.
    r is chosen near the balance point p^r ≈ 1/2 (floored, min 2 so buckets
    aren't 2-valued), then b sized for the target recall. High thresholds
    (τ ≥ 0.9 ⇒ r ≥ 4) prune hard; low thresholds (τ ≈ 0.4 ⇒ r = 2) cannot —
    the sign-bit gap between a 0.4-cosine pair and background is small, so
    most pairs become candidates and the verify step approaches the exact
    join's cost. That is a property of the operating point, not the
    implementation; at 100 TB you either raise τ or switch to IVF routing.
    """
    import math

    p = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    # τ ≥ 1 (or clamped to it) ⇒ p = 1: every bit agrees for qualifying pairs
    # (exact duplicates up to scale), so a single widest band is both complete
    # and maximally pruning — and log(p) = 0 must not be divided by.
    if p >= 1.0:
        return 32, 1
    r = max(2, int(math.log(0.5) / math.log(p)))
    pr = p**r
    b = max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - pr)))
    return r, min(max_bands, b)


def lsh_bucket_skew(
    bucketed: DataFrame,
    skew_factor: float = 8.0,
    min_hot_bucket: int = 256,
) -> dict:
    """Band-bucket skew probe for the LSH guard: one map-combinable
    groupBy-count plus a 2-scalar aggregate (bounded control-plane
    collect). Returns {max, mean, hot_threshold, salted} where ``salted``
    says whether the bucket self-join must route through plans/skew.py.

    A healthy embedding distribution keeps the largest bucket a few
    percent of all entries (measured 3.2 % at sf0.1, BASELINE.md); a
    mode-collapsed embedder (many near-identical vectors) concentrates one
    band bucket and would turn the bucket equi-join into a single
    straggler partition at 100 TB. The threshold is relative to the mean
    bucket (``skew_factor`` × mean) with an absolute floor so tiny tables
    never trip it."""
    row = (
        bucketed.groupBy("bucket")
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("mean"))
        .first()
    )
    mx = int(row["mx"] or 0)
    mean = float(row["mean"] or 0.0)
    hot = max(min_hot_bucket, int(skew_factor * mean))
    return {"max": mx, "mean": mean, "hot_threshold": hot, "salted": mx > hot}


# At most one persisted bucketed frame PER SparkSession (keyed by
# applicationId): a new call only unpersists its own session's previous
# frame, so concurrent sessions cannot silently force each other's
# still-lazy results to recompute (ADVICE r7). Single-threaded use within
# one session is still assumed.
_LSH_CACHE: dict[str, object] = {}


def release_lsh_cache(app_id: str | None = None) -> None:
    """Unpersist the bucketed frame cached by the last
    embedding_near_dup_lsh call (non-blocking; no-op if none). With
    ``app_id`` only that session's entry is released."""
    keys = [app_id] if app_id is not None else list(_LSH_CACHE)
    for k in keys:
        df = _LSH_CACHE.pop(k, None)
        if df is not None:
            try:
                df.unpersist(blocking=False)
            except Exception:  # session already stopped — nothing to free
                pass


def embedding_near_dup_lsh(
    embeddings: DataFrame,
    threshold: float = 0.95,
    target_recall: float = 0.99999,
    shape: tuple[int, int] | None = None,
    skew_factor: float = 8.0,
    min_hot_bucket: int = 256,
) -> DataFrame:
    """Scale path for embedding near-dup pairs: banded random-hyperplane
    buckets → candidate pairs → EXACT cosine verify.

    Candidates are pairs sharing ≥1 of b sign-bit bands (an equi-join on the
    band bucket — never a cartesian); (r, b) come from lsh_band_shape unless
    ``shape`` overrides. Precision is exact (every candidate is re-scored
    with the true cosine); recall ≥ target_recall for pairs AT the threshold
    and higher for pairs above it. Output schema matches
    embedding_near_dup_pairs.

    Skew guard (automated round 6): the band-bucket histogram is measured
    on every run (lsh_bucket_skew); when one bucket exceeds
    ``skew_factor`` × the mean (floor ``min_hot_bucket``) — the
    mode-collapsed-embedder shape — the self-join routes through
    plans/skew.salted_equi_join, which spreads the hot bucket across salt
    sub-keys while meeting every intra-bucket pair exactly once, so the
    result set is IDENTICAL to the unsalted join (pytest-pinned against
    the exact all-pairs baseline). lsh_topk needs no such guard: its
    query side is broadcast, so no bucket key ever shuffles.

    NOTE: calling this function triggers a Spark job eagerly (the skew
    probe is an action at DataFrame-construction time). The bucketed
    frame is persisted so the embeddings scan + band-bucket explode run
    once, shared by the probe and the join. PySpark has no "first action
    over the returned lazy frame has run" hook, so the cache is released
    on the NEXT call to this function (bounded: at most one bucketed
    frame stays cached, MEMORY_AND_DISK so eviction is safe) or
    explicitly via release_lsh_cache()."""
    rows, bands = shape if shape is not None else lsh_band_shape(threshold, target_recall)
    planes = rows * bands
    weights = _plane_weights(embeddings, planes)
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    if weights is None:  # empty corpus — the expression path handles it lazily
        emb = emb.withColumn("bucket", F.explode(_rh_band_buckets("emb", planes, bands)))
    else:
        emb = emb.withColumn(
            "bucket", F.explode(_rh_band_buckets_vec(F.col("emb"), planes, bands, weights))
        )
    app_id = embeddings.sparkSession.sparkContext.applicationId
    release_lsh_cache(app_id)
    emb = emb.persist()
    _LSH_CACHE[app_id] = emb
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("emb").alias("e_a"), "bucket")
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("emb").alias("e_b"), "bucket")
    skew = lsh_bucket_skew(emb, skew_factor, min_hot_bucket)
    if skew["salted"]:
        from azure_workflow_for_kml_satellite_spark.plans.skew import salted_equi_join

        joined = salted_equi_join(
            a,
            b,
            identity_cols=["id_a"],
            cell_col="bucket",
            hot_threshold=skew["hot_threshold"],
        )
    else:
        joined = a.join(b, "bucket")
    return (
        joined
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine", _cosine_vec(F.col("e_a"), F.col("e_b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    sample_fraction: float | None = None,
    max_train_rows: int | None = 100_000,
) -> list[list[float]]:
    """Deterministic IVF centroid training: k-means/Lloyd with init = the
    ``n_centroids`` vectors of smallest xxhash64(vec_id) (reproducible, no
    RNG), assignment in an Arrow-batched pandas UDF (numpy argmax of the
    dot products), means via distributed per-dimension avg.

    IVF quality needs only a sketch of the distribution, so by default the
    Lloyd iterations run on a hash sample capped at ``max_train_rows``
    vectors (one count + one partition-independent xxhash filter) — NEVER on
    the full corpus: at 100 TB ``iters`` full-corpus assignment passes would
    dominate the whole query. ``sample_fraction`` overrides the derived
    fraction explicitly; below the cap the corpus trains unsampled (the
    small-sf determinism/recall contract is unchanged). The sampled training
    set is cached across the Lloyd iterations and unpersisted after."""
    import numpy as np

    emb = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    if sample_fraction is None and max_train_rows is not None:
        n = emb.count()
        if n > max_train_rows:
            sample_fraction = max_train_rows / n
    if sample_fraction and sample_fraction < 1.0:
        # deterministic, partitioning-independent hash sample (same scheme as
        # operators/sampling.hash_sample)
        bound = int(sample_fraction * 1_000_000)
        emb = emb.filter(F.pmod(F.xxhash64("vec_id", F.lit(7)), F.lit(1_000_000)) < bound)
    emb = emb.cache()
    try:
        init = (
            emb.withColumn("h", F.xxhash64("vec_id"))
            .orderBy("h")
            .limit(n_centroids)
            .select("emb")
            .collect()
        )
        centroids = np.array([r.emb for r in init], dtype=np.float64)

        for _ in range(iters):
            assigned = emb.withColumn("cluster", _assign_udf(centroids)(F.col("emb")))
            new_rows = (
                assigned.select("cluster", F.posexplode("emb").alias("pos", "v"))
                .groupBy("cluster", "pos")
                .agg(F.avg("v").alias("m"))
                .collect()
            )
            for r in new_rows:
                centroids[r.cluster][r.pos] = r.m
    finally:
        emb.unpersist()
    return centroids.tolist()


def _assign_udf(centroids):
    """Pandas UDF assigning each vector to its max-cosine centroid."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(centroids, dtype=np.float64)
    cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)

    # explicit functionType form: `from __future__ import annotations` makes
    # the pd.Series type hints unresolvable strings for pandas_udf inference
    def assign(embs):
        m = np.stack(embs.to_numpy())
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(mn @ cn.T, axis=1).astype(np.int32))

    from pyspark.sql.functions import PandasUDFType

    return pandas_udf(assign, "int", PandasUDFType.SCALAR)


def _probe_udf(centroids, n_probe: int):
    """Pandas UDF mapping each query vector to its ``n_probe`` max-cosine
    centroid ids (stable tie order) — the probe set stays a column, so
    unbounded query sets never collect to the driver."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    c = np.asarray(centroids, dtype=np.float64)
    cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)

    def probe(embs):
        m = np.stack(embs.to_numpy())
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        idx = np.argsort(-(mn @ cn.T), axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype(np.int32) for row in idx])

    return pandas_udf(probe, "array<int>", PandasUDFType.SCALAR)


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    iters: int = 5,
    max_train_rows: int | None = 100_000,
) -> DataFrame:
    """IVF-Flat approximate top-k (the brief's 'IVF variant as the scale
    path'): vectors are routed to their nearest trained centroid once
    (inverted lists = a cluster column, i.e. a partitionable key); each query
    probes its ``n_probe`` nearest centroids and scores ONLY those lists with
    the exact cosine. At scale the corpus is read cluster-pruned
    (n_probe/n_centroids of the data) instead of fully scanned; centroid
    training runs on a ≤``max_train_rows`` hash sample; probe assignment is
    a column expression over broadcast centroids, so queries stay a
    distributed (broadcast) DataFrame end-to-end — no driver collect.

    Provable-equality gate (the q_ngram_jaccard_capped pattern): with
    ``n_probe == n_centroids`` every inverted list is probed, so every
    (query, vector) pair is scored with the exact cosine and the result
    PROVABLY equals ``brute_force_topk`` — that operating point is what the
    driver's exact-cosine oracle checks; pruned operating points are
    benchmarked and recall-tested separately."""
    centroids = train_ivf_centroids(
        embeddings, n_centroids, iters, max_train_rows=max_train_rows
    )
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).withColumn("cluster", _assign_udf(centroids)(F.col("emb")))

    probes = (
        embeddings.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("q_emb"),
        )
        .withColumn(
            "cluster", F.explode(_probe_udf(centroids, min(n_probe, n_centroids))("q_emb"))
        )
    )
    cand = emb.join(F.broadcast(probes), "cluster").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.withColumn("cosine", _cosine_vec(F.col("q_emb"), F.col("emb")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    planes: int = 12,
    coverage_band: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates share the full random-hyperplane
    signature bucket (or differ in ≤1 of 3 sub-bands via banded buckets).

    ``coverage_band=True`` is the provable-equality operating point (the
    q_ngram_jaccard_capped pattern): one extra band whose bucket value is
    constant is appended, so the banded candidate generation provably covers
    every (query, vector) pair — the identical explode → bucket equi-join →
    dedup → exact-cosine verify → window top-k machinery runs, but its
    output PROVABLY equals ``brute_force_topk`` and the driver's exact
    oracle applies. The pruned default (sign-bit bands only) is what runs
    at 100 TB and is benchmarked/recall-tested separately."""
    weights = _plane_weights(embeddings, planes)
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).withColumn(
        "sig",
        _rh_signature("emb", planes)
        if weights is None  # empty corpus — lazy expression path
        else _rh_signature_vec(F.col("emb"), planes, weights),
    )
    band_size = planes // 3
    bucket_exprs = [
        F.concat_ws(
            ":",
            F.lit(bi),
            F.shiftright("sig", bi * band_size)
            .bitwiseAND(F.lit((1 << band_size) - 1))
            .cast("string"),
        )
        for bi in range(3)
    ]
    if coverage_band:
        bucket_exprs.append(F.lit("cover:0"))
    banded = emb.select(
        "vec_id",
        "emb",
        F.explode(F.array(*bucket_exprs)).alias("bucket"),
    )
    # query side: filter BEFORE the signature/band computation — the bucket
    # exprs are per-row pure, and the broadcast-build subtree otherwise
    # recomputes signatures for the whole corpus to keep a handful of rows
    q = (
        emb.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.explode(F.array(*bucket_exprs)).alias("bucket"),
        )
    )
    cand = (
        banded.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "q_emb", F.col("emb").alias("c_emb"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", _cosine_vec(F.col("q_emb"), F.col("c_emb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
