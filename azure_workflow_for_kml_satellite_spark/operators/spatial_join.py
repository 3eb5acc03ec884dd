"""Cell-indexed spatial join: AOI ↔ scene (SURVEY.md §2.3 J1/J2/J3 — the
engine's centerpiece).

Spark-first design:
- Both sides are polyfilled to grid cells with **pure column expressions**
  (floor arithmetic + ``sequence`` + ``explode``) — no Python in the hot path,
  whole-stage-codegen friendly.
- Candidate generation is a plain equi-join on the int64 cell id; the exact
  bbox-intersection predicate (the reference's STAC ``bbox=`` /
  ``s_intersects`` semantics, planetary_computer.py:159-165, mosaic.py:52-64)
  is a refinement filter.
- Duplicate (aoi, scene) pairs from multi-cell overlap are eliminated with the
  **reporter-cell trick** (emit only in the cell containing the intersection's
  min corner) instead of a ``distinct`` shuffle.
- Top-1 scene per (geometry, frame) by cloud cover (reference: ndvi.py:63-67)
  is ``min_by`` over a struct ordering key — partial-aggregating map-side,
  cheaper than a window sort. Ties are broken by (datetime, scene_id): the
  reference's STAC sort is unstable under ties, so the engine pins a
  deterministic total order (SURVEY.md §7.4 risk 3).
- The scene×frame dimension is built FIRST (small side), so the expensive
  join never multiplies by frames.

Skew: dense geometry clusters (the monster grid) hash to few cells. When the
scene side is broadcast (default: it is a dimension) there is no shuffle to
skew. For the non-broadcast path, ``salt`` deterministically splits each hot
cell key: aoi side gets ``pmod(xxhash64(url, feature_index), salt)``, the
scene side explodes all salt ids (reference analog: area-based reroute to
bigger nodes, batch.py:28-30; SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from azure_workflow_for_kml_satellite_spark.constants import (
    DEFAULT_CELL_RES,
)

# ── cell expressions (mirror functions/cells.py in pure SQL) ────────────────


def _cell_size(res: int) -> float:
    return 360.0 / (1 << res)


def _ix_expr(lon_col: str, res: int):
    size = _cell_size(res)
    nmax = (1 << res) - 1
    return F.greatest(
        F.lit(0),
        F.least(F.lit(nmax), F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(size))),
    )


def _iy_expr(lat_col: str, res: int):
    size = _cell_size(res)
    nmax = (1 << res) - 1
    return F.greatest(
        F.lit(0),
        F.least(F.lit(nmax), F.floor((F.col(lat_col) + F.lit(90.0)) / F.lit(size))),
    )


def _cell_id(ix, iy, res: int):
    return (
        F.lit(res).cast("long") * F.lit(1 << 52).cast("long")
        + ix.cast("long") * F.lit(1 << 26).cast("long")
        + iy.cast("long")
    )


def explode_bbox_cells(
    df: DataFrame,
    min_lon: str,
    min_lat: str,
    max_lon: str,
    max_lat: str,
    res: int = DEFAULT_CELL_RES,
    out: str = "cell",
) -> DataFrame:
    """Polyfill a bbox to cells entirely in column expressions: one output row
    per (input row, covering cell)."""
    df = (
        df.withColumn("_ix0", _ix_expr(min_lon, res))
        .withColumn("_ix1", _ix_expr(max_lon, res))
        .withColumn("_iy0", _iy_expr(min_lat, res))
        .withColumn("_iy1", _iy_expr(max_lat, res))
    )
    df = df.withColumn("_ix", F.explode(F.sequence("_ix0", "_ix1"))).withColumn(
        "_iy", F.explode(F.sequence("_iy0", "_iy1"))
    )
    return df.withColumn(out, _cell_id(F.col("_ix"), F.col("_iy"), res)).drop(
        "_ix0", "_ix1", "_iy0", "_iy1", "_ix", "_iy"
    )


# ── scene × frame dimension ─────────────────────────────────────────────────


def scene_frame_candidates(
    scenes: DataFrame,
    frames: DataFrame,
    date_start: str | None = None,
    date_end: str | None = None,
) -> DataFrame:
    """Scenes usable for NDVI per frame: collection match + datetime within
    the frame window + cloud ceiling (reference: ndvi.py:44-91, 279-322;
    F1/F3 filters). Small: a scene matches ≤1 frame per variant."""
    f = frames
    if date_start:
        f = f.filter(F.col("end") >= F.lit(date_start))
    if date_end:
        f = f.filter(F.col("start") <= F.lit(date_end))
    f = f.select(
        "frame_id",
        "naip_variant",
        "year",
        "season",
        "start",
        "end",
        F.col("collection").alias("frame_collection"),
        "is_naip",
        "ndvi_collection",
        "max_cloud",
    )
    # the scenes file is small but the downstream cell explode + broadcast
    # build would otherwise run in its single scan task — parallelize it
    scenes = scenes.repartition(scenes.sparkSession.sparkContext.defaultParallelism)
    s = scenes.select(
        "scene_id",
        F.col("collection").alias("scene_collection"),
        "datetime",
        "cloud_cover",
        "resolution_m",
        F.col("min_lon").alias("s_min_lon"),
        F.col("min_lat").alias("s_min_lat"),
        F.col("max_lon").alias("s_max_lon"),
        F.col("max_lat").alias("s_max_lat"),
    )
    return s.join(
        F.broadcast(f),
        (F.col("scene_collection") == F.col("ndvi_collection"))
        & (F.to_date("datetime") >= F.to_date("start"))
        & (F.to_date("datetime") <= F.to_date("end"))
        & (F.col("cloud_cover") <= F.col("max_cloud")),
        "inner",
    )


# ── the join ────────────────────────────────────────────────────────────────

AOI_KEY = ["url", "feature_index"]

_AOI_CARRY = [
    "url",
    "feature_index",
    "dedup_key",
    "name",
    "min_lon",
    "min_lat",
    "max_lon",
    "max_lat",
    "buf_min_lon",
    "buf_min_lat",
    "buf_max_lon",
    "buf_max_lat",
    "area_ha",
    "max_span_m",
    "has_naip",
]


def estimate_scene_cell_rows(scene_frames: DataFrame, res: int = DEFAULT_CELL_RES) -> int:
    """Exact row count of the cell-exploded scene×frame dim, computed as one
    cheap aggregate over the (small relative to AOIs) scene×frame table —
    sum over rows of (#x cells × #y cells) their bbox covers."""
    size = _cell_size(res)
    nmax = (1 << res) - 1

    def _clamp(c):
        return F.greatest(F.lit(0), F.least(F.lit(nmax), c))

    nx = (
        _clamp(F.floor((F.col("s_max_lon") + 180.0) / size))
        - _clamp(F.floor((F.col("s_min_lon") + 180.0) / size))
        + 1
    )
    ny = (
        _clamp(F.floor((F.col("s_max_lat") + 90.0) / size))
        - _clamp(F.floor((F.col("s_min_lat") + 90.0) / size))
        + 1
    )
    row = scene_frames.agg(F.sum(nx * ny).alias("n")).collect()[0]
    return int(row["n"] or 0)


# Above this many exploded dim rows the broadcast build (~150 B/row on the
# driver + every executor) stops being worth it vs a salted shuffle join.
MAX_BROADCAST_CELL_ROWS = 2_000_000


def spatial_join_candidates(
    aois: DataFrame,
    scene_frames: DataFrame,
    res: int = DEFAULT_CELL_RES,
    broadcast_scenes: bool | None = None,
    salt: int = 1,
    auto_salt: int = 8,
) -> DataFrame:
    """All (aoi, frame, candidate scene) rows: cell equi-join + exact bbox
    refinement + reporter-cell dedup.

    ``broadcast_scenes=None`` (default) picks the strategy from the data:
    the exploded scene×frame×cell dim row count is estimated with one cheap
    aggregate; small dims broadcast (AOI side never shuffles), large dims —
    e.g. a multi-year 10⁷-scene STAC catalog — go through the salted shuffle
    join with ``auto_salt`` salts instead of exceeding broadcast limits.
    Both paths produce identical rows (tested)."""
    if broadcast_scenes is None:
        est = estimate_scene_cell_rows(scene_frames, res)
        broadcast_scenes = est <= MAX_BROADCAST_CELL_ROWS
        if not broadcast_scenes and salt == 1:
            salt = auto_salt
    a = explode_bbox_cells(
        aois.select(*_AOI_CARRY),
        "buf_min_lon",
        "buf_min_lat",
        "buf_max_lon",
        "buf_max_lat",
        res=res,
    )
    s = explode_bbox_cells(
        scene_frames, "s_min_lon", "s_min_lat", "s_max_lon", "s_max_lat", res=res
    )

    join_keys = ["cell"]
    if salt > 1 and not broadcast_scenes:
        a = a.withColumn(
            "salt", F.pmod(F.xxhash64("url", "feature_index"), F.lit(salt))
        )
        s = s.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        ).withColumn("salt", F.col("salt").cast("long"))
        join_keys.append("salt")
    if broadcast_scenes:
        s = F.broadcast(s)

    joined = a.join(s, on=join_keys, how="inner").filter(
        # NAIP-variant frame selection (aois.has_naip picks the frame set)
        (F.col("naip_variant") == F.col("has_naip"))
        # exact bbox intersection refinement (J1)
        & (F.col("buf_min_lon") <= F.col("s_max_lon"))
        & (F.col("s_min_lon") <= F.col("buf_max_lon"))
        & (F.col("buf_min_lat") <= F.col("s_max_lat"))
        & (F.col("s_min_lat") <= F.col("buf_max_lat"))
    )
    # Reporter-cell dedup: only the cell containing the intersection's
    # min corner emits the pair — no distinct() shuffle needed.
    rep_ix = _ix_expr_val(F.greatest("buf_min_lon", "s_min_lon"), res)
    rep_iy = _iy_expr_val(F.greatest("buf_min_lat", "s_min_lat"), res)
    joined = joined.filter(F.col("cell") == _cell_id(rep_ix, rep_iy, res))
    return joined.drop("cell", "salt") if salt > 1 else joined.drop("cell")


def _ix_expr_val(col, res: int):
    size = _cell_size(res)
    nmax = (1 << res) - 1
    return F.greatest(F.lit(0), F.least(F.lit(nmax), F.floor((col + F.lit(180.0)) / F.lit(size))))


def _iy_expr_val(col, res: int):
    size = _cell_size(res)
    nmax = (1 << res) - 1
    return F.greatest(F.lit(0), F.least(F.lit(nmax), F.floor((col + F.lit(90.0)) / F.lit(size))))


def best_scene_per_frame(candidates: DataFrame) -> DataFrame:
    """Top-1 scene per (aoi, frame) by (cloud, datetime, scene_id) — J2/W3 as
    a map-side-combining min_by aggregation."""
    scene_struct = F.struct(
        "scene_id",
        "cloud_cover",
        "datetime",
        "resolution_m",
        "s_min_lon",
        "s_min_lat",
        "s_max_lon",
        "s_max_lat",
    )
    order_key = F.struct("cloud_cover", "datetime", "scene_id")
    carry = [c for c in _AOI_CARRY if c not in ("url", "feature_index")]
    agg = (
        candidates.groupBy(
            "url",
            "feature_index",
            "frame_id",
            "naip_variant",
            "year",
            "season",
            "start",
            "end",
            "frame_collection",
            "is_naip",
            "ndvi_collection",
        )
        .agg(
            F.min_by(scene_struct, order_key).alias("best"),
            *[F.first(c).alias(c) for c in carry],
        )
        .select("*", "best.*")
        .drop("best")
    )
    return agg


def spatial_join_best_scene(
    aois: DataFrame,
    scenes: DataFrame,
    frames: DataFrame,
    date_start: str | None = None,
    date_end: str | None = None,
    res: int = DEFAULT_CELL_RES,
    broadcast_scenes: bool | None = None,
    salt: int = 1,
) -> DataFrame:
    """Full J1+J2: one row per (aoi, frame) with its least-cloudy scene.
    broadcast_scenes=None → data-driven broadcast/salted-shuffle choice."""
    sf = scene_frame_candidates(scenes, frames, date_start, date_end)
    cand = spatial_join_candidates(aois, sf, res, broadcast_scenes, salt)
    return best_scene_per_frame(cand)


def best_display_scene(
    aois: DataFrame,
    scenes: DataFrame,
    frames: DataFrame,
    date_start: str | None = None,
    date_end: str | None = None,
    res: int = DEFAULT_CELL_RES,
) -> DataFrame:
    """Display-mosaic selection with the reference's fallback ladder
    (SURVEY.md §7.4 risk 6; reference runner.py:228-294, mosaic.py:62-72):

    - only frames whose RGB display is suitable (estimated pixels ≥ 12,
      frames.py:75-76) register a display mosaic;
    - candidates come from the frame's DISPLAY collection; NAIP ranks by
      datetime DESC (newest vintage wins — mosaic.py:68-72, no cloud
      property), cloud collections rank by cloud ASC with the ≤20 ceiling
      (runner.py:229-234);
    - a NAIP frame with no NAIP scene falls back to a Sentinel-2 mosaic and
      reports display_collection='sentinel-2-l2a' (runner.py:244-254).

    Output: one row per suitable (aoi, frame) that found any scene:
    (url, feature_index, frame_id, naip_variant, display_collection,
    scene_id, fallback_used)."""
    f = frames
    if date_start:
        f = f.filter(F.col("end") >= F.lit(date_start))
    if date_end:
        f = f.filter(F.col("start") <= F.lit(date_end))
    f = f.select(
        "frame_id", "naip_variant", "year", "start", "end",
        F.col("collection").alias("frame_collection"), "is_naip",
    )
    s = scenes.select(
        "scene_id",
        F.col("collection").alias("scene_collection"),
        "datetime",
        "cloud_cover",
        F.col("min_lon").alias("s_min_lon"),
        F.col("min_lat").alias("s_min_lat"),
        F.col("max_lon").alias("s_max_lon"),
        F.col("max_lat").alias("s_max_lat"),
    )
    # candidate set: primary display collection, plus sentinel-2 fallback
    # rows for NAIP frames
    prim = s.join(
        F.broadcast(f),
        (F.col("scene_collection") == F.col("frame_collection"))
        & (F.to_date("datetime") >= F.to_date("start"))
        & (F.to_date("datetime") <= F.to_date("end"))
        & (
            (F.col("frame_collection") == "naip")  # NAIP: no cloud property
            | (F.col("cloud_cover") <= 20.0)
        ),
        "inner",
    ).withColumn("fallback_used", F.lit(False))
    fb = s.join(
        F.broadcast(f.filter(F.col("is_naip"))),
        (F.col("scene_collection") == "sentinel-2-l2a")
        & (F.to_date("datetime") >= F.to_date("start"))
        & (F.to_date("datetime") <= F.to_date("end"))
        & (F.col("cloud_cover") <= 20.0),
        "inner",
    ).withColumn("fallback_used", F.lit(True))
    cand = prim.unionByName(fb)

    a = explode_bbox_cells(
        aois.select("url", "feature_index", "has_naip", "max_span_m",
                    "buf_min_lon", "buf_min_lat", "buf_max_lon", "buf_max_lat"),
        "buf_min_lon", "buf_min_lat", "buf_max_lon", "buf_max_lat", res=res,
    )
    sc = F.broadcast(explode_bbox_cells(cand, "s_min_lon", "s_min_lat", "s_max_lon", "s_max_lat", res=res))
    joined = a.join(sc, "cell").filter(
        (F.col("naip_variant") == F.col("has_naip"))
        & (F.col("buf_min_lon") <= F.col("s_max_lon"))
        & (F.col("s_min_lon") <= F.col("buf_max_lon"))
        & (F.col("buf_min_lat") <= F.col("s_max_lat"))
        & (F.col("s_min_lat") <= F.col("buf_max_lat"))
    )
    rep_ix = _ix_expr_val(F.greatest("buf_min_lon", "s_min_lon"), res)
    rep_iy = _iy_expr_val(F.greatest("buf_min_lat", "s_min_lat"), res)
    joined = joined.filter(F.col("cell") == _cell_id(rep_ix, rep_iy, res))

    # F15 suitability gate (display only registered when suitable)
    gsd = F.when(
        (F.col("frame_collection") == "naip") & (F.col("year") <= 2014), F.lit(1.0)
    ).otherwise(
        F.when(F.col("frame_collection") == "naip", F.lit(0.6))
        .when(F.col("frame_collection") == "sentinel-2-l2a", F.lit(10.0))
        .when(F.col("frame_collection") == "landsat-c2-l2", F.lit(30.0))
        .otherwise(F.lit(10.0))
    )
    joined = joined.filter(F.col("max_span_m") / gsd >= 12)

    # ladder order: primary before fallback; NAIP newest-first, others
    # least-cloudy-first; deterministic tiebreaks
    order_key = F.struct(
        F.col("fallback_used").cast("int").alias("prio"),
        F.when(F.col("scene_collection") == "naip", -F.unix_timestamp("datetime"))
        .otherwise(F.col("cloud_cover")).alias("rank"),
        F.col("datetime").alias("dt"),
        F.col("scene_id").alias("sid"),
    )
    pick = F.struct("scene_id", "scene_collection", "fallback_used")
    best = joined.groupBy("url", "feature_index", "frame_id", "naip_variant").agg(
        F.min_by(pick, order_key).alias("best")
    )
    return best.select(
        "url",
        "feature_index",
        "frame_id",
        "naip_variant",
        F.col("best.scene_collection").alias("display_collection"),
        F.col("best.scene_id").alias("scene_id"),
        F.col("best.fallback_used").alias("fallback_used"),
    )


def tile_assignment(
    aois: DataFrame,
    scenes: DataFrame,
    res: int = DEFAULT_CELL_RES,
    broadcast_scenes: bool = True,
) -> DataFrame:
    """J3: every (geometry, intersecting scene tile) pair — the
    geometry↔raster-tile assignment relation."""
    a = explode_bbox_cells(
        aois.select("url", "feature_index", "buf_min_lon", "buf_min_lat", "buf_max_lon", "buf_max_lat"),
        "buf_min_lon",
        "buf_min_lat",
        "buf_max_lon",
        "buf_max_lat",
        res=res,
    )
    s = scenes.select(
        "scene_id",
        "collection",
        F.col("min_lon").alias("s_min_lon"),
        F.col("min_lat").alias("s_min_lat"),
        F.col("max_lon").alias("s_max_lon"),
        F.col("max_lat").alias("s_max_lat"),
    )
    s = explode_bbox_cells(s, "s_min_lon", "s_min_lat", "s_max_lon", "s_max_lat", res=res)
    if broadcast_scenes:
        s = F.broadcast(s)
    joined = a.join(s, "cell").filter(
        (F.col("buf_min_lon") <= F.col("s_max_lon"))
        & (F.col("s_min_lon") <= F.col("buf_max_lon"))
        & (F.col("buf_min_lat") <= F.col("s_max_lat"))
        & (F.col("s_min_lat") <= F.col("buf_max_lat"))
    )
    rep_ix = _ix_expr_val(F.greatest("buf_min_lon", "s_min_lon"), res)
    rep_iy = _iy_expr_val(F.greatest("buf_min_lat", "s_min_lat"), res)
    return joined.filter(F.col("cell") == _cell_id(rep_ix, rep_iy, res)).drop("cell")
