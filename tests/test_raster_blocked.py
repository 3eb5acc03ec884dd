"""Differential tests: the cache-blocked window evaluators (round-8
optimization) must be bit-identical to the full-window kernel path for the
NDVI-stats row and the change-pair row, across window sizes, collections,
partial scene overlap, and empty windows."""

from __future__ import annotations

import random

import numpy as np

from azure_workflow_for_kml_satellite_spark.functions import raster as R
from azure_workflow_for_kml_satellite_spark.operators import change as C
from azure_workflow_for_kml_satellite_spark.operators.ndvi import compute_ndvi_for_row


def _mk_recipe(rng: random.Random, prefix: str = "", big: bool = False) -> dict:
    sx = rng.uniform(-100, 100)
    sy = rng.uniform(-40, 40)
    sw = rng.uniform(0.05, 0.5)
    sh = rng.uniform(0.05, 0.5)
    coll = rng.choice(["sentinel-2-l2a", "landsat-c2-l2"])
    res = 10.0 if coll == "sentinel-2-l2a" else 30.0
    if big:
        sw, sh = 0.35, 0.35
    rx = sx + rng.uniform(-0.02, sw * 0.8)
    ry = sy + rng.uniform(-0.02, sh * 0.8)
    rw = rng.uniform(0.001, sw if big else 0.08)
    rh = rng.uniform(0.001, sh if big else 0.08)
    return {
        prefix + "scene_id": f"scn-{rng.randint(0, 10**6)}",
        prefix + "s_min_lon": sx,
        prefix + "s_min_lat": sy,
        prefix + "s_max_lon": sx + sw,
        prefix + "s_max_lat": sy + sh,
        prefix + "resolution_m": res,
        prefix + "ndvi_collection": coll,
        prefix + "min_lon": rx,
        prefix + "min_lat": ry,
        prefix + "max_lon": rx + rw,
        prefix + "max_lat": ry + rh,
    }


def _full_path_row(rec: dict) -> dict:
    """The pre-round-8 full-window implementation, kept as the reference."""
    read_bbox = [rec["min_lon"], rec["min_lat"], rec["max_lon"], rec["max_lat"]]
    scene_bbox = [rec["s_min_lon"], rec["s_min_lat"], rec["s_max_lon"], rec["s_max_lat"]]
    coll = rec["ndvi_collection"]
    bands = R.read_window_bands(
        rec["scene_id"], scene_bbox, rec["resolution_m"], read_bbox, coll
    )
    out = dict.fromkeys(
        [
            "ndvi_mean", "ndvi_min", "ndvi_max", "ndvi_std", "ndvi_median",
            "valid_pixels", "total_pixels", "masked_pixels", "ndvi_raster",
        ]
    )
    if bands is None:
        return out
    if coll == "landsat-c2-l2":
        ndvi, mask, masked = R.ndvi_landsat(bands["red"], bands["nir"], bands.get("qa"))
    else:
        ndvi, mask, masked = R.ndvi_s2(bands["red"], bands["nir"], bands.get("scl"))
    st = R.ndvi_statistics(ndvi, mask)
    if st is None:
        return out
    out.update(
        {
            "ndvi_mean": st["mean"],
            "ndvi_min": st["min"],
            "ndvi_max": st["max"],
            "ndvi_std": st["std"],
            "ndvi_median": st["median"],
            "valid_pixels": st["valid_pixels"],
            "total_pixels": st["total_pixels"],
            "masked_pixels": masked,
        }
    )
    return out


def _full_path_pair(rec: dict, lt: float = -0.1, gt: float = 0.1):
    ra = C.masked_ndvi_for_recipe(rec, "a_")
    rb = C.masked_ndvi_for_recipe(rec, "b_")
    if ra is None or rb is None:
        return None
    (na, res_a), (nb, _) = ra, rb
    return R.change_stats(na, nb, abs(res_a * res_a) / 10_000, lt, gt)


def test_blocked_row_matches_full_path():
    rng = random.Random(11)
    for i in range(150):
        rec = _mk_recipe(rng, big=(i % 17 == 0))
        assert compute_ndvi_for_row(rec) == _full_path_row(rec), rec


def test_blocked_pair_matches_full_path():
    rng = random.Random(23)
    for i in range(100):
        rec = {**_mk_recipe(rng, "a_", big=(i % 23 == 0)), **_mk_recipe(rng, "b_", big=(i % 23 == 0))}
        if i % 3 == 0:  # realistic case: both sides read the same AOI bbox
            for c in ("min_lon", "min_lat", "max_lon", "max_lat"):
                rec["b_" + c] = rec["a_" + c]
        assert C.change_stats_for_pair_blocked(rec, -0.1, 0.1) == _full_path_pair(rec), rec


def test_blocked_stats_monster_window_exact():
    """One deliberately huge window: blocked block count > 100, still exact."""
    seed = R.scene_seed("monster")
    win = (3, 2787, 7, 2791)
    red = R.gen_band(seed, R.BAND_RED, win)
    nir = R.gen_band(seed, R.BAND_NIR, win)
    scl_win = (1, 1394, 3, 1396)
    scl = R.gen_band(seed, R.BAND_SCL, scl_win)
    ndvi, mask, masked_full = R.ndvi_s2(red, nir, scl)
    st_full = R.ndvi_statistics(ndvi, mask)

    parts = []
    masked = 0
    for nd, vm, m in R.iter_masked_ndvi_chunks(seed, "sentinel-2-l2a", win, scl_win):
        masked += m
        parts.append(nd[vm].copy())
    vals = np.concatenate(parts)
    st = R.ndvi_statistics_from_values(vals, (win[1] - win[0]) * (win[3] - win[2]))
    assert st == st_full
    assert masked == masked_full
