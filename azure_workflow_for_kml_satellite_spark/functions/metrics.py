"""Per-AOI metric kernels (SURVEY.md §2.4 A3/A6/A7) — pure functions shared
by the Spark operators and the sequential oracle.

Ports the exact arithmetic of the reference's aoi_metrics module
(reference: treesight/pipeline/enrichment/aoi_metrics.py) — OLS slope over
the valid-frame index, max consecutive drop tracked against the ORIGINAL
frame index, population std, CV, and the documented rounding ladder.
"""

from __future__ import annotations

import math

from azure_workflow_for_kml_satellite_spark.functions.geometry import classify_ndvi


def ndvi_trend(frame_means: list[tuple[int, float | None]]) -> dict:
    """Trend stats from [(frame_id, mean-or-None), ...] in frame-plan order
    (reference: aoi_metrics.py:51-122)."""
    valid = [(fid, m) for fid, m in frame_means if m is not None]
    if len(valid) < 2:
        latest = valid[0][1] if valid else None
        return {
            "direction": "insufficient_data",
            "observations": len(valid),
            "slope_per_frame": None,
            "earliest_mean": None,
            "latest_mean": latest,
            "overall_change": None,
            "overall_change_pct": None,
            "max_consecutive_drop": None,
            "max_drop_frame_id": None,
            "coefficient_of_variation": None,
            "mean_ndvi": None,
            "std_ndvi": None,
            "health_class": classify_ndvi(latest) if latest is not None else "unknown",
        }

    means = [m for _, m in valid]
    n = len(means)
    x_mean = (n - 1) / 2.0
    y_mean = sum(means) / n
    numerator = sum((i - x_mean) * (m - y_mean) for i, m in enumerate(means))
    denominator = sum((i - x_mean) ** 2 for i in range(n))
    slope = numerator / denominator if denominator != 0 else 0.0

    if abs(slope) < 0.002:
        direction = "stable"
    elif slope > 0:
        direction = "improving"
    else:
        direction = "declining"

    max_drop = 0.0
    max_drop_fid = -1
    for i in range(1, n):
        drop = means[i - 1] - means[i]
        if drop > max_drop:
            max_drop = drop
            max_drop_fid = valid[i][0]  # original frame id, not filtered index

    std = math.sqrt(sum((m - y_mean) ** 2 for m in means) / n) if n > 1 else 0.0
    cv = std / y_mean if y_mean > 0 else 0.0

    earliest_mean = means[0]
    latest_mean = means[-1]
    overall_change = latest_mean - earliest_mean

    return {
        "direction": direction,
        "observations": n,
        "slope_per_frame": round(slope, 5),
        "earliest_mean": round(earliest_mean, 4),
        "latest_mean": round(latest_mean, 4),
        "overall_change": round(overall_change, 4),
        "overall_change_pct": round(overall_change / earliest_mean * 100, 1)
        if earliest_mean
        else 0.0,
        "max_consecutive_drop": round(max_drop, 4),
        "max_drop_frame_id": max_drop_fid,
        "coefficient_of_variation": round(cv, 3),
        "mean_ndvi": round(y_mean, 4),
        "std_ndvi": round(std, 4),
        "health_class": classify_ndvi(latest_mean),
    }


def change_summary(mean_deltas: list[float], loss_has: list[float], gain_has: list[float]) -> dict:
    """Season-change rollup (reference: change_detection.py:244-259)."""
    summary = {
        "comparisons": len(mean_deltas),
        "total_loss_ha": round(sum(loss_has), 2),
        "total_gain_ha": round(sum(gain_has), 2),
    }
    if mean_deltas:
        avg = sum(mean_deltas) / len(mean_deltas)
        summary["avg_mean_delta"] = round(avg, 4)
        summary["trajectory"] = (
            "Improving" if avg > 0.02 else "Declining" if avg < -0.02 else "Stable"
        )
    else:
        summary["avg_mean_delta"] = None
        summary["trajectory"] = "Insufficient data"
    return summary
