"""S20: per-document EUDR due-diligence PDF reports.

Distributed assembly of the reference's fpdf2 report (reference:
blueprints/export.py:512-1533 — header, EUDR compliance summary,
vegetation analysis, per-parcel evidence sections) as a binary column:
the per-AOI metric tables are joined, grouped per source url, and one
scalar UDF renders each group with the from-scratch PDF writer
(functions/pdf.py). Report text mirrors the reference's section wording.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from azure_workflow_for_kml_satellite_spark.functions.pdf import PdfBuilder


def _render_report(url: str, parcels: list) -> bytes:
    parcels = sorted(parcels, key=lambda p: p["feature_index"])
    pdf = PdfBuilder()
    # header (export.py:569-593)
    pdf.heading("EUDR Due-Diligence Report", size=18)
    pdf.line(f"Report ID: {url}", size=9)
    pdf.line(f"Parcels analysed: {len(parcels)}", size=9)
    # compliance summary (export.py:610-671)
    pdf.heading("EUDR Compliance Summary", size=12)
    pdf.line("EUDR cutoff date: 31 December 2020", size=10)
    n_free = sum(1 for p in parcels if p["deforestation_free"])
    n_flagged = sum(1 for p in parcels if not p["deforestation_free"])
    pdf.line(f"Deforestation-free parcels: {n_free}", size=10)
    pdf.line(f"Parcels with findings: {n_flagged}", size=10)
    # vegetation analysis (export.py:674-713)
    pdf.heading("Vegetation Analysis", size=12)
    directions: dict[str, int] = {}
    for p in parcels:
        directions[p["direction"] or "unknown"] = directions.get(p["direction"] or "unknown", 0) + 1
    for d in sorted(directions):
        pdf.line(f"NDVI trend '{d}': {directions[d]} parcel(s)", size=10)
    pdf.table(
        ["parcel", "area (ha)", "health", "trajectory", "confidence"],
        [
            [
                str(p["name"] or f"feature {p['feature_index']}"),
                f"{p['area_ha']:.1f}" if p["area_ha"] is not None else "-",
                str(p["health_class"] or "-"),
                str(p["trajectory"] or "-"),
                str(p["confidence"] or "-"),
            ]
            for p in parcels
        ],
        [150.0, 70.0, 110.0, 90.0, 70.0],
    )
    # per-parcel evidence (export.py:748-840)
    pdf.heading("Per-Parcel Evidence", size=14)
    for p in parcels:
        pdf.line(str(p["name"] or f"feature {p['feature_index']}"), size=11, style="B")
        verdict = "DEFORESTATION-FREE" if p["deforestation_free"] else "FINDINGS PRESENT"
        pdf.line(f"Determination: {verdict} (confidence: {p['confidence']})", size=9)
        for flag in (p["flags"] or "").split("|"):
            if flag:
                pdf.line(f"- {flag}", size=9, style="I")
    return pdf.build()


def eudr_report_pdfs(
    aois: DataFrame,
    trend: DataFrame,
    change_summary: DataFrame,
    determination: DataFrame,
) -> DataFrame:
    """One (url, report_pdf, n_parcels) row per source document."""
    j = (
        aois.select("url", "feature_index", "name", "area_ha")
        .join(
            trend.select("url", "feature_index", "direction", "health_class"),
            ["url", "feature_index"],
            "left",
        )
        .join(
            change_summary.select("url", "feature_index", "trajectory"),
            ["url", "feature_index"],
            "left",
        )
        .join(
            determination.select(
                "url", "feature_index", "deforestation_free", "confidence", "flags"
            ),
            ["url", "feature_index"],
            "left",
        )
    )
    render = F.udf(_render_report, "binary")
    return (
        j.groupBy("url")
        .agg(
            F.collect_list(
                F.struct(
                    "feature_index",
                    "name",
                    "area_ha",
                    "direction",
                    "health_class",
                    "trajectory",
                    "deforestation_free",
                    "confidence",
                    "flags",
                )
            ).alias("parcels")
        )
        .select(
            "url",
            render("url", "parcels").alias("report_pdf"),
            F.size("parcels").alias("n_parcels"),
        )
    )
