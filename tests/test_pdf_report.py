"""S20 PDF report: structural validity, content, determinism."""

from __future__ import annotations

import re

from azure_workflow_for_kml_satellite_spark.functions.pdf import PdfBuilder


def _build_sample() -> bytes:
    pdf = PdfBuilder()
    pdf.heading("EUDR Due-Diligence Report", 18)
    pdf.line("Report ID: test (with) \\ parens", 9)
    pdf.table(["a", "b"], [["1", "2"], ["3", "4"]], [100.0, 100.0])
    for i in range(120):  # force a page break
        pdf.line(f"row {i}")
    return pdf.build()


def test_pdf_structure_and_xref():
    data = _build_sample()
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    # xref offsets must point at the right objects
    xref_at = int(re.search(rb"startxref\n(\d+)\n%%EOF$", data).group(1))
    assert data[xref_at : xref_at + 4] == b"xref"
    offsets = re.findall(rb"(\d{10}) 00000 n", data[xref_at:])
    for i, off in enumerate(offsets, start=1):
        assert data[int(off) :].startswith(f"{i} 0 obj".encode())
    # multi-page: the forced overflow must create >= 2 pages
    assert int(re.search(rb"/Count (\d+)", data).group(1)) >= 2


def test_pdf_text_and_escaping_and_determinism():
    data = _build_sample()
    assert b"(EUDR Due-Diligence Report)" in data
    assert rb"\(with\)" in data and rb"\\" in data
    assert data == _build_sample()  # byte-deterministic


def test_eudr_report_pdfs_operator(spark):
    from azure_workflow_for_kml_satellite_spark.operators.reports import (
        eudr_report_pdfs,
    )

    aois = spark.createDataFrame(
        [
            ("u1", 0, "Farm A", 120.5),
            ("u1", 1, "Farm B", 30.0),
            ("u2", 0, "Lot C", 999.9),
        ],
        "url string, feature_index long, name string, area_ha double",
    )
    trend = spark.createDataFrame(
        [("u1", 0, "declining", "sparse_vegetation"), ("u1", 1, "stable", "healthy_vegetation")],
        "url string, feature_index long, direction string, health_class string",
    )
    chg = spark.createDataFrame(
        [("u1", 0, "Declining")], "url string, feature_index long, trajectory string"
    )
    det = spark.createDataFrame(
        [
            ("u1", 0, False, "high", "Vegetation loss 12.0% (5.0 ha) in Summer 2022 -> 2023|Overall NDVI trajectory is declining"),
            ("u1", 1, True, "medium", ""),
            ("u2", 0, True, "low", ""),
        ],
        "url string, feature_index long, deforestation_free boolean, confidence string, flags string",
    )
    out = {r.url: r for r in eudr_report_pdfs(aois, trend, chg, det).collect()}
    assert set(out) == {"u1", "u2"} and out["u1"].n_parcels == 2
    pdf = bytes(out["u1"].report_pdf)
    assert pdf.startswith(b"%PDF-1.4")
    assert b"(Deforestation-free parcels: 1)" in pdf
    assert b"(Parcels with findings: 1)" in pdf
    assert b"(Farm A)" in pdf and b"(NDVI trend 'declining': 1 parcel\\(s\\))" in pdf
    assert b"Vegetation loss 12.0% \\(5.0 ha\\)" in pdf


def test_report_text_matches_pdf_content(spark):
    """report_text is the report's full logical content: every line of it
    (headers, counters, histogram, table rows, evidence) must appear in the
    rendered PDF, and the text itself is deterministic."""
    from azure_workflow_for_kml_satellite_spark.operators.reports import (
        eudr_report_pdfs,
    )

    aois = spark.createDataFrame(
        [("u1", 0, "Farm A", 12.345), ("u1", 1, None, 7.0)],
        "url string, feature_index long, name string, area_ha double",
    )
    trend = spark.createDataFrame(
        [("u1", 0, "declining", "sparse_vegetation")],
        "url string, feature_index long, direction string, health_class string",
    )
    chg = spark.createDataFrame(
        [("u1", 0, "Declining")], "url string, feature_index long, trajectory string"
    )
    det = spark.createDataFrame(
        [("u1", 0, False, "high", "Overall NDVI trajectory is declining"),
         ("u1", 1, True, "low", "")],
        "url string, feature_index long, deforestation_free boolean, confidence string, flags string",
    )
    rows = eudr_report_pdfs(aois, trend, chg, det).collect()
    assert len(rows) == 1
    r = rows[0]
    text = r.report_text
    pdf = bytes(r.report_pdf)
    assert "Report ID: u1" in text and "Parcels analysed: 2" in text
    assert "NDVI trend 'declining': 1 parcel(s)" in text
    assert "NDVI trend 'unknown': 1 parcel(s)" in text
    assert "parcel | area (ha) | health | trajectory | confidence" in text
    assert "Farm A | 12.3 | sparse_vegetation | Declining | high" in text
    assert "feature 1 | 7.0 | - | - | low" in text
    assert "Determination: FINDINGS PRESENT (confidence: high)" in text
    assert "- Overall NDVI trajectory is declining" in text
    # every non-table text line is rendered into the PDF stream (escaped)
    for line in text.split("\n"):
        if " | " in line:
            continue  # table rows render cell-wise
        probe = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        assert f"({probe})".encode("latin-1", "replace") in pdf, line
    # determinism
    r2 = eudr_report_pdfs(aois, trend, chg, det).collect()[0]
    assert r2.report_text == text and bytes(r2.report_pdf) == pdf


def test_engine_pdf_bytes_match_independent_oracle_renderer():
    """The pdf_md5 gate's foundation: operators/reports._render_report and
    the oracle's independent transcription (oracle/pdfdoc.render_report)
    must produce byte-identical PDF 1.4 streams, including multi-page
    reports, escaping-heavy names, missing areas, and flagless parcels."""
    import random

    from azure_workflow_for_kml_satellite_spark.operators.reports import (
        _render_report,
    )
    from azure_workflow_for_kml_satellite_spark.oracle import pdfdoc

    rng = random.Random(11)
    for n_parcels in (1, 3, 80):  # 80 forces several page breaks
        parcels = []
        for i in range(n_parcels):
            flags = "|".join(
                f"flag {j} (code {j * 7})" for j in range(rng.randint(0, 3))
            )
            parcels.append(
                {
                    "feature_index": i,
                    "name": (
                        f"Parcel (§{i}) \\ test" if i % 7 == 0
                        else (None if i % 11 == 0 else f"P{i}")
                    ),
                    "area_ha": None if i % 13 == 0 else i * 1.37,
                    "direction": rng.choice(["up", "down", None, "stable"]),
                    "health_class": rng.choice(["good", None]),
                    "trajectory": rng.choice(["improving", None]),
                    "deforestation_free": i % 3 != 0,
                    "confidence": rng.choice(["low", "medium", "high"]),
                    "flags": flags,
                }
            )
        engine_pdf, _txt = _render_report("https://example.org/x", parcels)

        sp = sorted(parcels, key=lambda p: p["feature_index"])
        free = sum(1 for p in sp if p["deforestation_free"])
        tc: dict = {}
        for p in sp:
            d = p["direction"] or "unknown"
            tc[d] = tc.get(d, 0) + 1
        head = [
            "EUDR Due-Diligence Report",
            "Report ID: https://example.org/x",
            f"Parcels analysed: {len(sp)}",
            "EUDR Compliance Summary",
            "EUDR cutoff date: 31 December 2020",
            f"Deforestation-free parcels: {free}",
            f"Parcels with findings: {len(sp) - free}",
            "Vegetation Analysis",
        ]
        trend = [f"NDVI trend '{d}': {tc[d]} parcel(s)" for d in sorted(tc)]
        cells = [
            [
                str(p["name"] or f"feature {p['feature_index']}"),
                ("%.1f" % p["area_ha"]) if p["area_ha"] is not None else "-",
                str(p["health_class"] or "-"),
                str(p["trajectory"] or "-"),
                str(p["confidence"] or "-"),
            ]
            for p in sp
        ]
        blocks = []
        for p in sp:
            label = str(p["name"] or f"feature {p['feature_index']}")
            word = (
                "DEFORESTATION-FREE" if p["deforestation_free"] else "FINDINGS PRESENT"
            )
            fls = [f"- {f}" for f in (p["flags"] or "").split("|") if f]
            blocks.append(
                (label, f"Determination: {word} (confidence: {p['confidence']})", fls)
            )
        oracle_pdf = pdfdoc.render_report(
            head,
            trend,
            ["parcel", "area (ha)", "health", "trajectory", "confidence"],
            cells,
            blocks,
        )
        assert engine_pdf == oracle_pdf
