"""Deterministic synthetic data generator (seedless — pure hash of indices).

Builds the engine-specific tables described in FIXTURES.md:

- ``pages``    — Common-Crawl-style rows (url, warc_ts, html, text, lang)
  with a controlled fraction embedding KML/KMZ documents drawn from the
  reference's fixture shape catalog (reference: tests/fixtures/*.kml,
  docs/scale_baseline.md:26-34 for the 200-polygon "monster grid").
- ``scenes``   — STAC-style tile grid mirroring SearchResult
  (reference: treesight/models/imagery.py:67-92).
- ``frames``   — the frame-plan dimension (sources/frames.py).
- ``weather_daily`` / ``protected_areas`` / ``fire_events`` / ``regions`` —
  deterministic external-enrichment lookups (reference: enrichment/weather.py,
  pipeline/eudr.py:142-162, enrichment/fire.py).

Everything is a pure function of row indices (no RNG state), so generation
is order-independent and reproducible; written with pyarrow (no Spark
dependency — the generator is also used by the sequential oracle).
"""

from __future__ import annotations

import base64
import hashlib
import io
import struct
import zipfile
import zlib
from datetime import date, datetime, timedelta
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from azure_workflow_for_kml_satellite_spark.functions.kml import extract_text
from azure_workflow_for_kml_satellite_spark.sources.frames import all_frame_rows

# ── deterministic hashing ───────────────────────────────────────────────────

_MASK = (1 << 64) - 1


def _mix(*parts: int) -> int:
    """splitmix64 over combined integer parts — stable across processes."""
    z = 0x243F6A8885A308D3
    for p in parts:
        z = (z ^ (p & _MASK)) * 0x9E3779B97F4A7C15 & _MASK
    z = (z + 0x9E3779B97F4A7C15) & _MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK
    return (z ^ (z >> 31)) & _MASK


# ── regions ─────────────────────────────────────────────────────────────────

REGIONS = [
    # name, anchor_lon, anchor_lat, half_span_deg
    ("kenya", 36.8, -1.3, 1.5),
    ("amazon", -60.0, -10.0, 1.5),
    ("conus", -100.0, 40.0, 1.5),
    ("europe", 5.0, 48.0, 1.5),
]

_WORDS = (
    "forest canopy satellite polygon boundary vegetation index seasonal "
    "archive crawl page analysis tile raster band cloud scene orbit pixel "
    "parcel survey monitor region data model report metric detect change"
).split()


# ── shape catalog (FIXTURES.md §2) ──────────────────────────────────────────


def _rect(lon: float, lat: float, w: float, h: float) -> list[list[float]]:
    return [
        [lon, lat],
        [lon + w, lat],
        [lon + w, lat + h],
        [lon, lat + h],
        [lon, lat],
    ]


def _coords_str(ring: list[list[float]]) -> str:
    return " ".join(f"{c[0]:.6f},{c[1]:.6f},0" for c in ring)


def _placemark(
    name: str,
    exterior: list[list[float]],
    holes: list[list[list[float]]] | None = None,
    metadata: dict[str, str] | None = None,
    extra_polygons: list[list[list[float]]] | None = None,
) -> str:
    ext_xml = ""
    if metadata:
        data = "".join(
            f"<Data name=\"{k}\"><value>{v}</value></Data>" for k, v in metadata.items()
        )
        ext_xml = f"<ExtendedData>{data}</ExtendedData>"
    polys = [(exterior, holes or [])]
    for p in extra_polygons or []:
        polys.append((p, []))
    poly_xml = ""
    for ext, hs in polys:
        inner = "".join(
            "<innerBoundaryIs><LinearRing><coordinates>"
            + _coords_str(h)
            + "</coordinates></LinearRing></innerBoundaryIs>"
            for h in hs
        )
        poly_xml += (
            "<Polygon><outerBoundaryIs><LinearRing><coordinates>"
            + _coords_str(ext)
            + "</coordinates></LinearRing></outerBoundaryIs>"
            + inner
            + "</Polygon>"
        )
    if len(polys) > 1:
        poly_xml = f"<MultiGeometry>{poly_xml}</MultiGeometry>"
    return f"<Placemark><name>{name}</name>{ext_xml}{poly_xml}</Placemark>"


def _kml_doc(placemarks: list[str]) -> str:
    return (
        '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>'
        + "".join(placemarks)
        + "</Document></kml>"
    )


def _region_for(i: int) -> tuple[str, float, float, float]:
    return REGIONS[_mix(i, 11) % len(REGIONS)]


def _anchor(i: int) -> tuple[float, float]:
    """Deterministic anchor point inside the page's region (±1.2°)."""
    name, lon, lat, half = _region_for(i)
    dx = ((_mix(i, 13) % 2400) / 1000.0) - 1.2
    dy = ((_mix(i, 17) % 2400) / 1000.0) - 1.2
    return round(lon + dx, 4), round(lat + dy, 4)


_KIND_TABLE: list[tuple[str, int]] = [
    ("none", 25),
    ("rect", 20),
    ("two_placemarks", 8),
    ("multi_polygon", 5),
    ("hole", 5),
    ("concave", 5),
    ("triangle", 5),
    ("tiny", 3),
    ("huge", 3),
    ("duplicate_names", 3),
    ("five_grid", 5),
    ("kmz_rect", 5),
    ("adjacent", 3),
    ("degenerate", 2),
    ("invalid_xml", 2),
]
_KIND_TOTAL = sum(w for _, w in _KIND_TABLE)


def page_kind(i: int) -> str:
    """Shape kind for page i. Every 500th-ish page is the 200-polygon monster
    grid (the hot-cell skew driver, docs/scale_baseline.md:26-34)."""
    if i % 500 == 7:
        return "monster"
    if i % 1000 == 13:
        return "mega"
    h = _mix(i, 23) % _KIND_TOTAL
    acc = 0
    for kind, w in _KIND_TABLE:
        acc += w
        if h < acc:
            return kind
    return "none"


def _monster_grid(lon0: float, lat0: float, n: int = 200) -> list[str]:
    """200 2x2km squares on a 0.05-degree grid (docs/scale_baseline.md:26-34),
    anchored at the amazon region like the reference fixture (-60, -10)."""
    side = 0.018  # ~2 km
    pms = []
    for k in range(n):
        r, c = divmod(k, 20)
        ring = _rect(lon0 + c * 0.05, lat0 + r * 0.05, side, side)
        pms.append(_placemark(f"Monster {k}", ring))
    return pms


def build_kml_for_page(i: int) -> tuple[str | None, bytes | None]:
    """Return (inline_kml, kmz_bytes) for page i; both None when no geometry."""
    kind = page_kind(i)
    lon, lat = _anchor(i)
    s = 0.01  # ~1.1 km square → golden area band 50-200 ha (test_geo.py:58-71)
    if kind == "none":
        return None, None
    if kind == "rect":
        meta = {"crop": "apple", "variety": "fuji"} if i % 3 == 0 else None
        return _kml_doc([_placemark(f"Field {i}", _rect(lon, lat, s, s), metadata=meta)]), None
    if kind == "two_placemarks":
        return (
            _kml_doc(
                [
                    _placemark(f"North {i}", _rect(lon, lat + 0.02, s, s)),
                    _placemark(f"South {i}", _rect(lon, lat, s, s)),
                ]
            ),
            None,
        )
    if kind == "multi_polygon":
        return (
            _kml_doc(
                [
                    _placemark(
                        f"Multi {i}",
                        _rect(lon, lat, s, s),
                        extra_polygons=[_rect(lon + 0.03, lat, s, s)],
                    )
                ]
            ),
            None,
        )
    if kind == "hole":
        hole = _rect(lon + 0.003, lat + 0.003, 0.004, 0.004)
        return _kml_doc([_placemark(f"Donut {i}", _rect(lon, lat, s, s), holes=[hole])]), None
    if kind == "concave":
        ring = [
            [lon, lat],
            [lon + s, lat],
            [lon + s, lat + s / 2],
            [lon + s / 2, lat + s / 2],
            [lon + s / 2, lat + s],
            [lon, lat + s],
            [lon, lat],
        ]
        return _kml_doc([_placemark(f"Lshape {i}", ring)]), None
    if kind == "triangle":
        ring = [[lon, lat], [lon + s, lat], [lon + s / 2, lat + s], [lon, lat]]
        return _kml_doc([_placemark(f"Tri {i}", ring)]), None
    if kind == "tiny":
        return _kml_doc([_placemark(f"Tiny {i}", _rect(lon, lat, 0.0002, 0.0002))]), None
    if kind == "huge":
        # ~11 km square → ~12 000 ha: above the 10 000 ha area-warning
        # threshold (reference: constants.py:28).
        return _kml_doc([_placemark(f"Huge {i}", _rect(lon, lat, 0.1, 0.1))]), None
    if kind == "mega":
        # ~28 km square → ~77 000 ha: above the 50 000 ha batch-routing
        # threshold (reference: constants.py:29, batch.py:28-30). Rare (1 per
        # 1000 pages) because its NDVI windows are ~8M pixels.
        return _kml_doc([_placemark(f"Mega {i}", _rect(lon, lat, 0.25, 0.25))]), None
    if kind == "duplicate_names":
        return (
            _kml_doc(
                [
                    _placemark("Duplicate", _rect(lon, lat, s, s)),
                    _placemark("Duplicate", _rect(lon + 0.05, lat, s, s)),
                ]
            ),
            None,
        )
    if kind == "five_grid":
        pms = [
            _placemark(f"Grid {i}-{k}", _rect(lon + (k % 3) * 0.02, lat + (k // 3) * 0.02, s, s))
            for k in range(5)
        ]
        return _kml_doc(pms), None
    if kind == "kmz_rect":
        kml = _kml_doc([_placemark(f"Zipped {i}", _rect(lon, lat, s, s))])
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("doc.kml", kml)
        return None, buf.getvalue()
    if kind == "adjacent":
        return (
            _kml_doc(
                [
                    _placemark(f"West {i}", _rect(lon, lat, s, s)),
                    _placemark(f"East {i}", _rect(lon + s, lat, s, s)),
                ]
            ),
            None,
        )
    if kind == "degenerate":
        # 2-vertex "polygon" → parser must skip it (lxml_parser.py:33-35),
        # plus one valid triangle so the page still yields a feature.
        bad = "<Placemark><name>Bad</name><Polygon><outerBoundaryIs><LinearRing>" \
            f"<coordinates>{lon:.6f},{lat:.6f},0 {lon + s:.6f},{lat:.6f},0</coordinates>" \
            "</LinearRing></outerBoundaryIs></Polygon></Placemark>"
        good = _placemark(f"Good {i}", [[lon, lat], [lon + s, lat], [lon, lat + s], [lon, lat]])
        return _kml_doc([bad, good]), None
    if kind == "invalid_xml":
        return "<kml xmlns=\"http://www.opengis.net/kml/2.2\"><Document><unclosed></kml>", None
    if kind == "monster":
        _, rlon, rlat, _half = REGIONS[1]
        return _kml_doc(_monster_grid(rlon, rlat)), None
    raise AssertionError(kind)


# ── pages table ─────────────────────────────────────────────────────────────


def _lorem(i: int, n: int) -> str:
    return " ".join(_WORDS[_mix(i, 31, k) % len(_WORDS)] for k in range(n))


_LANGS = ["en", "en", "en", "en", "en", "en", "en", "es", "de", "fr"]


def build_page(i: int) -> dict:
    url = f"https://example.org/page/{i:07d}"
    ts = datetime(2018, 1, 1) + timedelta(
        days=int(_mix(i, 37) % (8 * 365)), seconds=int(_mix(i, 41) % 86400)
    )
    kml, kmz = build_kml_for_page(i)
    body = f"<h1>Survey page {i}</h1><p>{_lorem(i, 24)}</p>"
    embedded = ""
    if kml is not None:
        embedded = kml
    if kmz is not None:
        embedded = (
            '<script type="application/vnd.kmz">'
            + base64.b64encode(kmz).decode("ascii")
            + "</script>"
        )
    html = (
        f"<html><head><title>Page {i}</title><style>p{{margin:0}}</style></head>"
        f"<body>{body}{embedded}<p>{_lorem(i + 1, 12)}</p></body></html>"
    ).encode("utf-8")
    return {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": extract_text(html),
        "lang": _LANGS[_mix(i, 43) % 10],
    }


def write_pages(out_dir: str | Path, n_pages: int) -> Path:
    rows = [build_page(i) for i in range(n_pages)]
    table = pa.table(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        }
    )
    out = Path(out_dir) / "pages.parquet"
    # small row groups so Spark can split the file into parallel scan tasks
    pq.write_table(table, out, row_group_size=1024)
    return out


# ── scenes table ────────────────────────────────────────────────────────────

TILE_DEG = 0.5
COLLECTION_RES_M = {"sentinel-2-l2a": 10.0, "landsat-c2-l2": 30.0, "naip": 1.0}


def _region_tiles() -> list[tuple[float, float]]:
    """Lower-left corners of 0.5-degree tiles covering every region box,
    snapped to the global tile grid so tiles are unique."""
    seen: set[tuple[float, float]] = set()
    for _name, lon, lat, half in REGIONS:
        x0 = (lon - half) // TILE_DEG * TILE_DEG
        y0 = (lat - half) // TILE_DEG * TILE_DEG
        x = x0
        while x < lon + half:
            y = y0
            while y < lat + half:
                seen.add((round(x, 4), round(y, 4)))
                y = round(y + TILE_DEG, 4)
            x = round(x + TILE_DEG, 4)
    return sorted(seen)


def build_scene_rows() -> list[dict]:
    """One scene per (collection, tile, month-in-range); NAIP only on CONUS
    summers, no cloud property (reference: planetary_computer.py:51-52)."""
    tiles = _region_tiles()
    rows: list[dict] = []

    def _add(collection: str, x: float, y: float, year: int, month: int):
        tx, ty = int(round(x / TILE_DEG)), int(round(y / TILE_DEG))
        scene_id = f"{collection}_{tx}_{ty}_{year}{month:02d}"
        h = _mix(zlib.crc32(scene_id.encode()), 53)
        day = 1 + h % 28
        dt = datetime(year, month, day, h % 24, (h >> 8) % 60)
        cloud = None if collection == "naip" else ((h >> 16) % 100000) / 1000.0
        rows.append(
            {
                "scene_id": scene_id,
                "collection": collection,
                "datetime": dt,
                "cloud_cover": cloud,
                "resolution_m": COLLECTION_RES_M[collection],
                "crs": "EPSG:4326",
                "min_lon": x,
                "min_lat": y,
                "max_lon": round(x + TILE_DEG, 4),
                "max_lat": round(y + TILE_DEG, 4),
            }
        )

    conus = REGIONS[2]
    for x, y in tiles:
        for year in range(2018, 2027):
            for month in range(1, 13):
                if (year, month) > (2026, 8):
                    continue
                _add("sentinel-2-l2a", x, y, year, month)
        for year in range(2012, 2018):
            for month in range(1, 13):
                _add("landsat-c2-l2", x, y, year, month)
        in_conus = (
            conus[1] - conus[3] <= x <= conus[1] + conus[3]
            and conus[2] - conus[3] <= y <= conus[2] + conus[3]
        )
        if in_conus:
            for year in (2012, 2014, 2016, 2018, 2020, 2022, 2024):
                _add("naip", x, y, year, 7)
    return rows


def write_scenes(out_dir: str | Path) -> Path:
    rows = build_scene_rows()
    table = pa.table(
        {
            "scene_id": [r["scene_id"] for r in rows],
            "collection": [r["collection"] for r in rows],
            "datetime": pa.array([r["datetime"] for r in rows], pa.timestamp("us")),
            "cloud_cover": pa.array([r["cloud_cover"] for r in rows], pa.float64()),
            "resolution_m": [r["resolution_m"] for r in rows],
            "crs": [r["crs"] for r in rows],
            "min_lon": [r["min_lon"] for r in rows],
            "min_lat": [r["min_lat"] for r in rows],
            "max_lon": [r["max_lon"] for r in rows],
            "max_lat": [r["max_lat"] for r in rows],
        }
    )
    out = Path(out_dir) / "scenes.parquet"
    pq.write_table(table, out)
    return out


# ── dimension tables ────────────────────────────────────────────────────────


def write_frames(out_dir: str | Path) -> Path:
    rows = all_frame_rows()
    cols = {
        k: [r[k] for r in rows]
        for k in (
            "frame_id",
            "naip_variant",
            "year",
            "season",
            "start",
            "end",
            "collection",
            "asset",
            "is_naip",
            "ndvi_collection",
            "max_cloud",
        )
    }
    out = Path(out_dir) / "frames.parquet"
    pq.write_table(pa.table(cols), out)
    return out


def write_regions(out_dir: str | Path) -> Path:
    out = Path(out_dir) / "regions.parquet"
    pq.write_table(
        pa.table(
            {
                "region": [r[0] for r in REGIONS],
                "anchor_lon": [r[1] for r in REGIONS],
                "anchor_lat": [r[2] for r in REGIONS],
                "min_lon": [r[1] - r[3] for r in REGIONS],
                "min_lat": [r[2] - r[3] for r in REGIONS],
                "max_lon": [r[1] + r[3] for r in REGIONS],
                "max_lat": [r[2] + r[3] for r in REGIONS],
            }
        ),
        out,
    )
    return out


def write_weather(out_dir: str | Path) -> Path:
    """Open-Meteo-shaped daily rows per region with null gaps
    (reference: enrichment/weather.py:36-44; nulls per aoi_metrics.py:212-213)."""
    names, dates, temps, precips = [], [], [], []
    d0 = date(2013, 1, 1)
    n_days = (date(2026, 8, 31) - d0).days + 1
    for ridx, (name, _lon, lat, _half) in enumerate(REGIONS):
        for k in range(n_days):
            d = d0 + timedelta(days=k)
            h = _mix(ridx, k, 61)
            doy = d.timetuple().tm_yday
            seasonal = 15.0 - abs(doy - 182) / 182.0 * 20.0  # warm mid-year
            if lat < 0:
                seasonal = -seasonal
            temp = None if h % 37 == 0 else round(10.0 + seasonal + (h % 100) / 10.0, 1)
            p_h = _mix(ridx, k, 67)
            precip = (
                None
                if p_h % 41 == 0
                else (0.0 if p_h % 10 < 4 else round((p_h % 250) / 10.0, 1))
            )
            names.append(name)
            dates.append(d)
            temps.append(temp)
            precips.append(precip)
    out = Path(out_dir) / "weather_daily.parquet"
    pq.write_table(
        pa.table(
            {
                "region": names,
                "date": pa.array(dates, pa.date32()),
                "temp_c": pa.array(temps, pa.float64()),
                "precip_mm": pa.array(precips, pa.float64()),
            }
        ),
        out,
    )
    return out


def write_protected_areas(out_dir: str | Path) -> Path:
    """WDPA-like polygons, two per region (reference: eudr.py:142-162)."""
    rows = []
    for ridx, (name, lon, lat, _half) in enumerate(REGIONS):
        for k in range(2):
            w = 0.4 + 0.2 * k
            x0 = lon - 0.8 + k * 0.9
            y0 = lat - 0.5 + k * 0.4
            ring = _rect(x0, y0, w, w)
            rows.append(
                {
                    "wdpa_id": ridx * 10 + k,
                    "name": f"{name.title()} Reserve {k}",
                    "designation": "National Park" if k == 0 else "Nature Reserve",
                    "iucn_category": "II" if k == 0 else "IV",
                    "status": "Designated",
                    "country": name.upper()[:3],
                    "exterior": ring,
                    "min_lon": min(c[0] for c in ring),
                    "min_lat": min(c[1] for c in ring),
                    "max_lon": max(c[0] for c in ring),
                    "max_lat": max(c[1] for c in ring),
                }
            )
    out = Path(out_dir) / "protected_areas.parquet"
    pq.write_table(
        pa.table(
            {
                "wdpa_id": [r["wdpa_id"] for r in rows],
                "name": [r["name"] for r in rows],
                "designation": [r["designation"] for r in rows],
                "iucn_category": [r["iucn_category"] for r in rows],
                "status": [r["status"] for r in rows],
                "country": [r["country"] for r in rows],
                "exterior": pa.array(
                    [r["exterior"] for r in rows], pa.list_(pa.list_(pa.float64()))
                ),
                "min_lon": [r["min_lon"] for r in rows],
                "min_lat": [r["min_lat"] for r in rows],
                "max_lon": [r["max_lon"] for r in rows],
                "max_lat": [r["max_lat"] for r in rows],
            }
        ),
        out,
    )
    return out


def write_fire_events(out_dir: str | Path) -> Path:
    """FIRMS-shaped rows (reference: enrichment/fire.py:96-107)."""
    rows = []
    conf = ["l", "n", "h"]
    for ridx, (name, lon, lat, half) in enumerate(REGIONS):
        for k in range(80):
            h = _mix(ridx, k, 71)
            rows.append(
                {
                    "latitude": round(lat - half + (h % 3000) / 1000.0, 5),
                    "longitude": round(lon - half + ((h >> 12) % 3000) / 1000.0, 5),
                    "acq_date": (date(2021, 1, 1) + timedelta(days=(h >> 24) % 1400)).isoformat(),
                    "acq_time": f"{(h >> 40) % 24:02d}{(h >> 48) % 60:02d}",
                    "confidence": conf[h % 3],
                    "frp": round((h % 5000) / 100.0, 2),
                    "bright_ti4": round(300.0 + (h % 700) / 10.0, 1),
                    "region": name,
                }
            )
    out = Path(out_dir) / "fire_events.parquet"
    pq.write_table(pa.table({k: [r[k] for r in rows] for k in rows[0]}), out)
    return out


def write_flood_gauges(out_dir: str | Path) -> Path:
    """EA/USGS-shaped river gauges (reference: flood.py:35-163): UK gauges
    near the europe region edge + US gauges near conus. A synthetic UK
    cluster is added at (-2.0, 52.0) so the EA routing path has data."""
    rows = []
    anchors = [("usgs", -100.0, 40.0, 3.0, 60), ("ea", -2.0, 52.0, 2.0, 40)]
    for src, lon, lat, half, n in anchors:
        for k in range(n):
            h = _mix(zlib.crc32(src.encode()), k, 83)
            rows.append(
                {
                    "station_id": f"{src}-{k:04d}",
                    "source": src,
                    "longitude": round(lon - half + (h % int(half * 2000)) / 1000.0, 5),
                    "latitude": round(lat - half + ((h >> 16) % int(half * 2000)) / 1000.0, 5),
                    "river": f"River {chr(65 + h % 26)}",
                    "level_m": round((h % 900) / 100.0, 2),
                }
            )
    out = Path(out_dir) / "flood_gauges.parquet"
    pq.write_table(pa.table({k: [r[k] for r in rows] for k in rows[0]}), out)
    return out


def write_utm_scenes(out_dir: str | Path) -> Path:
    """UTM-grid dimension for the sentinel scenes: each scene's native
    projected grid (the reference's scenes carry a 'proj:epsg' and every
    windowed read happens on that UTM grid after the AOI bbox is
    transformed into it, fulfilment.py:264-271). The projected bbox is the
    min/max of the four transformed tile corners, snapped OUTWARD to whole
    10 m pixels so the grid origin is an exact pixel boundary."""
    import math as _m

    from azure_workflow_for_kml_satellite_spark.functions import tmerc

    rows = []
    for r in build_scene_rows():
        if r["collection"] != "sentinel-2-l2a":
            continue
        clon = (r["min_lon"] + r["max_lon"]) / 2.0
        clat = (r["min_lat"] + r["max_lat"]) / 2.0
        epsg = tmerc.utm_epsg_for(clon, clat)
        zone, north = tmerc.parse_utm_epsg(epsg)
        corners = [
            (r["min_lon"], r["min_lat"]),
            (r["min_lon"], r["max_lat"]),
            (r["max_lon"], r["min_lat"]),
            (r["max_lon"], r["max_lat"]),
        ]
        pts = [tmerc.utm_forward(lo, la, zone, north) for lo, la in corners]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        rows.append(
            {
                "scene_id": r["scene_id"],
                "epsg": epsg,
                "u_min_e": _m.floor(min(xs) / 10.0) * 10.0,
                "u_min_n": _m.floor(min(ys) / 10.0) * 10.0,
                "u_max_e": _m.ceil(max(xs) / 10.0) * 10.0,
                "u_max_n": _m.ceil(max(ys) / 10.0) * 10.0,
                "u_res_m": 10.0,
            }
        )
    out = Path(out_dir) / "utm_scenes.parquet"
    pq.write_table(pa.table({k: [r[k] for r in rows] for k in rows[0]}), out)
    return out


def write_coord_requests(out_dir: str | Path) -> Path:
    """Pasted-coordinate requests (reference EP2 input shape,
    coordinate_parser.py): single points, point pairs, polygons, and the
    parser's documented error classes — deterministic, no rng."""
    rows = []
    for i in range(40):
        h = _mix(97, i, 11)
        lat = round(-80.0 + (h % 160000) / 1000.0, 6)
        lon = round(-179.0 + ((h >> 13) % 358000) / 1000.0, 6)
        kind = i % 8
        if kind in (0, 1, 2):  # single point
            text = f"{lat}, {lon}"
        elif kind == 3:  # two points, mixed separators
            text = f"{lat};{lon}\n{round(lat + 0.01, 6)}\t{round(lon + 0.02, 6)}"
        elif kind == 4:  # polygon with comments + blank lines
            pts = [
                (round(lat + dy, 6), round(lon + dx, 6))
                for dy, dx in ((0, 0), (0.03, 0.0), (0.03, 0.04), (0.0, 0.04))
            ]
            text = "# boundary\n" + "\n".join(f"{a}, {b}" for a, b in pts) + "\n"
        elif kind == 5:  # latitude out of range
            text = f"{91.0 + i}, {lon}"
        elif kind == 6:  # unparseable line
            text = f"{lat}, {lon}\nnot coordinates at all"
        else:  # longitude out of range
            text = f"{lat}, {181.5}"
        rows.append({"source": f"req{i:03d}", "coords_text": text})
    rows.append({"source": "req_empty", "coords_text": "   \n# only comments\n"})
    rows.append(
        {
            "source": "req_too_many",
            "coords_text": "\n".join("1.0, 2.0" for _ in range(501)),
        }
    )
    out = Path(out_dir) / "coord_requests.parquet"
    pq.write_table(pa.table({k: [r[k] for r in rows] for k in rows[0]}), out)
    return out


def write_csv_points(out_dir: str | Path) -> Path:
    """CSV-shaped point rows for the S6 fuzzy-column parser: headers that
    exercise case-insensitive + prefix matching ('Label'/'LATITUDE'/'lng'),
    nulls (name fallback + unparseable coordinate), and range errors."""
    rows = []
    for i in range(25):
        h = _mix(131, i, 7)
        lat = round(-80.0 + (h % 160000) / 1000.0, 6)
        lon = round(-179.0 + ((h >> 13) % 358000) / 1000.0, 6)
        label = f"site-{i:02d}" if i % 5 else None  # null name → fallback
        if i % 9 == 4:
            lat = 95.0 + i  # out of range → per-row error
        rows.append({"Label": label, "LATITUDE": lat, "lng": lon})
    rows.append({"Label": "null-lat", "LATITUDE": None, "lng": 10.0})
    out = Path(out_dir) / "csv_points.parquet"
    pq.write_table(
        pa.table(
            {
                "Label": pa.array([r["Label"] for r in rows], pa.string()),
                "LATITUDE": pa.array([r["LATITUDE"] for r in rows], pa.float64()),
                "lng": pa.array([r["lng"] for r in rows], pa.float64()),
            }
        ),
        out,
    )
    return out


# ── images (training-data thumbnail / multimodal assets) ────────────────────

IMAGE_COUNT = 48


def _hash_bytes(i: int, n: int) -> bytes:
    """n deterministic bytes for asset i — pure function of indices (blake2b
    counter mode), stable across processes and platforms."""
    out = bytearray()
    block = 0
    while len(out) < n:
        out += hashlib.blake2b(
            struct.pack("<QQ", i, block), digest_size=32
        ).digest()
        block += 1
    return bytes(out[:n])


IMAGE_KINDS = ("png_rgba", "png_rgb", "png_ga", "webp", "gif_anim", "webp_anim")


def image_kind(i: int) -> str:
    return IMAGE_KINDS[i % len(IMAGE_KINDS)]


def _image_dims(i: int) -> tuple[int, int]:
    h = 16 + (_mix(223, i, 5) % 60)  # 16..75 — some below the 32px thumb side
    w = 16 + (_mix(227, i, 3) % 60)
    return h, w


def _gif_anim_parts(i: int, h: int, w: int):
    """Deterministic recipe for animated-GIF asset ``i``: (palette 64x3,
    frame specs for encode_gif_anim). Frame 0 — the one image_metadata /
    image_thumbnails composite — covers the full canvas on even i and an
    inset subrect (transparent margins → RGBA path) on odd i, with a
    transparent index when i%4==1. Frames 1-2 exercise disposal 2
    (restore-background) and 3 (restore-previous) plus transparency."""
    import numpy as np

    pal = np.frombuffer(_hash_bytes(_mix(401, i), 64 * 3), np.uint8).reshape(64, 3)
    variant = _mix(443, i) % 4  # i%6==4 for every gif_anim, so derive the
    # layout from the hash, not from i's (constant) parity
    if variant in (1, 3):
        left, top = 3, 2
        fh, fw = h - 6, w - 5
    else:
        left = top = 0
        fh, fw = h, w
    idx0 = (
        np.frombuffer(_hash_bytes(_mix(409, i), fh * fw), np.uint8).reshape(fh, fw)
        % 64
    )
    frames = [
        {
            "indices": idx0,
            "left": left,
            "top": top,
            "transparent": 7 if variant in (2, 3) else None,
            "disposal": (1, 2, 3)[i % 3],
            "delay_ms": 40,
        },
        {
            "indices": np.frombuffer(
                _hash_bytes(_mix(419, i), (h // 2) * (w // 2)), np.uint8
            ).reshape(h // 2, w // 2)
            % 64,
            "left": 1,
            "top": 1,
            "transparent": 5,
            "disposal": 2,
            "delay_ms": 50,
        },
        {
            "indices": np.frombuffer(
                _hash_bytes(_mix(421, i), (h // 3) * (w // 3)), np.uint8
            ).reshape(h // 3, w // 3)
            % 64,
            "left": 2,
            "top": 0,
            "disposal": 3,
            "delay_ms": 60,
        },
    ]
    return pal, frames


def _webp_anim_frames(i: int, h: int, w: int):
    """Deterministic recipe for animated-WebP asset ``i``:
    [(x, y, dur_ms, flags, rgba)] for the ANMF muxer. Frame 0 overwrites
    the full canvas (so the first-frame composite equals its pixels);
    frames 1-2 exercise alpha-blend and dispose-to-background at offsets."""
    import numpy as np

    f0 = np.frombuffer(_hash_bytes(_mix(431, i), h * w * 4), np.uint8).reshape(
        h, w, 4
    )
    f1 = np.frombuffer(
        _hash_bytes(_mix(433, i), (h // 2) * (w // 2) * 4), np.uint8
    ).reshape(h // 2, w // 2, 4)
    f2 = np.frombuffer(
        _hash_bytes(_mix(439, i), (h // 3) * (w // 3) * 4), np.uint8
    ).reshape(h // 3, w // 3, 4)
    return [
        (0, 0, 40, 0x02, f0),  # overwrite full canvas
        (2, 4, 50, 0x00, f1),  # alpha-blend at (2,4)
        (4, 2, 60, 0x02 | 0x01, f2),  # overwrite, then dispose rect to bg
    ]


def image_pixels(i: int):
    """Source pixels of synthetic image asset ``i`` (uint8 HxWxC; C=4 for
    png_rgba/webp/webp_anim, 3 for png_rgb, 2 for gray+alpha; gif_anim /
    webp_anim yield the FIRST-FRAME COMPOSITE the engine's animation
    decoders must produce). The single source of truth shared by
    ``write_images`` (which encodes them into containers) and the
    sequential oracle (which recomputes expected thumbnails from the same
    pixels WITHOUT the engine's decoders — so the engine's container
    decode, including animation compositing, is part of what the oracle
    checks)."""
    import numpy as np

    kind = image_kind(i)
    h, w = _image_dims(i)
    if kind == "gif_anim":
        pal, frames = _gif_anim_parts(i, h, w)
        f0 = frames[0]
        idx = f0["indices"]
        fh, fw = idx.shape
        canvas = np.zeros((h, w, 4), dtype=np.uint8)
        opaque = (
            np.ones((fh, fw), dtype=bool)
            if f0["transparent"] is None
            else idx != f0["transparent"]
        )
        region = canvas[f0["top"] : f0["top"] + fh, f0["left"] : f0["left"] + fw]
        region[..., :3][opaque] = pal[idx][opaque]
        region[..., 3][opaque] = 255
        if bool((canvas[..., 3] == 255).all()):
            return np.ascontiguousarray(canvas[..., :3])  # decode_gif RGB path
        return canvas
    if kind == "webp_anim":
        return _webp_anim_frames(i, h, w)[0][4]
    c = {"png_rgba": 4, "png_rgb": 3, "png_ga": 2, "webp": 4}[kind]
    noise = np.frombuffer(_hash_bytes(i, h * w * c), dtype=np.uint8).reshape(h, w, c)
    # blend a smooth gradient into channel 0 so thumbnails exercise real
    # bilinear mixing, not just noise averaging
    gy = np.linspace(0.0, 255.0, h)[:, None]
    gx = np.linspace(0.0, 255.0, w)[None, :]
    out = noise.copy()
    out[..., 0] = np.clip(
        np.rint(noise[..., 0] * 0.5 + (gy + gx) * 0.25), 0, 255
    ).astype(np.uint8)
    return out


def _encode_png(arr, color_type: int) -> bytes:
    """Minimal PNG writer for the generator (filter-0 rows, zlib level 6):
    colour types 2 (RGB), 4 (gray+alpha), 6 (RGBA)."""
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _mux_webp_anim(cw: int, ch: int, frames) -> bytes:
    """Animated-WebP container (VP8X + ANIM/ANMF) from RGBA frames, each
    VP8L-encoded. frames: [(x, y, dur_ms, flags, rgba)]; x/y must be even
    (the ANMF header stores them halved)."""
    from azure_workflow_for_kml_satellite_spark.functions.vp8l import (
        encode_webp_lossless,
    )

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            tag
            + len(body).to_bytes(4, "little")
            + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    vp8x = (
        bytes([0x02, 0, 0, 0])
        + (cw - 1).to_bytes(3, "little")
        + (ch - 1).to_bytes(3, "little")
    )
    out = chunk(b"VP8X", vp8x)
    out += chunk(b"ANIM", bytes([0, 0, 0, 0]) + (0).to_bytes(2, "little"))
    for x, y, dur, flags, px in frames:
        still = encode_webp_lossless(px)
        fh, fw = px.shape[:2]
        body = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (fw - 1).to_bytes(3, "little")
            + (fh - 1).to_bytes(3, "little")
            + dur.to_bytes(3, "little")
            + bytes([flags])
            + still[12:]  # strip RIFF....WEBP, keep the image chunks
        )
        out += chunk(b"ANMF", body)
    return b"RIFF" + (4 + len(out)).to_bytes(4, "little") + b"WEBP" + out


def write_images(out_dir: str | Path) -> Path:
    """Deterministic image-asset table (asset_id, payload) across lossless
    containers the engine decodes from scratch (PNG colour types 2/4/6,
    WebP-lossless, animated GIF, animated WebP), plus corrupt payloads for
    the per-row quarantine path."""
    from azure_workflow_for_kml_satellite_spark.functions.gif import encode_gif_anim
    from azure_workflow_for_kml_satellite_spark.functions.vp8l import (
        encode_webp_lossless,
    )

    ids, payloads = [], []
    for i in range(IMAGE_COUNT):
        kind = image_kind(i)
        h, w = _image_dims(i)
        if kind == "webp":
            payload = encode_webp_lossless(image_pixels(i))
        elif kind == "gif_anim":
            pal, frames = _gif_anim_parts(i, h, w)
            payload = encode_gif_anim((w, h), pal, frames)
        elif kind == "webp_anim":
            payload = _mux_webp_anim(w, h, _webp_anim_frames(i, h, w))
        else:
            ct = {"png_rgba": 6, "png_rgb": 2, "png_ga": 4}[kind]
            payload = _encode_png(image_pixels(i), ct)
        ids.append(f"img{i:03d}_{kind}")
        payloads.append(payload)
    ids.append("img_corrupt_png")
    payloads.append(b"\x89PNG\r\n\x1a\n" + _hash_bytes(9001, 40))
    ids.append("img_corrupt_webp")
    payloads.append(b"RIFF\x20\x00\x00\x00WEBPVP8L\x08\x00\x00\x00" + b"\x00" * 8)
    ids.append("img_corrupt_gif")
    payloads.append(b"GIF89a" + _hash_bytes(9002, 40))
    out = Path(out_dir) / "images.parquet"
    pq.write_table(
        pa.table({"asset_id": pa.array(ids, pa.string()), "payload": pa.array(payloads, pa.binary())}),
        out,
    )
    return out


AUDIO_COUNT = 40
AUDIO_KINDS = ("wav16", "flac", "mp3", "ulaw", "vorbis")


def audio_kind(i: int) -> str:
    return AUDIO_KINDS[i % len(AUDIO_KINDS)]


def audio_spec(i: int) -> dict:
    """Deterministic recipe for audio asset ``i``: a pure sine with known
    analytic amplitude/rms — the oracle side of q_audio_metadata derives
    expected timing exactly and rms/peak tolerance bands from this spec,
    independent of any decoder."""
    kind = audio_kind(i)
    if kind == "mp3":
        rate = (44100, 48000, 32000)[_mix(501, i) % 3]
        seconds = 0.5
        # round 7: rotate the mp3 assets through the escape tables
        # (code tables 16/24 with linbits — the real-web Layer III shape)
        # so q_audio_metadata gates the escape decode path; None keeps the
        # round-6 non-escape table for continuity
        tables = (None, 16, 20, 24, 28, 31, 17, 25)
        spec = {"mp3_table": tables[(i // len(AUDIO_KINDS)) % len(tables)]}
    elif kind == "vorbis":
        rate = (44100, 48000, 32000)[_mix(501, i) % 3]
        seconds = 0.25
        spec = {}
    else:
        rate = (8000, 16000, 44100)[_mix(501, i) % 3]
        seconds = 0.25
        spec = {}
    n = int(rate * seconds)
    freq = 200.0 + (_mix(503, i) % 2000)
    # keep the tone away from Nyquist so analytic rms ≈ amp/sqrt(2) holds
    freq = min(freq, rate / 2.5)
    amp = 0.2 + (_mix(509, i) % 60) / 100.0
    spec.update({"kind": kind, "rate": rate, "n": n, "freq": freq, "amp": amp})
    return spec


def audio_samples(i: int):
    import numpy as np

    sp = audio_spec(i)
    t = np.arange(sp["n"], dtype=np.float64)
    return sp["amp"] * np.sin(2.0 * np.pi * sp["freq"] * t / sp["rate"])


def _wav_container(fmt_code: int, channels: int, rate: int, bits: int,
                   body: bytes) -> bytes:
    byte_rate = rate * channels * bits // 8
    fmt = struct.pack("<HHIIHH", fmt_code, channels, rate, byte_rate,
                      max(1, channels * bits // 8), bits)
    riff = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def write_audio(out_dir: str | Path) -> Path:
    """Deterministic audio-asset table (asset_id, payload): PCM16 WAV,
    FLAC, MPEG-1 Layer III, Ogg Vorbis (both round-6 from-scratch
    codecs) and G.711 µ-law WAV sines, plus a corrupt payload for the
    quarantine path."""
    import numpy as np

    from azure_workflow_for_kml_satellite_spark.functions.flac import encode_flac
    from azure_workflow_for_kml_satellite_spark.functions.mp3 import encode_mp3
    from azure_workflow_for_kml_satellite_spark.functions.pcm_codecs import (
        mulaw_encode,
    )
    from azure_workflow_for_kml_satellite_spark.functions.vorbis import (
        encode_vorbis,
    )

    ids, payloads = [], []
    for i in range(AUDIO_COUNT):
        sp = audio_spec(i)
        x = audio_samples(i)
        pcm16 = np.round(x * 32767.0).astype(np.int16)
        if sp["kind"] == "wav16":
            payload = _wav_container(1, 1, sp["rate"], 16, pcm16.tobytes())
        elif sp["kind"] == "flac":
            payload = encode_flac(pcm16.astype(np.int64), rate=sp["rate"])
        elif sp["kind"] == "mp3":
            payload = encode_mp3(x, sp["rate"], table_id=sp["mp3_table"])
        elif sp["kind"] == "vorbis":
            payload = encode_vorbis(x, sp["rate"])
        else:  # ulaw
            payload = _wav_container(7, 1, sp["rate"], 8, mulaw_encode(pcm16))
        ids.append(f"aud{i:03d}_{sp['kind']}")
        payloads.append(payload)
    ids.append("aud_corrupt")
    payloads.append(b"RIFF\x10\x00\x00\x00WAVEjunk" + _hash_bytes(9003, 32))
    out = Path(out_dir) / "audio.parquet"
    pq.write_table(
        pa.table({"asset_id": pa.array(ids, pa.string()),
                  "payload": pa.array(payloads, pa.binary())}),
        out,
    )
    return out


# ── video assets (avc1-in-MP4, round-6 H.264 decode gate) ──────────────────

VIDEO_COUNT = 20  # 0-13 all-IDR intra clips; 14-19 IPP GOPs (P frames)
VIDEO_EVERY_MS = 250  # sampling cadence q_video_frames uses


def video_spec(i: int) -> dict:
    """Deterministic recipe for video asset ``i``: frame geometry/timing
    plus the exact encoder options (functions/h264.encode_h264_frames).
    The oracle side of q_video_frames re-derives expected timing from this
    spec and expected pixel hashes from the ENCODER's reconstruction —
    the from-scratch H.264 *decoder* is never consulted by the oracle, so
    a decode bug (entropy parse, context modeling, prediction, dequant,
    deblock) hash-mismatches at the driver."""
    w = 24 + (_mix(601, i) % 5) * 8  # 24..56 px, even
    h = 16 + (_mix(602, i) % 4) * 10  # 16/26/36/46 px, even
    n_frames = 2 + _mix(603, i) % 3
    delta_ms = 200 + (_mix(604, i) % 3) * 100
    qp = 12 + (_mix(605, i) % 8) * 5  # 12..47
    enc = {"qp": qp, "seed": i}
    if i >= 14:
        # IPP GOPs: IDR + P frames (P_Skip runs, 16x16/16x8/8x16/P_8x8
        # partitions, quarter-pel MVs, intra-in-P), sequential-DPB decode
        enc["gop"] = "ipp"
        n_frames = 5 + _mix(603, i) % 3
        if i % 3 == 1:
            enc["idr_every"] = 3
        elif i % 3 == 2:
            enc["deblock"] = False
        if 16 <= i <= 18:
            # round 7: IPP GOPs under CABAC too — mb_skip_flag, P mb_type
            # tree, sub_mb_type, ref_idx, UEG3 mvd, inter cbf contexts
            enc["entropy"] = "cabac"
    else:
        variant = i % 5
        if variant == 1:
            enc["pcm_every"] = 3
        elif variant == 2:
            enc["n_slices"] = 2
        elif variant == 3:
            enc["deblock"] = False
        elif variant == 4:
            enc["qp_jitter"] = 5
            enc["chroma_qp_off"] = 6 - (_mix(607, i) % 13)
        if 5 <= i <= 9:
            # round 7: one of each intra variant re-encoded with CABAC
            # (entropy_coding_mode_flag=1, I-slice syntax + arithmetic
            # engine of functions/cabac.py; SEI provenance marker in every
            # AU). The oracle recons are entropy-independent, so the
            # decoder must parse the arithmetic stream bit-exactly for the
            # driver hashes to keep matching.
            enc["entropy"] = "cabac"
    return {"w": w, "h": h, "n_frames": n_frames, "delta_ms": delta_ms,
            "blocky": _mix(606, i) % 2 == 1, "enc": enc}


def video_frames(i: int) -> list:
    """Deterministic (y, u, v) source planes per frame: moving gradients,
    optionally hard 8x8 block edges (exercises cbp / deblock paths)."""
    import numpy as np

    sp = video_spec(i)
    h, w = sp["h"], sp["w"]
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for f in range(sp["n_frames"]):
        base = (xx * 3 + yy * 2 + f * 37 + i * 11) % 256
        if sp["blocky"]:
            base = np.where((xx // 8 + yy // 8 + f) % 2 == 0, base, 255 - base)
        y = base.astype(np.uint8)
        u = ((xx[::2, ::2] * 5 + f * 13 + i * 7) % 256).astype(np.uint8)
        v = ((yy[::2, ::2] * 4 + f * 29 + i * 3) % 256).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + tag + body


def mux_avc1_mp4(sps: bytes, pps: bytes, samples: list, width: int,
                 height: int, delta_ms: int, timescale: int = 1000) -> bytes:
    """Minimal conformant ISO-BMFF mux: ftyp + mdat + moov with one video
    trak (stsd avc1+avcC, stts/stsz/stsc/stco), 4-byte NAL lengths."""
    avcc = (bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
            + struct.pack(">H", len(sps)) + sps
            + bytes([1]) + struct.pack(">H", len(pps)) + pps)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomavc1")
    base = len(ftyp) + 8
    offs, sizes = [], []
    off = base
    for s in samples:
        offs.append(off)
        sizes.append(len(s))
        off += len(s)
    mdat = _box(b"mdat", b"".join(samples))
    vse = (b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
           + struct.pack(">HH", width, height)
           + struct.pack(">II", 0x00480000, 0x00480000) + b"\x00" * 4
           + struct.pack(">H", 1) + b"\x00" * 32 + struct.pack(">H", 24)
           + struct.pack(">h", -1))
    avc1 = _box(b"avc1", vse + _box(b"avcC", avcc))
    n = len(samples)
    delta = delta_ms * timescale // 1000
    stbl = _box(
        b"stbl",
        _box(b"stsd", struct.pack(">II", 0, 1) + avc1)
        + _box(b"stts", struct.pack(">II", 0, 1) + struct.pack(">II", n, delta))
        + _box(b"stsz", struct.pack(">III", 0, 0, n)
               + b"".join(struct.pack(">I", s) for s in sizes))
        + _box(b"stsc", struct.pack(">II", 0, 1) + struct.pack(">III", 1, 1, 1))
        + _box(b"stco", struct.pack(">II", 0, n)
               + b"".join(struct.pack(">I", o) for o in offs)),
    )
    mdhd = _box(b"mdhd", struct.pack(">I", 0)
                + struct.pack(">IIIIHH", 0, 0, timescale, n * delta, 0, 0))
    hdlr = _box(b"hdlr", struct.pack(">I", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 12)
    mdia = _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl))
    return ftyp + mdat + _box(b"moov", _box(b"trak", mdia))


# the chain-break asset: an IPP clip whose second sample (a P frame) is
# truncated — frames 1 and 2 must surface per-frame decode errors (the
# decoder refuses to decode P frames against a broken reference chain)
# and decoding must RESUME at the frame-3 IDR. Shared constants so the
# oracle derives the same expectation from the spec alone.
CHAINBREAK_SPEC = {"w": 32, "h": 26, "n_frames": 6, "delta_ms": 300,
                   "enc": {"qp": 30, "seed": 77, "gop": "ipp", "idr_every": 3}}
CHAINBREAK_BROKEN = {1, 2}  # truncated P + the poisoned follower


def chainbreak_frames() -> list:
    import numpy as np

    sp = CHAINBREAK_SPEC
    h, w = sp["h"], sp["w"]
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for f in range(sp["n_frames"]):
        y = ((xx * 5 + yy * 3 + f * 41) % 256).astype(np.uint8)
        frames.append((y, (y[::2, ::2] // 3 + 40).astype(np.uint8),
                       ((yy[::2, ::2] * 7 + f * 19) % 256).astype(np.uint8)))
    return frames


def chainbreak_payload() -> bytes:
    import struct as _struct

    from azure_workflow_for_kml_satellite_spark.functions.h264 import (
        encode_h264_frames,
    )

    sp = CHAINBREAK_SPEC
    enc = encode_h264_frames(chainbreak_frames(), **sp["enc"])
    samples = [
        b"".join(_struct.pack(">I", len(n)) + n for n in nals)
        for nals in enc["samples"]
    ]
    samples[1] = samples[1][: len(samples[1]) // 2]  # truncate the P frame
    return mux_avc1_mp4(enc["sps"], enc["pps"], samples,
                        sp["w"], sp["h"], sp["delta_ms"])


def write_videos(out_dir: str | Path) -> Path:
    """Deterministic video-asset table (asset_id, payload): avc1-in-MP4
    clips encoded by the in-repo conformant all-intra H.264 encoder
    across QP / I_PCM / multi-slice / no-deblock / QP-jitter variants,
    plus a corrupt payload for the quarantine path."""
    import struct as _struct

    from azure_workflow_for_kml_satellite_spark.functions.h264 import (
        encode_h264_frames,
    )

    ids, payloads = [], []
    for i in range(VIDEO_COUNT):
        sp = video_spec(i)
        enc = encode_h264_frames(video_frames(i), **sp["enc"])
        samples = [
            b"".join(_struct.pack(">I", len(n)) + n for n in nals)
            for nals in enc["samples"]
        ]
        payload = mux_avc1_mp4(enc["sps"], enc["pps"], samples,
                               sp["w"], sp["h"], sp["delta_ms"])
        ids.append(f"vid{i:03d}_avc1")
        payloads.append(payload)
    ids.append("vid_chainbreak_avc1")
    payloads.append(chainbreak_payload())
    ids.append("vid_corrupt")
    payloads.append(b"\x00\x00\x00\x20ftypisom" + _hash_bytes(9005, 64))
    out = Path(out_dir) / "videos.parquet"
    pq.write_table(
        pa.table({"asset_id": pa.array(ids, pa.string()),
                  "payload": pa.array(payloads, pa.binary())}),
        out,
    )
    return out


# ── top-level ───────────────────────────────────────────────────────────────

SF_PAGES = {"sf0.001": 300, "sf0.01": 3000, "sf0.1": 30000, "sf1": 300000, "sf10": 3000000}


def generate_sf(data_root: str | Path, sf: str) -> Path:
    out_dir = Path(data_root) / sf
    out_dir.mkdir(parents=True, exist_ok=True)
    write_pages(out_dir, SF_PAGES[sf])
    write_scenes(out_dir)
    write_frames(out_dir)
    write_regions(out_dir)
    write_weather(out_dir)
    write_protected_areas(out_dir)
    write_fire_events(out_dir)
    write_flood_gauges(out_dir)
    write_coord_requests(out_dir)
    write_csv_points(out_dir)
    write_utm_scenes(out_dir)
    write_images(out_dir)
    write_audio(out_dir)
    write_videos(out_dir)
    return out_dir
