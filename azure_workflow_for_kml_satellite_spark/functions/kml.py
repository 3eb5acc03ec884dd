"""KML / KMZ parsing kernels (SURVEY.md §2.1 S1-S6).

Replicates the reference's canonical lxml parser semantics
(reference: treesight/parsers/lxml_parser.py) using the stdlib
``xml.etree.ElementTree`` (lxml is not installed in this environment; the
element-tree API surface used — iter/find/findall with namespaced tags — is
identical, so parse output is the same).

Runs inside Arrow-batched pandas UDFs on executors; no Spark imports here.
"""

from __future__ import annotations

import re
import zipfile
from io import BytesIO
from xml.etree import ElementTree

from azure_workflow_for_kml_satellite_spark.constants import (
    MAX_KMZ_COMPRESSION_RATIO,
    MAX_KMZ_DECOMPRESSED_BYTES,
    MAX_KMZ_FILE_COUNT,
)
from azure_workflow_for_kml_satellite_spark.functions.geometry import ensure_closed

KML_NS = "{http://www.opengis.net/kml/2.2}"

_ZIP_MAGIC = b"PK\x03\x04"

_KML_NAMESPACES = {
    "http://www.opengis.net/kml/2.2",
    "http://earth.google.com/kml/2.2",
    "http://earth.google.com/kml/2.1",
    "http://earth.google.com/kml/2.0",
}

_DOCTYPE_RE = re.compile(rb"<!DOCTYPE", re.IGNORECASE)


def maybe_unzip(data: bytes) -> bytes:
    """KMZ → extract doc.kml (or first *.kml) with zip-bomb guards
    (reference: parsers/__init__.py:37-82)."""
    if not data.startswith(_ZIP_MAGIC):
        return data
    with zipfile.ZipFile(BytesIO(data)) as zf:
        entries = zf.infolist()
        if len(entries) > MAX_KMZ_FILE_COUNT:
            raise ValueError(f"KMZ file count {len(entries)} exceeds limit of {MAX_KMZ_FILE_COUNT}")
        for info in entries:
            if info.file_size > MAX_KMZ_DECOMPRESSED_BYTES:
                raise ValueError(
                    f"Decompressed size of '{info.filename}' ({info.file_size:,} bytes) "
                    f"exceeds limit of {MAX_KMZ_DECOMPRESSED_BYTES:,} bytes"
                )
            if info.compress_size > 0:
                ratio = info.file_size / info.compress_size
                if ratio > MAX_KMZ_COMPRESSION_RATIO:
                    raise ValueError(
                        f"Compression ratio of '{info.filename}' ({ratio:.0f}:1) "
                        f"exceeds limit of {MAX_KMZ_COMPRESSION_RATIO}:1"
                    )
        if "doc.kml" in zf.namelist():
            return zf.read("doc.kml")
        for name in zf.namelist():
            if name.lower().endswith(".kml"):
                return zf.read(name)
    raise ValueError("KMZ archive contains no .kml file")


def validate_kml_bytes(data: bytes) -> None:
    """Structural safety checks: no DOCTYPE, well-formed XML, KML namespace
    (reference: parsers/__init__.py:88-114)."""
    if _DOCTYPE_RE.search(data[:4096]):
        raise ValueError(
            "KML contains a DOCTYPE declaration — DTD/entity declarations are not permitted"
        )
    try:
        root = ElementTree.fromstring(data)
    except ElementTree.ParseError as exc:
        raise ValueError(f"Malformed XML: {exc}") from exc
    tag = root.tag
    ns = tag[1:].split("}", 1)[0] if tag.startswith("{") else ""
    if ns not in _KML_NAMESPACES:
        raise ValueError(f"Root element namespace '{ns}' is not a recognised KML namespace")


def _parse_coordinates(text: str) -> list[list[float]]:
    """KML coordinate string → [lon, lat] pairs; altitude dropped
    (reference: lxml_parser.py:76-87)."""
    coords: list[list[float]] = []
    for token in text.strip().split():
        parts = token.strip().split(",")
        if len(parts) >= 2:
            try:
                lon, lat = float(parts[0]), float(parts[1])
                coords.append([lon, lat])
            except ValueError:
                continue
    return coords


def _parse_polygon(polygon) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Exterior + interior rings from a KML <Polygon>
    (reference: lxml_parser.py:54-73)."""
    exterior: list[list[float]] = []
    interior: list[list[list[float]]] = []
    outer = polygon.find(f"{KML_NS}outerBoundaryIs/{KML_NS}LinearRing/{KML_NS}coordinates")
    if outer is not None and outer.text:
        exterior = _parse_coordinates(outer.text)
    for inner_elem in polygon.findall(
        f"{KML_NS}innerBoundaryIs/{KML_NS}LinearRing/{KML_NS}coordinates"
    ):
        if inner_elem.text:
            ring = _parse_coordinates(inner_elem.text)
            if ring:
                interior.append(ring)
    return exterior, interior


def _parse_extended_data(placemark) -> dict[str, str]:
    """ExtendedData key/value map (reference: lxml_parser.py:90-101)."""
    metadata: dict[str, str] = {}
    ext = placemark.find(f"{KML_NS}ExtendedData")
    if ext is None:
        return metadata
    for data in ext.findall(f"{KML_NS}Data"):
        key = data.get("name", "")
        val_elem = data.find(f"{KML_NS}value")
        if key and val_elem is not None and val_elem.text:
            metadata[key] = val_elem.text
    return metadata


def _text(elem, tag: str) -> str:
    child = elem.find(tag)
    return child.text.strip() if child is not None and child.text else ""


def parse_kml(kml_bytes: bytes, source_file: str = "") -> list[dict]:
    """Parse KML bytes → list of feature dicts, one per polygon.

    Mirrors parse_kml_lxml (reference: lxml_parser.py:17-51): per-Placemark
    name/description/metadata, default name "Unnamed Feature {i}", <3-vertex
    polygons skipped, rings closed, feature_index in document order.
    """
    root = ElementTree.fromstring(kml_bytes)
    features: list[dict] = []
    for placemark in root.iter(f"{KML_NS}Placemark"):
        name = _text(placemark, f"{KML_NS}name") or f"Unnamed Feature {len(features)}"
        description = _text(placemark, f"{KML_NS}description") or ""
        metadata = _parse_extended_data(placemark)
        for polygon in placemark.iter(f"{KML_NS}Polygon"):
            exterior, interior = _parse_polygon(polygon)
            if len(exterior) < 3:
                continue
            exterior = ensure_closed(exterior)
            interior = [ensure_closed(ring) for ring in interior]
            features.append(
                {
                    "name": name,
                    "description": description,
                    "exterior_coords": exterior,
                    "interior_coords": interior,
                    "crs": "EPSG:4326",
                    "metadata": metadata,
                    "source_file": source_file,
                    "feature_index": len(features),
                }
            )
    return features


# ── HTML embedding / extraction ──────────────────────────────────────────────

_KML_BLOCK_RE = re.compile(rb"<kml[\s>].*?</kml>", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def extract_kml_documents(html: bytes) -> list[bytes]:
    """Find embedded KML documents inside a page's html bytes.

    The synthetic pages embed KML either inline (``<kml ...>...</kml>``) or as
    a base64 KMZ payload inside ``<script type="application/vnd.kmz">``.
    """
    import base64

    docs = [m.group(0) for m in _KML_BLOCK_RE.finditer(html)]
    for m in re.finditer(
        rb'<script type="application/vnd\.kmz">(.*?)</script>', html, re.DOTALL
    ):
        try:
            docs.append(base64.b64decode(m.group(1).strip()))
        except Exception:
            continue
    return docs


def extract_text(html: bytes) -> str:
    """Deterministic visible-text extraction — the byte-identical-per-url
    invariant surface (BASELINE.json input_hint).

    Rule: drop <script>/<style>/<kml> subtrees, strip tags, collapse
    whitespace. Both the page generator and the engine use this one function,
    so text bytes are identical per url by construction, and the invariant is
    enforced by comparing engine output to the generator's stored column.
    """
    s = html.decode("utf-8", errors="replace")
    s = re.sub(r"(?s)<script\b.*?</script>", " ", s)
    s = re.sub(r"(?s)<style\b.*?</style>", " ", s)
    s = re.sub(r"(?s)<kml\b.*?</kml>", " ", s)
    s = _TAG_RE.sub(" ", s)
    s = _WS_RE.sub(" ", s).strip()
    return s
