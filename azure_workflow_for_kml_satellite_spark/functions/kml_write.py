"""KML document generation — the coords→KML converter feature
(SURVEY.md §2.8 G17; reference: treesight/pipeline/eudr.py:57-132).

Pure functions; the Spark surface wraps them in a small mapInPandas when a
whole column of plot lists needs converting.
"""

from __future__ import annotations

import html
import math

from azure_workflow_for_kml_satellite_spark.constants import EARTH_RADIUS_M

_KML_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<kml xmlns="http://www.opengis.net/kml/2.2"><Document><name>{doc_name}</name>'
)
_KML_FOOTER = "</Document></kml>"
_PLACEMARK_POLYGON = (
    "<Placemark><name>{name}</name><Polygon><outerBoundaryIs><LinearRing>"
    "<coordinates>{coordinates}</coordinates>"
    "</LinearRing></outerBoundaryIs></Polygon></Placemark>"
)
_PLACEMARK_POINT_BUFFER = (
    "<Placemark><name>{name}</name>"
    "<description>Point buffer {radius_m} m around ({lon}, {lat})</description>"
    "<Polygon><outerBoundaryIs><LinearRing>"
    "<coordinates>{coordinates}</coordinates>"
    "</LinearRing></outerBoundaryIs></Polygon></Placemark>"
)


def xml_escape(text: str) -> str:
    """reference: eudr.py:130-132."""
    return html.escape(text, quote=True)


def point_buffer(lon: float, lat: float, radius_m: float, segments: int = 32) -> list[list[float]]:
    """Circle ring with pole clamping (reference: eudr.py:107-127)."""
    if radius_m <= 0:
        raise ValueError(f"radius_m must be positive, got {radius_m!r}")
    if segments < 3:
        raise ValueError(f"segments must be >= 3, got {segments!r}")
    lat_r = math.radians(lat)
    pole_epsilon = 1e-6
    max_lat_r = (math.pi / 2) - pole_epsilon
    safe_lat_r = max(min(lat_r, max_lat_r), -max_lat_r)
    cos_safe_lat = math.cos(safe_lat_r)
    ring: list[list[float]] = []
    for i in range(segments + 1):
        angle = 2 * math.pi * i / segments
        dlat = (radius_m / EARTH_RADIUS_M) * math.cos(angle)
        dlon = (radius_m / (EARTH_RADIUS_M * cos_safe_lat)) * math.sin(angle)
        ring.append([lon + math.degrees(dlon), lat + math.degrees(dlat)])
    return ring


def coords_to_kml(
    plots: list[dict],
    doc_name: str = "EUDR Plots",
    buffer_m: float = 100.0,
) -> str:
    """Point/polygon plot dicts → KML string (reference: eudr.py:57-104)."""
    parts = [_KML_HEADER.format(doc_name=xml_escape(doc_name))]
    for plot in plots:
        name = xml_escape(plot.get("name", "Unnamed"))
        if "coordinates" in plot:
            ring = plot["coordinates"]
            if ring and ring[0] != ring[-1]:
                ring = [*list(ring), ring[0]]
            coord_str = " ".join(f"{c[0]},{c[1]},0" for c in ring)
            parts.append(_PLACEMARK_POLYGON.format(name=name, coordinates=coord_str))
        elif "lon" in plot and "lat" in plot:
            lon, lat = float(plot["lon"]), float(plot["lat"])
            radius = float(plot.get("radius_m", buffer_m))
            ring = point_buffer(lon, lat, radius)
            coord_str = " ".join(f"{c[0]:.6f},{c[1]:.6f},0" for c in ring)
            parts.append(
                _PLACEMARK_POINT_BUFFER.format(
                    name=name, radius_m=radius, lon=lon, lat=lat, coordinates=coord_str
                )
            )
    parts.append(_KML_FOOTER)
    return "".join(parts)
