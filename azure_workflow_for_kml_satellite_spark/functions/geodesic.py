"""Vendored pure-Python WGS84 ellipsoidal geodesic area/perimeter.

The reference's primary G3 path is pyproj's ``Geod(ellps="WGS84")
.polygon_area_perimeter`` (reference: geo.py:69-83, Karney's GeographicLib
under the hood); this container has no pyproj, so the primary ELLIPSOIDAL
semantics would otherwise never execute here (SURVEY.md §7.4 risk 2). This
module provides them from public algorithms:

- perimeter: Vincenty's inverse formula (Vincenty 1975) — mm-accurate
  geodesic distance for the non-antipodal segments that parcel rings are
  made of (near-antipodal inputs raise; Karney's method converges there,
  but no polygon edge is ever antipodal);
- area: exact equal-area (authalic) mapping — geodetic latitudes map to
  authalic latitudes and the polygon area is evaluated on the authalic
  sphere with the same trapezoid shoelace the spherical fallback uses
  (reference geo.py:127-140). The authalic map preserves REGION area
  exactly; the only approximation is edge shape (a geodesic edge is not
  exactly a great circle on the authalic sphere), which is negligible at
  parcel scale (sub-ppm for km-scale edges).

Validated in tests/test_geodesic.py against closed-form ellipsoid facts
(meridian-arc quadrature, equatorial arcs, parallel-bounded quadrilateral
areas) — not against the engine's spherical fallback.

Production dispatch (functions/geometry.geodesic_area_and_perimeter) is
UNCHANGED: pyproj primary when importable, spherical fallback otherwise —
exactly the reference's documented ImportError behaviour — because the
expected-parquet oracle re-derives that same dispatch independently and a
bit-for-bit second Karney implementation is not a realistic oracle. This
module exists so the primary semantics are band-tested in-container and
available to callers that want ellipsoidal numbers explicitly.
"""

from __future__ import annotations

import math

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1.0 - WGS84_F)
_E2 = WGS84_F * (2.0 - WGS84_F)  # first eccentricity squared
_E = math.sqrt(_E2)

# q(90°): the authalic function at the pole; ellipsoid surface = 2π a² q90
_Q90 = 1.0 + (1.0 - _E2) / _E * math.atanh(_E)
R_AUTHALIC_M = WGS84_A * math.sqrt(_Q90 / 2.0)


def vincenty_distance_m(
    lon1: float, lat1: float, lon2: float, lat2: float,
    tol: float = 1e-12, max_iter: int = 200,
) -> float:
    """Geodesic distance in metres on WGS84 (Vincenty inverse).

    Raises ValueError when the iteration fails to converge (near-antipodal
    pairs — impossible for polygon ring segments).
    """
    if lon1 == lon2 and lat1 == lat2:
        return 0.0
    u1 = math.atan((1.0 - WGS84_F) * math.tan(math.radians(lat1)))
    u2 = math.atan((1.0 - WGS84_F) * math.tan(math.radians(lat2)))
    ell = math.radians(lon2 - lon1)
    su1, cu1 = math.sin(u1), math.cos(u1)
    su2, cu2 = math.sin(u2), math.cos(u2)
    lam = ell
    for _ in range(max_iter):
        sl, cl = math.sin(lam), math.cos(lam)
        sin_sigma = math.hypot(cu2 * sl, cu1 * su2 - su1 * cu2 * cl)
        if sin_sigma == 0.0:
            return 0.0  # coincident
        cos_sigma = su1 * su2 + cu1 * cu2 * cl
        sigma = math.atan2(sin_sigma, cos_sigma)
        sin_alpha = cu1 * cu2 * sl / sin_sigma
        cos2_alpha = 1.0 - sin_alpha * sin_alpha
        if cos2_alpha == 0.0:
            cos_2sm = 0.0  # equatorial line
        else:
            cos_2sm = cos_sigma - 2.0 * su1 * su2 / cos2_alpha
        c = WGS84_F / 16.0 * cos2_alpha * (4.0 + WGS84_F * (4.0 - 3.0 * cos2_alpha))
        lam_prev = lam
        lam = ell + (1.0 - c) * WGS84_F * sin_alpha * (
            sigma
            + c * sin_sigma * (cos_2sm + c * cos_sigma * (-1.0 + 2.0 * cos_2sm * cos_2sm))
        )
        if abs(lam - lam_prev) < tol:
            break
    else:
        raise ValueError(
            "Vincenty inverse did not converge (near-antipodal input?) for "
            f"({lon1},{lat1})-({lon2},{lat2})"
        )
    u_sq = cos2_alpha * (WGS84_A * WGS84_A - WGS84_B * WGS84_B) / (WGS84_B * WGS84_B)
    big_a = 1.0 + u_sq / 16384.0 * (4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq)))
    big_b = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))
    delta_sigma = big_b * sin_sigma * (
        cos_2sm
        + big_b / 4.0 * (
            cos_sigma * (-1.0 + 2.0 * cos_2sm * cos_2sm)
            - big_b / 6.0 * cos_2sm
            * (-3.0 + 4.0 * sin_sigma * sin_sigma)
            * (-3.0 + 4.0 * cos_2sm * cos_2sm)
        )
    )
    return WGS84_B * big_a * (sigma - delta_sigma)


def authalic_sin(lat_deg: float) -> float:
    """sin(authalic latitude) = q(φ)/q(90°): the exact equal-area latitude
    remap for the WGS84 ellipsoid."""
    s = math.sin(math.radians(lat_deg))
    q = (1.0 - _E2) * (
        s / (1.0 - _E2 * s * s) + (1.0 / (2.0 * _E)) * math.log((1.0 + _E * s) / (1.0 - _E * s))
    )
    return max(-1.0, min(1.0, q / _Q90))


def ellipsoidal_area_m2(coords: list) -> float:
    """Polygon area on the WGS84 ellipsoid via the authalic equal-area
    mapping: the spherical trapezoid shoelace (same discrete form as the
    reference's spherical path, geo.py:127-140) evaluated with authalic
    latitudes on the authalic-radius sphere."""
    n = len(coords)
    if n < 3:
        return 0.0
    total = 0.0
    for i in range(n):
        j = (i + 1) % n
        lon1 = math.radians(coords[i][0])
        lon2 = math.radians(coords[j][0])
        total += (lon2 - lon1) * (2.0 + authalic_sin(coords[i][1]) + authalic_sin(coords[j][1]))
    return abs(total * R_AUTHALIC_M * R_AUTHALIC_M / 2.0)


def ellipsoidal_perimeter_m(coords: list) -> float:
    """Ring perimeter in metres: Vincenty geodesic segments, ring closed if
    open (mirrors the haversine fallback's closure rule, geo.py:107-124)."""
    if len(coords) < 2:
        return 0.0
    ring = list(coords)
    if ring[0] != ring[-1]:
        ring.append(ring[0])
    return sum(
        vincenty_distance_m(ring[i][0], ring[i][1], ring[i + 1][0], ring[i + 1][1])
        for i in range(len(ring) - 1)
    )


def polygon_area_perimeter(lons: list, lats: list) -> tuple[float, float]:
    """pyproj ``Geod.polygon_area_perimeter``-shaped entry point:
    (area_m2, perimeter_m), area unsigned. Input as parallel coordinate
    lists, matching the reference call site (geo.py:74-77)."""
    coords = [[lon, lat] for lon, lat in zip(lons, lats)]
    return ellipsoidal_area_m2(coords), ellipsoidal_perimeter_m(coords)
