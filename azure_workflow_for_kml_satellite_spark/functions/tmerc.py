"""Vendored WGS84 transverse-Mercator (UTM) transform — the pyproj-absent
upgrade path for G4 ``transform_bbox`` and R5 ``reproject_bilinear``
(reference: treesight/geo.py:85-104 builds a pyproj ``Transformer`` from
EPSG:4326 to the scene's UTM CRS before every windowed read,
fulfilment.py:264-271/321-354).

Implementation: Krüger series in the third flattening n, 6th order, exactly
as published in C. F. F. Karney, *Transverse Mercator with an accuracy of a
few nanometers*, Journal of Geodesy 85(8), 2011 (the same series pyproj's
``tmerc`` +proj uses at order 6) — sub-micrometre round-trip accuracy across
a UTM zone and agreement with independent Redfearn-series evaluations to
≲1 mm (tests/test_tmerc.py pins both, plus a numerical-quadrature meridian
arc along the central meridian).

Dispatch parity rule (same as functions/geodesic.py): production call sites
(geometry.transform_bbox, raster.reproject_bilinear) try pyproj FIRST when
importable, mirroring the reference; this module is the fallback, and the
only path exercised in the sandbox.

Scalar entry points use ``math`` (bit-stable against the straight-line
oracle re-implementation in oracle/kernels.py); ``*_np`` entry points are
the numpy-vectorized executor path for raster grids (agrees with the scalar
path to libm ulp).
"""

from __future__ import annotations

import math
import re

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_E = math.sqrt(_F * (2.0 - _F))
_N = _F / (2.0 - _F)

# UTM projection constants
K0 = 0.9996
FALSE_EASTING = 500_000.0
FALSE_NORTHING_SOUTH = 10_000_000.0

# Krüger series coefficients, 6th order in n (Karney 2011 eqs. 35-36; the
# rectifying radius A from eq. 14).
_N2, _N3, _N4, _N5, _N6 = _N**2, _N**3, _N**4, _N**5, _N**6

RECTIFYING_RADIUS = (_A / (1.0 + _N)) * (1.0 + _N2 / 4.0 + _N4 / 64.0 + _N6 / 256.0)

ALPHA = (
    _N / 2.0 - 2.0 * _N2 / 3.0 + 5.0 * _N3 / 16.0 + 41.0 * _N4 / 180.0
    - 127.0 * _N5 / 288.0 + 7891.0 * _N6 / 37800.0,
    13.0 * _N2 / 48.0 - 3.0 * _N3 / 5.0 + 557.0 * _N4 / 1440.0
    + 281.0 * _N5 / 630.0 - 1983433.0 * _N6 / 1935360.0,
    61.0 * _N3 / 240.0 - 103.0 * _N4 / 140.0 + 15061.0 * _N5 / 26880.0
    + 167603.0 * _N6 / 181440.0,
    49561.0 * _N4 / 161280.0 - 179.0 * _N5 / 168.0 + 6601661.0 * _N6 / 7257600.0,
    34729.0 * _N5 / 80640.0 - 3418889.0 * _N6 / 1995840.0,
    212378941.0 * _N6 / 319334400.0,
)

BETA = (
    _N / 2.0 - 2.0 * _N2 / 3.0 + 37.0 * _N3 / 96.0 - _N4 / 360.0
    - 81.0 * _N5 / 512.0 + 96199.0 * _N6 / 604800.0,
    _N2 / 48.0 + _N3 / 15.0 - 437.0 * _N4 / 1440.0 + 46.0 * _N5 / 105.0
    - 1118711.0 * _N6 / 3870720.0,
    17.0 * _N3 / 480.0 - 37.0 * _N4 / 840.0 - 209.0 * _N5 / 4480.0
    + 5569.0 * _N6 / 90720.0,
    4397.0 * _N4 / 161280.0 - 11.0 * _N5 / 504.0 - 830251.0 * _N6 / 7257600.0,
    4583.0 * _N5 / 161280.0 - 108847.0 * _N6 / 3991680.0,
    20648693.0 * _N6 / 638668800.0,
)

# conformal → geographic latitude series (Karney 2011 via the standard
# auxiliary-latitude expansions, 6th order)
DELTA = (
    2.0 * _N - 2.0 * _N2 / 3.0 - 2.0 * _N3 + 116.0 * _N4 / 45.0
    + 26.0 * _N5 / 45.0 - 2854.0 * _N6 / 675.0,
    7.0 * _N2 / 3.0 - 8.0 * _N3 / 5.0 - 227.0 * _N4 / 45.0
    + 2704.0 * _N5 / 315.0 + 2323.0 * _N6 / 945.0,
    56.0 * _N3 / 15.0 - 136.0 * _N4 / 35.0 - 1262.0 * _N5 / 105.0
    + 73814.0 * _N6 / 2835.0,
    4279.0 * _N4 / 630.0 - 332.0 * _N5 / 35.0 - 399572.0 * _N6 / 14175.0,
    4174.0 * _N5 / 315.0 - 144838.0 * _N6 / 6237.0,
    601676.0 * _N6 / 22275.0,
)

_UTM_RE = re.compile(r"^EPSG:(32[67])(\d\d)$", re.IGNORECASE)


def parse_utm_epsg(crs: str) -> tuple[int, bool] | None:
    """'EPSG:326zz'/'EPSG:327zz' → (zone, is_north); else None."""
    m = _UTM_RE.match(crs.strip())
    if not m:
        return None
    zone = int(m.group(2))
    if not 1 <= zone <= 60:
        return None
    return zone, m.group(1) == "326"


def is_geographic(crs: str) -> bool:
    return crs.strip().upper() in ("EPSG:4326", "OGC:CRS84", "WGS84")


def utm_epsg_for(lon: float, lat: float) -> str:
    """The standard UTM zone EPSG for a point (reference picks the scene's
    'proj:epsg' the same way; grid-exception zones 31-37X are not used by
    the satellite collections and are intentionally omitted)."""
    zone = int((lon + 180.0) // 6.0) % 60 + 1
    return f"EPSG:{326 if lat >= 0 else 327}{zone:02d}"


def central_meridian_deg(zone: int) -> float:
    return zone * 6.0 - 183.0


def utm_forward(lon: float, lat: float, zone: int, north: bool) -> tuple[float, float]:
    """Geographic (deg) → UTM easting/northing (m). Karney 2011 eqs. 7-11."""
    lam = math.radians(lon - central_meridian_deg(zone))
    # normalize to (-pi, pi] so zone-adjacent longitudes stay finite
    if lam > math.pi:
        lam -= 2.0 * math.pi
    elif lam <= -math.pi:
        lam += 2.0 * math.pi
    phi = math.radians(lat)
    sphi = math.sin(phi)
    # conformal latitude via tau' (tan of conformal lat), eq. 7
    t = math.sinh(math.atanh(sphi) - _E * math.atanh(_E * sphi))
    clam = math.cos(lam)
    xi_p = math.atan2(t, clam)
    eta_p = math.asinh(math.sin(lam) / math.hypot(t, clam))
    xi = xi_p
    eta = eta_p
    for j in range(6):
        a2j = 2.0 * (j + 1)
        xi += ALPHA[j] * math.sin(a2j * xi_p) * math.cosh(a2j * eta_p)
        eta += ALPHA[j] * math.cos(a2j * xi_p) * math.sinh(a2j * eta_p)
    easting = FALSE_EASTING + K0 * RECTIFYING_RADIUS * eta
    northing = K0 * RECTIFYING_RADIUS * xi
    if not north:
        northing += FALSE_NORTHING_SOUTH
    return easting, northing


def utm_inverse(easting: float, northing: float, zone: int, north: bool) -> tuple[float, float]:
    """UTM easting/northing (m) → geographic (deg). Karney 2011 eqs. 20-26."""
    xi = (northing - (0.0 if north else FALSE_NORTHING_SOUTH)) / (K0 * RECTIFYING_RADIUS)
    eta = (easting - FALSE_EASTING) / (K0 * RECTIFYING_RADIUS)
    xi_p = xi
    eta_p = eta
    for j in range(6):
        a2j = 2.0 * (j + 1)
        xi_p -= BETA[j] * math.sin(a2j * xi) * math.cosh(a2j * eta)
        eta_p -= BETA[j] * math.cos(a2j * xi) * math.sinh(a2j * eta)
    chi = math.asin(math.sin(xi_p) / math.cosh(eta_p))
    phi = chi
    for j in range(6):
        a2j = 2.0 * (j + 1)
        phi += DELTA[j] * math.sin(a2j * chi)
    lam = math.atan2(math.sinh(eta_p), math.cos(xi_p))
    return central_meridian_deg(zone) + math.degrees(lam), math.degrees(phi)


def utm_forward_np(lons: np.ndarray, lats: np.ndarray, zone: int, north: bool):
    """Vectorized ``utm_forward`` (float64; agrees with the scalar path to
    libm ulp — tests pin < 1e-6 m)."""
    lam = np.radians(np.asarray(lons, dtype=np.float64) - central_meridian_deg(zone))
    lam = np.where(lam > math.pi, lam - 2.0 * math.pi, lam)
    lam = np.where(lam <= -math.pi, lam + 2.0 * math.pi, lam)
    phi = np.radians(np.asarray(lats, dtype=np.float64))
    sphi = np.sin(phi)
    t = np.sinh(np.arctanh(sphi) - _E * np.arctanh(_E * sphi))
    clam = np.cos(lam)
    xi_p = np.arctan2(t, clam)
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, clam))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(6):
        a2j = 2.0 * (j + 1)
        xi += ALPHA[j] * np.sin(a2j * xi_p) * np.cosh(a2j * eta_p)
        eta += ALPHA[j] * np.cos(a2j * xi_p) * np.sinh(a2j * eta_p)
    easting = FALSE_EASTING + K0 * RECTIFYING_RADIUS * eta
    northing = K0 * RECTIFYING_RADIUS * xi
    if not north:
        northing = northing + FALSE_NORTHING_SOUTH
    return easting, northing


def utm_inverse_np(eastings: np.ndarray, northings: np.ndarray, zone: int, north: bool):
    """Vectorized ``utm_inverse``."""
    n_off = 0.0 if north else FALSE_NORTHING_SOUTH
    xi = (np.asarray(northings, dtype=np.float64) - n_off) / (K0 * RECTIFYING_RADIUS)
    eta = (np.asarray(eastings, dtype=np.float64) - FALSE_EASTING) / (K0 * RECTIFYING_RADIUS)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(6):
        a2j = 2.0 * (j + 1)
        xi_p -= BETA[j] * np.sin(a2j * xi) * np.cosh(a2j * eta)
        eta_p -= BETA[j] * np.cos(a2j * xi) * np.sinh(a2j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for j in range(6):
        a2j = 2.0 * (j + 1)
        phi += DELTA[j] * np.sin(a2j * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return central_meridian_deg(zone) + np.degrees(lam), np.degrees(phi)


def transform_point(x: float, y: float, src_crs: str, dst_crs: str) -> tuple[float, float]:
    """Scalar transform between EPSG:4326 and any UTM zone (either
    direction, or UTM→UTM via geographic). Raises NotImplementedError for
    CRS families outside {geographic, UTM} — same contract surface as the
    pyproj path it substitutes."""
    if src_crs == dst_crs:
        return x, y
    src_utm = parse_utm_epsg(src_crs)
    dst_utm = parse_utm_epsg(dst_crs)
    if src_utm is None and not is_geographic(src_crs):
        raise NotImplementedError(f"unsupported src CRS {src_crs} (vendored tmerc)")
    if dst_utm is None and not is_geographic(dst_crs):
        raise NotImplementedError(f"unsupported dst CRS {dst_crs} (vendored tmerc)")
    if src_utm is not None:
        x, y = utm_inverse(x, y, src_utm[0], src_utm[1])
    if dst_utm is not None:
        return utm_forward(x, y, dst_utm[0], dst_utm[1])
    return x, y


def transform_grid_np(xs: np.ndarray, ys: np.ndarray, src_crs: str, dst_crs: str):
    """Vectorized transform of coordinate arrays (the raster-grid path)."""
    if src_crs == dst_crs:
        return xs, ys
    src_utm = parse_utm_epsg(src_crs)
    dst_utm = parse_utm_epsg(dst_crs)
    if src_utm is None and not is_geographic(src_crs):
        raise NotImplementedError(f"unsupported src CRS {src_crs} (vendored tmerc)")
    if dst_utm is None and not is_geographic(dst_crs):
        raise NotImplementedError(f"unsupported dst CRS {dst_crs} (vendored tmerc)")
    if src_utm is not None:
        xs, ys = utm_inverse_np(xs, ys, src_utm[0], src_utm[1])
    if dst_utm is not None:
        return utm_forward_np(xs, ys, dst_utm[0], dst_utm[1])
    return xs, ys
