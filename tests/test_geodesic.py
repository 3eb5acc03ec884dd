"""Vendored WGS84 ellipsoidal geodesic (functions/geodesic.py) validated
against closed-form / independently-integrated ellipsoid facts — NOT against
the engine's spherical fallback, so the primary G3 semantics (reference
geo.py:69-83's pyproj path) are genuinely exercised in this pyproj-less
container."""

import math

import numpy as np

from azure_workflow_for_kml_satellite_spark.functions import geodesic as gd

A = gd.WGS84_A
E2 = gd.WGS84_F * (2 - gd.WGS84_F)


def _meridian_arc_m(lat_deg: float) -> float:
    """Meridian arc 0→lat via 64-point Gauss-Legendre over the exact
    meridional radius of curvature M(φ) = a(1-e²)/(1-e² sin²φ)^{3/2}."""
    x, w = np.polynomial.legendre.leggauss(64)
    phi = (x + 1.0) / 2.0 * math.radians(lat_deg)
    m = A * (1 - E2) / np.power(1 - E2 * np.sin(phi) ** 2, 1.5)
    return float(np.sum(w * m) * math.radians(lat_deg) / 2.0)


def _patch_area_m2(lon1, lat1, lon2, lat2) -> float:
    """Area of the parallel/meridian-bounded patch via 2-D quadrature of the
    exact ellipsoid area element dA = M(φ) N(φ) cosφ dφ dλ."""
    x, w = np.polynomial.legendre.leggauss(64)
    phi = (x + 1.0) / 2.0 * math.radians(lat2 - lat1) + math.radians(lat1)
    ww = np.sqrt(1 - E2 * np.sin(phi) ** 2)
    integrand = (A * (1 - E2) / ww**3) * (A / ww) * np.cos(phi)
    band = float(np.sum(w * integrand) * math.radians(lat2 - lat1) / 2.0)
    return band * math.radians(lon2 - lon1)


def test_vincenty_equator_exact():
    # the equator is a geodesic: distance = a * Δλ exactly
    got = gd.vincenty_distance_m(10.0, 0.0, 11.0, 0.0)
    assert abs(got - A * math.radians(1.0)) < 1e-6 * got


def test_vincenty_meridian_matches_quadrature():
    for lat in (1.0, 10.0, 45.0, 80.0):
        got = gd.vincenty_distance_m(5.0, 0.0, 5.0, lat)
        exp = _meridian_arc_m(lat)
        assert abs(got - exp) < 1e-8 * exp, (lat, got, exp)


def test_vincenty_symmetry_and_zero():
    d1 = gd.vincenty_distance_m(36.8, -1.3, 5.0, 48.0)
    d2 = gd.vincenty_distance_m(5.0, 48.0, 36.8, -1.3)
    assert abs(d1 - d2) < 1e-6
    assert gd.vincenty_distance_m(3.0, 4.0, 3.0, 4.0) == 0.0
    # sanity vs haversine (sphere): within 0.5%
    from azure_workflow_for_kml_satellite_spark.functions.geometry import haversine_km

    assert abs(d1 / 1000.0 - haversine_km(36.8, -1.3, 5.0, 48.0)) < 0.005 * d1 / 1000.0


def test_area_parallel_bounded_patch_exact():
    """The authalic mapping must reproduce the EXACT ellipsoidal area of
    meridian/parallel-bounded quadrilaterals (where edge-shape error is
    zero for parallels and meridians contribute no area)."""
    for (lo1, la1, lo2, la2) in [
        (36.8, -1.3, 36.9, -1.2),
        (0.0, 40.0, 2.0, 45.0),
        (-120.0, -60.0, -119.0, -59.0),
    ]:
        ring = [[lo1, la1], [lo2, la1], [lo2, la2], [lo1, la2], [lo1, la1]]
        got = gd.ellipsoidal_area_m2(ring)
        exp = _patch_area_m2(lo1, la1, lo2, la2)
        assert abs(got - exp) < 1e-9 * exp, (got, exp)


def test_polygon_area_perimeter_band_and_vs_spherical():
    """Reference band (test_geo.py:58-71) holds on the ellipsoidal path, and
    the ellipsoid-vs-sphere delta is small but nonzero (the correction is
    real, not a re-labelled fallback)."""
    from azure_workflow_for_kml_satellite_spark.functions import geometry as geo

    sq = [[36.8, -1.3], [36.81, -1.3], [36.81, -1.29], [36.8, -1.29], [36.8, -1.3]]
    area_m2, per_m = gd.polygon_area_perimeter(
        [c[0] for c in sq], [c[1] for c in sq]
    )
    assert 50 < area_m2 / 10_000 < 200 and 3 < per_m / 1_000 < 6
    area_fb = geo.spherical_area_ha(sq)
    per_fb = geo.haversine_perimeter_km(sq)
    assert abs(area_m2 / 10_000 - area_fb) / area_fb < 0.01
    assert abs(per_m / 1_000 - per_fb) / per_fb < 0.01
    assert area_m2 / 10_000 != area_fb  # genuinely ellipsoidal


def test_matches_pyproj_when_available():
    try:
        from pyproj import Geod
    except ImportError:
        return  # the vendored path IS the in-container primary stand-in
    sq = [[36.8, -1.3], [36.81, -1.3], [36.81, -1.29], [36.8, -1.29], [36.8, -1.3]]
    a_ref, p_ref = Geod(ellps="WGS84").polygon_area_perimeter(
        [c[0] for c in sq], [c[1] for c in sq]
    )
    a_got, p_got = gd.polygon_area_perimeter([c[0] for c in sq], [c[1] for c in sq])
    assert abs(a_got - abs(a_ref)) < 1e-4 * abs(a_ref)
    assert abs(p_got - abs(p_ref)) < 1e-5 * abs(p_ref)
