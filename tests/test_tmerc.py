"""Vendored transverse-Mercator validation (functions/tmerc.py ↔
oracle/kernels.py tm_*), pinned three independent ways:

1. the engine and oracle transcriptions of the Karney 2011 series are
   bit-identical (the oracle-kernel parity contract);
2. a THIRD formulation implemented here — the classic Redfearn series (the
   GDA/OSGB published expansion in powers of ω = λ−λ0, a completely
   different derivation) — agrees to ≲2 mm inside a UTM zone;
3. the northing along the central meridian equals k0 × the meridian arc
   computed by direct numerical quadrature of the ellipsoid integrand.

Plus round-trip closure, scalar↔vectorized agreement, and the now-ungated
cross-CRS legs of geometry.transform_bbox / raster.reproject_bilinear
(G4 / R5 — reference geo.py:85-104, fulfilment.py:321-354).
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from azure_workflow_for_kml_satellite_spark.functions import geometry as geo
from azure_workflow_for_kml_satellite_spark.functions import raster as R
from azure_workflow_for_kml_satellite_spark.functions import tmerc as T
from azure_workflow_for_kml_satellite_spark.oracle import kernels as K

_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_E4 = _E2 * _E2
_E6 = _E4 * _E2


def _meridian_arc_series(phi: float) -> float:
    a0 = 1.0 - _E2 / 4.0 - 3.0 * _E4 / 64.0 - 5.0 * _E6 / 256.0
    a2 = (3.0 / 8.0) * (_E2 + _E4 / 4.0 + 15.0 * _E6 / 128.0)
    a4 = (15.0 / 256.0) * (_E4 + 3.0 * _E6 / 4.0)
    a6 = 35.0 * _E6 / 3072.0
    return _A * (
        a0 * phi
        - a2 * math.sin(2.0 * phi)
        + a4 * math.sin(4.0 * phi)
        - a6 * math.sin(6.0 * phi)
    )


def _redfearn_forward(lon: float, lat: float, zone: int, north: bool):
    """Redfearn (1948) series as published in the GDA technical manual —
    an ω-power expansion, independent of the Krüger/Karney conformal-plane
    derivation used by both the engine and the oracle."""
    k0 = 0.9996
    lon0 = zone * 6.0 - 183.0
    w = math.radians(lon - lon0)
    phi = math.radians(lat)
    s, c = math.sin(phi), math.cos(phi)
    t = math.tan(phi)
    nu = _A / math.sqrt(1.0 - _E2 * s * s)
    rho = _A * (1.0 - _E2) / (1.0 - _E2 * s * s) ** 1.5
    psi = nu / rho
    t2, t4, t6 = t * t, t**4, t**6
    m = _meridian_arc_series(phi)
    e_term = (
        w * c
        + (w**3 * c**3 / 6.0) * (psi - t2)
        + (w**5 * c**5 / 120.0)
        * (4.0 * psi**3 * (1.0 - 6.0 * t2) + psi**2 * (1.0 + 8.0 * t2) - 2.0 * psi * t2 + t4)
        + (w**7 * c**7 / 5040.0) * (61.0 - 479.0 * t2 + 179.0 * t4 - t6)
    )
    east = 500000.0 + k0 * nu * e_term
    n_term = (
        m
        + (w**2 / 2.0) * nu * s * c
        + (w**4 / 24.0) * nu * s * c**3 * (4.0 * psi**2 + psi - t2)
        + (w**6 / 720.0)
        * nu
        * s
        * c**5
        * (
            8.0 * psi**4 * (11.0 - 24.0 * t2)
            - 28.0 * psi**3 * (1.0 - 6.0 * t2)
            + psi**2 * (1.0 - 32.0 * t2)
            - 2.0 * psi * t2
            + t4
        )
        + (w**8 / 40320.0) * nu * s * c**7 * (1385.0 - 3111.0 * t2 + 543.0 * t4 - t6)
    )
    nrth = k0 * n_term + (0.0 if north else 10000000.0)
    return east, nrth


def test_anchor_points():
    # equator × central meridian is exactly the false origin
    assert T.utm_forward(9.0, 0.0, 32, True) == (500000.0, 0.0)
    # southern false northing
    e, n = T.utm_forward(9.0, -0.0001, 32, False)
    assert e == 500000.0 and 9999980 < n < 10000000
    # zone helpers
    assert T.utm_epsg_for(9.0, 48.0) == "EPSG:32632"
    assert T.utm_epsg_for(-73.5, -40.0) == "EPSG:32718"
    assert T.parse_utm_epsg("EPSG:32632") == (32, True)
    assert T.parse_utm_epsg("EPSG:32718") == (18, False)
    assert T.parse_utm_epsg("EPSG:4326") is None
    assert T.parse_utm_epsg("EPSG:32661") is None  # polar stereographic, not UTM


def test_central_meridian_matches_quadrature_meridian_arc():
    for lat in (12.0, 37.5, 45.0, 63.25, 79.0, -33.0):
        phis = np.linspace(0.0, math.radians(lat), 400_001)
        integrand = _A * (1.0 - _E2) / np.power(1.0 - _E2 * np.sin(phis) ** 2, 1.5)
        m = float(np.trapz(integrand, phis))
        north = lat >= 0
        e, n = T.utm_forward(9.0, lat, 32, north)
        expect = 0.9996 * abs(m) + (0.0 if north else 10000000.0)
        assert e == pytest.approx(500000.0, abs=1e-9)
        assert n == pytest.approx(expect if north else 10000000.0 - 0.9996 * abs(m), abs=1e-3)


def test_roundtrip_and_scalar_vs_vectorized():
    rng = random.Random(0xA11CE)
    lons, lats, zones, norths = [], [], [], []
    for _ in range(500):
        zone = rng.randint(1, 60)
        cm = zone * 6 - 183
        lon = cm + rng.uniform(-4.0, 4.0)
        lat = rng.uniform(-84.0, 84.0)
        e, n = T.utm_forward(lon, lat, zone, lat >= 0)
        lo, la = T.utm_inverse(e, n, zone, lat >= 0)
        assert abs(lo - lon) < 1e-11 and abs(la - lat) < 1e-11
        lons.append(lon), lats.append(lat), zones.append(zone), norths.append(lat >= 0)
    # vectorized agrees with scalar to well under a micron
    for zone in {32, 18, 55}:
        sel = [i for i, z in enumerate(zones) if z == zone] or [0]
        ls = np.array([lons[i] for i in sel])
        ps = np.array([lats[i] for i in sel])
        ev, nv = T.utm_forward_np(ls, ps, zone, True)
        for i, idx in enumerate(sel):
            es, ns = T.utm_forward(lons[idx], lats[idx], zone, True)
            assert abs(es - ev[i]) < 1e-6 and abs(ns - nv[i]) < 1e-6
        lov, lav = T.utm_inverse_np(ev, nv, zone, True)
        for i in range(len(sel)):
            los, las = T.utm_inverse(float(ev[i]), float(nv[i]), zone, True)
            assert abs(los - lov[i]) < 1e-12 and abs(las - lav[i]) < 1e-12


def test_engine_oracle_bit_parity():
    rng = random.Random(0xBEEF)
    for _ in range(2000):
        zone = rng.randint(1, 60)
        north = rng.random() < 0.5
        cm = zone * 6 - 183
        lon = cm + rng.uniform(-3.9, 3.9)
        lat = rng.uniform(0.001, 84.0) * (1.0 if north else -1.0)
        assert T.utm_forward(lon, lat, zone, north) == K.tm_forward(lon, lat, zone, north)
        e, n = T.utm_forward(lon, lat, zone, north)
        assert T.utm_inverse(e, n, zone, north) == K.tm_inverse(e, n, zone, north)


def test_against_independent_redfearn_series():
    rng = random.Random(0xFEED)
    worst = 0.0
    for _ in range(2000):
        zone = rng.randint(1, 60)
        north = rng.random() < 0.5
        cm = zone * 6 - 183
        lon = cm + rng.uniform(-3.0, 3.0)
        lat = rng.uniform(0.01, 80.0) * (1.0 if north else -1.0)
        e1, n1 = T.utm_forward(lon, lat, zone, north)
        e2, n2 = _redfearn_forward(lon, lat, zone, north)
        worst = max(worst, abs(e1 - e2), abs(n1 - n2))
    assert worst < 2e-3  # two independent derivations agree to < 2 mm


def test_transform_bbox_cross_crs_ungated():
    # G4's cross-CRS leg now runs without pyproj (vendored tmerc fallback)
    bbox = [8.5, 47.2, 8.7, 47.4]
    out = geo.transform_bbox(bbox, "EPSG:4326", "EPSG:32632")
    # corners must match the scalar transform exactly
    x0, y0 = T.utm_forward(8.5, 47.2, 32, True)
    x1, y1 = T.utm_forward(8.7, 47.4, 32, True)
    assert out == (min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1))
    # and round-trip back to ~the original corners
    back = geo.transform_bbox(list(out), "EPSG:32632", "EPSG:4326")
    assert back[0] == pytest.approx(8.5, abs=1e-9)
    assert back[3] == pytest.approx(47.4, abs=1e-9)
    # unsupported family still raises (honest contract, not silent nonsense)
    with pytest.raises(NotImplementedError):
        geo.transform_bbox(bbox, "EPSG:4326", "EPSG:3035")


def test_reproject_bilinear_cross_crs_ungated():
    """R5 cross-CRS: a linear-gradient raster on a UTM grid, warped onto a
    4326 destination grid, must reproduce the gradient evaluated at each
    destination centre's true UTM coordinate (bilinear on a linear field is
    exact up to float32)."""
    zone, north = 32, True
    # 200×200 @ 100 m source grid around (9°, 47°)
    cx, cy = T.utm_forward(9.0, 47.0, zone, north)
    x0, y0 = cx - 10_000.0, cy - 10_000.0
    x1, y1 = cx + 10_000.0, cy + 10_000.0
    sh = sw = 200
    px = (x1 - x0) / sw
    xs = x0 + (np.arange(sw) + 0.5) * px
    ys = y1 - (np.arange(sh) + 0.5) * px
    gx, gy = np.meshgrid(xs, ys)
    src = (0.001 * (gx - x0) + 0.0005 * (gy - y0)).astype(np.float32)

    dst_bbox = [8.95, 46.96, 9.05, 47.04]
    dh = dw = 64
    out = R.reproject_bilinear(
        src, [x0, y0, x1, y1], dst_bbox, (dh, dw),
        src_crs="EPSG:32632", dst_crs="EPSG:4326",
    )
    assert out.shape == (dh, dw) and np.isfinite(out).all()
    dxs = dst_bbox[0] + (np.arange(dw) + 0.5) * (dst_bbox[2] - dst_bbox[0]) / dw
    dys = dst_bbox[3] - (np.arange(dh) + 0.5) * (dst_bbox[3] - dst_bbox[1]) / dh
    dgx, dgy = np.meshgrid(dxs, dys)
    ux, uy = T.utm_forward_np(dgx.ravel(), dgy.ravel(), zone, north)
    expect = (0.001 * (ux - x0) + 0.0005 * (uy - y0)).reshape(dh, dw)
    assert np.abs(out - expect).max() < 5e-3  # float32 bilinear on linear field
    # destination centres outside the source coverage come out NaN
    out2 = R.reproject_bilinear(
        src, [x0, y0, x1, y1], [8.0, 46.0, 8.2, 46.2], (8, 8),
        src_crs="EPSG:32632", dst_crs="EPSG:4326",
    )
    assert np.isnan(out2).all()


def test_oracle_bbox_helper_matches_engine():
    rng = random.Random(0x5EED)
    for _ in range(200):
        zone = rng.randint(1, 60)
        north = rng.random() < 0.5
        cm = zone * 6 - 183
        lo = cm + rng.uniform(-3.0, 2.5)
        la = rng.uniform(1.0, 70.0) * (1.0 if north else -1.0)
        bbox = [lo, min(la, la + 0.3), lo + 0.4, max(la, la + 0.3)]
        epsg = f"EPSG:{326 if north else 327}{zone:02d}"
        assert geo.transform_bbox(bbox, "EPSG:4326", epsg) == K.tm_bbox_to_utm(
            bbox, zone, north
        )
