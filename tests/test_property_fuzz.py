"""Property-based checks (hypothesis) for the round-3 numeric kernels:
the exact portfolio expansion fold and the vendored ellipsoidal geodesic.
Spark-free — pure-Python invariants that the distributed operators build on.
"""

import math

from hypothesis import given, settings, strategies as st

from azure_workflow_for_kml_satellite_spark.functions import geodesic as gd
from azure_workflow_for_kml_satellite_spark.operators.metrics import _expansion_add

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)


@settings(max_examples=300, deadline=None)
@given(st.lists(finite_doubles, min_size=0, max_size=200), st.integers(1, 7))
def test_expansion_partials_are_exact(values, n_parts):
    """Splitting values into any number of partition partials and fsum-ing
    the concatenated expansion components must equal fsum of the raw values
    EXACTLY (bit-for-bit) — the invariant the two-level portfolio fold's
    partitioning-independence rests on."""
    chunks = [values[i::n_parts] for i in range(n_parts)]
    components = []
    for chunk in chunks:
        partial: list = []
        for v in chunk:
            _expansion_add(partial, v)
        # the expansion exactly represents the chunk sum
        assert math.fsum(partial) == math.fsum(chunk)
        components.extend(partial)
    assert math.fsum(components) == math.fsum(values)


lat = st.floats(min_value=-84.0, max_value=84.0, allow_nan=False)
lon = st.floats(min_value=-179.0, max_value=179.0, allow_nan=False)


@settings(max_examples=100, deadline=None)
@given(lon, lat, lon, lat)
def test_vincenty_symmetric_and_bounded(lon1, lat1, lon2, lat2):
    """d(a,b) == d(b,a) (within fp noise), 0 ≤ d ≤ half the WGS84 equator,
    and the sphere approximation agrees within the flattening (~0.6%)."""
    try:
        d1 = gd.vincenty_distance_m(lon1, lat1, lon2, lat2)
        d2 = gd.vincenty_distance_m(lon2, lat2, lon1, lat1)
    except ValueError:
        return  # documented near-antipodal non-convergence — not a segment
    assert abs(d1 - d2) <= max(1e-6, 1e-9 * d1)
    assert 0.0 <= d1 <= math.pi * gd.WGS84_A + 1.0
    if d1 > 1.0:
        from azure_workflow_for_kml_satellite_spark.functions.geometry import (
            haversine_km,
        )

        sphere = haversine_km(lon1, lat1, lon2, lat2) * 1000.0
        assert abs(d1 - sphere) / d1 < 0.007


@settings(max_examples=60, deadline=None)
@given(
    st.floats(min_value=-170.0, max_value=170.0),
    st.floats(min_value=-80.0, max_value=80.0),
    st.floats(min_value=0.001, max_value=2.0),
    st.floats(min_value=0.001, max_value=2.0),
)
def test_authalic_patch_area_matches_quadrature(lon0, lat0, dlon, dlat):
    """Random parallel-bounded patches: the authalic-mapped area must match
    direct 2-D quadrature of the ellipsoid area element to ~1e-9 relative."""
    import numpy as np

    ring = [
        [lon0, lat0],
        [lon0 + dlon, lat0],
        [lon0 + dlon, lat0 + dlat],
        [lon0, lat0 + dlat],
        [lon0, lat0],
    ]
    got = gd.ellipsoidal_area_m2(ring)
    a, e2 = gd.WGS84_A, gd.WGS84_F * (2 - gd.WGS84_F)
    x, w = np.polynomial.legendre.leggauss(48)
    phi = (x + 1.0) / 2.0 * math.radians(dlat) + math.radians(lat0)
    ww = np.sqrt(1 - e2 * np.sin(phi) ** 2)
    integrand = (a * (1 - e2) / ww**3) * (a / ww) * np.cos(phi)
    band = float(np.sum(w * integrand) * math.radians(dlat) / 2.0)
    exp = band * math.radians(dlon)
    assert abs(got - exp) < max(1e-9 * exp, 1e-4)
