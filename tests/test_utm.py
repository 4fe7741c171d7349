"""UTM reprojection: round-trip accuracy + agreement with the reference."""

from __future__ import annotations

import numpy as np
import pytest

from building2osm_spark import utm
from tests.conftest import import_reference

ref_utm = import_reference("utm")

rng = np.random.default_rng(11)


def test_roundtrip_subnanometre():
    lat = rng.uniform(55.0, 71.0, 500)   # Norway latitudes
    lon = rng.uniform(4.0, 31.0, 500)
    e, n = utm.latlon_to_utm(lat, lon, 33)
    lat2, lon2 = utm.utm_to_latlon(e, n, 33)
    assert np.max(np.abs(lat2 - lat)) < 1e-9
    assert np.max(np.abs(lon2 - lon)) < 1e-9


def test_matches_reference_forward():
    # standard UTM domain (±6° of the zone 33 central meridian at 15°E):
    # the reference's truncated series agrees to < 1 mm there; its own error
    # grows to ~1.4 cm at 14° off-meridian (measured), ours stays nm-exact
    lat = rng.uniform(58.0, 70.0, 100)
    lon = rng.uniform(9.0, 21.0, 100)
    e, n = utm.latlon_to_utm(lat, lon, 33)
    for i in range(100):
        xy = ref_utm.LatLonToUTMXY(np.radians(lat[i]), np.radians(lon[i]), 33)
        assert e[i] == pytest.approx(xy[0], abs=1e-3)
        assert n[i] == pytest.approx(xy[1], abs=1e-3)


def test_matches_reference_inverse():
    # cadastral flow: UtmToLatLon(x, y, 33, "N") at building2osm.py:620
    e = rng.uniform(200000.0, 800000.0, 100)
    n = rng.uniform(6500000.0, 7800000.0, 100)
    lat, lon = utm.utm_to_latlon(e, n, 33)
    for i in range(100):
        want = ref_utm.UtmToLatLon(e[i], n[i], 33, "N")
        # measured: ≤2.5e-9° typical, 1.5e-8° at 6°-off-meridian eastings
        # (the reference's truncation) — below the 1e-7° output rounding
        assert lat[i] == pytest.approx(want[0], abs=5e-8)
        assert lon[i] == pytest.approx(want[1], abs=5e-8)


def test_southern_hemisphere():
    lat, lon = np.array([-33.9]), np.array([18.4])  # zone 34S
    e, n = utm.latlon_to_utm(lat, lon, 34)
    assert n[0] > 5000000  # false northing applied
    lat2, lon2 = utm.utm_to_latlon(e, n, 34, southern=True)
    assert lat2[0] == pytest.approx(lat[0], abs=1e-9)
    assert lon2[0] == pytest.approx(lon[0], abs=1e-9)
