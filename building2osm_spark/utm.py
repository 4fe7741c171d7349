"""UTM <-> WGS84 conversion, numpy-vectorized (reference parity: utm.py).

Implemented from the public Krüger series for the transverse Mercator
projection (Karney, "Transverse Mercator with an accuracy of a few
nanometers", J. Geod. 85, 2011; also Wikipedia: Transverse Mercator —
flattening series), NOT transcribed from the reference's utm.py. The
reference uses an equivalent published series, so both agree to well below
the 7-decimal output rounding (verified in tests/test_utm.py against the
reference implementation directly).

WGS84: a = 6378137 m, f = 1/298.257223563; UTM: k0 = 0.9996,
false easting 500000 m, false northing 10000000 m on the southern hemisphere.
"""

from __future__ import annotations

import numpy as np

_A = 6378137.0
_F = 1.0 / 298.257223563
_K0 = 0.9996
_E0 = 500000.0
_N0_SOUTH = 10000000.0

_N = _F / (2.0 - _F)  # third flattening
# rectifying radius (series in n, Karney eq. 14)
_AA = _A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0)

# forward coefficients alpha (Karney eq. 35 truncated at n^6)
_ALPHA = (
    _N / 2.0 - 2.0 / 3.0 * _N**2 + 5.0 / 16.0 * _N**3 + 41.0 / 180.0 * _N**4
    - 127.0 / 288.0 * _N**5 + 7891.0 / 37800.0 * _N**6,
    13.0 / 48.0 * _N**2 - 3.0 / 5.0 * _N**3 + 557.0 / 1440.0 * _N**4
    + 281.0 / 630.0 * _N**5 - 1983433.0 / 1935360.0 * _N**6,
    61.0 / 240.0 * _N**3 - 103.0 / 140.0 * _N**4 + 15061.0 / 26880.0 * _N**5
    + 167603.0 / 181440.0 * _N**6,
    49561.0 / 161280.0 * _N**4 - 179.0 / 168.0 * _N**5 + 6601661.0 / 7257600.0 * _N**6,
    34729.0 / 80640.0 * _N**5 - 3418889.0 / 1995840.0 * _N**6,
    212378941.0 / 319334400.0 * _N**6,
)

# inverse coefficients beta (Karney eq. 36 truncated at n^6)
_BETA = (
    _N / 2.0 - 2.0 / 3.0 * _N**2 + 37.0 / 96.0 * _N**3 - 1.0 / 360.0 * _N**4
    - 81.0 / 512.0 * _N**5 + 96199.0 / 604800.0 * _N**6,
    1.0 / 48.0 * _N**2 + 1.0 / 15.0 * _N**3 - 437.0 / 1440.0 * _N**4
    + 46.0 / 105.0 * _N**5 - 1118711.0 / 3870720.0 * _N**6,
    17.0 / 480.0 * _N**3 - 37.0 / 840.0 * _N**4 - 209.0 / 4480.0 * _N**5
    + 5569.0 / 90720.0 * _N**6,
    4397.0 / 161280.0 * _N**4 - 11.0 / 504.0 * _N**5 - 830251.0 / 7257600.0 * _N**6,
    4583.0 / 161280.0 * _N**5 - 108847.0 / 3991680.0 * _N**6,
    20648693.0 / 638668800.0 * _N**6,
)

_E2 = _F * (2.0 - _F)  # first eccentricity squared


def zone_central_meridian(zone: int) -> float:
    return float(zone * 6 - 183)


def latlon_to_utm(lat, lon, zone: int) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) degrees → (easting, northing) metres in the given UTM zone."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    phi = np.radians(lat)
    lam = np.radians(lon - zone_central_meridian(zone))

    # conformal latitude
    e = np.sqrt(_E2)
    t = np.sinh(np.arctanh(np.sin(phi)) - e * np.arctanh(e * np.sin(phi)))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))

    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, (a_j) in enumerate(_ALPHA, start=1):
        xi = xi + a_j * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta = eta + a_j * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)

    easting = _E0 + _K0 * _AA * eta
    northing = _K0 * _AA * xi
    northing = np.where(lat < 0, northing + _N0_SOUTH, northing)
    return easting, northing


def utm_to_latlon(easting, northing, zone: int, southern: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """(easting, northing) metres in zone → (lat, lon) degrees."""
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)
    if southern:
        northing = northing - _N0_SOUTH

    xi = northing / (_K0 * _AA)
    eta = (easting - _E0) / (_K0 * _AA)

    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b_j in enumerate(_BETA, start=1):
        xi_p = xi_p - b_j * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p = eta_p - b_j * np.cos(2 * j * xi) * np.sinh(2 * j * eta)

    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))  # conformal latitude

    # invert conformal latitude by fixed-point iteration on the isometric form
    e = np.sqrt(_E2)
    phi = chi.copy()
    for _ in range(7):
        s = np.sin(phi)
        phi = np.arcsin(
            np.tanh(np.arctanh(np.sin(chi)) + e * np.arctanh(e * s))
        )

    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    lat = np.degrees(phi)
    lon = np.degrees(lam) + zone_central_meridian(zone)
    return lat, lon
