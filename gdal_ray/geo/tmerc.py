"""Ellipsoidal transverse-Mercator (UTM) forward/inverse, vectorized.

The reference reaches UTM through PROJ (``ogr/ogrct.cpp:665`` transformer
chain; the gdalwarp benchmark shape is EPSG:32631 -> EPSG:4326,
``autotest/benchmark/test_gdalwarp.py:29-56``). No PROJ exists in this
container, so this module implements the public Karney/Krüger series
(Karney 2011, "Transverse Mercator with an accuracy of a few nanometers";
the same exact-TM series PROJ's ``tmerc`` uses at 6th order in n) directly
over numpy arrays: forward (lat/lon -> easting/northing) and inverse, WGS84
ellipsoid, k0 = 0.9996, false easting 500 km, false northing 10 000 km for
southern zones.

Accuracy: the 6th-order series is < 1 nm within a UTM zone; the test suite
checks round-trip closure and the central-meridian invariants (E = 500000,
N = k0 * meridian arc computed by independent numerical integration).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "utm_zone_lon0",
    "latlon_to_utm",
    "utm_to_latlon",
    "parse_utm_epsg",
]

_A = 6378137.0
_F = 1.0 / 298.257223563
_K0 = 0.9996
_E0 = 500000.0
_N0_SOUTH = 10000000.0

_n = _F / (2.0 - _F)
_E2 = _F * (2.0 - _F)
_E = np.sqrt(_E2)

# rectifying radius
_AA = _A / (1.0 + _n) * (1.0 + _n**2 / 4.0 + _n**4 / 64.0 + _n**6 / 256.0)

# Karney 6th-order series coefficients in n (public values)
_ALPHA = np.array(
    [
        _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180
        - 127 * _n**5 / 288 + 7891 * _n**6 / 37800,
        13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440
        + 281 * _n**5 / 630 - 1983433 * _n**6 / 1935360,
        61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880
        + 167603 * _n**6 / 181440,
        49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
        34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
        212378941 * _n**6 / 319334400,
    ]
)
_BETA = np.array(
    [
        _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360
        - 81 * _n**5 / 512 + 96199 * _n**6 / 604800,
        _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440
        + 46 * _n**5 / 105 - 1118711 * _n**6 / 3870720,
        17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480
        + 5569 * _n**6 / 90720,
        4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
        4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
        20648693 * _n**6 / 638668800,
    ]
)
_J = np.arange(1, 7, dtype=np.float64)


def utm_zone_lon0(zone: int) -> float:
    """Central meridian (degrees) of a UTM zone (1..60)."""
    return zone * 6.0 - 183.0


def parse_utm_epsg(srs: str):
    """'EPSG:326xx'/'EPSG:327xx' -> (zone, south) or None if not UTM."""
    if not srs.startswith("EPSG:"):
        return None
    try:
        code = int(srs[5:])
    except ValueError:
        return None
    if 32601 <= code <= 32660:
        return code - 32600, False
    if 32701 <= code <= 32760:
        return code - 32700, True
    return None


def latlon_to_utm(lat, lon, zone: int, south: bool = False):
    """WGS84 degrees -> UTM easting/northing (meters), Karney series."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    phi = np.deg2rad(lat)
    lam = np.deg2rad(lon - utm_zone_lon0(zone))
    s = np.sin(phi)
    # conformal latitude tau'
    t = np.sinh(np.arctanh(s) - _E * np.arctanh(_E * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    j2xi = 2.0 * _J[:, None] * xi_p.ravel()[None, :]
    j2eta = 2.0 * _J[:, None] * eta_p.ravel()[None, :]
    xi = xi_p.ravel() + (_ALPHA[:, None] * np.sin(j2xi) * np.cosh(j2eta)).sum(0)
    eta = eta_p.ravel() + (_ALPHA[:, None] * np.cos(j2xi) * np.sinh(j2eta)).sum(0)
    E = _E0 + _K0 * _AA * eta.reshape(lat.shape)
    N = _K0 * _AA * xi.reshape(lat.shape)
    if south:
        N = N + _N0_SOUTH
    return E, N


def utm_to_latlon(E, N, zone: int, south: bool = False):
    """UTM easting/northing (meters) -> WGS84 degrees, Karney series +
    Newton iteration for the inverse conformal latitude."""
    E = np.asarray(E, dtype=np.float64)
    N = np.asarray(N, dtype=np.float64)
    if south:
        N = N - _N0_SOUTH
    xi = (N / (_K0 * _AA)).ravel()
    eta = ((E - _E0) / (_K0 * _AA)).ravel()
    j2xi = 2.0 * _J[:, None] * xi[None, :]
    j2eta = 2.0 * _J[:, None] * eta[None, :]
    xi_p = xi - (_BETA[:, None] * np.sin(j2xi) * np.cosh(j2eta)).sum(0)
    eta_p = eta - (_BETA[:, None] * np.cos(j2xi) * np.sinh(j2eta)).sum(0)
    tau_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # Newton: solve tau'(tau) = tau_p for tau (geodetic tan latitude)
    tau = tau_p.copy()
    for _ in range(3):
        sig = np.sinh(_E * np.arctanh(_E * tau / np.hypot(1.0, tau)))
        f_tau = tau * np.hypot(1.0, sig) - sig * np.hypot(1.0, tau)
        dtau = (
            (np.hypot(1.0, sig) * np.hypot(1.0, tau) - sig * tau)
            * (1.0 - _E2)
            * np.hypot(1.0, tau)
            / (1.0 + (1.0 - _E2) * tau**2)
        )
        tau = tau + (tau_p - f_tau) / dtau
    lat = np.rad2deg(np.arctan(tau)).reshape(E.shape)
    lon = (np.rad2deg(lam) + utm_zone_lon0(zone)).reshape(E.shape)
    return lat, lon
