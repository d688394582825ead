"""Conic projections: Lambert Conformal Conic (2SP) and Albers Equal-Area.

Ellipsoidal (WGS84) closed forms per the standard geodesy formulas the
reference gets from PROJ (``ogr/ogrct.cpp:665`` transform chain; LCC is
EPSG method 9802, Albers 9822) — the two most common projected CRS families
after UTM. Forward is closed-form (SQL-expressible for the oracle gate);
inverse iterates the conformal / authalic latitude to double precision.

SRS strings (parameterized, like PROJ +proj= strings):
  ``LCC:sp1,sp2,lat0,lon0[,fe,fn]``   e.g. LCC:33,45,23,-96
  ``AEA:sp1,sp2,lat0,lon0[,fe,fn]``   e.g. AEA:29.5,45.5,23,-96
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "lcc_forward",
    "lcc_inverse",
    "albers_forward",
    "albers_inverse",
    "parse_conic_srs",
]

_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_E = np.sqrt(_E2)
_D2R = np.pi / 180.0


def _m(phi):
    """Snyder m: cos(phi)/sqrt(1 - e^2 sin^2 phi)."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - _E2 * s * s)


def _t(phi):
    """Snyder t: tan(pi/4 - phi/2) / ((1 - e sin)/(1 + e sin))^(e/2)."""
    s = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / (
        ((1.0 - _E * s) / (1.0 + _E * s)) ** (_E / 2.0)
    )


def _q(phi):
    """Snyder q (authalic latitude kernel)."""
    s = np.sin(phi)
    return (1.0 - _E2) * (
        s / (1.0 - _E2 * s * s)
        - (1.0 / (2.0 * _E)) * np.log((1.0 - _E * s) / (1.0 + _E * s))
    )


def lcc_forward(lat, lon, sp1, sp2, lat0, lon0, fe=0.0, fn=0.0):
    """Lambert Conformal Conic 2SP forward (EPSG 9802). Degrees in, m out."""
    lat = np.asarray(lat, dtype=np.float64) * _D2R
    lon = np.asarray(lon, dtype=np.float64) * _D2R
    p1, p2, p0, l0 = (v * _D2R for v in (sp1, sp2, lat0, lon0))
    m1, m2 = _m(p1), _m(p2)
    t1, t2, t0 = _t(p1), _t(p2), _t(p0)
    n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    f_ = m1 / (n * t1**n)
    rho0 = _A * f_ * t0**n
    t = _t(lat)
    rho = _A * f_ * t**n
    theta = n * (lon - l0)
    x = fe + rho * np.sin(theta)
    y = fn + rho0 - rho * np.cos(theta)
    return x, y


def lcc_inverse(x, y, sp1, sp2, lat0, lon0, fe=0.0, fn=0.0):
    """LCC 2SP inverse; returns (lat, lon) degrees."""
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    p1, p2, p0, l0 = (v * _D2R for v in (sp1, sp2, lat0, lon0))
    m1, m2 = _m(p1), _m(p2)
    t1, t2, t0 = _t(p1), _t(p2), _t(p0)
    n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    f_ = m1 / (n * t1**n)
    rho0 = _A * f_ * t0**n
    rho = np.copysign(np.hypot(x, rho0 - y), n)
    t = (rho / (_A * f_)) ** (1.0 / n)
    theta = np.arctan2(np.sign(n) * x, np.sign(n) * (rho0 - y))
    # iterate conformal -> geodetic latitude
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        s = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - _E * s) / (1.0 + _E * s)) ** (_E / 2.0)
        )
    return phi / _D2R, (theta / n + l0) / _D2R


def albers_forward(lat, lon, sp1, sp2, lat0, lon0, fe=0.0, fn=0.0):
    """Albers Equal-Area conic forward (EPSG 9822). Degrees in, m out."""
    lat = np.asarray(lat, dtype=np.float64) * _D2R
    lon = np.asarray(lon, dtype=np.float64) * _D2R
    p1, p2, p0, l0 = (v * _D2R for v in (sp1, sp2, lat0, lon0))
    m1, m2 = _m(p1), _m(p2)
    q1, q2, q0 = _q(p1), _q(p2), _q(p0)
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    c = m1 * m1 + n * q1
    rho0 = _A * np.sqrt(c - n * q0) / n
    q = _q(lat)
    rho = _A * np.sqrt(c - n * q) / n
    theta = n * (lon - l0)
    x = fe + rho * np.sin(theta)
    y = fn + rho0 - rho * np.cos(theta)
    return x, y


def albers_inverse(x, y, sp1, sp2, lat0, lon0, fe=0.0, fn=0.0):
    """Albers inverse; returns (lat, lon) degrees."""
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    p1, p2, p0, l0 = (v * _D2R for v in (sp1, sp2, lat0, lon0))
    m1, m2 = _m(p1), _m(p2)
    q1, q2, q0 = _q(p1), _q(p2), _q(p0)
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    c = m1 * m1 + n * q1
    rho0 = _A * np.sqrt(c - n * q0) / n
    rho = np.hypot(x, rho0 - y)
    q = (c - (rho * n / _A) ** 2) / n
    theta = np.arctan2(np.sign(n) * x, np.sign(n) * (rho0 - y))
    # iterate authalic -> geodetic latitude
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(10):
        s = np.sin(phi)
        den = 1.0 - _E2 * s * s
        phi = phi + (den * den / (2.0 * np.cos(phi) + 1e-300)) * (
            q / (1.0 - _E2)
            - s / den
            + (1.0 / (2.0 * _E)) * np.log((1.0 - _E * s) / (1.0 + _E * s))
        )
    return phi / _D2R, (theta / n + l0) / _D2R


def parse_conic_srs(srs: str):
    """'LCC:sp1,sp2,lat0,lon0[,fe,fn]' / 'AEA:...' -> (kind, params) or None."""
    if not isinstance(srs, str) or ":" not in srs:
        return None
    kind, _, rest = srs.partition(":")
    if kind not in ("LCC", "AEA"):
        return None
    vals = [float(v) for v in rest.split(",")]
    if len(vals) == 4:
        vals += [0.0, 0.0]
    if len(vals) != 6:
        raise ValueError(f"bad conic SRS {srs!r}")
    return kind, tuple(vals)
