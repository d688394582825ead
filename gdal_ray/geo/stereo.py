"""Stereographic + Hotine Oblique Mercator projections.

Closes the largest gap in the engine's PROJ-replacement seam
(``raster/warp.py`` transformer chain; reference ``ogr/ogrct.cpp:665``
OGRProjCT): the projection methods behind the common national/polar CRS
that are neither cylindrical (mercator/tmerc) nor conic (lcc/albers):

- EPSG method **9810** Polar Stereographic (variant A: k0 at the pole,
  e.g. UPS EPSG:5041/5042; variant B: standard parallel, e.g. the NSIDC
  sea-ice grids EPSG:3413/3976 and Antarctic EPSG:3031);
- EPSG method **9809** Oblique Stereographic ("double" stereographic via
  the conformal sphere, e.g. Amersfoort / RD New EPSG:28992 on Bessel);
- EPSG method **9815** Hotine Oblique Mercator variant B (rectified skew
  orthomorphic, e.g. Timbalai 1948 / RSO Borneo EPSG:29873 on Everest).

Formulas follow the published EPSG Guidance Note 7-2 / Snyder (1987)
closed forms, with the ellipsoid (a, 1/f) parameterized — national CRS on
Bessel/Everest work, unlike the WGS84-fixed conic module. Forward is
closed-form; inverses iterate the conformal latitude to double precision.

SRS strings (parameterized, mirroring geo/conic.py):
  ``PSTA:lat0,lon0,k0[,fe,fn[,a,rf]]``            9810 variant A
  ``PSTB:lat_ts,lon0[,fe,fn[,a,rf]]``             9810 variant B
  ``OSTE:lat0,lon0,k0[,fe,fn[,a,rf]]``            9809
  ``HOMB:latc,lonc,alpha,gamma,k0[,ec,nc[,a,rf]]``9815
plus the registered EPSG codes above. Anything else falls through to the
optional pyproj seam in ``raster/warp.py``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "polar_stereo_forward",
    "polar_stereo_inverse",
    "polar_stereo_k0_from_lat_ts",
    "oblique_stereo_forward",
    "oblique_stereo_inverse",
    "homerc_forward",
    "homerc_inverse",
    "parse_stereo_srs",
]

_WGS84 = (6378137.0, 298.257223563)
_D2R = np.pi / 180.0


def _ell(a, rf):
    f = 1.0 / rf
    e2 = f * (2.0 - f)
    return a, e2, np.sqrt(e2)


def _t_north(lat, e):
    """EPSG t for the NORTH polar aspect: small near the pole."""
    s = np.sin(lat)
    return np.tan(np.pi / 4.0 - lat / 2.0) * ((1.0 + e * s) / (1.0 - e * s)) ** (e / 2.0)


def _phi_from_t_north(t, e, iters: int = 10):
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(iters):
        s = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)
        )
    return phi


# --------------------------------------------------------------------------
# EPSG 9810 Polar Stereographic
# --------------------------------------------------------------------------

def polar_stereo_k0_from_lat_ts(lat_ts, a=_WGS84[0], rf=_WGS84[1]):
    """Variant B -> variant A: scale at the pole from the standard parallel."""
    a_, e2, e = _ell(a, rf)
    latf = abs(lat_ts) * _D2R
    s = np.sin(latf)
    mf = np.cos(latf) / np.sqrt(1.0 - e2 * s * s)
    tf = _t_north(latf, e)
    return float(
        mf * np.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e)) / (2.0 * tf)
    )


def polar_stereo_forward(lat, lon, lat0, lon0, k0, fe=0.0, fn=0.0,
                         a=_WGS84[0], rf=_WGS84[1]):
    """EPSG 9810 variant A forward (lat0 = +-90). Degrees in, meters out."""
    a_, e2, e = _ell(a, rf)
    lat = np.asarray(lat, dtype=np.float64) * _D2R
    lon = np.asarray(lon, dtype=np.float64) * _D2R
    l0 = lon0 * _D2R
    south = lat0 < 0
    if south:
        t = _t_north(-lat, e)
    else:
        t = _t_north(lat, e)
    rho = (
        2.0 * a_ * k0 * t
        / np.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
    )
    dl = lon - l0
    x = fe + rho * np.sin(dl)
    y = fn + (rho * np.cos(dl) if south else -rho * np.cos(dl))
    return x, y


def polar_stereo_inverse(x, y, lat0, lon0, k0, fe=0.0, fn=0.0,
                         a=_WGS84[0], rf=_WGS84[1]):
    """EPSG 9810 variant A inverse; returns (lat, lon) degrees."""
    a_, e2, e = _ell(a, rf)
    xp = np.asarray(x, dtype=np.float64) - fe
    yp = np.asarray(y, dtype=np.float64) - fn
    south = lat0 < 0
    rho = np.hypot(xp, yp)
    t = rho * np.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e)) / (2.0 * a_ * k0)
    phi = _phi_from_t_north(t, e)
    if south:
        lat = -phi
        lon = lon0 * _D2R + np.arctan2(xp, yp)
    else:
        lat = phi
        lon = lon0 * _D2R + np.arctan2(xp, -yp)
    return lat / _D2R, lon / _D2R


# --------------------------------------------------------------------------
# EPSG 9809 Oblique Stereographic (double projection via conformal sphere)
# --------------------------------------------------------------------------

def _oste_consts(lat0, lon0, a, rf):
    a_, e2, e = _ell(a, rf)
    p0 = lat0 * _D2R
    s0 = np.sin(p0)
    rho0 = a_ * (1.0 - e2) / (1.0 - e2 * s0 * s0) ** 1.5
    nu0 = a_ / np.sqrt(1.0 - e2 * s0 * s0)
    R = np.sqrt(rho0 * nu0)
    n = np.sqrt(1.0 + e2 * np.cos(p0) ** 4 / (1.0 - e2))
    S1 = (1.0 + s0) / (1.0 - s0)
    S2 = (1.0 - e * s0) / (1.0 + e * s0)
    w1 = (S1 * S2**e) ** n
    sin_chi00 = (w1 - 1.0) / (w1 + 1.0)
    c = (n + s0) * (1.0 - sin_chi00) / ((n - s0) * (1.0 + sin_chi00))
    w2 = c * w1
    chi0 = np.arcsin((w2 - 1.0) / (w2 + 1.0))
    return a_, e2, e, R, n, c, chi0, lon0 * _D2R


def oblique_stereo_forward(lat, lon, lat0, lon0, k0, fe=0.0, fn=0.0,
                           a=_WGS84[0], rf=_WGS84[1]):
    """EPSG 9809 forward. Degrees in, meters out."""
    a_, e2, e, R, n, c, chi0, L0 = _oste_consts(lat0, lon0, a, rf)
    lat = np.asarray(lat, dtype=np.float64) * _D2R
    lon = np.asarray(lon, dtype=np.float64) * _D2R
    lam = n * (lon - L0) + L0
    s = np.sin(lat)
    Sa = (1.0 + s) / (1.0 - s)
    Sb = (1.0 - e * s) / (1.0 + e * s)
    w = c * (Sa * Sb**e) ** n
    chi = np.arcsin((w - 1.0) / (w + 1.0))
    B = 1.0 + np.sin(chi) * np.sin(chi0) + np.cos(chi) * np.cos(chi0) * np.cos(lam - L0)
    x = fe + 2.0 * R * k0 * np.cos(chi) * np.sin(lam - L0) / B
    y = fn + 2.0 * R * k0 * (
        np.sin(chi) * np.cos(chi0) - np.cos(chi) * np.sin(chi0) * np.cos(lam - L0)
    ) / B
    return x, y


def oblique_stereo_inverse(x, y, lat0, lon0, k0, fe=0.0, fn=0.0,
                           a=_WGS84[0], rf=_WGS84[1]):
    """EPSG 9809 inverse; returns (lat, lon) degrees."""
    a_, e2, e, R, n, c, chi0, L0 = _oste_consts(lat0, lon0, a, rf)
    xp = np.asarray(x, dtype=np.float64) - fe
    yp = np.asarray(y, dtype=np.float64) - fn
    g = 2.0 * R * k0 * np.tan(np.pi / 4.0 - chi0 / 2.0)
    h = 4.0 * R * k0 * np.tan(chi0) + g
    i = np.arctan2(xp, h + yp)
    j = np.arctan2(xp, g - yp) - i
    chi = chi0 + 2.0 * np.arctan((yp - xp * np.tan(j / 2.0)) / (2.0 * R * k0))
    lam = j + 2.0 * i + L0
    lon = (lam - L0) / n + L0
    psi = 0.5 * np.log((1.0 + np.sin(chi)) / (c * (1.0 - np.sin(chi)))) / n
    # iterate isometric -> geodetic latitude (EPSG GN7-2 iteration)
    phi = 2.0 * np.arctan(np.exp(psi)) - np.pi / 2.0
    for _ in range(8):
        s = np.sin(phi)
        psi_i = np.log(
            np.tan(phi / 2.0 + np.pi / 4.0)
            * ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)
        )
        phi = phi - (psi_i - psi) * np.cos(phi) * (1.0 - e2 * s * s) / (1.0 - e2)
    return phi / _D2R, lon / _D2R


# --------------------------------------------------------------------------
# EPSG 9815 Hotine Oblique Mercator, variant B (rectified skew orthomorphic)
# --------------------------------------------------------------------------

def _homb_consts(latc, lonc, alpha, k0, a, rf):
    a_, e2, e = _ell(a, rf)
    pc = latc * _D2R
    ac = alpha * _D2R
    s = np.sin(pc)
    B = np.sqrt(1.0 + e2 * np.cos(pc) ** 4 / (1.0 - e2))
    A_ = a_ * B * k0 * np.sqrt(1.0 - e2) / (1.0 - e2 * s * s)
    t0 = _t_north(pc, e)
    D = B * np.sqrt(1.0 - e2) / (np.cos(pc) * np.sqrt(1.0 - e2 * s * s))
    D2 = max(float(D * D), 1.0)
    F = D + np.sqrt(D2 - 1.0) * np.sign(pc)
    H = F * t0**B
    G = (F - 1.0 / F) / 2.0
    gamma0 = np.arcsin(np.sin(ac) / D)
    lam0 = lonc * _D2R - np.arcsin(G * np.tan(gamma0)) / B
    uc = (A_ / B) * np.arctan2(np.sqrt(D2 - 1.0), np.cos(ac)) * np.sign(pc)
    return a_, e2, e, B, A_, H, gamma0, lam0, uc


def homerc_forward(lat, lon, latc, lonc, alpha, gamma, k0, ec=0.0, nc=0.0,
                   a=_WGS84[0], rf=_WGS84[1]):
    """EPSG 9815 forward (variant B: grid origin at the projection center).
    Degrees in, meters out."""
    a_, e2, e, B, A_, H, gamma0, lam0, uc = _homb_consts(latc, lonc, alpha, k0, a, rf)
    gc = gamma * _D2R
    lat = np.asarray(lat, dtype=np.float64) * _D2R
    lon = np.asarray(lon, dtype=np.float64) * _D2R
    t = _t_north(lat, e)
    Q = H / t**B
    S = (Q - 1.0 / Q) / 2.0
    T = (Q + 1.0 / Q) / 2.0
    V = np.sin(B * (lon - lam0))
    U = (-V * np.cos(gamma0) + S * np.sin(gamma0)) / T
    v = A_ * np.log((1.0 - U) / (1.0 + U)) / (2.0 * B)
    u = (
        A_ * np.arctan2(S * np.cos(gamma0) + V * np.sin(gamma0), np.cos(B * (lon - lam0)))
        / B
    ) - np.abs(uc) * np.sign(latc)
    x = v * np.cos(gc) + u * np.sin(gc) + ec
    y = u * np.cos(gc) - v * np.sin(gc) + nc
    return x, y


def homerc_inverse(x, y, latc, lonc, alpha, gamma, k0, ec=0.0, nc=0.0,
                   a=_WGS84[0], rf=_WGS84[1]):
    """EPSG 9815 inverse; returns (lat, lon) degrees."""
    a_, e2, e, B, A_, H, gamma0, lam0, uc = _homb_consts(latc, lonc, alpha, k0, a, rf)
    gc = gamma * _D2R
    xp = np.asarray(x, dtype=np.float64) - ec
    yp = np.asarray(y, dtype=np.float64) - nc
    v = xp * np.cos(gc) - yp * np.sin(gc)
    u = yp * np.cos(gc) + xp * np.sin(gc) + np.abs(uc) * np.sign(latc)
    Q = np.exp(-B * v / A_)
    S = (Q - 1.0 / Q) / 2.0
    T = (Q + 1.0 / Q) / 2.0
    V = np.sin(B * u / A_)
    U = (V * np.cos(gamma0) + S * np.sin(gamma0)) / T
    t = (H / np.sqrt((1.0 + U) / (1.0 - U))) ** (1.0 / B)
    phi = _phi_from_t_north(t, e)
    lon = lam0 - np.arctan2(S * np.cos(gamma0) - V * np.sin(gamma0), np.cos(B * u / A_)) / B
    return phi / _D2R, lon / _D2R


# --------------------------------------------------------------------------
# SRS registry / parser
# --------------------------------------------------------------------------

_BESSEL = (6377397.155, 299.1528128)
_EVEREST_B = (6377298.556, 300.8017)
_GRS80 = (6378137.0, 298.257222101)

_DMS = lambda d, m, s: d + m / 60.0 + s / 3600.0  # noqa: E731

_EPSG_STEREO = {
    # Universal Polar Stereographic (variant A): k0 at the pole
    "EPSG:5041": ("PSTA", (90.0, 0.0, 0.994, 2000000.0, 2000000.0, *_WGS84)),
    "EPSG:5042": ("PSTA", (-90.0, 0.0, 0.994, 2000000.0, 2000000.0, *_WGS84)),
    # NSIDC sea-ice grids + Antarctic Polar Stereographic (variant B)
    "EPSG:3413": ("PSTB", (70.0, -45.0, 0.0, 0.0, *_WGS84)),
    "EPSG:3976": ("PSTB", (-70.0, 0.0, 0.0, 0.0, *_WGS84)),
    "EPSG:3031": ("PSTB", (-71.0, 0.0, 0.0, 0.0, *_WGS84)),
    # Amersfoort / RD New (oblique stereographic on Bessel 1841)
    "EPSG:28992": (
        "OSTE",
        (_DMS(52, 9, 22.178), _DMS(5, 23, 15.5), 0.9999079, 155000.0, 463000.0, *_BESSEL),
    ),
    # Timbalai 1948 / RSO Borneo (m) — Hotine Oblique Mercator variant B
    "EPSG:29873": (
        "HOMB",
        (
            4.0, 115.0,
            _DMS(53, 18, 56.9537), _DMS(53, 7, 48.3685), 0.99984,
            590476.87, 442857.65, *_EVEREST_B,
        ),
    ),
}


def parse_stereo_srs(srs: str):
    """Return (kind, params) for a stereographic/HOM SRS string, else None.

    ``kind`` in {"PSTA", "PSTB", "OSTE", "HOMB"}; params are the positional
    arguments of the matching forward/inverse function (defaults filled).
    """
    hit = _EPSG_STEREO.get(srs)
    if hit is not None:
        return hit
    for kind, n_req, n_all in (("PSTA", 3, 7), ("PSTB", 2, 6), ("OSTE", 3, 7), ("HOMB", 5, 9)):
        if srs.startswith(kind + ":"):
            vals = [float(v) for v in srs[len(kind) + 1 :].split(",")]
            if not (n_req <= len(vals) <= n_all):
                raise ValueError(f"{kind} SRS needs {n_req}-{n_all} params: {srs!r}")
            defaults = {
                "PSTA": [0.0, 0.0, *_WGS84],
                "PSTB": [0.0, 0.0, *_WGS84],
                "OSTE": [0.0, 0.0, *_WGS84],
                "HOMB": [0.0, 0.0, *_WGS84],
            }[kind]
            vals = vals + defaults[len(vals) - n_req :]
            return kind, tuple(vals)
    return None


def stereo_to_latlon(x, y, kind: str, params):
    if kind == "PSTA":
        return polar_stereo_inverse(x, y, *params)
    if kind == "PSTB":
        lat_ts, lon0, fe, fn, a, rf = params
        k0 = polar_stereo_k0_from_lat_ts(lat_ts, a, rf)
        lat0 = 90.0 if lat_ts > 0 else -90.0
        return polar_stereo_inverse(x, y, lat0, lon0, k0, fe, fn, a, rf)
    if kind == "OSTE":
        return oblique_stereo_inverse(x, y, *params)
    if kind == "HOMB":
        return homerc_inverse(x, y, *params)
    raise ValueError(kind)


def latlon_to_stereo(lat, lon, kind: str, params):
    if kind == "PSTA":
        return polar_stereo_forward(lat, lon, *params)
    if kind == "PSTB":
        lat_ts, lon0, fe, fn, a, rf = params
        k0 = polar_stereo_k0_from_lat_ts(lat_ts, a, rf)
        lat0 = 90.0 if lat_ts > 0 else -90.0
        return polar_stereo_forward(lat, lon, lat0, lon0, k0, fe, fn, a, rf)
    if kind == "OSTE":
        return oblique_stereo_forward(lat, lon, *params)
    if kind == "HOMB":
        return homerc_forward(lat, lon, *params)
    raise ValueError(kind)
