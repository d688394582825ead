"""GCP-based geotransforms: polynomial, thin-plate-spline, and RPC.

The reference's non-SRS transformer family (``GDALCreateGenImgProjTransformer``
GCP paths): polynomial orders 1-3 fit by least squares (``alg/gdal_crs.c``,
the CRS_ functions lifted from GRASS i.rectify), exact thin-plate-spline
interpolation (``alg/gdal_tps.cpp`` + ``alg/thinplatespline.cpp``), and the
rational polynomial coefficient model for satellite imagery
(``alg/gdal_rpc.cpp``, the RPC00B 20-term cubic ratio).

Each transform fits/solves ONCE (numpy lstsq / dense solve — GCP counts are
tens to thousands, tiny) and applies vectorized over pixel arrays, so a
warp stage builds the transform in the actor/task once and maps whole
destination grids per batch. Both directions are fitted independently from
the same GCPs, exactly like the reference (forward px->geo and reverse
geo->px solve separate coefficient sets; TPS solves two splines; RPC
inverts iteratively).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "GCPPolynomial",
    "ThinPlateSpline",
    "RPCTransform",
]

_N_TERMS = {1: 3, 2: 6, 3: 10}


def _poly_design(x, y, order: int) -> np.ndarray:
    """Design matrix with GDAL's term order (gdal_crs.c exponent loop:
    constant, then increasing total degree, x-major within a degree)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    cols = [np.ones_like(x)]
    for deg in range(1, order + 1):
        for j in range(deg + 1):
            cols.append(x ** (deg - j) * y**j)
    return np.stack(cols, axis=-1)


class GCPPolynomial:
    """Least-squares polynomial GCP transform (``alg/gdal_crs.c``).

    ``gcps``: array-like of (pixel, line, geo_x, geo_y). ``order`` in
    {1, 2, 3} (order 1 = affine, the gdal_translate -gcp default pick).
    Forward maps (pixel, line) -> (geo_x, geo_y); ``inverse`` maps back
    through an independently fitted reverse polynomial, mirroring
    GDALGCPTransform's bReversed handling.
    """

    def __init__(self, gcps, order: int = 1):
        g = np.asarray(gcps, dtype=np.float64)
        if order not in _N_TERMS:
            raise ValueError("polynomial order must be 1, 2 or 3")
        if len(g) < _N_TERMS[order]:
            raise ValueError(
                f"order {order} needs >= {_N_TERMS[order]} GCPs, got {len(g)}"
            )
        self.order = order
        A = _poly_design(g[:, 0], g[:, 1], order)
        self.fwd_x, *_ = np.linalg.lstsq(A, g[:, 2], rcond=None)
        self.fwd_y, *_ = np.linalg.lstsq(A, g[:, 3], rcond=None)
        B = _poly_design(g[:, 2], g[:, 3], order)
        self.rev_x, *_ = np.linalg.lstsq(B, g[:, 0], rcond=None)
        self.rev_y, *_ = np.linalg.lstsq(B, g[:, 1], rcond=None)
        # rms residual of the forward fit (gdal_crs.c reports per-GCP error)
        fx = A @ self.fwd_x
        fy = A @ self.fwd_y
        self.rms = float(np.sqrt(np.mean((fx - g[:, 2]) ** 2 + (fy - g[:, 3]) ** 2)))

    def forward(self, px, py):
        A = _poly_design(px, py, self.order)
        return A @ self.fwd_x, A @ self.fwd_y

    def inverse(self, gx, gy):
        B = _poly_design(gx, gy, self.order)
        return B @ self.rev_x, B @ self.rev_y


def _tps_kernel(d2: np.ndarray) -> np.ndarray:
    """r^2 log r^2 basis exactly as thinplatespline.cpp base_func (which
    returns r2 * log(r2) * 0.5 == r^2 log r)."""
    out = np.zeros_like(d2)
    nz = d2 > 0
    out[nz] = d2[nz] * np.log(d2[nz]) * 0.5
    return out


class ThinPlateSpline:
    """Exact TPS interpolation through all GCPs (``alg/gdal_tps.cpp``).

    Solves the classic augmented system [[K, P], [P^T, 0]] once per
    direction; apply is one (n_points x n_gcps) kernel matmul per batch.
    """

    def __init__(self, gcps):
        g = np.asarray(gcps, dtype=np.float64)
        if len(g) < 3:
            raise ValueError("TPS needs >= 3 GCPs")
        self._fwd = self._solve(g[:, :2], g[:, 2:4])
        self._rev = self._solve(g[:, 2:4], g[:, :2])

    @staticmethod
    def _solve(src, dst):
        n = len(src)
        d2 = ((src[:, None, :] - src[None, :, :]) ** 2).sum(axis=2)
        K = _tps_kernel(d2)
        P = np.concatenate([np.ones((n, 1)), src], axis=1)
        A = np.zeros((n + 3, n + 3))
        A[:n, :n] = K
        A[:n, n:] = P
        A[n:, :n] = P.T
        rhs = np.zeros((n + 3, 2))
        rhs[:n] = dst
        coef = np.linalg.solve(A, rhs)
        return src, coef

    @staticmethod
    def _apply(model, x, y):
        src, coef = model
        pts = np.stack(
            [np.asarray(x, dtype=np.float64).ravel(), np.asarray(y, dtype=np.float64).ravel()],
            axis=1,
        )
        d2 = ((pts[:, None, :] - src[None, :, :]) ** 2).sum(axis=2)
        K = _tps_kernel(d2)
        n = len(src)
        out = K @ coef[:n] + coef[n] + pts @ coef[n + 1 :]
        shp = np.shape(x)
        return out[:, 0].reshape(shp), out[:, 1].reshape(shp)

    def forward(self, px, py):
        return self._apply(self._fwd, px, py)

    def inverse(self, gx, gy):
        return self._apply(self._rev, gx, gy)


# RPC00B term order (alg/gdal_rpc.cpp RPCEvaluate): 20 coefficients over
# normalized (L=long, P=lat, H=height):
# 1, L, P, H, LP, LH, PH, L2, P2, H2, PLH, L3, LP2, LH2, L2P, P3, PH2,
# L2H, P2H, H3
def _rpc_terms(L, P, H):
    return np.stack(
        [
            np.ones_like(L), L, P, H, L * P, L * H, P * H, L * L, P * P, H * H,
            P * L * H, L**3, L * P * P, L * H * H, L * L * P, P**3, P * H * H,
            L * L * H, P * P * H, H**3,
        ],
        axis=-1,
    )


class RPCTransform:
    """Rational polynomial (RPC00B) transform (``alg/gdal_rpc.cpp``).

    ``rpc``: dict with LINE_NUM_COEFF/LINE_DEN_COEFF/SAMP_NUM_COEFF/
    SAMP_DEN_COEFF (20 floats each) and the 10 offset/scale fields
    (LAT/LONG/HEIGHT/LINE/SAMP _OFF and _SCALE). Forward maps
    (lon, lat[, height]) -> (pixel, line); ``inverse`` iterates the
    forward model (GDALRPCTransform's reverse Newton loop).
    """

    _REQ = (
        "LINE_NUM_COEFF", "LINE_DEN_COEFF", "SAMP_NUM_COEFF", "SAMP_DEN_COEFF",
        "LAT_OFF", "LAT_SCALE", "LONG_OFF", "LONG_SCALE", "HEIGHT_OFF",
        "HEIGHT_SCALE", "LINE_OFF", "LINE_SCALE", "SAMP_OFF", "SAMP_SCALE",
    )

    def __init__(self, rpc: dict):
        missing = [k for k in self._REQ if k not in rpc]
        if missing:
            raise ValueError(f"RPC metadata missing {missing}")
        self.rpc = {
            k: (np.asarray(v, dtype=np.float64) if "COEFF" in k else float(v))
            for k, v in rpc.items()
            if k in self._REQ
        }
        for k in self._REQ[:4]:
            if self.rpc[k].shape != (20,):
                raise ValueError(f"{k} must have 20 coefficients")

    def forward(self, lon, lat, height=0.0):
        r = self.rpc
        L = (np.asarray(lon, dtype=np.float64) - r["LONG_OFF"]) / r["LONG_SCALE"]
        P = (np.asarray(lat, dtype=np.float64) - r["LAT_OFF"]) / r["LAT_SCALE"]
        H = (np.asarray(height, dtype=np.float64) - r["HEIGHT_OFF"]) / r["HEIGHT_SCALE"]
        H = np.broadcast_to(H, np.broadcast_shapes(L.shape, P.shape, H.shape))
        t = _rpc_terms(*np.broadcast_arrays(L, P, H))
        line = (t @ r["LINE_NUM_COEFF"]) / (t @ r["LINE_DEN_COEFF"])
        samp = (t @ r["SAMP_NUM_COEFF"]) / (t @ r["SAMP_DEN_COEFF"])
        return (
            samp * r["SAMP_SCALE"] + r["SAMP_OFF"],
            line * r["LINE_SCALE"] + r["LINE_OFF"],
        )

    def inverse(self, px, py, height=0.0, iters: int = 10):
        """(pixel, line) -> (lon, lat) by damped Newton on the forward
        model with numeric Jacobian (gdal_rpc.cpp reverse path)."""
        r = self.rpc
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        lon = np.full(px.shape, r["LONG_OFF"], dtype=np.float64)
        lat = np.full(py.shape, r["LAT_OFF"], dtype=np.float64)
        dl = r["LONG_SCALE"] * 1e-6
        dp = r["LAT_SCALE"] * 1e-6
        for _ in range(iters):
            fx, fy = self.forward(lon, lat, height)
            ex = fx - px
            ey = fy - py
            if max(np.abs(ex).max(initial=0), np.abs(ey).max(initial=0)) < 1e-9:
                break
            fx1, fy1 = self.forward(lon + dl, lat, height)
            fx2, fy2 = self.forward(lon, lat + dp, height)
            j11 = (fx1 - fx) / dl
            j21 = (fy1 - fy) / dl
            j12 = (fx2 - fx) / dp
            j22 = (fy2 - fy) / dp
            det = j11 * j22 - j12 * j21
            det = np.where(det == 0, 1e-30, det)
            lon = lon - (j22 * ex - j12 * ey) / det
            lat = lat - (-j21 * ex + j11 * ey) / det
        return lon, lat
