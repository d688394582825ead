"""Geolocation-array transformer (``alg/gdalgeoloc.cpp``).

The reference's GEOLOCATION metadata domain georeferences a raster by two
2-D arrays of geo coordinates (GEOLOC X/Y bands, optionally subsampled by
PIXEL_STEP/LINE_STEP with PIXEL_OFFSET/LINE_OFFSET — the common shape of
swath satellite products). Forward (pixel -> geo) is bilinear
interpolation in the arrays; inverse (geo -> pixel) replaces GDAL's
precomputed backmap grid with a vectorized coarse-seed + Newton refinement
on the same bilinear surface — no grid to size/store, converges in a few
iterations on any locally-invertible geolocation field.

Built once per task/actor (the seed grid is a tiny subsample), applied
vectorized over whole destination grids — the same contract as
``geo/gcp.py`` transforms, so ``raster/warp.warp_image_transform`` accepts
it directly.
"""

from __future__ import annotations

import numpy as np

__all__ = ["GeolocTransform"]


class GeolocTransform:
    """``geo_x``/``geo_y``: (rows, cols) arrays of geo coordinates at the
    geoloc-grid nodes; node (r, c) georeferences image pixel
    ``(pixel_offset + c*pixel_step, line_offset + r*line_step)``
    (GDALCreateGeoLocTransformer's four metadata knobs)."""

    def __init__(self, geo_x, geo_y, pixel_offset: float = 0.0,
                 line_offset: float = 0.0, pixel_step: float = 1.0,
                 line_step: float = 1.0, seed_stride: int | None = None):
        self.gx = np.asarray(geo_x, dtype=np.float64)
        self.gy = np.asarray(geo_y, dtype=np.float64)
        if self.gx.shape != self.gy.shape or self.gx.ndim != 2:
            raise ValueError("geo_x/geo_y must be equal-shape 2-D arrays")
        self.px0, self.py0 = float(pixel_offset), float(line_offset)
        self.pxs, self.pys = float(pixel_step), float(line_step)
        h, w = self.gx.shape
        if seed_stride is None:
            seed_stride = max(1, min(h, w) // 64)
        rr = np.arange(0, h, seed_stride)
        cc = np.arange(0, w, seed_stride)
        self._seed_rc = (rr, cc)
        self._seed_x = self.gx[np.ix_(rr, cc)].ravel()
        self._seed_y = self.gy[np.ix_(rr, cc)].ravel()
        self._seed_r = np.repeat(rr.astype(np.float64), len(cc))
        self._seed_c = np.tile(cc.astype(np.float64), len(rr))

    # -- grid-space helpers (r, c are FRACTIONAL geoloc-array indices) ----

    def _sample(self, r, c):
        h, w = self.gx.shape
        r = np.clip(r, 0.0, h - 1.0)
        c = np.clip(c, 0.0, w - 1.0)
        r0 = np.clip(np.floor(r).astype(np.int64), 0, h - 2) if h > 1 else np.zeros_like(r, np.int64)
        c0 = np.clip(np.floor(c).astype(np.int64), 0, w - 2) if w > 1 else np.zeros_like(c, np.int64)
        fr = r - r0
        fc = c - c0
        def bi(a):
            return (a[r0, c0] * (1 - fr) * (1 - fc) + a[r0, c0 + 1] * (1 - fr) * fc
                    + a[r0 + 1, c0] * fr * (1 - fc) + a[r0 + 1, c0 + 1] * fr * fc)
        return bi(self.gx), bi(self.gy)

    def forward(self, px, py):
        """Image pixel coords -> geo coords (bilinear in the arrays)."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        c = (px - self.px0) / self.pxs
        r = (py - self.py0) / self.pys
        return self._sample(r, c)

    def inverse(self, gx, gy, iters: int = 20, tol: float = 1e-9):
        """Geo coords -> image pixel coords: nearest seed node + Newton on
        the bilinear surface (numeric Jacobian, damped), vectorized."""
        gx = np.asarray(gx, dtype=np.float64)
        gy = np.asarray(gy, dtype=np.float64)
        flat_x = gx.ravel()
        flat_y = gy.ravel()
        # coarse seed: nearest subsampled node. Chunk size scales inversely
        # with the seed count so the (chunk x n_seeds) d2 matrix stays
        # ~16M float64 elements (~128 MB) regardless of grid size — a fixed
        # chunk would allocate chunk*n_seeds*8 bytes per concurrent task
        # (e.g. 65536 x 4096 = 2 GB).
        r = np.empty(flat_x.shape, dtype=np.float64)
        c = np.empty(flat_x.shape, dtype=np.float64)
        B = max(1, 16_000_000 // max(len(self._seed_x), 1))
        for s in range(0, len(flat_x), B):
            e = min(s + B, len(flat_x))
            d2 = (flat_x[s:e, None] - self._seed_x[None, :]) ** 2 + (
                flat_y[s:e, None] - self._seed_y[None, :]
            ) ** 2
            k = np.argmin(d2, axis=1)
            r[s:e] = self._seed_r[k]
            c[s:e] = self._seed_c[k]
        h, w = self.gx.shape
        dr = 1e-3
        for _ in range(iters):
            fx, fy = self._sample(r, c)
            ex = fx - flat_x
            ey = fy - flat_y
            if max(np.abs(ex).max(initial=0.0), np.abs(ey).max(initial=0.0)) < tol:
                break
            # Jacobian sampled from INSIDE the grid: at the last row/col a
            # forward difference would clip to zero and strand the point
            rj = np.minimum(r, h - 1.0 - dr)
            cj = np.minimum(c, w - 1.0 - dr)
            fxj, fyj = self._sample(rj, cj)
            fx1, fy1 = self._sample(rj + dr, cj)
            fx2, fy2 = self._sample(rj, cj + dr)
            j11 = (fx2 - fxj) / dr  # dX/dc
            j21 = (fy2 - fyj) / dr  # dY/dc
            j12 = (fx1 - fxj) / dr  # dX/dr
            j22 = (fy1 - fyj) / dr  # dY/dr
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-30, 1e-30, det)
            dc = (j22 * ex - j12 * ey) / det
            drw = (-j21 * ex + j11 * ey) / det
            c = np.clip(c - dc, 0.0, w - 1.0)
            r = np.clip(r - drw, 0.0, h - 1.0)
        px = self.px0 + c * self.pxs
        py = self.py0 + r * self.pys
        return px.reshape(gx.shape), py.reshape(gy.shape)
