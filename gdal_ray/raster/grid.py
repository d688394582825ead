"""Gridding: scattered points -> raster (GDALGrid algorithms).

Kernels mirror ``alg/gdalgrid.h:50-98`` / ``alg/gdalgrid.cpp``:
- invdist: Shepard inverse-distance-to-a-power with smoothing
  (``GDALGridInverseDistanceToAPower``), power=2, smoothing=0 defaults;
  a point exactly on a node short-circuits to its value;
- nearest: value of the nearest point (ties: first in input order, the
  quadtree-iteration order GDAL uses);
- average / minimum / maximum / range / count: moving-window metrics over
  points within ``radius`` (circular window), nodata where empty.

The distributed form: output tiles keyed by cell id, input points routed to
tiles via k-ring replication (groupby(cell).map_groups with these kernels);
per-image/per-tile grids here are brute-force numpy (the in-cell kernel).
"""

from __future__ import annotations

import numpy as np

__all__ = ["grid_points"]


def grid_points(
    px,
    py,
    pv,
    w,
    h,
    gt,
    algorithm="invdist",
    power=2.0,
    smoothing=0.0,
    radius=np.inf,
    nodata=0.0,
):
    """Compute an (h, w) grid from points; node centers via the
    geotransform (node value sampled at pixel centers, gdal_grid layout)."""
    from gdal_ray.geo.affine import apply_geotransform

    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    pv = np.asarray(pv, dtype=np.float64)
    cols, rows = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    gx, gy = apply_geotransform(gt, cols.ravel(), rows.ravel())
    # (nodes, points) distances, chunked over nodes
    out = np.full(w * h, np.float64(nodata))
    chunk = max(1, 2_000_000 // max(1, len(px)))
    for s in range(0, len(gx), chunk):
        dx = gx[s : s + chunk, None] - px[None, :]
        dy = gy[s : s + chunk, None] - py[None, :]
        d2 = dx * dx + dy * dy
        if algorithm == "invdist":
            r2 = d2 + smoothing * smoothing
            exact = r2 == 0.0
            wgt = 1.0 / np.maximum(r2, 1e-300) ** (power / 2.0)
            if np.isfinite(radius):
                wgt = np.where(d2 <= radius * radius, wgt, 0.0)
            num = (wgt * pv[None, :]).sum(axis=1)
            den = wgt.sum(axis=1)
            vals = np.where(den > 0, num / np.where(den == 0, 1, den), nodata)
            hit = exact.any(axis=1)
            if hit.any():
                first = exact.argmax(axis=1)
                vals[hit] = pv[first[hit]]
            out[s : s + chunk] = vals
        elif algorithm == "nearest":
            if np.isfinite(radius):
                masked = np.where(d2 <= radius * radius, d2, np.inf)
            else:
                masked = d2
            idx = masked.argmin(axis=1)
            vals = pv[idx]
            empty = ~np.isfinite(masked.min(axis=1))
            vals[empty] = nodata
            out[s : s + chunk] = vals
        else:
            inside = d2 <= radius * radius
            cnt = inside.sum(axis=1)
            if algorithm == "count":
                out[s : s + chunk] = cnt
                continue
            vv = np.where(inside, pv[None, :], np.nan)
            with np.errstate(invalid="ignore"):
                if algorithm == "average":
                    vals = np.nanmean(vv, axis=1)
                elif algorithm == "minimum":
                    vals = np.nanmin(np.where(inside, vv, np.inf), axis=1)
                    vals[~np.isfinite(vals)] = np.nan
                elif algorithm == "maximum":
                    vals = np.nanmax(np.where(inside, vv, -np.inf), axis=1)
                    vals[~np.isfinite(vals)] = np.nan
                elif algorithm == "range":
                    lo = np.nanmin(np.where(inside, vv, np.inf), axis=1)
                    hi = np.nanmax(np.where(inside, vv, -np.inf), axis=1)
                    vals = hi - lo
                    vals[~np.isfinite(vals)] = np.nan
                else:
                    raise ValueError(algorithm)
            vals = np.where(cnt > 0, vals, nodata)
            out[s : s + chunk] = vals
    return out.reshape(h, w)
