"""Six-coefficient affine geotransform math.

Semantics match the GDAL reference:
- apply: ``geoX = GT0 + px*GT1 + ln*GT2; geoY = GT3 + px*GT4 + ln*GT5``
  (reference ``alg/gdaltransformer.cpp:4491-4500``, GDALApplyGeoTransform).
- invert: special-cased axis-aligned path plus 2x2 adjoint/determinant path
  with the same ``|det| <= 1e-10 * magnitude^2`` singularity test
  (reference ``alg/gdaltransformer.cpp:4516+``, GDALInvGeoTransform).

All functions are vectorized: ``px``/``ln`` may be scalars or numpy arrays.
"""

from __future__ import annotations

import numpy as np

__all__ = ["apply_geotransform", "invert_geotransform", "pixel_to_geo_bbox"]


def apply_geotransform(gt, px, ln):
    """(pixel, line) -> (geoX, geoY). ``gt`` is the 6-coefficient sequence."""
    px = np.asarray(px, dtype=np.float64)
    ln = np.asarray(ln, dtype=np.float64)
    geo_x = gt[0] + px * gt[1] + ln * gt[2]
    geo_y = gt[3] + px * gt[4] + ln * gt[5]
    return geo_x, geo_y


def invert_geotransform(gt):
    """Return the inverse 6-coefficient transform, or None if singular.

    Mirrors GDALInvGeoTransform including the no-rotation fast path (which
    avoids determinant round-off) and the singularity threshold.
    """
    gt = [float(v) for v in gt]
    if gt[2] == 0.0 and gt[4] == 0.0 and gt[1] != 0.0 and gt[5] != 0.0:
        return (
            -gt[0] / gt[1],
            1.0 / gt[1],
            0.0,
            -gt[3] / gt[5],
            0.0,
            1.0 / gt[5],
        )

    det = gt[1] * gt[5] - gt[2] * gt[4]
    magnitude = max(abs(gt[1]), abs(gt[2]), abs(gt[4]), abs(gt[5]))
    if abs(det) <= 1e-10 * magnitude * magnitude:
        return None
    inv_det = 1.0 / det
    return (
        (gt[2] * gt[3] - gt[0] * gt[5]) * inv_det,
        gt[5] * inv_det,
        -gt[2] * inv_det,
        (-gt[1] * gt[3] + gt[0] * gt[4]) * inv_det,
        -gt[4] * inv_det,
        gt[1] * inv_det,
    )


def pixel_to_geo_bbox(gt_arr, w, h):
    """Vectorized per-row geo bbox of images from their geotransforms.

    ``gt_arr``: (N, 6) float64; ``w``/``h``: (N,) pixel sizes.
    Returns (minx, miny, maxx, maxy) arrays covering all four corners, so
    rotated geotransforms (gt2/gt4 != 0) are handled correctly.
    """
    gt_arr = np.asarray(gt_arr, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)
    h = np.asarray(h, dtype=np.float64)
    zeros = np.zeros_like(w)
    corners_px = (zeros, w, zeros, w)
    corners_ln = (zeros, zeros, h, h)
    xs = np.stack(
        [gt_arr[:, 0] + px * gt_arr[:, 1] + ln * gt_arr[:, 2] for px, ln in zip(corners_px, corners_ln)],
        axis=0,
    )
    ys = np.stack(
        [gt_arr[:, 3] + px * gt_arr[:, 4] + ln * gt_arr[:, 5] for px, ln in zip(corners_px, corners_ln)],
        axis=0,
    )
    return xs.min(axis=0), ys.min(axis=0), xs.max(axis=0), ys.max(axis=0)
