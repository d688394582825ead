"""Hilbert-curve keys for spatial-locality sorting.

The FlatGeobuf writer sorts features by Hilbert index before building its
packed R-tree (reference ``ogr/ogrsf_frmts/flatgeobuf/packedrtree.h:93-105``);
our engine's analog is ``ds.sort("hilbert")`` before writing spatially
clustered output. Standard xy->d curve mapping (public Hilbert curve
algorithm), vectorized over uint32 lattice coordinates.
"""

from __future__ import annotations

import numpy as np

__all__ = ["hilbert_xy2d", "hilbert_key_meters"]


def hilbert_xy2d(order: int, x, y):
    """(x, y) on a 2^order grid -> Hilbert distance (vectorized)."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    rx = np.zeros_like(x)
    ry = np.zeros_like(y)
    d = np.zeros_like(x)
    s = np.int64(1) << np.int64(order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = x[flip]
        y_f = y[flip]
        x[flip] = s - 1 - x_f
        y[flip] = s - 1 - y_f
        xs = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = xs
        s >>= 1
    return d


def hilbert_key_meters(mx, my, order: int = 16):
    """EPSG:3857 meters -> Hilbert key on a 2^order x 2^order world grid."""
    from gdal_ray.geo.mercator import ORIGIN_SHIFT

    n = np.int64(1) << np.int64(order)
    fx = (np.asarray(mx, dtype=np.float64) + ORIGIN_SHIFT) / (2 * ORIGIN_SHIFT)
    fy = (np.asarray(my, dtype=np.float64) + ORIGIN_SHIFT) / (2 * ORIGIN_SHIFT)
    ix = np.clip((fx * n).astype(np.int64), 0, n - 1)
    iy = np.clip((fy * n).astype(np.int64), 0, n - 1)
    return hilbert_xy2d(order, ix, iy)
