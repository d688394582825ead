"""Vectorized ray-casting point-in-polygon, bit-compatible with GDAL.

The kernel reimplements ``OGRLinearRing::isPointInRing``
(reference ``ogr/ogrlinearring.cpp:462-531``) exactly:

- optional envelope pre-test (``minx <= x <= maxx and miny <= y <= maxy``);
- for each ring segment (p[i-1], p[i]) with coordinates shifted so the test
  point is the origin: the segment is considered iff
  ``(y1 > 0 and y2 <= 0) or (y2 > 0 and y1 <= 0)``;
- crossing counted iff ``(x1*y2 - x2*y1) / (y2 - y1) > 0`` (strict);
- inside iff the crossing count is odd.

A point inside a hole ring is reported outside the polygon (odd-even over
outer ring minus holes), matching OGRPolygon semantics for simple polygons.
"""

from __future__ import annotations

import numpy as np

from gdal_ray.geo import wkb as _wkb

__all__ = ["points_in_ring", "points_in_polygon_rings", "points_in_polygon_wkb"]

# Max broadcast elements per chunk: keeps the (points x vertices) temporaries
# bounded (~8 float64 arrays of this size => ~250 MB peak per task).
_CHUNK_ELEMS = 4_000_000


def points_in_ring(px, py, ring, test_envelope=True):
    """Boolean mask of points strictly inside a ring (GDAL odd-even rules).

    px, py: (N,) float64; ring: (M, 2) closed or open vertex list
    (closure is implied via the segment loop exactly as GDAL stores rings
    closed; we require the caller to pass the closed form).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64)
    n = px.shape[0]
    m = ring.shape[0]
    if m < 4:  # GDAL: rings with < 4 points are never "inside"
        return np.zeros(n, dtype=bool)

    out = np.zeros(n, dtype=bool)
    cand = np.arange(n)
    if test_envelope:
        minx, miny = ring.min(axis=0)
        maxx, maxy = ring.max(axis=0)
        env = (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)
        cand = cand[env]
        if cand.size == 0:
            return out
        px = px[cand]
        py = py[cand]

    rx = ring[:, 0]
    ry = ring[:, 1]
    chunk = max(1, _CHUNK_ELEMS // m)
    for s in range(0, px.shape[0], chunk):
        cx = px[s : s + chunk, None]
        cy = py[s : s + chunk, None]
        # segment endpoints relative to each test point
        x1 = rx[None, 1:] - cx
        y1 = ry[None, 1:] - cy
        x2 = rx[None, :-1] - cx
        y2 = ry[None, :-1] - cy
        straddle = ((y1 > 0) & (y2 <= 0)) | ((y2 > 0) & (y1 <= 0))
        denom = y2 - y1
        with np.errstate(divide="ignore", invalid="ignore"):
            inter = (x1 * y2 - x2 * y1) / denom
        crossings = (straddle & (inter > 0.0)).sum(axis=1)
        out[cand[s : s + chunk]] = (crossings % 2).astype(bool)
    return out


def points_in_polygon_rings(px, py, rings):
    """Inside outer ring and not inside any hole. rings: [outer, *holes]."""
    if not rings:
        return np.zeros(np.asarray(px).shape[0], dtype=bool)
    inside = points_in_ring(px, py, rings[0])
    for hole in rings[1:]:
        if not inside.any():
            break
        inside &= ~points_in_ring(px, py, hole)
    return inside


def points_in_polygon_wkb(px, py, wkb_bytes):
    """Inside test against a WKB Polygon or MultiPolygon blob."""
    polys = _wkb.decode_polygons(wkb_bytes)
    out = np.zeros(np.asarray(px).shape[0], dtype=bool)
    for rings in polys:
        out |= points_in_polygon_rings(px, py, rings)
        if out.all():
            break
    return out
