"""Independent scalar oracle implementations (literal formula translations).

These deliberately mirror the cited GDAL reference code line-by-line in plain
scalar Python (math module, per-point loops) so that the engine's vectorized
numpy kernels are cross-checked against an INDEPENDENT rendering of the same
formulas — not against themselves. Used only by the fixture generator and
tests; never imported by pipeline code.
"""

from __future__ import annotations

import math

__all__ = [
    "merc_latlon_to_meters",
    "merc_meters_to_tile_tms",
    "tms_to_xyz",
    "point_in_ring_scalar",
    "point_in_polygon_scalar",
    "tiles_for_bbox",
]

_R = 6378137.0
_ORIGIN_SHIFT = 2 * math.pi * _R / 2.0
_INITIAL_RES = 2 * math.pi * _R / 256.0


def merc_latlon_to_meters(lat, lon):
    """gdal2tiles.py:422-430 LatLonToMeters, scalar."""
    mx = lon * _ORIGIN_SHIFT / 180.0
    my = math.log(math.tan((90 + lat) * math.pi / 360.0)) / (math.pi / 180.0)
    my = my * _ORIGIN_SHIFT / 180.0
    return mx, my


def merc_meters_to_tile_tms(mx, my, zoom):
    """gdal2tiles.py MetersToPixels + PixelsToTile (ceil/256 - 1 rule)."""
    res = _INITIAL_RES / (2**zoom)
    px = (mx + _ORIGIN_SHIFT) / res
    py = (my + _ORIGIN_SHIFT) / res
    tx = int(math.ceil(px / 256.0) - 1)
    ty = int(math.ceil(py / 256.0) - 1)
    return tx, ty


def tms_to_xyz(ty, zoom):
    return (2**zoom) - 1 - ty


def point_in_ring_scalar(x, y, ring):
    """ogr/ogrlinearring.cpp:462-531 isPointInRing, literal translation.

    ring: sequence of (x, y) pairs, closed (first == last).
    """
    n = len(ring)
    if n < 4:
        return False
    minx = min(p[0] for p in ring)
    maxx = max(p[0] for p in ring)
    miny = min(p[1] for p in ring)
    maxy = max(p[1] for p in ring)
    if not (minx <= x <= maxx and miny <= y <= maxy):
        return False
    crossings = 0
    prev_dx = ring[0][0] - x
    prev_dy = ring[0][1] - y
    for i in range(1, n):
        x1 = ring[i][0] - x
        y1 = ring[i][1] - y
        x2 = prev_dx
        y2 = prev_dy
        if ((y1 > 0) and (y2 <= 0)) or ((y2 > 0) and (y1 <= 0)):
            inter = (x1 * y2 - x2 * y1) / (y2 - y1)
            if 0.0 < inter:
                crossings += 1
        prev_dx = x1
        prev_dy = y1
    return crossings % 2 == 1


def point_in_polygon_scalar(x, y, polys):
    """polys: list of polygons, each a list of rings (outer first)."""
    for rings in polys:
        if point_in_ring_scalar(x, y, rings[0]):
            in_hole = any(point_in_ring_scalar(x, y, h) for h in rings[1:])
            if not in_hole:
                return True
    return False


def tiles_for_bbox(minx, miny, maxx, maxy, zoom):
    """XYZ (z, x, y) tiles covering a 3857 bbox — gdal2tiles tminmax logic."""
    n = 2**zoom
    tx0, ty0 = merc_meters_to_tile_tms(minx, miny, zoom)
    tx1, ty1 = merc_meters_to_tile_tms(maxx, maxy, zoom)
    tx0 = max(0, min(n - 1, tx0))
    tx1 = max(0, min(n - 1, tx1))
    ty0 = max(0, min(n - 1, ty0))
    ty1 = max(0, min(n - 1, ty1))
    out = []
    for tx in range(tx0, tx1 + 1):
        for ty in range(ty0, ty1 + 1):
            out.append((zoom, tx, tms_to_xyz(ty, zoom)))
    return out


def label_regions_scalar(pixels, w, h, nodata=-1, connect8=False):
    """Independent BFS region labeling for the round-trip oracle."""
    labels = [[-1] * w for _ in range(h)]
    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connect8:
        offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    nlab = 0
    counts = []
    for sy in range(h):
        for sx in range(w):
            v = pixels[sy * w + sx]
            if v == nodata or labels[sy][sx] != -1:
                continue
            stack = [(sy, sx)]
            labels[sy][sx] = nlab
            cnt = 0
            while stack:
                y, x = stack.pop()
                cnt += 1
                for dy, dx in offs:
                    ny, nx = y + dy, x + dx
                    if 0 <= ny < h and 0 <= nx < w and labels[ny][nx] == -1 and pixels[ny * w + nx] == v:
                        labels[ny][nx] = nlab
                        stack.append((ny, nx))
            counts.append(cnt)
            nlab += 1
    return nlab, counts


def checksum_scalar(values):
    """alg/gdalchecksum.cpp integer loop, literal translation."""
    primes = [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]
    cs = 0
    ip = 0
    for v in values:
        m = int(v) - (int(v) // primes[ip]) * primes[ip] if v >= 0 else -((-int(v)) % primes[ip])
        cs += m
        cs &= 0xFFFF
        ip += 1
        if ip > 10:
            ip = 0
    return cs
