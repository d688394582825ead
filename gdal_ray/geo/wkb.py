"""Minimal OGC WKB codec (pure numpy/struct) for the geometry types we carry.

GDAL stores layer geometry as WKB in Arrow binary columns
(``ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp`` — geometry = binary WKB);
our tables do the same. Supported: Point (1), LineString (2), Polygon (3),
MultiPoint (4), MultiLineString (5), MultiPolygon (6), 2-D, either byte
order on read, little-endian on write.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_point",
    "encode_linestring",
    "encode_multilinestring",
    "encode_polygon",
    "encode_multipolygon",
    "decode_polygons",
    "decode_lines",
    "decode_points",
    "wkb_envelope",
]

_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3
_WKB_MULTIPOINT = 4
_WKB_MULTILINESTRING = 5
_WKB_MULTIPOLYGON = 6


def encode_point(x, y):
    return struct.pack("<BIdd", 1, _WKB_POINT, float(x), float(y))


def encode_linestring(pts):
    """pts: (M, 2) float array -> WKB LineString."""
    pts = np.asarray(pts, dtype="<f8")
    return struct.pack("<BII", 1, _WKB_LINESTRING, pts.shape[0]) + pts.tobytes()


def encode_multilinestring(lines):
    """lines: list of (M, 2) arrays -> WKB MultiLineString."""
    parts = [struct.pack("<BII", 1, _WKB_MULTILINESTRING, len(lines))]
    for pts in lines:
        parts.append(encode_linestring(pts))
    return b"".join(parts)


def decode_lines(buf):
    """WKB LineString/MultiLineString -> list of (M, 2) float64 arrays."""
    little, gtype, off = _decode_geom(buf, 0)
    dt = "<f8" if little else ">f8"

    def one(off, little, dt):
        npts, off = _rd_u32(buf, off, little)
        arr = np.frombuffer(buf, dtype=dt, count=npts * 2, offset=off).reshape(npts, 2)
        return arr.astype(np.float64, copy=False), off + npts * 16

    if gtype == _WKB_LINESTRING:
        pts, _ = one(off, little, dt)
        return [pts]
    if gtype == _WKB_MULTILINESTRING:
        ngeom, off = _rd_u32(buf, off, little)
        out = []
        for _ in range(ngeom):
            little2, gtype2, off = _decode_geom(buf, off)
            if gtype2 != _WKB_LINESTRING:
                raise ValueError(f"unexpected member type {gtype2} in MultiLineString")
            pts, off = one(off, little2, "<f8" if little2 else ">f8")
            out.append(pts)
        return out
    raise ValueError(f"not a linear WKB geometry (type {gtype})")


def encode_polygon(rings):
    """rings: list of (M,2) float arrays; first = outer. Rings are closed on
    write if not already closed (GDAL closeRings semantics,
    ``ogr/ogrlinearring.cpp`` closeRings)."""
    parts = [struct.pack("<BII", 1, _WKB_POLYGON, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype="<f8")
        if ring.shape[0] >= 1 and (ring[0] != ring[-1]).any():
            ring = np.vstack([ring, ring[:1]])
        parts.append(struct.pack("<I", ring.shape[0]))
        parts.append(ring.tobytes())
    return b"".join(parts)


def encode_multipolygon(polys):
    """polys: list of list-of-rings."""
    parts = [struct.pack("<BII", 1, _WKB_MULTIPOLYGON, len(polys))]
    for rings in polys:
        parts.append(encode_polygon(rings))
    return b"".join(parts)


def _rd_u32(buf, off, little):
    return struct.unpack_from("<I" if little else ">I", buf, off)[0], off + 4


def _decode_polygon_body(buf, off, little):
    nrings, off = _rd_u32(buf, off, little)
    rings = []
    dt = "<f8" if little else ">f8"
    for _ in range(nrings):
        npts, off = _rd_u32(buf, off, little)
        arr = np.frombuffer(buf, dtype=dt, count=npts * 2, offset=off).reshape(npts, 2)
        rings.append(arr.astype(np.float64, copy=False))
        off += npts * 16
    return rings, off


def _decode_geom(buf, off):
    little = buf[off] == 1
    off += 1
    gtype, off = _rd_u32(buf, off, little)
    gtype = gtype & 0xFF  # strip 2.5D / SRID flags conservatively
    return little, gtype, off


def decode_polygons(buf):
    """WKB -> list of polygons, each a list of (M,2) rings (outer first)."""
    little, gtype, off = _decode_geom(buf, 0)
    if gtype == _WKB_POLYGON:
        rings, _ = _decode_polygon_body(buf, off, little)
        return [rings]
    if gtype == _WKB_MULTIPOLYGON:
        ngeom, off = _rd_u32(buf, off, little)
        out = []
        for _ in range(ngeom):
            little2, gtype2, off = _decode_geom(buf, off)
            if gtype2 != _WKB_POLYGON:
                raise ValueError(f"unexpected member type {gtype2} in MultiPolygon")
            rings, off = _decode_polygon_body(buf, off, little2)
            out.append(rings)
        return out
    raise ValueError(f"not a polygonal WKB geometry (type {gtype})")


def decode_points(bufs):
    """Vector of WKB Points -> (x, y) float64 arrays."""
    n = len(bufs)
    xs = np.empty(n, dtype=np.float64)
    ys = np.empty(n, dtype=np.float64)
    for i, buf in enumerate(bufs):
        little, gtype, off = _decode_geom(buf, 0)
        if gtype != _WKB_POINT:
            raise ValueError(f"not a WKB point (type {gtype})")
        fmt = "<dd" if little else ">dd"
        xs[i], ys[i] = struct.unpack_from(fmt, buf, off)
    return xs, ys


def wkb_envelope(buf):
    """(minx, miny, maxx, maxy) over all rings of a polygonal WKB blob."""
    polys = decode_polygons(buf)
    allpts = np.vstack([r for rings in polys for r in rings])
    mn = allpts.min(axis=0)
    mx = allpts.max(axis=0)
    return float(mn[0]), float(mn[1]), float(mx[0]), float(mx[1])
