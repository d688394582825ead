"""Minimal OGC WKB codec (pure numpy/struct) for the geometry types we carry.

GDAL stores layer geometry as WKB in Arrow binary columns
(``ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp`` — geometry = binary WKB);
our tables do the same. Supported on read: Point (1), LineString (2),
Polygon (3), MultiPoint (4), MultiLineString (5), MultiPolygon (6),
CircularString (8), CompoundCurve (9), CurvePolygon (10), MultiCurve (11),
MultiSurface (12); each in 2-D, ISO Z/M/ZM (type+1000/2000/3000,
``ogr/ogr_core.h`` wkb25DBit successors) and PostGIS EWKB flag forms
(0x80000000 Z / 0x40000000 M / 0x20000000 SRID), either byte order.
Z/M ordinates are parsed and DROPPED (the engine's kernels are 2-D, the
same 2.5D flattening most OGR operations apply); curve types LINEARIZE via
the arc stroking rule of ``OGRGeometryFactory::curveToLineString``
(``ogr/ogrgeometryfactory.cpp``) with the reference's 4-degree default
step. Writes are little-endian 2-D.
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
    "encode_circularstring",
    "decode_polygons",
    "decode_lines",
    "decode_points",
    "linearize_arc",
    "wkb_envelope",
]

_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3
_WKB_MULTIPOINT = 4
_WKB_MULTILINESTRING = 5
_WKB_MULTIPOLYGON = 6
_WKB_CIRCULARSTRING = 8
_WKB_COMPOUNDCURVE = 9
_WKB_CURVEPOLYGON = 10
_WKB_MULTICURVE = 11
_WKB_MULTISURFACE = 12

# default max angle step for arc stroking, degrees
# (OGRGeometryFactory::curveToLineString dfMaxAngleStepSizeDegrees -> 4)
_ARC_STEP_DEG = 4.0


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
    """WKB LineString/MultiLineString/CircularString/CompoundCurve/
    MultiCurve -> list of (M, 2) float64 arrays (curves linearized,
    Z/M dropped)."""
    little, gtype, extra, off = _decode_geom(buf, 0)
    if gtype == _WKB_LINESTRING:
        pts, _ = _read_pts(buf, off, little, extra)
        return [pts]
    if gtype == _WKB_CIRCULARSTRING:
        pts, _ = _read_pts(buf, off, little, extra)
        return [_linearize_circular(pts)]
    if gtype == _WKB_COMPOUNDCURVE:
        pts, _ = _decode_curve(buf, 0)
        return [pts]
    if gtype in (_WKB_MULTILINESTRING, _WKB_MULTICURVE):
        ngeom, off = _rd_u32(buf, off, little)
        out = []
        for _ in range(ngeom):
            pts, off = _decode_curve(buf, off)
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


def encode_circularstring(pts):
    """pts: (2k+1, 2) control points (arc triples sharing endpoints)."""
    pts = np.asarray(pts, dtype="<f8")
    return struct.pack("<BII", 1, _WKB_CIRCULARSTRING, pts.shape[0]) + pts.tobytes()


def _rd_u32(buf, off, little):
    return struct.unpack_from("<I" if little else ">I", buf, off)[0], off + 4


def linearize_arc(p0, p1, p2, max_step_deg: float = _ARC_STEP_DEG) -> np.ndarray:
    """Stroke the circular arc through (p0, p1, p2) into line vertices
    (``OGRGeometryFactory::curveToLineString`` stroking: uniform angular
    steps bounded by the max step, exact endpoints). Collinear control
    points degrade to the two straight segments. Returns (M, 2) including
    both endpoints."""
    p0 = np.asarray(p0, dtype=np.float64)
    p1 = np.asarray(p1, dtype=np.float64)
    p2 = np.asarray(p2, dtype=np.float64)
    # circumcenter via perpendicular bisectors
    ax, ay = p0
    bx, by = p1
    cx, cy = p2
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return np.stack([p0, p1, p2])
    ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay)
          + (cx * cx + cy * cy) * (ay - by)) / d
    uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx)
          + (cx * cx + cy * cy) * (bx - ax)) / d
    r = float(np.hypot(ax - ux, ay - uy))
    a0 = np.arctan2(ay - uy, ax - ux)
    a1 = np.arctan2(by - uy, bx - ux)
    a2 = np.arctan2(cy - uy, cx - ux)
    # orientation from the sign of the control triangle (p1 between p0, p2)
    ccw = d > 0
    if ccw:
        s01 = (a1 - a0) % (2.0 * np.pi)
        s02 = (a2 - a0) % (2.0 * np.pi)
    else:
        s01 = -((a0 - a1) % (2.0 * np.pi))
        s02 = -((a0 - a2) % (2.0 * np.pi))
    # p1 must lie on the path; if wraps disagree, go the long way
    if abs(s01) > abs(s02):
        s02 = s02 + (2.0 * np.pi if ccw else -2.0 * np.pi)
    n = max(2, int(np.ceil(abs(s02) / np.deg2rad(max_step_deg))))
    ang = a0 + s02 * np.linspace(0.0, 1.0, n + 1)
    out = np.stack([ux + r * np.cos(ang), uy + r * np.sin(ang)], axis=1)
    out[0] = p0
    out[-1] = p2
    return out


def _read_pts(buf, off, little, extra):
    """Read an npts-prefixed coordinate run with ``extra`` Z/M ordinates;
    returns (M, 2) xy (Z/M parsed and dropped)."""
    npts, off = _rd_u32(buf, off, little)
    dims = 2 + extra
    dt = "<f8" if little else ">f8"
    arr = np.frombuffer(buf, dtype=dt, count=npts * dims, offset=off).reshape(npts, dims)
    return arr[:, :2].astype(np.float64, copy=False), off + npts * dims * 8


def _linearize_circular(pts: np.ndarray) -> np.ndarray:
    """CircularString control points -> stroked vertices."""
    if len(pts) < 3:
        return pts
    segs = [pts[:1]]
    for i in range(0, len(pts) - 2, 2):
        segs.append(linearize_arc(pts[i], pts[i + 1], pts[i + 2])[1:])
    return np.vstack(segs)


def _decode_curve(buf, off):
    """Any curve-typed member -> linearized (M, 2) vertex array."""
    little, gtype, extra, off = _decode_geom(buf, off)
    if gtype == _WKB_LINESTRING:
        return _read_pts(buf, off, little, extra)
    if gtype == _WKB_CIRCULARSTRING:
        pts, off = _read_pts(buf, off, little, extra)
        return _linearize_circular(pts), off
    if gtype == _WKB_COMPOUNDCURVE:
        nseg, off = _rd_u32(buf, off, little)
        parts = []
        for i in range(nseg):
            pts, off = _decode_curve(buf, off)
            parts.append(pts if i == 0 else pts[1:])  # segments share endpoints
        return np.vstack(parts) if parts else np.empty((0, 2)), off
    raise ValueError(f"unsupported curve member type {gtype}")


def _decode_polygon_body(buf, off, little, extra=0):
    nrings, off = _rd_u32(buf, off, little)
    rings = []
    for _ in range(nrings):
        pts, off = _read_pts(buf, off, little, extra)
        rings.append(pts)
    return rings, off


def _decode_curvepolygon(buf, off, little):
    nrings, off = _rd_u32(buf, off, little)
    rings = []
    for _ in range(nrings):
        pts, off = _decode_curve(buf, off)
        # close the linearized ring if the curve did not
        if len(pts) >= 2 and (pts[0] != pts[-1]).any():
            pts = np.vstack([pts, pts[:1]])
        rings.append(pts)
    return rings, off


def _decode_geom(buf, off):
    """Header -> (little, base_type, n_extra_ordinates, offset past header).
    Handles ISO Z/M/ZM (type + 1000/2000/3000) and PostGIS EWKB flag bits
    (0x80000000 Z, 0x40000000 M, 0x20000000 SRID — the SRID int is
    skipped)."""
    little = buf[off] == 1
    off += 1
    gtype, off = _rd_u32(buf, off, little)
    extra = 0
    if gtype & 0x80000000:
        extra += 1
    if gtype & 0x40000000:
        extra += 1
    if gtype & 0x20000000:
        off += 4  # EWKB SRID
    gtype &= 0x1FFFFFFF
    iso = gtype // 1000
    if iso in (1, 2, 3):
        extra += 2 if iso == 3 else 1
        gtype %= 1000
    return little, gtype, extra, off


def decode_polygons(buf):
    """WKB -> list of polygons, each a list of (M,2) rings (outer first).
    CurvePolygon/MultiSurface rings linearize; Z/M ordinates drop."""
    little, gtype, extra, off = _decode_geom(buf, 0)
    if gtype == _WKB_POLYGON:
        rings, _ = _decode_polygon_body(buf, off, little, extra)
        return [rings]
    if gtype == _WKB_CURVEPOLYGON:
        rings, _ = _decode_curvepolygon(buf, off, little)
        return [rings]
    if gtype in (_WKB_MULTIPOLYGON, _WKB_MULTISURFACE):
        ngeom, off = _rd_u32(buf, off, little)
        out = []
        for _ in range(ngeom):
            little2, gtype2, extra2, off = _decode_geom(buf, off)
            if gtype2 == _WKB_POLYGON:
                rings, off = _decode_polygon_body(buf, off, little2, extra2)
            elif gtype2 == _WKB_CURVEPOLYGON:
                rings, off = _decode_curvepolygon(buf, off, little2)
            else:
                raise ValueError(f"unexpected member type {gtype2} in MultiPolygon")
            out.append(rings)
        return out
    raise ValueError(f"not a polygonal WKB geometry (type {gtype})")


def decode_points(bufs):
    """Vector of WKB Points -> (x, y) float64 arrays (Z/M dropped)."""
    n = len(bufs)
    xs = np.empty(n, dtype=np.float64)
    ys = np.empty(n, dtype=np.float64)
    for i, buf in enumerate(bufs):
        little, gtype, extra, off = _decode_geom(buf, 0)
        if gtype != _WKB_POINT:
            raise ValueError(f"not a WKB point (type {gtype})")
        fmt = "<dd" if little else ">dd"
        xs[i], ys[i] = struct.unpack_from(fmt, buf, off)
    return xs, ys


def wkb_envelope(buf):
    """(minx, miny, maxx, maxy) of any WKB geometry (OGR GetEnvelope):
    points, lines, polygons, and their Multi forms."""
    little, gtype, extra, off = _decode_geom(buf, 0)
    base = gtype % 1000 if gtype < 3000 else gtype
    if base == _WKB_POINT:
        fmt = "<dd" if little else ">dd"
        x, y = struct.unpack_from(fmt, buf, off)
        return float(x), float(y), float(x), float(y)
    if base == _WKB_MULTIPOINT:
        fmt_n = "<I" if little else ">I"
        n = struct.unpack_from(fmt_n, buf, off)[0]
        o, pts = off + 4, []
        for _ in range(n):
            lt, _, _, o = _decode_geom(buf, o)
            pts.append(struct.unpack_from("<dd" if lt else ">dd", buf, o))
            o += 16
        allpts = np.asarray(pts, dtype=np.float64)
    elif base in (_WKB_LINESTRING, _WKB_MULTILINESTRING,
                  _WKB_CIRCULARSTRING, _WKB_COMPOUNDCURVE, _WKB_MULTICURVE):
        allpts = np.vstack(decode_lines(buf))
    else:
        polys = decode_polygons(buf)
        allpts = np.vstack([r for rings in polys for r in rings])
    mn = allpts.min(axis=0)
    mx = allpts.max(axis=0)
    return float(mn[0]), float(mn[1]), float(mx[0]), float(mx[1])


def map_coords(buf, fn):
    """Structure-preserving coordinate transform of a 2-D WKB geometry:
    ``fn((M, 2) array) -> (M', 2) array`` is applied to the point / each
    line / each ring and the original geometry class (single vs Multi) is
    re-encoded. The workhorse behind the vector-pipeline steps (swap-xy,
    segmentize, simplify, reproject — the gdalalg_vector_* step family).
    Curves linearize and Z/M drop on the way through (the engine's
    canonical 2-D layer form)."""
    little, gtype, extra, off = _decode_geom(buf, 0)
    base = gtype % 1000 if gtype < 3000 else gtype  # tolerate ISO Z codes
    if base in (_WKB_POINT,):
        fmt = "<dd" if little else ">dd"
        x, y = struct.unpack_from(fmt, buf, off)
        out = np.asarray(fn(np.array([[x, y]], dtype=np.float64)))
        return encode_point(out[0, 0], out[0, 1])
    if base in (_WKB_LINESTRING, _WKB_CIRCULARSTRING, _WKB_COMPOUNDCURVE):
        return encode_linestring(fn(decode_lines(buf)[0]))
    if base in (_WKB_MULTILINESTRING, _WKB_MULTICURVE):
        return encode_multilinestring([fn(ln) for ln in decode_lines(buf)])
    if base in (_WKB_POLYGON, _WKB_CURVEPOLYGON):
        return encode_polygon([fn(r) for r in decode_polygons(buf)[0]])
    if base in (_WKB_MULTIPOLYGON, _WKB_MULTISURFACE):
        return encode_multipolygon(
            [[fn(r) for r in rings] for rings in decode_polygons(buf)]
        )
    raise ValueError(f"unsupported WKB geometry for map_coords (type {gtype})")


def explode(buf):
    """Multi-part WKB -> list of single-part WKB blobs (the reference's
    explode-collections step, apps/gdalalg_vector_explode_collections);
    single-part input passes through as a one-element list."""
    little, gtype, extra, off = _decode_geom(buf, 0)
    if gtype in (_WKB_MULTILINESTRING, _WKB_MULTICURVE):
        return [encode_linestring(ln) for ln in decode_lines(buf)]
    if gtype in (_WKB_MULTIPOLYGON, _WKB_MULTISURFACE):
        return [encode_polygon(rings) for rings in decode_polygons(buf)]
    if gtype == 4:  # MultiPoint
        ngeom, off2 = _rd_u32(buf, off, little)
        out = []
        for _ in range(ngeom):
            l2, g2, e2, off2 = _decode_geom(buf, off2)
            fmt = "<dd" if l2 else ">dd"
            x, y = struct.unpack_from(fmt, buf, off2)
            off2 += 16 + 8 * e2
            out.append(encode_point(x, y))
        return out
    return [bytes(buf)]
