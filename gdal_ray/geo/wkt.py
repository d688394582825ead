"""WKT geometry text codec (OGR ``importFromWkt`` / ``exportToWkt``
analogue, ``ogr/ogr_geometry.h:458-488``; parser core in
``ogr/ogr2002/ogrgeometryfactory``). 2D subset over the engine's six
base types; parses through to the SAME canonical little-endian WKB the
rest of the engine speaks, so WKT is a pure text skin over
``geo/wkb.py``.

Float formatting uses Python's shortest-round-trip ``repr`` (the
reference uses %.15g, which can LOSE the 17th digit; repr is exact), so
``wkt -> wkb -> wkt`` and ``wkb -> wkt -> wkb`` are bit-stable.
``EMPTY`` geometries map to None (the engine's NULL-geometry column
convention, like OGR's null geometry)."""

from __future__ import annotations

import re

from gdal_ray.sources import geojson as GJ  # reuse the dict codecs

__all__ = ["wkt_to_wkb", "wkb_to_wkt"]

_HEAD = re.compile(r"\s*([A-Za-z]+)\s*(Z|M|ZM)?\s*(EMPTY)?\s*", re.I)
_NUM = re.compile(r"[-+0-9.eE]+")


def _parse_nums(body: str, depth_split: int):
    """Split ``body`` (without the outermost parens) at commas of nesting
    depth 0 and recurse; at depth_split 0 parse 'x y [z [m]]' pairs."""
    if depth_split == 0:
        nums = _NUM.findall(body)
        return [float(nums[0]), float(nums[1])]
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    parts.append(body[start:])
    out = []
    for p in parts:
        p = p.strip()
        if p.startswith("("):
            p = p[1:-1]
        out.append(_parse_nums(p, depth_split - 1))
    return out


def wkt_to_wkb(text: str | None) -> bytes | None:
    """WKT -> canonical little-endian 2D WKB (Z/M ordinates drop;
    EMPTY -> None)."""
    if text is None or not str(text).strip():
        return None
    m = _HEAD.match(str(text))
    if not m:
        raise ValueError(f"bad WKT: {text[:40]!r}")
    kind = m.group(1).upper()
    if m.group(3):  # EMPTY
        return None
    body = str(text)[m.end():].strip()
    if not (body.startswith("(") and body.endswith(")")):
        raise ValueError(f"bad WKT body: {text[:40]!r}")
    body = body[1:-1]
    depth = {
        "POINT": 0, "MULTIPOINT": 1, "LINESTRING": 1,
        "MULTILINESTRING": 2, "POLYGON": 2, "MULTIPOLYGON": 3,
    }.get(kind)
    if depth is None:
        raise ValueError(f"unsupported WKT type {kind!r}")
    coords = _parse_nums(body, depth)
    gj_type = {
        "POINT": "Point", "MULTIPOINT": "MultiPoint",
        "LINESTRING": "LineString", "MULTILINESTRING": "MultiLineString",
        "POLYGON": "Polygon", "MULTIPOLYGON": "MultiPolygon",
    }[kind]
    return GJ.geojson_to_wkb({"type": gj_type, "coordinates": coords})


def _fmt(v: float) -> str:
    r = repr(float(v))
    return r[:-2] if r.endswith(".0") else r


def _pts(seq) -> str:
    return ", ".join(f"{_fmt(p[0])} {_fmt(p[1])}" for p in seq)


def wkb_to_wkt(buf: bytes | None) -> str | None:
    """WKB -> WKT text (curve types linearize through the WKB decoders)."""
    if buf is None:
        return None
    g = GJ.wkb_to_geojson(buf)
    t, c = g["type"], g["coordinates"]
    if t == "Point":
        return f"POINT ({_fmt(c[0])} {_fmt(c[1])})"
    if t == "MultiPoint":
        return "MULTIPOINT (" + ", ".join(f"({_pts([p])})" for p in c) + ")"
    if t == "LineString":
        return f"LINESTRING ({_pts(c)})"
    if t == "MultiLineString":
        return "MULTILINESTRING (" + ", ".join(f"({_pts(l)})" for l in c) + ")"
    if t == "Polygon":
        return "POLYGON (" + ", ".join(f"({_pts(r)})" for r in c) + ")"
    return ("MULTIPOLYGON ("
            + ", ".join("(" + ", ".join(f"({_pts(r)})" for r in p) + ")"
                        for p in c)
            + ")")
