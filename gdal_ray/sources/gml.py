"""GML vector driver (OGR GML driver analogue, ``ogr/ogrsf_frmts/gml/``
— ``gmlreader.cpp`` feature walk + ``gml2ogrgeometry.cpp`` geometry
parse, simple-features subset).

Reads/writes the classic ``wfs:FeatureCollection`` / ``gml:featureMember``
shape: one member element per feature, child elements become attribute
columns, the geometry child (any local name whose subtree contains a
``gml:Point`` / ``gml:LineString`` / ``gml:Polygon`` / ``gml:MultiPoint``)
parses from ``gml:pos`` / ``gml:posList`` / ``gml:coordinates`` into the
engine's WKB column. Axis order is x,y as written (the driver's
non-urn-srs default).

Scale split mirrors the GPX/KML drivers: one ``.gml`` document parses
inside its read task; a directory of shards is the distributed form; the
writer emits one shard per block (atomic rename) and ``repr`` ordinates
make round-trips bit-exact.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

import numpy as np
import pandas as pd
import pyarrow as pa

from gdal_ray.geo import wkb as W

__all__ = ["read_gml", "write_gml", "write_gml_dir"]

_GEOM_TAGS = ("Point", "LineString", "Polygon", "MultiPoint", "Curve",
              "Surface")

_HEADER = ('<?xml version="1.0" encoding="UTF-8"?>\n'
           '<wfs:FeatureCollection xmlns:wfs="http://www.opengis.net/wfs" '
           'xmlns:gml="http://www.opengis.net/gml" '
           'xmlns:ogr="http://ogr.maptools.org/">\n')
_FOOTER = "</wfs:FeatureCollection>\n"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find_geom(el):
    if _local(el.tag) in _GEOM_TAGS:
        return el
    for ch in el:
        g = _find_geom(ch)
        if g is not None:
            return g
    return None


def _coords(el) -> np.ndarray:
    """gml:pos / gml:posList (space-separated x y pairs) or legacy
    gml:coordinates ('x,y x,y') under ``el`` -> (n, 2) float64."""
    for ch in el.iter():
        name = _local(ch.tag)
        if name in ("pos", "posList"):
            vals = [float(v) for v in (ch.text or "").split()]
            return np.asarray(vals, np.float64).reshape(-1, 2)
        if name == "coordinates":
            pts = [tuple(float(p) for p in tok.split(",")[:2])
                   for tok in (ch.text or "").split()]
            return np.asarray(pts, np.float64).reshape(-1, 2)
    raise ValueError("no gml coordinate element found")


def _geom_to_wkb(g) -> bytes:
    t = _local(g.tag)
    if t == "Point":
        xy = _coords(g)
        return W.encode_point(float(xy[0, 0]), float(xy[0, 1]))
    if t == "LineString":
        return W.encode_linestring(_coords(g))
    if t == "Polygon":
        rings = []
        for ch in g:
            name = _local(ch.tag)
            if name in ("exterior", "outerBoundaryIs"):
                rings.insert(0, _coords(ch))
            elif name in ("interior", "innerBoundaryIs"):
                rings.append(_coords(ch))
        return W.encode_polygon(rings)
    if t == "MultiPoint":
        import struct

        pts = [_coords(m) for m in g.iter() if _local(m.tag) == "Point"]
        body = b"".join(W.encode_point(float(p[0, 0]), float(p[0, 1]))
                        for p in pts)
        return struct.pack("<BII", 1, 4, len(pts)) + body
    raise ValueError(f"unsupported GML geometry {t!r}")


def _parse_doc(raw: bytes) -> pa.Table:
    root = ET.fromstring(raw)
    members = []
    for el in root.iter():
        if _local(el.tag) in ("featureMember", "member"):
            for ch in el:
                members.append(ch)
    cols: dict[str, list] = {}
    rows = []
    for seq, feat in enumerate(members):
        fid_attr = (feat.get("fid") or feat.get("id")
                    or feat.get("{http://www.opengis.net/gml}id"))
        try:
            fid = int(str(fid_attr))
        except (TypeError, ValueError):
            fid = seq  # per-document sequence when no numeric id
        row = {"fid": fid, "geometry": None}
        for ch in feat:
            geom = _find_geom(ch)
            if geom is not None:
                row["geometry"] = _geom_to_wkb(geom)
            elif len(ch) == 0:
                row[_local(ch.tag)] = ch.text
        rows.append(row)
    names = list(dict.fromkeys(k for r in rows for k in r))
    for n in names:
        cols[n] = [r.get(n) for r in rows]
    arrays = {"fid": pa.array(cols.pop("fid"), pa.int64()),
              "geometry": pa.array(cols.pop("geometry"), pa.binary())}
    for k, v in cols.items():
        arrays[k] = pa.array(v, pa.string())
    return pa.table(arrays)


def read_gml(path: str):
    """``.gml`` file or directory of shards -> Dataset (fid, geometry:
    WKB, string attribute columns)."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        tables = [_parse_doc(raw) for raw in batch["bytes"].to_pylist()]
        return pa.concat_tables(tables, promote_options="default")

    return rd.read_binary_files(path, file_extensions=["gml"]).map_batches(
        parse, batch_format="pyarrow", batch_size=None)


def _fmt_pts(xy: np.ndarray) -> str:
    return " ".join(f"{repr(float(x))} {repr(float(y))}" for x, y in xy)


def _wkb_to_gml(buf: bytes) -> str:
    buf = bytes(buf)
    _, gtype, _, _ = W._decode_geom(buf, 0)
    base = gtype % 1000
    if base == 1:
        x, y = W.decode_points([buf])
        return (f"<gml:Point><gml:pos>{repr(float(x[0]))} "
                f"{repr(float(y[0]))}</gml:pos></gml:Point>")
    if base == 2:
        line = W.decode_lines(buf)[0]
        return (f"<gml:LineString><gml:posList>{_fmt_pts(line)}"
                "</gml:posList></gml:LineString>")
    if base == 3:
        rings = W.decode_polygons(buf)[0]
        s = ("<gml:Polygon><gml:exterior><gml:LinearRing><gml:posList>"
             f"{_fmt_pts(rings[0])}"
             "</gml:posList></gml:LinearRing></gml:exterior>")
        for r in rings[1:]:
            s += ("<gml:interior><gml:LinearRing><gml:posList>"
                  f"{_fmt_pts(r)}"
                  "</gml:posList></gml:LinearRing></gml:interior>")
        return s + "</gml:Polygon>"
    if base == 4:
        import struct

        n = struct.unpack_from("<I", buf, 5)[0]
        o = 9
        parts = []
        for _ in range(n):
            x, y = struct.unpack_from("<dd", buf, o + 5)
            parts.append("<gml:pointMember><gml:Point><gml:pos>"
                         f"{repr(x)} {repr(y)}"
                         "</gml:pos></gml:Point></gml:pointMember>")
            o += 21
        return "<gml:MultiPoint>" + "".join(parts) + "</gml:MultiPoint>"
    raise ValueError(f"unsupported WKB type {gtype} for GML export")


def _doc_xml(df: pd.DataFrame) -> str:
    attrs = [c for c in df.columns if c not in ("fid", "geometry")]
    out = [_HEADER]
    for _, row in df.iterrows():
        out.append('<gml:featureMember><ogr:feature fid="'
                   f'{int(row["fid"]) if not pd.isna(row.get("fid")) else 0}'
                   '">')
        out.append("<ogr:geom>" + _wkb_to_gml(row["geometry"])
                   + "</ogr:geom>")
        for c in attrs:
            v = row[c]
            if v is not None and not pd.isna(v):
                out.append(f"<ogr:{c}>{escape(str(v))}</ogr:{c}>")
        out.append("</ogr:feature></gml:featureMember>\n")
    out.append(_FOOTER)
    return "".join(out)


def write_gml_dir(ds, out_dir: str):
    """Dataset -> one ``.gml`` shard per block (atomic rename)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        import zlib

        body = _doc_xml(df).encode("utf-8")
        shard = f"part-{zlib.crc32(body):08x}-{len(df)}.gml"
        final = os.path.join(out_dir, shard)
        if not os.path.exists(final):
            tmp = final + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(body)
            os.replace(tmp, final)
        return pd.DataFrame({"shard": [shard], "n": [len(df)]})

    return ds.map_batches(write_shard, batch_format="pandas",
                          batch_size=None)


def write_gml(ds, path: str) -> int:
    """Dataset -> ONE .gml document (driver-side small write)."""
    df = ds.to_pandas()
    body = _doc_xml(df).encode("utf-8")
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(body)
    os.replace(tmp, path)
    return len(df)
