"""KML vector driver (OGR KML driver analogue, ``ogr/ogrsf_frmts/kml/``).

The reference's built-in KML reader walks ``<Placemark>`` elements inside
``<Document>``/``<Folder>`` containers and exposes Point / LineString /
Polygon (+ MultiGeometry) from their ``<coordinates>`` text, with
``name`` / ``description`` fields (``ogr/ogrsf_frmts/kml/kml.cpp``,
``ogr2kmlgeometry.cpp``). Same contract here over the engine's columnar
layer form: ``geometry`` = WKB + ``name`` / ``description`` / ``folder``
columns + per-document ``fid``.

Scale: one ``.kml`` file is ONE XML document (parsed inside its read
task); a directory of ``.kml`` shards is the distributed form — identical
to the GPX driver's split. Ordinates serialize with ``repr`` (shortest
round-trip), so read(write(ds)) is bit-exact for the round-trip twin.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

import numpy as np
import pandas as pd
import pyarrow as pa

from gdal_ray.geo import wkb as W

__all__ = ["read_kml", "write_kml", "write_kml_dir"]

_HEADER = ('<?xml version="1.0" encoding="UTF-8"?>\n'
           '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>\n')
_FOOTER = "</Document></kml>\n"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find(el, name):
    for ch in el:
        if _local(ch.tag) == name:
            return ch
    return None


def _coords_text(el) -> np.ndarray:
    """<coordinates> 'lon,lat[,alt] ...' -> (n, 2) float64."""
    c = _find(el, "coordinates")
    pts = []
    for tok in (c.text or "").split():
        parts = tok.split(",")
        pts.append((float(parts[0]), float(parts[1])))
    return np.asarray(pts, dtype=np.float64).reshape(-1, 2)


def _geom_to_wkb(el) -> bytes | None:
    t = _local(el.tag)
    if t == "Point":
        xy = _coords_text(el)
        return W.encode_point(float(xy[0, 0]), float(xy[0, 1]))
    if t == "LineString":
        return W.encode_linestring(_coords_text(el))
    if t == "Polygon":
        rings = []
        outer = _find(el, "outerBoundaryIs")
        rings.append(_coords_text(_find(outer, "LinearRing")))
        for ch in el:
            if _local(ch.tag) == "innerBoundaryIs":
                rings.append(_coords_text(_find(ch, "LinearRing")))
        return W.encode_polygon(rings)
    if t == "MultiGeometry":
        subs = [s for s in el
                if _local(s.tag) in ("Point", "LineString", "Polygon")]
        kinds = {_local(s.tag) for s in subs}
        if kinds == {"Point"}:
            import struct

            body = b"".join(_geom_to_wkb(s) for s in subs)
            return struct.pack("<BII", 1, 4, len(subs)) + body
        if kinds == {"LineString"}:
            return W.encode_multilinestring([_coords_text(s) for s in subs])
        if kinds == {"Polygon"}:
            polys = []
            for s in subs:
                rings = [_coords_text(_find(_find(s, "outerBoundaryIs"),
                                            "LinearRing"))]
                for ch in s:
                    if _local(ch.tag) == "innerBoundaryIs":
                        rings.append(_coords_text(_find(ch, "LinearRing")))
                polys.append(rings)
            return W.encode_multipolygon(polys)
        raise ValueError("mixed MultiGeometry is not supported")
    return None


def _walk_placemarks(el, folder: str | None, out: list):
    name = _local(el.tag)
    if name == "Placemark":
        out.append((folder, el))
        return
    if name in ("Folder", "Document"):
        fname = _find(el, "name")
        folder = (fname.text if fname is not None and fname.text
                  else folder)
    for ch in el:
        _walk_placemarks(ch, folder, out)


def _parse_doc(raw: bytes) -> pa.Table:
    root = ET.fromstring(raw)
    marks: list = []
    _walk_placemarks(root, None, marks)
    cols = {"fid": [], "geometry": [], "name": [], "description": [],
            "folder": []}
    for fid, (folder, pm) in enumerate(marks):
        geom = None
        for ch in pm:
            if _local(ch.tag) in ("Point", "LineString", "Polygon",
                                  "MultiGeometry"):
                geom = _geom_to_wkb(ch)
                break
        nm = _find(pm, "name")
        ds_ = _find(pm, "description")
        cols["fid"].append(fid)
        cols["geometry"].append(geom)
        cols["name"].append(nm.text if nm is not None else None)
        cols["description"].append(ds_.text if ds_ is not None else None)
        cols["folder"].append(folder)
    return pa.table({
        "fid": pa.array(cols["fid"], pa.int64()),
        "geometry": pa.array(cols["geometry"], pa.binary()),
        "name": pa.array(cols["name"], pa.string()),
        "description": pa.array(cols["description"], pa.string()),
        "folder": pa.array(cols["folder"], pa.string()),
    })


def read_kml(path: str):
    """``.kml`` file or directory of shards -> Dataset of Placemarks."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        tables = [_parse_doc(raw) for raw in batch["bytes"].to_pylist()]
        return pa.concat_tables(tables, promote_options="default")

    return rd.read_binary_files(path, file_extensions=["kml"]).map_batches(
        parse, batch_format="pyarrow", batch_size=None)


def _fmt_pts(xy: np.ndarray) -> str:
    return " ".join(f"{repr(float(x))},{repr(float(y))}" for x, y in xy)


def _wkb_to_kml(buf: bytes) -> str:
    buf = bytes(buf)
    _, gtype, _, _ = W._decode_geom(buf, 0)
    base = gtype % 1000
    if base == 1:
        x, y = W.decode_points([buf])
        return (f"<Point><coordinates>{repr(float(x[0]))},"
                f"{repr(float(y[0]))}</coordinates></Point>")
    if base in (2, 5):
        lines = W.decode_lines(buf)
        parts = [f"<LineString><coordinates>{_fmt_pts(ln)}"
                 "</coordinates></LineString>" for ln in lines]
        if base == 2:
            return parts[0]
        return "<MultiGeometry>" + "".join(parts) + "</MultiGeometry>"
    if base in (3, 6):
        polys = W.decode_polygons(buf)
        out = []
        for rings in polys:
            s = ("<Polygon><outerBoundaryIs><LinearRing><coordinates>"
                 f"{_fmt_pts(rings[0])}"
                 "</coordinates></LinearRing></outerBoundaryIs>")
            for r in rings[1:]:
                s += ("<innerBoundaryIs><LinearRing><coordinates>"
                      f"{_fmt_pts(r)}"
                      "</coordinates></LinearRing></innerBoundaryIs>")
            s += "</Polygon>"
            out.append(s)
        if base == 3 and len(out) == 1:
            return out[0]
        return "<MultiGeometry>" + "".join(out) + "</MultiGeometry>"
    raise ValueError(f"unsupported WKB type {gtype} for KML export")


def _doc_xml(df: pd.DataFrame) -> str:
    out = [_HEADER]
    for _, row in df.iterrows():
        out.append("<Placemark>")
        for col, tag in (("name", "name"), ("description", "description")):
            v = row.get(col)
            if v is not None and not pd.isna(v):
                out.append(f"<{tag}>{escape(str(v))}</{tag}>")
        out.append(_wkb_to_kml(row["geometry"]))
        out.append("</Placemark>\n")
    out.append(_FOOTER)
    return "".join(out)


def write_kml_dir(ds, out_dir: str):
    """Dataset -> one ``.kml`` shard per block (atomic rename, resumable)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        import zlib

        body = _doc_xml(df).encode("utf-8")
        shard = f"part-{zlib.crc32(body):08x}-{len(df)}.kml"
        final = os.path.join(out_dir, shard)
        if not os.path.exists(final):
            tmp = final + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(body)
            os.replace(tmp, final)
        return pd.DataFrame({"shard": [shard], "n": [len(df)]})

    return ds.map_batches(write_shard, batch_format="pandas",
                          batch_size=None)


def write_kml(ds, path: str) -> int:
    """Dataset -> ONE .kml document (driver-side small write)."""
    df = ds.to_pandas()
    body = _doc_xml(df).encode("utf-8")
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(body)
    os.replace(tmp, path)
    return len(df)
