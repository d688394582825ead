"""GPX vector driver (OGR GPX driver analogue, ``ogr/ogrsf_frmts/gpx/``).

The reference exposes a ``.gpx`` document as five layers — waypoints
(Point), routes (LineString), tracks (MultiLineString), route_points and
track_points (one Point row per ``<rtept>``/``<trkpt>`` with parent ids)
(``ogr/ogrsf_frmts/gpx/ogr_gpx.h``, ``ogrgpxlayer.cpp``). The same layer
contract here over the engine's standard columnar form (SURVEY.md §1.2:
``geometry`` = WKB binary + attribute columns + ``fid``).

Scale: a GPX file is ONE XML document, so each file parses inside a
single read task; a DIRECTORY of ``.gpx`` shards is the distributed form
(``read_binary_files`` shards by file — the reference's driver has the
same per-file constraint). The writer emits one ``.gpx`` shard per block
(atomic rename, resumable), or one single document via ``write_gpx`` for
bounded layers.

Float ordinates serialize with ``repr`` (Python's shortest-round-trip
form), so ``read(write(ds))`` is bit-exact — the identity round-trip twin
(q_gpx_roundtrip) relies on it. Namespaces are stripped on parse (the
reference's expat handler matches local names the same way).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

import numpy as np
import pandas as pd
import pyarrow as pa

from gdal_ray.geo import wkb as W

__all__ = ["read_gpx", "write_gpx", "write_gpx_dir", "GPX_LAYERS"]

GPX_LAYERS = ("waypoints", "routes", "tracks", "route_points",
              "track_points")

_HEADER = ('<?xml version="1.0" encoding="UTF-8"?>\n'
           '<gpx version="1.1" creator="gdal_ray" '
           'xmlns="http://www.topografix.com/GPX/1/1">\n')


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _child_text(el, name):
    for ch in el:
        if _local(ch.tag) == name:
            return ch.text
    return None


def _pt_fields(el):
    lat = float(el.get("lat"))
    lon = float(el.get("lon"))
    ele = _child_text(el, "ele")
    return lon, lat, (float(ele) if ele is not None else None)


def _parse_doc(raw: bytes, layer: str) -> dict:
    root = ET.fromstring(raw)
    cols: dict[str, list] = {"fid": [], "geometry": []}
    if layer == "waypoints":
        cols.update({"name": [], "desc": [], "ele": []})
        fid = 0
        for el in root:
            if _local(el.tag) != "wpt":
                continue
            x, y, ele = _pt_fields(el)
            cols["fid"].append(fid)
            cols["geometry"].append(W.encode_point(x, y))
            cols["name"].append(_child_text(el, "name"))
            cols["desc"].append(_child_text(el, "desc"))
            cols["ele"].append(ele)
            fid += 1
    elif layer in ("routes", "tracks"):
        cols.update({"name": [], "n_points": []})
        tag, pt_tag = (("rte", "rtept") if layer == "routes"
                       else ("trk", "trkpt"))
        fid = 0
        for el in root:
            if _local(el.tag) != tag:
                continue
            if layer == "routes":
                pts = [(p_[0], p_[1]) for ch in el
                       if _local(ch.tag) == pt_tag
                       for p_ in [_pt_fields(ch)]]
                geom = W.encode_linestring(
                    np.asarray(pts, dtype=np.float64).reshape(-1, 2))
                npts = len(pts)
            else:
                segs = []
                for seg in el:
                    if _local(seg.tag) != "trkseg":
                        continue
                    pts = [(p_[0], p_[1]) for ch in seg
                           if _local(ch.tag) == pt_tag
                           for p_ in [_pt_fields(ch)]]
                    segs.append(np.asarray(pts, dtype=np.float64
                                           ).reshape(-1, 2))
                geom = W.encode_multilinestring(segs)
                npts = int(sum(len(s) for s in segs))
            cols["fid"].append(fid)
            cols["geometry"].append(geom)
            cols["name"].append(_child_text(el, "name"))
            cols["n_points"].append(npts)
            fid += 1
    elif layer in ("route_points", "track_points"):
        parent_col = ("route_fid" if layer == "route_points"
                      else "track_fid")
        cols.update({parent_col: [], "pt_id": [], "ele": []})
        if layer == "track_points":
            cols["track_seg_id"] = []
        tag = "rte" if layer == "route_points" else "trk"
        fid = 0
        pid = 0
        for el in root:
            if _local(el.tag) != tag:
                continue
            if layer == "route_points":
                groups = [(0, [ch for ch in el
                               if _local(ch.tag) == "rtept"])]
            else:
                groups = [(si, [ch for ch in seg
                                if _local(ch.tag) == "trkpt"])
                          for si, seg in enumerate(
                              s for s in el if _local(s.tag) == "trkseg")]
            for seg_id, pts in groups:
                for i, ch in enumerate(pts):
                    x, y, ele = _pt_fields(ch)
                    cols["fid"].append(fid)
                    cols["geometry"].append(W.encode_point(x, y))
                    cols[parent_col].append(pid)
                    cols["pt_id"].append(i)
                    cols["ele"].append(ele)
                    if layer == "track_points":
                        cols["track_seg_id"].append(seg_id)
                    fid += 1
            pid += 1
    else:
        raise ValueError(f"unknown GPX layer {layer!r}; one of {GPX_LAYERS}")
    arrays = {"fid": pa.array(cols.pop("fid"), pa.int64()),
              "geometry": pa.array(cols.pop("geometry"), pa.binary())}
    for k, v in cols.items():
        typ = (pa.float64() if k == "ele"
               else pa.int64() if k.endswith(("_id", "_fid", "points"))
               else pa.string())
        arrays[k] = pa.array(v, typ)
    return pa.table(arrays)


def read_gpx(path: str, layer: str = "waypoints"):
    """``.gpx`` file or directory of shards -> Dataset of one reference
    layer. Each document parses inside its own read task."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        tables = [_parse_doc(raw, layer)
                  for raw in batch["bytes"].to_pylist()]
        return pa.concat_tables(tables, promote_options="default")

    return rd.read_binary_files(path, file_extensions=["gpx"]).map_batches(
        parse, batch_format="pyarrow", batch_size=None)


def _fmt(v: float) -> str:
    return repr(float(v))


def _wpt_xml(x, y, name, desc, ele, tag="wpt", indent="  ") -> str:
    parts = [f'{indent}<{tag} lat="{_fmt(y)}" lon="{_fmt(x)}">']
    if ele is not None and not pd.isna(ele):
        parts.append(f"<ele>{_fmt(ele)}</ele>")
    if name is not None and not pd.isna(name):
        parts.append(f"<name>{escape(str(name))}</name>")
    if desc is not None and not pd.isna(desc):
        parts.append(f"<desc>{escape(str(desc))}</desc>")
    parts.append(f"</{tag}>")
    return "".join(parts)


def _doc_xml(df: pd.DataFrame, layer: str) -> str:
    out = [_HEADER]
    if layer == "waypoints":
        for _, row in df.iterrows():
            x, y = W.decode_points([row["geometry"]])
            out.append(_wpt_xml(x[0], y[0], row.get("name"),
                                row.get("desc"), row.get("ele")) + "\n")
    elif layer == "tracks":
        for _, row in df.iterrows():
            name = row.get("name")
            out.append("  <trk>")
            if name is not None and not pd.isna(name):
                out.append(f"<name>{escape(str(name))}</name>")
            for seg in W.decode_lines(bytes(row["geometry"])):
                out.append("<trkseg>")
                for x, y in seg:
                    out.append(f'<trkpt lat="{_fmt(y)}" lon="{_fmt(x)}"/>')
                out.append("</trkseg>")
            out.append("</trk>\n")
    elif layer == "routes":
        for _, row in df.iterrows():
            name = row.get("name")
            out.append("  <rte>")
            if name is not None and not pd.isna(name):
                out.append(f"<name>{escape(str(name))}</name>")
            for seg in W.decode_lines(bytes(row["geometry"])):
                for x, y in seg:
                    out.append(f'<rtept lat="{_fmt(y)}" lon="{_fmt(x)}"/>')
            out.append("</rte>\n")
    else:
        raise ValueError(f"write_gpx supports waypoints/tracks/routes, "
                         f"not {layer!r}")
    out.append("</gpx>\n")
    return "".join(out)


def write_gpx_dir(ds, out_dir: str, layer: str = "waypoints"):
    """Dataset -> one ``.gpx`` shard per block under ``out_dir`` (atomic
    rename per shard; partitioned, resumable). Returns the shard table."""
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        import zlib

        body = _doc_xml(df, layer).encode("utf-8")
        shard = f"part-{zlib.crc32(body):08x}-{len(df)}.gpx"
        final = os.path.join(out_dir, shard)
        if not os.path.exists(final):
            tmp = final + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(body)
            os.replace(tmp, final)
        return pd.DataFrame({"shard": [shard], "n": [len(df)]})

    return ds.map_batches(write_shard, batch_format="pandas",
                          batch_size=None)


def write_gpx(ds, path: str, layer: str = "waypoints") -> int:
    """Dataset -> ONE .gpx document (driver-side small write; use
    write_gpx_dir for partitioned output). Returns feature count."""
    df = ds.to_pandas()
    body = _doc_xml(df, layer).encode("utf-8")
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(body)
    os.replace(tmp, path)
    return len(df)
