"""GeoJSON / GeoJSONSeq vector drivers (OGR GeoJSON driver analogue).

The reference reads a GeoJSON ``FeatureCollection`` as one OGR layer
(``ogr/ogrsf_frmts/geojson/ogrgeojsonreader.cpp``) and the line-delimited
variant through its GeoJSONSeq driver
(``ogr/ogrsf_frmts/geojson/ogrgeojsonseqdriver.cpp``, RFC 8142 text
sequences / one-feature-per-line ``.geojsonl``). The columnar form here is
the engine's standard vector layer (SURVEY.md §1.2): ``geometry`` as a WKB
binary column + one column per property + ``fid``.

Scale split, stated explicitly:

- ``read_geojson`` — a FeatureCollection is ONE json document; it is not
  splittable, so it parses inside a single read task (the reference has
  the same constraint: the driver materializes the doc). Use it for
  bounded side inputs.
- ``read_geojsonseq`` — newline-delimited features ARE splittable:
  ``ray.data.read_text`` shards the file(s) by byte ranges and each batch
  parses independently; this is the 100 TB path. Property-schema
  inference runs as a separate cheap streaming pass over the text (the
  reference's reader also pre-scans to build the field list).
- ``write_geojsonseq`` — one ``.geojsonl`` shard per block under a
  directory (resumable partitioned output); geometry decodes from WKB
  through the engine's own codecs.

Coordinates are 2D (Z/M ordinates drop on read, like the engine's other
WKB consumers); ``GeometryCollection`` is not supported and raises.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

from gdal_ray.geo import wkb as W

__all__ = [
    "geojson_to_wkb",
    "wkb_to_geojson",
    "read_geojson",
    "read_geojsonseq",
    "write_geojsonseq",
    "write_geojson",
]

_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3
_WKB_MULTIPOINT = 4
_WKB_MULTILINESTRING = 5
_WKB_MULTIPOLYGON = 6


def _encode_multipoint(pts) -> bytes:
    body = b"".join(W.encode_point(x, y) for x, y in pts)
    return struct.pack("<BII", 1, _WKB_MULTIPOINT, len(pts)) + body


def geojson_to_wkb(geom: dict) -> bytes | None:
    """GeoJSON geometry object -> canonical little-endian 2D WKB."""
    if geom is None:
        return None
    t = geom["type"]
    c = geom.get("coordinates")
    if t == "Point":
        return W.encode_point(float(c[0]), float(c[1]))
    if t == "MultiPoint":
        return _encode_multipoint([(float(p[0]), float(p[1])) for p in c])
    if t == "LineString":
        return W.encode_linestring(np.asarray(c, dtype=np.float64)[:, :2])
    if t == "MultiLineString":
        return W.encode_multilinestring(
            [np.asarray(l, dtype=np.float64)[:, :2] for l in c]
        )
    if t == "Polygon":
        return W.encode_polygon(
            [np.asarray(r, dtype=np.float64)[:, :2] for r in c]
        )
    if t == "MultiPolygon":
        return W.encode_multipolygon(
            [[np.asarray(r, dtype=np.float64)[:, :2] for r in poly] for poly in c]
        )
    raise ValueError(f"unsupported GeoJSON geometry type {t!r}")


def _rings_to_coords(rings):
    return [np.asarray(r, dtype=np.float64).tolist() for r in rings]


def wkb_to_geojson(buf: bytes | None) -> dict | None:
    """WKB -> GeoJSON geometry object (via the engine's own decoders;
    curve types linearize, Z/M drop)."""
    if buf is None:
        return None
    buf = bytes(buf)
    _, gtype, _, off = W._decode_geom(buf, 0)
    if gtype == _WKB_POINT:
        x, y = W.decode_points([buf])
        return {"type": "Point", "coordinates": [float(x[0]), float(y[0])]}
    if gtype == _WKB_MULTIPOINT:
        little = buf[0] == 1
        n = struct.unpack_from("<I" if little else ">I", buf, 5)[0]
        pts, o = [], 9
        for _ in range(n):
            little2 = buf[o] == 1
            _, _, _, o = W._decode_geom(buf, o)
            x, y = struct.unpack_from("<dd" if little2 else ">dd", buf, o)
            pts.append([x, y])
            o += 16
        return {"type": "MultiPoint", "coordinates": pts}
    if gtype in (_WKB_LINESTRING, _WKB_MULTILINESTRING, 8, 9, 11):
        lines = [ln.tolist() for ln in W.decode_lines(buf)]
        if gtype == _WKB_LINESTRING and len(lines) == 1:
            return {"type": "LineString", "coordinates": lines[0]}
        return {"type": "MultiLineString", "coordinates": lines}
    polys = W.decode_polygons(buf)  # raises on non-polygonal leftovers
    if gtype == _WKB_POLYGON or (gtype == 10 and len(polys) == 1):
        return {"type": "Polygon", "coordinates": _rings_to_coords(polys[0])}
    return {
        "type": "MultiPolygon",
        "coordinates": [_rings_to_coords(p) for p in polys],
    }


def _features_to_table(feats: list, fields: list[str] | None,
                       fid_start: int | None = None) -> pa.Table:
    cols: dict = {"fid": [], "geometry": []}
    if fields is None:
        fields = list(dict.fromkeys(
            k for f in feats for k in (f.get("properties") or {})
        ))
    for name in fields:
        cols[name] = []
    for i, f in enumerate(feats):
        fid = f.get("id")
        if fid is None and fid_start is not None:
            fid = fid_start + i
        cols["fid"].append(int(fid) if fid is not None else None)
        cols["geometry"].append(geojson_to_wkb(f.get("geometry")))
        props = f.get("properties") or {}
        for name in fields:
            cols[name].append(props.get(name))
    arrays = {
        "fid": pa.array(cols["fid"], pa.int64()),
        "geometry": pa.array(cols["geometry"], pa.binary()),
    }
    for name in fields:
        arrays[name] = pa.array(cols[name])
    return pa.table(arrays)


def read_geojson(path: str, columns: list[str] | None = None):
    """FeatureCollection file -> Dataset (fid, geometry: WKB, properties).
    The document parses inside ONE read task (GeoJSON is not splittable);
    missing Feature ``id`` members get sequential FIDs, like the
    reference's reader."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        out = []
        for raw in batch["bytes"].to_pylist():
            doc = json.loads(raw)
            if doc.get("type") != "FeatureCollection":
                raise ValueError("expected a GeoJSON FeatureCollection")
            out.append(_features_to_table(doc["features"], None, fid_start=0))
        t = pa.concat_tables(out, promote_options="default")
        return t.select(columns) if columns else t

    return rd.read_binary_files(path).map_batches(
        parse, batch_format="pyarrow", batch_size=None
    )


def _seq_fields(text_ds) -> list[str]:
    """Streaming schema pass: union of property keys across all lines
    (the reference's reader pre-scans for the field list the same way)."""
    def keys(batch: pd.DataFrame) -> pd.DataFrame:
        seen = list(dict.fromkeys(
            k for line in batch["text"]
            for k in (json.loads(line).get("properties") or {})
        ))
        return pd.DataFrame({"key": seen})

    got = text_ds.map_batches(keys, batch_format="pandas").unique("key")
    return sorted(got)


def read_geojsonseq(path: str, columns: list[str] | None = None,
                    fields: list[str] | None = None):
    """Line-delimited GeoJSON (one Feature per line, .geojsonl /
    RFC 8142) -> Dataset. Splittable: text shards parse independently.
    ``fields`` skips the schema pass when the property list is known.
    FIDs come from the Feature ``id`` member (null when absent — a global
    sequence would serialize the read)."""
    import ray.data as rd

    text = rd.read_text(path)
    if fields is None:
        fields = _seq_fields(rd.read_text(path))

    def parse(batch: pd.DataFrame) -> pa.Table:
        feats = [json.loads(line) for line in batch["text"]]
        t = _features_to_table(feats, list(fields))
        return t.select(columns) if columns else t

    return text.map_batches(parse, batch_format="pandas")


def write_geojsonseq(ds, out_dir: str, fields: list[str] | None = None):
    """Dataset (fid, geometry: WKB, properties) -> one ``.geojsonl`` shard
    per block under ``out_dir`` (atomic rename per shard; partitioned,
    resumable output). Returns the directory."""
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pd.DataFrame) -> pd.DataFrame:
        names = fields or [
            c for c in batch.columns if c not in ("fid", "geometry")
        ]
        lines = []
        for _, row in batch.iterrows():
            props = {}
            for c in names:
                v = row[c]
                if isinstance(v, (np.integer,)):
                    v = int(v)
                elif isinstance(v, (np.floating,)):
                    v = float(v)
                elif v is not None and pd.isna(v):
                    v = None
                props[c] = v
            feat = {
                "type": "Feature",
                "geometry": wkb_to_geojson(row["geometry"]),
                "properties": props,
            }
            if not pd.isna(row.get("fid")):
                feat["id"] = int(row["fid"])
            lines.append(json.dumps(feat, separators=(",", ":")))
        body = ("\n".join(lines) + "\n").encode()
        import zlib

        shard = f"part-{zlib.crc32(body):08x}-{len(lines)}.geojsonl"
        final = os.path.join(out_dir, shard)
        if not os.path.exists(final):
            tmp = final + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(body)
            os.replace(tmp, final)
        return pd.DataFrame({"shard": [shard], "n": [len(lines)]})

    return ds.map_batches(write_shard, batch_format="pandas", batch_size=None)


def write_geojson(ds, path: str, fields: list[str] | None = None) -> int:
    """Dataset (fid, geometry: WKB, properties) -> ONE FeatureCollection
    file (the reference's GeoJSON driver writes a single document too —
    the format is unsplittable, so this is a driver-side small write;
    use write_geojsonseq for partitioned output). Returns feature count."""
    df = ds.to_pandas()
    names = fields or [c for c in df.columns if c not in ("fid", "geometry")]
    feats = []
    for _, row in df.iterrows():
        props = {}
        for c in names:
            v = row[c]
            if isinstance(v, (np.integer,)):
                v = int(v)
            elif isinstance(v, (np.floating,)):
                v = float(v)
            elif v is not None and pd.isna(v):
                v = None
            props[c] = v
        feat = {
            "type": "Feature",
            "geometry": wkb_to_geojson(row["geometry"]),
            "properties": props,
        }
        fid = row.get("fid")
        if fid is not None and not pd.isna(fid):
            feat["id"] = int(fid)
        feats.append(feat)
    doc = {"type": "FeatureCollection", "features": feats}
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(doc, fh, separators=(",", ":"))
    os.replace(tmp, path)
    return len(feats)
