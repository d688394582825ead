"""ESRI Shapefile driver (OGR Shapefile driver analogue,
``ogr/ogrsf_frmts/shape/`` over ``shapelib``). Pure-struct reader/writer
for the classic trio:

- ``.shp`` — geometry records (big-endian record headers, little-endian
  shape bodies; ESRI Shapefile Technical Description, July 1998);
- ``.shx`` — fixed 8-byte index records (offset + length per feature),
  which is what makes the format SPLITTABLE: a read task seeks straight
  to its record range;
- ``.dbf`` — dBASE III attribute table (fixed-width rows, C/N/F/L/D
  field types), also offset-addressable.

Supported shape types: Point(1), PolyLine(3), Polygon(5), MultiPoint(8)
and their Z/M variants on read (Z/M ordinates drop, like the engine's
other decoders). Geometry converts to the engine's canonical WKB;
polygon rings regroup by ESRI winding (clockwise = outer, like
shapelib's SHPRewindObject convention — each outer opens a new polygon,
counter-clockwise rings are holes of the last outer).

Scale: ``read_shapefile`` shards by RECORD RANGES from the .shx index —
each Ray task opens the pair read-only and reads only its slice of .shp
and .dbf. The writer is a driver-side bounded sink (the three files are
sequential single-stream formats), mirroring ``write_gpkg``.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd

from gdal_ray.geo import wkb as W

__all__ = ["read_shapefile", "write_shapefile"]

_SHP_POINT = {1, 11, 21}
_SHP_POLYLINE = {3, 13, 23}
_SHP_POLYGON = {5, 15, 25}
_SHP_MULTIPOINT = {8, 18, 28}


def _ring_area2(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def _shape_to_wkb(shape_type: int, body: bytes) -> bytes | None:
    """One .shp record body (after the 4-byte type) -> canonical WKB."""
    if shape_type == 0:  # Null shape
        return None
    if shape_type in _SHP_POINT:
        x, y = struct.unpack_from("<dd", body, 0)
        return W.encode_point(x, y)
    if shape_type in _SHP_MULTIPOINT:
        (n,) = struct.unpack_from("<i", body, 32)
        pts = np.frombuffer(body, dtype="<f8", count=2 * n, offset=36)
        pts = pts.reshape(n, 2)
        out = struct.pack("<BII", 1, 4, n)
        for x, y in pts:
            out += W.encode_point(float(x), float(y))
        return out
    if shape_type in _SHP_POLYLINE or shape_type in _SHP_POLYGON:
        nparts, npoints = struct.unpack_from("<ii", body, 32)
        parts = np.frombuffer(body, dtype="<i4", count=nparts, offset=40)
        off = 40 + 4 * nparts
        pts = np.frombuffer(body, dtype="<f8", count=2 * npoints, offset=off)
        pts = pts.reshape(npoints, 2)
        bounds = list(parts) + [npoints]
        rings = [np.array(pts[bounds[i]:bounds[i + 1]])
                 for i in range(nparts)]
        if shape_type in _SHP_POLYLINE:
            return W.encode_multilinestring(rings)
        # ESRI winding: clockwise (negative shoelace) = outer ring.
        # Regroup, then flip back to the WKB convention the rest of the
        # engine speaks (outer CCW, holes CW) so write->read restores the
        # original vertex order exactly
        polys: list[list[np.ndarray]] = []
        for r in rings:
            a2 = _ring_area2(r)
            if a2 <= 0 or not polys:
                # outer: flip to CCW unless degenerate (winding undefined)
                polys.append([r[::-1] if a2 < 0 else r])
            else:
                polys[-1].append(r[::-1])  # hole: CCW (ESRI) -> CW (WKB)
        if len(polys) == 1:
            return W.encode_polygon(polys[0])
        return W.encode_multipolygon(polys)
    raise ValueError(f"unsupported shapefile shape type {shape_type}")


def _read_dbf_header(fh):
    head = fh.read(32)
    n_rec, hdr_len, rec_len = struct.unpack_from("<IHH", head, 4)
    fields = []
    while True:
        fd = fh.read(32)
        if fd[0:1] == b"\r":
            break
        name = fd[:11].split(b"\x00")[0].decode("ascii")
        ftype = chr(fd[11])
        flen, fdec = fd[16], fd[17]
        fields.append((name, ftype, flen, fdec))
    return n_rec, hdr_len, rec_len, fields


def _parse_dbf_rows(raw: np.ndarray, fields, rec_len: int) -> dict:
    """Vectorized fixed-width decode: raw is (n, rec_len) uint8."""
    cols: dict = {}
    off = 1  # deletion flag byte
    as_bytes = raw.view(f"S{rec_len}").ravel()
    for name, ftype, flen, fdec in fields:
        sl = np.char.strip(
            np.ascontiguousarray(raw[:, off:off + flen])
            .view(f"S{flen}").ravel()
        )
        if ftype in ("N", "F"):
            s = pd.Series(sl).replace(b"", None)
            if ftype == "N" and fdec == 0:
                cols[name] = pd.to_numeric(
                    s.str.decode("ascii"), errors="coerce"
                ).astype("float64").astype("Int64" if s.isna().any() else "int64")
            else:
                cols[name] = pd.to_numeric(
                    s.str.decode("ascii"), errors="coerce"
                )
        elif ftype == "L":
            cols[name] = pd.Series(sl).isin([b"T", b"t", b"Y", b"y"])
        else:  # C, D and anything else -> text
            cols[name] = pd.Series(sl).str.decode("latin-1")
        off += flen
    del as_bytes
    return cols


def read_shapefile(path: str, columns: list[str] | None = None,
                   shard_records: int = 65536):
    """``path`` (with or without .shp) -> Dataset (fid, geometry: WKB,
    dbf attributes). The .shx index makes record ranges independently
    addressable, so each range is one Ray read task."""
    import ray.data as rd

    base = path[:-4] if path.lower().endswith(".shp") else path
    with open(base + ".shx", "rb") as fh:
        head = fh.read(28)
    (file_len_words,) = struct.unpack_from(">i", head, 24)
    n_rec = (file_len_words * 2 - 100) // 8
    with open(base + ".dbf", "rb") as fh:
        n_dbf, hdr_len, rec_len, fields = _read_dbf_header(fh)
    if n_dbf != n_rec:
        raise ValueError(f".shp has {n_rec} records but .dbf has {n_dbf}")

    shards = [
        {"lo": s, "hi": min(s + shard_records, n_rec)}
        for s in range(0, n_rec, shard_records)
    ]

    def read_shard(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        with open(base + ".shp", "rb") as shp, \
                open(base + ".dbf", "rb") as dbf, \
                open(base + ".shx", "rb") as shx:
            for lo, hi in zip(batch["lo"], batch["hi"]):
                lo, hi = int(lo), int(hi)
                # each task reads ITS OWN .shx slice (8 bytes/record) —
                # nothing index-sized ships in the task closure
                shx.seek(100 + 8 * lo)
                idx = np.frombuffer(shx.read(8 * (hi - lo)), dtype=">i4")
                offsets = idx[0::2].astype(np.int64) * 2
                lengths = idx[1::2].astype(np.int64) * 2
                geoms = []
                for o, ln in zip(offsets, lengths):
                    shp.seek(int(o) + 8)  # skip record header
                    body = shp.read(int(ln))
                    (stype,) = struct.unpack_from("<i", body, 0)
                    geoms.append(_shape_to_wkb(stype, body[4:]))
                dbf.seek(hdr_len + lo * rec_len)
                raw = np.frombuffer(
                    dbf.read((hi - lo) * rec_len), dtype=np.uint8
                ).reshape(hi - lo, rec_len)
                cols = _parse_dbf_rows(raw, fields, rec_len)
                df = pd.DataFrame(cols)
                df.insert(0, "geometry",
                          pd.Series(geoms, index=df.index, dtype=object))
                df.insert(0, "fid", np.arange(lo, hi, dtype=np.int64))
                outs.append(df)
        out = pd.concat(outs, ignore_index=True)
        return out[columns] if columns else out

    return rd.from_pandas(pd.DataFrame(shards)).repartition(
        len(shards)
    ).map_batches(read_shard, batch_format="pandas", batch_size=None)


def _wkb_to_shape(buf: bytes | None):
    """WKB -> (shape_type, body bytes after the type int)."""
    if buf is None:
        return 0, b""
    _, gtype, _, _ = W._decode_geom(bytes(buf), 0)
    if gtype == 1:
        x, y = W.decode_points([bytes(buf)])
        return 1, struct.pack("<dd", float(x[0]), float(y[0]))
    if gtype in (2, 5, 8, 9, 11):
        lines = W.decode_lines(bytes(buf))
        return 3, _parts_body(lines)
    polys = W.decode_polygons(bytes(buf))
    rings = []
    for p in polys:
        for k, r in enumerate(p):
            r = np.asarray(r, dtype=np.float64)
            # ESRI winding: outer clockwise, holes counter-clockwise
            cw = _ring_area2(r) <= 0
            if (k == 0) != cw:
                r = r[::-1]
            rings.append(r)
    return 5, _parts_body(rings)


def _parts_body(parts) -> bytes:
    parts = [np.asarray(p, dtype=np.float64) for p in parts]
    allp = np.vstack(parts)
    minx, miny = allp.min(axis=0)
    maxx, maxy = allp.max(axis=0)
    body = struct.pack("<4d", minx, miny, maxx, maxy)
    body += struct.pack("<ii", len(parts), len(allp))
    start = 0
    for p in parts:
        body += struct.pack("<i", start)
        start += len(p)
    body += allp.astype("<f8").tobytes()
    return body


def _dbf_field_spec(s: pd.Series, name: str):
    if np.issubdtype(s.dtype, np.integer):
        return (name[:10], "N", 18, 0)
    if np.issubdtype(s.dtype, np.floating):
        return (name[:10], "N", 24, 10)
    width = max(1, min(254, int(s.astype(str).str.len().max() or 1)))
    return (name[:10], "C", width, 0)


def write_shapefile(ds, base: str):
    """Dataset (geometry: WKB + attributes) -> ``base``.shp/.shx/.dbf.
    Driver-side bounded sink (three sequential files), streaming
    ``iter_batches``; returns the record count. All geometries must be
    one family (points, lines, or polygons) — the format is
    single-shape-type, like the reference driver enforces."""
    shp_records, shape_type = [], None
    frames = []
    for batch in ds.iter_batches(batch_format="pandas"):
        frames.append(batch.drop(columns=["geometry"]))
        for b in batch["geometry"]:
            st, body = _wkb_to_shape(None if b is None else bytes(b))
            if st != 0:
                if shape_type is None:
                    shape_type = st
                elif st != shape_type:
                    raise ValueError(
                        f"mixed shape types {shape_type} vs {st}"
                    )
            shp_records.append((st, body))
    attrs = pd.concat(frames, ignore_index=True)
    if "fid" in attrs.columns:
        attrs = attrs.drop(columns=["fid"])
    shape_type = shape_type or 1

    # ---- .shp + .shx ----
    recs, idx, off = [], [], 100
    bbox = [np.inf, np.inf, -np.inf, -np.inf]
    for i, (st, body) in enumerate(shp_records):
        content = struct.pack("<i", st) + body
        recs.append(struct.pack(">ii", i + 1, len(content) // 2) + content)
        idx.append(struct.pack(">ii", off // 2, len(content) // 2))
        off += 8 + len(content)
        if st in _SHP_POINT:
            x, y = struct.unpack_from("<dd", body, 0)
            bbox = [min(bbox[0], x), min(bbox[1], y),
                    max(bbox[2], x), max(bbox[3], y)]
        elif body:
            bx = struct.unpack_from("<4d", body, 0)
            bbox = [min(bbox[0], bx[0]), min(bbox[1], bx[1]),
                    max(bbox[2], bx[2]), max(bbox[3], bx[3])]
    if not np.isfinite(bbox).all():
        bbox = [0.0, 0.0, 0.0, 0.0]

    def header(total_words):
        return (struct.pack(">i", 9994) + b"\x00" * 20
                + struct.pack(">i", total_words)
                + struct.pack("<ii", 1000, shape_type)
                + struct.pack("<4d", *bbox)
                + struct.pack("<4d", 0, 0, 0, 0))

    shp_body = b"".join(recs)
    with open(base + ".shp", "wb") as fh:
        fh.write(header((100 + len(shp_body)) // 2) + shp_body)
    with open(base + ".shx", "wb") as fh:
        fh.write(header((100 + 8 * len(idx)) // 2) + b"".join(idx))

    # ---- .dbf ----
    fields = [_dbf_field_spec(attrs[c], c) for c in attrs.columns]
    rec_len = 1 + sum(f[2] for f in fields)
    hdr = struct.pack("<B3BIHH20x", 3, 26, 1, 1, len(attrs),
                      32 + 32 * len(fields) + 1, rec_len)
    fds = b"".join(
        struct.pack("<11sc4xBB14x", n.encode().ljust(11, b"\x00"),
                    t.encode(), w, d)
        for n, t, w, d in fields
    )
    rows = bytearray()
    for _, r in attrs.iterrows():
        rows += b" "
        for (n, t, w, d), c in zip(fields, attrs.columns):
            v = r[c]
            if t == "N":
                s = "" if pd.isna(v) else (
                    f"{v:.{d}f}" if d else str(int(v))
                )
                rows += s[:w].rjust(w).encode("ascii")
            else:
                s = "" if v is None or (not isinstance(v, str) and pd.isna(v)) else str(v)
                rows += s[:w].ljust(w).encode("latin-1", "replace")
    with open(base + ".dbf", "wb") as fh:
        fh.write(hdr + fds + b"\r" + bytes(rows) + b"\x1a")
    return len(shp_records)
