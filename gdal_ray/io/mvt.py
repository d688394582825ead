"""Mapbox Vector Tile (MVT 2.1) codec — pure-Python protobuf, no libs.

The reference ships MVT as an OGR driver (``ogr/ogrsf_frmts/mvt/``,
wire format in ``mvtutils.h`` / the public vector_tile.proto): a tile is
a protobuf ``Tile`` message of ``Layer``s, each layer a string-interned
key/value pool plus ``Feature``s whose geometry is a packed stream of
zigzag-delta command integers in integer tile coordinates. Everything
here is hand-rolled from the published spec:

- varint / zigzag primitives and length-delimited submessages;
- geometry command stream: ``(cmd & 7) | (count << 3)`` with MoveTo=1,
  LineTo=2, ClosePath=7; coordinates are deltas from the previous point,
  zigzag-encoded, in ``[0, extent)`` integer space;
- layer key/value pools deduplicate feature properties exactly like the
  reference's ``OGRMVTWriterDataset`` (first-seen order, so output is
  deterministic);
- ``decode_mvt`` parses what ``encode_mvt`` writes (and any spec-valid
  tile), giving byte-free structural round-trips for tests and the read
  path of the driver.

Geometry values are numpy int arrays; encode/decode are vectorized over
each ring/line (no per-vertex Python in the command stream math).
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_mvt", "decode_mvt", "zigzag", "unzigzag",
           "GEOM_POINT", "GEOM_LINESTRING", "GEOM_POLYGON"]

GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3

_CMD_MOVETO = 1
_CMD_LINETO = 2
_CMD_CLOSE = 7


# ---------------------------------------------------------------- protobuf

def _varint(n: int) -> bytes:
    out = bytearray()
    n = int(n)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _varints(arr) -> bytes:
    return b"".join(_varint(int(v)) for v in arr)


def zigzag(v):
    """Signed -> unsigned zigzag (vectorized)."""
    v = np.asarray(v, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def unzigzag(u):
    u = np.asarray(u, dtype=np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)
            ^ -(u & np.uint64(1)).astype(np.int64))


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


# ---------------------------------------------------------------- geometry

def _encode_geometry(geom_type: int, parts: list[np.ndarray]) -> list[int]:
    """parts: list of (n, 2) int arrays (points: one part of all points;
    lines: one part per line; polygons: one part per ring, exterior CW
    first per the spec, holes after). Returns command integers."""
    cmds: list[int] = []
    cx = cy = 0
    for pi, pts in enumerate(parts):
        pts = np.asarray(pts, dtype=np.int64).reshape(-1, 2)
        d = pts.copy()
        d[0, 0] -= cx
        d[0, 1] -= cy
        d[1:] = pts[1:] - pts[:-1]
        zz = zigzag(d.ravel())
        if geom_type == GEOM_POINT:
            if pi != 0:
                raise ValueError("points take a single part")
            cmds.append(_CMD_MOVETO | (len(pts) << 3))
            cmds.extend(int(v) for v in zz)
        else:
            cmds.append(_CMD_MOVETO | (1 << 3))
            cmds.extend(int(v) for v in zz[:2])
            cmds.append(_CMD_LINETO | ((len(pts) - 1) << 3))
            cmds.extend(int(v) for v in zz[2:])
            if geom_type == GEOM_POLYGON:
                cmds.append(_CMD_CLOSE | (1 << 3))
        cx, cy = int(pts[-1, 0]), int(pts[-1, 1])
    return cmds


def _decode_geometry(geom_type: int, cmds: list[int]) -> list[np.ndarray]:
    parts: list[np.ndarray] = []
    cur: list[list[int]] = []
    i = 0
    x = y = 0
    n = len(cmds)
    while i < n:
        c = cmds[i]
        i += 1
        cmd, cnt = c & 7, c >> 3
        if cmd == _CMD_CLOSE:
            parts.append(np.asarray(cur, dtype=np.int64))
            cur = []
            continue
        d = unzigzag(np.asarray(cmds[i:i + 2 * cnt], dtype=np.uint64))
        i += 2 * cnt
        pts = d.reshape(-1, 2).cumsum(axis=0)
        pts[:, 0] += x
        pts[:, 1] += y
        x, y = int(pts[-1, 0]), int(pts[-1, 1])
        if cmd == _CMD_MOVETO and cnt > 1:  # multipoint
            parts.append(pts)
            continue
        if cmd == _CMD_MOVETO and cur:
            parts.append(np.asarray(cur, dtype=np.int64))
            cur = []
        cur.extend(pts.tolist())
    if cur:
        parts.append(np.asarray(cur, dtype=np.int64))
    return parts


# ---------------------------------------------------------------- values

def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _tag(7, 0) + _varint(1 if v else 0)
    if isinstance(v, (int, np.integer)):
        v = int(v)
        if v >= 0:
            return _tag(4, 0) + _varint(v)
        return _tag(6, 0) + _varint(int(zigzag(np.int64(v))[()]))
    if isinstance(v, (float, np.floating)):
        import struct

        return _tag(3, 1) + struct.pack("<d", float(v))
    if isinstance(v, str):
        b = v.encode("utf-8")
        return _len_delim(1, b)
    raise TypeError(f"unsupported MVT value {type(v)}")


def _decode_value(buf: bytes):
    import struct

    v, i = _read_varint(buf, 0)
    field, wire = v >> 3, v & 7
    if field == 1:
        ln, i = _read_varint(buf, i)
        return buf[i:i + ln].decode("utf-8")
    if field == 3:
        return struct.unpack("<d", buf[i:i + 8])[0]
    if field == 4 or field == 5:
        val, _ = _read_varint(buf, i)
        return val
    if field == 6:
        val, _ = _read_varint(buf, i)
        return int(unzigzag(np.uint64(val))[()])
    if field == 7:
        val, _ = _read_varint(buf, i)
        return bool(val)
    if field == 2:
        return struct.unpack("<f", buf[i:i + 4])[0]
    raise ValueError(f"bad Value field {field}/{wire}")


# ---------------------------------------------------------------- tile

def encode_mvt(layers: dict, extent: int = 4096) -> bytes:
    """{layer_name: [feature, ...]} -> MVT tile bytes. A feature is a dict
    with ``geom_type`` (1/2/3), ``parts`` (list of (n,2) int arrays in
    tile coords), optional ``id`` (int) and ``properties`` (dict of
    str -> str/int/float/bool)."""
    out = bytearray()
    for name, feats in layers.items():
        keys: list[str] = []
        kidx: dict[str, int] = {}
        vals: list[bytes] = []
        vidx: dict[bytes, int] = {}
        fbufs = []
        for f in feats:
            tags: list[int] = []
            for k, v in (f.get("properties") or {}).items():
                if k not in kidx:
                    kidx[k] = len(keys)
                    keys.append(k)
                vb = _encode_value(v)
                if vb not in vidx:
                    vidx[vb] = len(vals)
                    vals.append(vb)
                tags.extend((kidx[k], vidx[vb]))
            cmds = _encode_geometry(f["geom_type"], f["parts"])
            fb = bytearray()
            if f.get("id") is not None:
                fb += _tag(1, 0) + _varint(int(f["id"]))
            if tags:
                fb += _len_delim(2, _varints(tags))
            fb += _tag(3, 0) + _varint(f["geom_type"])
            fb += _len_delim(4, _varints(cmds))
            fbufs.append(bytes(fb))
        lb = bytearray()
        lb += _tag(15, 0) + _varint(2)  # version
        lb += _len_delim(1, name.encode("utf-8"))
        for fb in fbufs:
            lb += _len_delim(2, fb)
        for k in keys:
            lb += _len_delim(3, k.encode("utf-8"))
        for vb in vals:
            lb += _len_delim(4, vb)
        if extent != 4096:
            lb += _tag(5, 0) + _varint(extent)
        out += _len_delim(3, bytes(lb))
    return bytes(out)


def _decode_packed(buf: bytes) -> list[int]:
    out = []
    i = 0
    while i < len(buf):
        v, i = _read_varint(buf, i)
        out.append(v)
    return out


def decode_mvt(data: bytes) -> dict:
    """MVT tile bytes -> {layer_name: {"extent": e, "features": [...]}}
    with features shaped like ``encode_mvt`` input plus decoded
    ``properties``."""
    layers: dict = {}
    i = 0
    while i < len(data):
        t, i = _read_varint(data, i)
        field, wire = t >> 3, t & 7
        if field != 3 or wire != 2:
            raise ValueError(f"unexpected Tile field {field}/{wire}")
        ln, i = _read_varint(data, i)
        lbuf = data[i:i + ln]
        i += ln
        name = ""
        extent = 4096
        keys: list[str] = []
        vals: list = []
        rawfeats: list[bytes] = []
        j = 0
        while j < len(lbuf):
            t2, j = _read_varint(lbuf, j)
            f2, w2 = t2 >> 3, t2 & 7
            if w2 == 2:
                ln2, j = _read_varint(lbuf, j)
                payload = lbuf[j:j + ln2]
                j += ln2
                if f2 == 1:
                    name = payload.decode("utf-8")
                elif f2 == 2:
                    rawfeats.append(payload)
                elif f2 == 3:
                    keys.append(payload.decode("utf-8"))
                elif f2 == 4:
                    vals.append(_decode_value(payload))
            else:
                v2, j = _read_varint(lbuf, j)
                if f2 == 5:
                    extent = v2
        feats = []
        for fb in rawfeats:
            fid = None
            gtype = 0
            tags: list[int] = []
            cmds: list[int] = []
            k = 0
            while k < len(fb):
                t3, k = _read_varint(fb, k)
                f3, w3 = t3 >> 3, t3 & 7
                if w3 == 2:
                    ln3, k = _read_varint(fb, k)
                    payload = fb[k:k + ln3]
                    k += ln3
                    if f3 == 2:
                        tags = _decode_packed(payload)
                    elif f3 == 4:
                        cmds = _decode_packed(payload)
                else:
                    v3, k = _read_varint(fb, k)
                    if f3 == 1:
                        fid = v3
                    elif f3 == 3:
                        gtype = v3
            props = {keys[tags[m]]: vals[tags[m + 1]]
                     for m in range(0, len(tags), 2)}
            feats.append({
                "id": fid, "geom_type": gtype,
                "parts": _decode_geometry(gtype, cmds),
                "properties": props,
            })
        layers[name] = {"extent": extent, "features": feats}
    return layers
