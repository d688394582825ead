"""LineString kernels (pure numpy) — the linear slice of the OGR geometry
API the round-2 engine lacked (VERDICT "Non-polygon geometry ops").

Reference semantics:
- ``line_length``: OGRCurve::get_Length (sum of per-segment
  sqrt(dx*dx + dy*dy), ``ogr/ogrlinestring.cpp`` get_Length);
- ``line_interpolate``: OGRCurve::Value at distance d along the line,
  clamped to the endpoints;
- ``segmentize``: OGRGeometry::segmentize — every segment longer than
  ``max_len`` splits into ceil(len/max_len) EQUAL parts
  (``ogr/ogrlinestring.cpp`` segmentize);
- ``clip_line_rect``: Liang–Barsky parametric clip of each segment to an
  axis-aligned rect (layer-algebra Clip on line layers,
  ``ogr/ogrsf_frmts/generic/ogrlayer.cpp:5497``), merging the parametric
  pieces of consecutive segments into polyline parts;
- ``clip_line_convex``: Cyrus–Beck clip to a CONVEX CCW ring (the line
  side of Intersection with convex method polygons).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "line_length",
    "line_interpolate",
    "segmentize",
    "clip_line_rect",
    "clip_line_convex",
    "line_locate",
    "line_substring",
    "line_milepoints",
]


def _seg_lengths(pts: np.ndarray) -> np.ndarray:
    d = np.diff(pts, axis=0)
    return np.sqrt(d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1])


def line_length(pts: np.ndarray) -> float:
    """Total length of a polyline (OGRCurve::get_Length)."""
    pts = np.asarray(pts, dtype=np.float64)
    if pts.shape[0] < 2:
        return 0.0
    return float(np.sum(_seg_lengths(pts)))


def line_interpolate(pts: np.ndarray, dist: float):
    """Point at distance ``dist`` along the line (OGRCurve::Value), clamped
    to [0, length]."""
    pts = np.asarray(pts, dtype=np.float64)
    if pts.shape[0] == 0:
        raise ValueError("empty line")
    if pts.shape[0] == 1 or dist <= 0:
        return float(pts[0, 0]), float(pts[0, 1])
    lens = _seg_lengths(pts)
    acc = 0.0
    for i, sl in enumerate(lens):
        if acc + sl >= dist and sl > 0:
            frac = (dist - acc) / sl
            x = pts[i, 0] + frac * (pts[i + 1, 0] - pts[i, 0])
            y = pts[i, 1] + frac * (pts[i + 1, 1] - pts[i, 1])
            return float(x), float(y)
        acc += sl
    return float(pts[-1, 0]), float(pts[-1, 1])


def segmentize(pts: np.ndarray, max_len: float) -> np.ndarray:
    """Split every over-long segment into equal parts (OGR segmentize)."""
    pts = np.asarray(pts, dtype=np.float64)
    if pts.shape[0] < 2:
        return pts.copy()
    out = [pts[:1]]
    lens = _seg_lengths(pts)
    for i, sl in enumerate(lens):
        n = int(np.ceil(sl / max_len)) if sl > max_len else 1
        if n > 1:
            t = np.arange(1, n, dtype=np.float64) / n
            mids = pts[i][None, :] + t[:, None] * (pts[i + 1] - pts[i])[None, :]
            out.append(mids)
        out.append(pts[i + 1 : i + 2])
    return np.vstack(out)


def _merge_parts(parts):
    """Chain consecutive clipped segments that share an endpoint."""
    merged = []
    for seg in parts:
        if merged and np.allclose(merged[-1][-1], seg[0], rtol=0, atol=1e-9):
            merged[-1] = np.vstack([merged[-1], seg[1:]])
        else:
            merged.append(seg)
    return merged


def clip_line_rect(pts: np.ndarray, minx, miny, maxx, maxy):
    """Liang–Barsky clip of a polyline to a rect; list of polyline parts."""
    pts = np.asarray(pts, dtype=np.float64)
    parts = []
    for i in range(pts.shape[0] - 1):
        x0, y0 = pts[i]
        x1, y1 = pts[i + 1]
        dx = x1 - x0
        dy = y1 - y0
        t0, t1 = 0.0, 1.0
        ok = True
        for p, q in (
            (-dx, x0 - minx),
            (dx, maxx - x0),
            (-dy, y0 - miny),
            (dy, maxy - y0),
        ):
            if p == 0.0:
                if q < 0.0:
                    ok = False
                    break
                continue
            r = q / p
            if p < 0.0:
                if r > t1:
                    ok = False
                    break
                if r > t0:
                    t0 = r
            else:
                if r < t0:
                    ok = False
                    break
                if r < t1:
                    t1 = r
        if not ok or t0 >= t1:
            continue
        a = np.array([x0 + t0 * dx, y0 + t0 * dy])
        b = np.array([x0 + t1 * dx, y0 + t1 * dy])
        parts.append(np.vstack([a, b]))
    return _merge_parts(parts)


def clip_line_convex(pts: np.ndarray, ring: np.ndarray):
    """Cyrus–Beck clip of a polyline to a convex CCW ring (closed)."""
    pts = np.asarray(pts, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64)
    ex = np.diff(ring[:, 0])
    ey = np.diff(ring[:, 1])
    # inward normal of a CCW edge (ex, ey) is (-ey, ex)
    nx, ny = -ey, ex
    parts = []
    for i in range(pts.shape[0] - 1):
        x0, y0 = pts[i]
        x1, y1 = pts[i + 1]
        dx = x1 - x0
        dy = y1 - y0
        t0, t1 = 0.0, 1.0
        ok = True
        for j in range(len(nx)):
            denom = nx[j] * dx + ny[j] * dy
            num = nx[j] * (x0 - ring[j, 0]) + ny[j] * (y0 - ring[j, 1])
            if denom == 0.0:
                if num < 0.0:
                    ok = False
                    break
                continue
            r = -num / denom
            if denom > 0.0:  # entering
                if r > t0:
                    t0 = r
            else:  # leaving
                if r < t1:
                    t1 = r
            if t0 > t1:
                ok = False
                break
        if not ok or t0 >= t1:
            continue
        a = np.array([x0 + t0 * dx, y0 + t0 * dy])
        b = np.array([x0 + t1 * dx, y0 + t1 * dy])
        parts.append(np.vstack([a, b]))
    return _merge_parts(parts)


def line_locate(pts: np.ndarray, px: float, py: float) -> float:
    """Measure (distance along the polyline) of the closest point to
    (px, py) — the ogrlineref get_pos operation (apps/ogrlineref.cpp):
    project onto every segment, clamp to the segment, take the global
    nearest. Vectorized over segments."""
    pts = np.asarray(pts, dtype=np.float64)
    if pts.shape[0] < 2:
        return 0.0
    a = pts[:-1]
    d = np.diff(pts, axis=0)
    seg2 = d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1]
    t = np.zeros(len(a))
    nz = seg2 > 0
    t[nz] = ((px - a[nz, 0]) * d[nz, 0] + (py - a[nz, 1]) * d[nz, 1]) / seg2[nz]
    t = np.clip(t, 0.0, 1.0)
    cx = a[:, 0] + t * d[:, 0]
    cy = a[:, 1] + t * d[:, 1]
    d2 = (cx - px) ** 2 + (cy - py) ** 2
    i = int(np.argmin(d2))
    lens = np.sqrt(seg2)
    return float(np.sum(lens[:i]) + t[i] * lens[i])


def line_substring(pts: np.ndarray, m0: float, m1: float) -> np.ndarray:
    """Sub-polyline between measures m0 <= m1 (ogrlineref get_subline /
    OGRCurve segment extraction): interpolated endpoints + every interior
    vertex whose measure falls strictly inside."""
    pts = np.asarray(pts, dtype=np.float64)
    total = line_length(pts)
    m0 = max(0.0, min(float(m0), total))
    m1 = max(m0, min(float(m1), total))
    lens = _seg_lengths(pts)
    acc = np.concatenate([[0.0], np.cumsum(lens)])
    start = line_interpolate(pts, m0)
    end = line_interpolate(pts, m1)
    inner = pts[1:-1][(acc[1:-1] > m0) & (acc[1:-1] < m1)] \
        if pts.shape[0] > 2 else np.empty((0, 2))
    out = np.vstack([[start], inner, [end]])
    # drop consecutive duplicates (a measure landing exactly on a vertex)
    keep = np.ones(len(out), dtype=bool)
    keep[1:] = (np.abs(np.diff(out, axis=0)) > 1e-12).any(axis=1)
    return out[keep]


def line_milepoints(pts: np.ndarray, step: float) -> np.ndarray:
    """(k, 3) array of (measure, x, y) every ``step`` along the line,
    including measure 0 and the terminal measure (ogrlineref create —
    the regular milepost table the reference builds as its reference
    layer)."""
    total = line_length(pts)
    if step <= 0:
        raise ValueError("milepoint step must be positive")
    ms = list(np.arange(0.0, total, step))
    if not ms or ms[-1] < total:
        ms.append(total)
    out = np.empty((len(ms), 3))
    for k, m in enumerate(ms):
        x, y = line_interpolate(pts, m)
        out[k] = (m, x, y)
    return out
