"""Contour (iso-line) generation via marching squares.

Mirrors ``alg/contour.cpp:568`` + ``alg/marching_squares/*.h``: for each
contour level, each 2x2 pixel-center cell contributes 0-2 segments whose
endpoints are linearly interpolated on the cell edges; segments are stitched
into polylines. Grid registration: value at pixel (i, j) sits at pixel
center (j + 0.5, i + 0.5), same as GDAL's pixel-is-area model.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "contour_segments",
    "stitch_polylines",
    "contour_lines",
    "contour_polygons",
]


def contour_segments(arr: np.ndarray, level: float):
    """All marching-squares segments of one level, vectorized over cells.

    Returns (N, 4) array of (x0, y0, x1, y1) in pixel-center coordinates.
    """
    a = arr.astype(np.float64)
    tl = a[:-1, :-1]
    tr = a[:-1, 1:]
    bl = a[1:, :-1]
    br = a[1:, 1:]
    # case index: bit set when corner >= level (GDAL's >= convention)
    idx = (
        (tl >= level).astype(np.int8)
        | ((tr >= level).astype(np.int8) << 1)
        | ((br >= level).astype(np.int8) << 2)
        | ((bl >= level).astype(np.int8) << 3)
    )
    ys, xs = np.nonzero((idx > 0) & (idx < 15))
    if ys.size == 0:
        return np.empty((0, 4))
    segs = []

    def interp(v0, v1):
        d = v1 - v0
        t = np.where(d != 0, (level - v0) / np.where(d == 0, 1, d), 0.5)
        return np.clip(t, 0.0, 1.0)

    ctl = tl[ys, xs]
    ctr = tr[ys, xs]
    cbl = bl[ys, xs]
    cbr = br[ys, xs]
    cx = xs + 0.5
    cy = ys + 0.5
    # edge crossing points (pixel-center space)
    top = np.stack([cx + interp(ctl, ctr), cy + 0 * cx], axis=1)
    bottom = np.stack([cx + interp(cbl, cbr), cy + 1 + 0 * cx], axis=1)
    left = np.stack([cx + 0 * cx, cy + interp(ctl, cbl)], axis=1)
    right = np.stack([cx + 1 + 0 * cx, cy + interp(ctr, cbr)], axis=1)
    ci = idx[ys, xs]
    # lookup: per case, list of (edgeA, edgeB) pairs; edges: 0=top 1=right
    # 2=bottom 3=left; ambiguous saddles (5, 10) resolved by center mean
    edges = {0: top, 1: right, 2: bottom, 3: left}
    TABLE = {
        1: [(3, 0)],
        2: [(0, 1)],
        3: [(3, 1)],
        4: [(1, 2)],
        6: [(0, 2)],
        7: [(3, 2)],
        8: [(2, 3)],
        9: [(2, 0)],
        11: [(2, 1)],
        12: [(1, 3)],
        13: [(1, 0)],
        14: [(0, 3)],
    }
    center = (ctl + ctr + cbl + cbr) / 4.0
    for case in np.unique(ci):
        sel = ci == case
        if case in (5, 10):
            hi = center[sel] >= level
            pairs_hi = [(3, 0), (1, 2)] if case == 5 else [(0, 1), (2, 3)]
            pairs_lo = [(3, 2), (1, 0)] if case == 5 else [(0, 3), (2, 1)]
            for flag, pairs in ((hi, pairs_hi), (~hi, pairs_lo)):
                ss = np.flatnonzero(sel)[flag]
                for ea, eb in pairs:
                    segs.append(
                        np.concatenate([edges[ea][ss], edges[eb][ss]], axis=1)
                    )
        else:
            ss = np.flatnonzero(sel)
            for ea, eb in TABLE[int(case)]:
                segs.append(np.concatenate([edges[ea][ss], edges[eb][ss]], axis=1))
    return np.concatenate(segs, axis=0) if segs else np.empty((0, 4))


def stitch_polylines(segs: np.ndarray, tol: float = 1e-9):
    """Greedy endpoint-matching of segments into polylines."""
    if len(segs) == 0:
        return []
    key = lambda p: (round(p[0] / tol) if tol else p[0], round(p[1] / tol))
    from collections import defaultdict

    adj = defaultdict(list)
    for i, s in enumerate(segs):
        adj[key(s[:2])].append((i, 0))
        adj[key(s[2:])].append((i, 1))
    used = np.zeros(len(segs), dtype=bool)
    lines = []
    for start in range(len(segs)):
        if used[start]:
            continue
        used[start] = True
        line = [segs[start][:2].tolist(), segs[start][2:].tolist()]
        # extend forward then backward
        for endsel in (1, 0):
            while True:
                p = line[-1] if endsel == 1 else line[0]
                nxt = None
                for j, side in adj[key(np.asarray(p))]:
                    if not used[j]:
                        nxt = (j, side)
                        break
                if nxt is None:
                    break
                j, side = nxt
                used[j] = True
                other = segs[j][2:] if side == 0 else segs[j][:2]
                if endsel == 1:
                    line.append(other.tolist())
                else:
                    line.insert(0, other.tolist())
        lines.append(np.asarray(line))
    return lines


def contour_lines(arr: np.ndarray, levels, gt=(0.0, 1.0, 0.0, 0.0, 0.0, 1.0)):
    """Per-level polylines in geo coordinates."""
    from gdal_ray.geo.affine import apply_geotransform

    out = []
    for level in levels:
        segs = contour_segments(arr, level)
        for line in stitch_polylines(segs):
            gx, gy = apply_geotransform(gt, line[:, 0], line[:, 1])
            out.append({"level": float(level), "coords": np.stack([gx, gy], axis=1)})
    return out


# --------------------------------------------------------------------------
# Polygon (iso-band) mode — alg/contour.cpp:568 polygonize=true +
# alg/marching_squares/polygon_ring_appender.h
# --------------------------------------------------------------------------

def _clip_by_level(pts, keep_ge: bool, level: float):
    """Sutherland-Hodgman clip of a value-carrying polygon [(x, y, v), ...]
    by the half-space v >= level (or v <= level); crossing vertices are
    linearly interpolated — the same per-edge interpolation marching
    squares uses, so crossing points on a shared cell border are
    bit-identical in both adjacent cells."""
    out = []
    n = len(pts)
    for i in range(n):
        x0, y0, v0 = pts[i]
        x1, y1, v1 = pts[(i + 1) % n]
        in0 = v0 >= level if keep_ge else v0 <= level
        in1 = v1 >= level if keep_ge else v1 <= level
        if in0:
            out.append((x0, y0, v0))
        if in0 != in1:
            t = (level - v0) / (v1 - v0)
            out.append((x0 + t * (x1 - x0), y0 + t * (y1 - y0), level))
    return out


def _ring_area_xy(ring) -> float:
    x = ring[:, 0]
    y = ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def _merge_fragments(frags):
    """Dissolve cell fragments into rings by cancelling opposite shared
    edges and chaining the remainder. Endpoint keys are the exact floats
    (shared-border crossings are computed from the same corner values in
    both cells, so they match bit-for-bit)."""
    from collections import defaultdict

    edgecount: dict = {}
    for poly in frags:
        n = len(poly)
        for i in range(n):
            a = poly[i]
            b = poly[(i + 1) % n]
            if a == b:
                continue
            if edgecount.get((b, a), 0) > 0:
                edgecount[(b, a)] -= 1
                if edgecount[(b, a)] == 0:
                    del edgecount[(b, a)]
            else:
                edgecount[(a, b)] = edgecount.get((a, b), 0) + 1
    adj = defaultdict(list)
    for (a, b), cnt in edgecount.items():
        for _ in range(cnt):
            adj[a].append(b)
    rings = []
    while adj:
        a0 = next(iter(adj))
        ring = [a0]
        a = a0
        while True:
            nxts = adj[a]
            b = nxts.pop()
            if not nxts:
                del adj[a]
            if b == a0:
                break
            ring.append(b)
            a = b
        ring.append(a0)
        rings.append(np.asarray(ring, dtype=np.float64))
    return rings


def contour_polygons(arr: np.ndarray, levels, gt=(0.0, 1.0, 0.0, 0.0, 0.0, 1.0)):
    """Iso-band POLYGONS between consecutive levels (gdal_contour -p;
    reference ``alg/contour.cpp:568`` polygonize branch +
    ``alg/marching_squares/polygon_ring_appender.h``): bands are
    (-inf, l0], [l0, l1], ..., [lN, +inf) over the pixel-center domain
    [0.5, w-0.5] x [0.5, h-0.5]. Per 2x2 cell the band region is the cell
    square clipped by the two band levels with per-edge linear
    interpolation (the marching-squares field model); fragments dissolve
    into rings by shared-edge cancellation. Saddle cells are cut straight
    between crossings (the same approximation as the line tracer's
    TABLE-driven segments).

    Returns a list of dicts per non-empty band: {elev_min, elev_max,
    rings (geo coords; holes have negative pixel-space shoelace area),
    area (pixel^2, exact fragment sum)}.
    """
    from gdal_ray.geo.affine import apply_geotransform

    a = np.asarray(arr, dtype=np.float64)
    h, w = a.shape
    if h < 2 or w < 2:
        return []
    tl = a[:-1, :-1]
    tr = a[:-1, 1:]
    bl = a[1:, :-1]
    br = a[1:, 1:]
    cmin = np.minimum(np.minimum(tl, tr), np.minimum(bl, br))
    cmax = np.maximum(np.maximum(tl, tr), np.maximum(bl, br))
    bounds = [-np.inf] + [float(v) for v in levels] + [np.inf]
    out = []
    for bi in range(len(bounds) - 1):
        lo, hi = bounds[bi], bounds[bi + 1]
        inside = (cmin >= lo) & (cmax <= hi)
        crossing = (cmax >= lo) & (cmin <= hi) & ~inside
        frags = []
        area = 0.0
        ys, xs = np.nonzero(inside)
        for y, x in zip(ys.tolist(), xs.tolist()):
            cx, cy = x + 0.5, y + 0.5
            frags.append([(cx, cy), (cx + 1.0, cy), (cx + 1.0, cy + 1.0),
                          (cx, cy + 1.0)])
        area += float(len(ys))
        ys, xs = np.nonzero(crossing)
        for y, x in zip(ys.tolist(), xs.tolist()):
            cx, cy = x + 0.5, y + 0.5
            vtl = float(tl[y, x])
            vtr = float(tr[y, x])
            vbl = float(bl[y, x])
            vbr = float(br[y, x])
            # 4 center-vertex triangles (linear field per triangle): the
            # band region inside each is CONVEX, so the clip is exact and
            # bands tile the cell even at saddles. The center value is the
            # corner mean in the SAME operand order as the line tracer's
            # saddle rule (contour_segments), keeping the two modes
            # consistent.
            vc = (vtl + vtr + vbl + vbr) / 4.0
            corners = [
                (cx, cy, vtl),
                (cx + 1.0, cy, vtr),
                (cx + 1.0, cy + 1.0, vbr),
                (cx, cy + 1.0, vbl),
            ]
            ctr = (cx + 0.5, cy + 0.5, vc)
            for t in range(4):
                pts = [corners[t], corners[(t + 1) % 4], ctr]
                if np.isfinite(lo):
                    pts = _clip_by_level(pts, True, lo)
                if len(pts) >= 3 and np.isfinite(hi):
                    pts = _clip_by_level(pts, False, hi)
                if len(pts) < 3:
                    continue
                ring = [(p[0], p[1]) for p in pts]
                frag = np.asarray(ring + [ring[0]], dtype=np.float64)
                fa = _ring_area_xy(frag)
                if fa == 0.0:
                    continue
                area += fa
                frags.append(ring)
        if not frags:
            continue
        geo_rings = []
        for ring in _merge_fragments(frags):
            gx, gy = apply_geotransform(gt, ring[:, 0], ring[:, 1])
            geo_rings.append(np.stack([gx, gy], axis=1))
        out.append(
            {
                "elev_min": lo,
                "elev_max": hi,
                "rings": geo_rings,
                "area": area,
            }
        )
    return out
