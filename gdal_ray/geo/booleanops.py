"""Polygon boolean operations with OUTPUT GEOMETRIES (no GEOS).

The reference delegates Intersection/Union/Difference to GEOS
(``ogr/ogr_geometry.h:563-592``; layer algebra ``ogr/ogrlayer.cpp:3345``,
``:3763``, ``:5806``). This module implements them for SIMPLE polygons
(no holes, no self-intersection) via convex decomposition:

- ``triangulate_ring``: ear-clipping triangulation of a simple ring;
- intersection: clip every triangle of A by every triangle of B with the
  Sutherland-Hodgman convex clip — each output piece is convex;
- difference A \\ B: for each piece of A subtract B's triangles one at a
  time using the half-plane decomposition
  ``P \\ T  =  disjoint union over edges i of  (P cut to the OUTSIDE of
  edge i, inside edges 1..i-1)`` — every piece stays convex;
- union: A + (B \\ A).

Results are MultiPolygon-like lists of convex rings (not dissolved); areas
are additive because pieces are interior-disjoint by construction. The
invariants area(A∩B) + area(A\\B) = area(A) and
area(A∪B) = area(A) + area(B) - area(A∩B) hold to float tolerance and are
asserted in the tests together with a Monte-Carlo membership oracle.
"""

from __future__ import annotations

import numpy as np

from gdal_ray.geo.geomops import _orient, clip_ring_convex, ring_area

__all__ = [
    "triangulate_ring",
    "make_valid_ring",
    "polygon_intersection",
    "polygon_difference",
    "polygon_union",
    "pieces_area",
]


def _open_ccw(ring: np.ndarray) -> np.ndarray:
    """Closed or open ring -> open CCW vertex list."""
    pts = ring[:-1] if ring.shape[0] >= 2 and (ring[0] == ring[-1]).all() else ring
    if ring_area(np.vstack([pts, pts[:1]])) < 0:
        pts = pts[::-1]
    return np.asarray(pts, dtype=np.float64)


def _segment_crossing(p1, p2, p3, p4):
    """Proper interior crossing of segments p1p2 and p3p4 -> (t, u, point)
    with both parameters strictly inside (0, 1), else None."""
    d1x, d1y = p2[0] - p1[0], p2[1] - p1[1]
    d2x, d2y = p4[0] - p3[0], p4[1] - p3[1]
    denom = d1x * d2y - d1y * d2x
    if denom == 0:
        return None
    t = ((p3[0] - p1[0]) * d2y - (p3[1] - p1[1]) * d2x) / denom
    u = ((p3[0] - p1[0]) * d1y - (p3[1] - p1[1]) * d1x) / denom
    eps = 1e-12
    if eps < t < 1 - eps and eps < u < 1 - eps:
        return t, u, (p1[0] + t * d1x, p1[1] + t * d1y)
    return None


def make_valid_ring(ring: np.ndarray) -> list[np.ndarray]:
    """MakeValid-lite (ref ``ogr/ogr_geometry.h:592`` MakeValid; GEOS
    'structure' method, simplified): split a self-intersecting ring at its
    edge-edge crossing points into SIMPLE closed sub-rings.

    The walk is augmented with every proper crossing point (sorted along
    each edge), then decomposed into loops: whenever a point recurs on the
    walk, the enclosed span pops off as one sub-ring (the classic bowtie
    ABXCDX -> XBX-loop + XDX-loop untwist). Near-zero-area slivers are
    dropped. Already-simple rings come back unchanged (one piece)."""
    pts = _open_ccw(ring)
    n = len(pts)
    if n < 3:
        return []
    # crossings per edge, ordered along the edge
    per_edge: list[list[tuple[float, tuple[float, float]]]] = [[] for _ in range(n)]
    for i in range(n):
        a1, a2 = pts[i], pts[(i + 1) % n]
        for j in range(i + 1, n):
            if j == i or (j + 1) % n == i or (i + 1) % n == j:
                continue  # adjacent edges share a vertex, not a crossing
            hit = _segment_crossing(a1, a2, pts[j], pts[(j + 1) % n])
            if hit is not None:
                t, u, p = hit
                per_edge[i].append((t, p))
                per_edge[j].append((u, p))
    if not any(per_edge):
        return [np.vstack([pts, pts[:1]])]
    walk: list[tuple[float, float]] = []
    for i in range(n):
        walk.append((float(pts[i][0]), float(pts[i][1])))
        for _, p in sorted(per_edge[i], key=lambda e: e[0]):
            walk.append((round(p[0], 9), round(p[1], 9)))
    # loop extraction: recurring point closes the span since its last visit
    out: list[np.ndarray] = []
    path: list[tuple[float, float]] = []
    seen: dict[tuple[float, float], int] = {}
    for p in walk:
        key = (round(p[0], 9), round(p[1], 9))
        if key in seen:
            j = seen[key]
            loop = path[j:] + [path[j]]
            if len(loop) >= 4:
                arr = np.asarray(loop, dtype=np.float64)
                if abs(ring_area(arr)) > 1e-12:
                    out.append(arr)
            for q in path[j + 1 :]:
                seen.pop((round(q[0], 9), round(q[1], 9)), None)
            path = path[: j + 1]
        else:
            seen[key] = len(path)
            path.append(p)
    if len(path) >= 3:
        arr = np.asarray(path + [path[0]], dtype=np.float64)
        if abs(ring_area(arr)) > 1e-12:
            out.append(arr)
    return out


def triangulate_ring(ring: np.ndarray, repair: bool = True) -> list[np.ndarray]:
    """Ear-clipping triangulation of a simple ring -> list of (3, 2) arrays.

    O(n^2); collinear vertices are dropped, degenerate remainders are
    fan-filled (zero-area ears contribute nothing to any boolean result).
    Self-intersecting input (detected by the exact ear-area identity below)
    is REPAIRED via ``make_valid_ring`` when ``repair`` is set — bowties
    degrade to their simple pieces instead of killing the stage (reference
    MakeValid, ``ogr/ogr_geometry.h:592``); pass ``repair=False`` to get
    the hard failure back.
    """
    pts = _open_ccw(ring)
    n = len(pts)
    if n < 3:
        return []
    idx = list(range(n))
    tris: list[np.ndarray] = []
    guard = 0
    while len(idx) > 3 and guard < 2 * n * n:
        guard += 1
        ear_found = False
        m = len(idx)
        for k in range(m):
            i0, i1, i2 = idx[k - 1], idx[k], idx[(k + 1) % m]
            a, b, c = pts[i0], pts[i1], pts[i2]
            cr = _orient(a[0], a[1], b[0], b[1], c[0], c[1])
            if cr <= 0:
                if cr == 0:  # collinear vertex: drop it outright
                    idx.pop(k)
                    ear_found = True
                    break
                continue
            # ear iff no other vertex lies inside (or on) triangle abc
            ok = True
            for j in idx:
                if j in (i0, i1, i2):
                    continue
                p = pts[j]
                d1 = _orient(a[0], a[1], b[0], b[1], p[0], p[1])
                d2 = _orient(b[0], b[1], c[0], c[1], p[0], p[1])
                d3 = _orient(c[0], c[1], a[0], a[1], p[0], p[1])
                if d1 >= 0 and d2 >= 0 and d3 >= 0:
                    ok = False
                    break
            if ok:
                tris.append(np.array([a, b, c]))
                idx.pop(k)
                ear_found = True
                break
        if not ear_found:  # degenerate ring: fan fallback
            break
    if len(idx) >= 3:
        p0 = pts[idx[0]]
        for k in range(1, len(idx) - 1):
            tris.append(np.array([p0, pts[idx[k]], pts[idx[k + 1]]]))
    tris = [t for t in tris if abs(ring_area(np.vstack([t, t[:1]]))) > 0]
    # simplicity check: for a simple ring the ear areas sum EXACTLY to the
    # ring area; a self-intersecting input silently violates that, so fail
    # loudly instead of returning overlapping pieces
    total = sum(abs(ring_area(np.vstack([t, t[:1]]))) for t in tris)
    want = abs(ring_area(np.vstack([pts, pts[:1]])))
    if abs(total - want) > 1e-6 * max(1.0, want, total):
        if repair:
            pieces = make_valid_ring(np.vstack([pts, pts[:1]]))
            if len(pieces) > 1:  # genuinely split: triangulate each piece
                tris = []
                for p in pieces:
                    tris.extend(triangulate_ring(p, repair=False))
                return tris
        raise ValueError(
            f"ring is not a simple polygon (ear area {total:.6g} != ring area {want:.6g})"
        )
    return tris


def _close(p: np.ndarray) -> np.ndarray:
    return np.vstack([p, p[:1]])


def _convex_minus_triangle(piece: np.ndarray, tri: np.ndarray) -> list[np.ndarray]:
    """Convex open piece minus a CCW triangle -> disjoint convex open pieces.

    P \\ T = union over T's edges i of (P clipped OUTSIDE edge i and INSIDE
    edges 0..i-1); each term is an intersection of half-planes with P, so
    convex, and terms are pairwise disjoint by construction.
    """
    out: list[np.ndarray] = []
    kept = piece  # P restricted to the inside of edges seen so far
    nt = len(tri)
    for i in range(nt):
        a = tri[i]
        b = tri[(i + 1) % nt]
        # half-plane clip helpers on OPEN convex rings
        outside = _clip_halfplane(kept, b, a)  # outside edge ab = inside ba
        if len(outside) >= 3:
            out.append(outside)
        kept = _clip_halfplane(kept, a, b)
        if len(kept) < 3:
            break
    return out


def _clip_halfplane(poly: np.ndarray, a, b) -> np.ndarray:
    """Clip an open convex ring to the left half-plane of directed edge a->b."""
    if len(poly) == 0:
        return poly
    out = []
    m = len(poly)
    for j in range(m):
        cur = poly[j]
        prev = poly[j - 1]
        cin = _orient(a[0], a[1], b[0], b[1], cur[0], cur[1]) >= 0
        pin = _orient(a[0], a[1], b[0], b[1], prev[0], prev[1]) >= 0
        if cin != pin:
            x1, y1 = prev
            x2, y2 = cur
            denom = (x1 - x2) * (a[1] - b[1]) - (y1 - y2) * (a[0] - b[0])
            if denom != 0:
                t = ((x1 - a[0]) * (a[1] - b[1]) - (y1 - a[1]) * (a[0] - b[0])) / denom
                out.append([x1 + t * (x2 - x1), y1 + t * (y2 - y1)])
        if cin:
            out.append([cur[0], cur[1]])
    return np.asarray(out) if out else np.empty((0, 2))


def polygon_intersection(ring_a: np.ndarray, ring_b: np.ndarray) -> list[np.ndarray]:
    """A ∩ B as a list of closed convex rings (interior-disjoint pieces)."""
    tris_b = triangulate_ring(ring_b)
    out = []
    for ta in triangulate_ring(ring_a):
        for tb in tris_b:
            piece = clip_ring_convex(_close(ta), _close(tb))
            if piece.shape[0] >= 4 and abs(ring_area(piece)) > 1e-12:
                out.append(piece)
    return out


def polygon_difference(ring_a: np.ndarray, ring_b: np.ndarray) -> list[np.ndarray]:
    """A \\ B as a list of closed convex rings (interior-disjoint pieces)."""
    tris_b = triangulate_ring(ring_b)
    out = []
    for ta in triangulate_ring(ring_a):
        pieces = [ta]
        for tb in tris_b:
            nxt: list[np.ndarray] = []
            for p in pieces:
                nxt.extend(_convex_minus_triangle(p, _open_ccw(_close(tb))))
            pieces = [p for p in nxt if abs(ring_area(_close(p))) > 1e-12]
            if not pieces:
                break
        out.extend(_close(p) for p in pieces)
    return out


def polygon_union(ring_a: np.ndarray, ring_b: np.ndarray) -> list[np.ndarray]:
    """A ∪ B as interior-disjoint convex pieces: A + (B \\ A)."""
    out = [_close(t) for t in triangulate_ring(ring_a)]
    out.extend(polygon_difference(ring_b, ring_a))
    return out


def pieces_area(pieces) -> float:
    """Total area of interior-disjoint closed rings."""
    return float(sum(abs(ring_area(p)) for p in pieces))
