"""Constructive / measurement geometry operations (pure numpy, no GEOS).

The GDAL reference delegates these to GEOS (``ogr/ogr_geometry.h:563-592``);
here each is a direct vector kernel over ring arrays. Implemented subset:
area, perimeter/length, centroid, convex hull, Douglas-Peucker simplify,
rectangle clip (Sutherland-Hodgman — exact for the ogr2ogr
``-clipsrc xmin ymin xmax ymax`` case, apps/ogr2ogr_lib.cpp clip path),
segmentize, swap_xy. Polygon-polygon boolean ops are out of scope without a
robust-geometry library; rectangle clip covers the dominant pipeline use.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "ring_area",
    "ring_length",
    "polygon_area",
    "polygon_centroid",
    "convex_hull",
    "simplify_dp",
    "clip_ring_rect",
    "segmentize",
    "swap_xy",
    "segments_intersect_any",
    "polygons_intersect",
    "clip_ring_convex",
    "buffer_convex",
]


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area of a closed ring."""
    x = ring[:, 0]
    y = ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def ring_length(ring: np.ndarray) -> float:
    d = np.diff(ring, axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def polygon_area(rings) -> float:
    """|outer| minus |holes| (OGR_GEOM_AREA special field semantics)."""
    if not rings:
        return 0.0
    return abs(ring_area(rings[0])) - sum(abs(ring_area(h)) for h in rings[1:])


def polygon_centroid(rings):
    """Area-weighted centroid of the outer ring (holes subtracted)."""
    cx = cy = total = 0.0
    for i, ring in enumerate(rings):
        x = ring[:-1, 0]
        y = ring[:-1, 1]
        x1 = ring[1:, 0]
        y1 = ring[1:, 1]
        cross = x * y1 - x1 * y
        a = cross.sum() / 2.0
        if a == 0:
            continue
        gx = ((x + x1) * cross).sum() / (6.0 * a)
        gy = ((y + y1) * cross).sum() / (6.0 * a)
        w = abs(a) * (1 if i == 0 else -1)
        cx += gx * w
        cy += gy * w
        total += w
    if total == 0:
        return float(rings[0][:, 0].mean()), float(rings[0][:, 1].mean())
    return cx / total, cy / total


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns closed CCW hull ring."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return np.vstack([pts, pts[:1]])
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        hull = []
        for p in seq:
            while len(hull) >= 2 and np.cross(hull[-1] - hull[-2], p - hull[-2]) <= 0:
                hull.pop()
            hull.append(p)
        return hull

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.asarray(lower[:-1] + upper[:-1])
    return np.vstack([hull, hull[:1]])


def simplify_dp(line: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas-Peucker simplification (OGR Simplify semantics; tolerance =
    max perpendicular deviation)."""
    if len(line) <= 2:
        return line
    keep = np.zeros(len(line), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(line) - 1)]
    while stack:
        a, b = stack.pop()
        if b <= a + 1:
            continue
        seg = line[b] - line[a]
        norm = np.hypot(*seg)
        pts = line[a + 1 : b]
        if norm == 0:
            d = np.hypot(pts[:, 0] - line[a][0], pts[:, 1] - line[a][1])
        else:
            d = np.abs(np.cross(seg, pts - line[a])) / norm
        imax = int(np.argmax(d))
        if d[imax] > tolerance:
            keep[a + 1 + imax] = True
            stack.append((a, a + 1 + imax))
            stack.append((a + 1 + imax, b))
    return line[keep]


def clip_ring_rect(ring: np.ndarray, xmin, ymin, xmax, ymax) -> np.ndarray:
    """Sutherland-Hodgman clip of a closed ring by an axis-aligned rect.

    Exact for convex clip windows; returns a closed ring (possibly empty).
    """
    poly = ring[:-1].tolist() if (ring[0] == ring[-1]).all() else ring.tolist()

    def clip_edge(pts, inside, intersect):
        out = []
        n = len(pts)
        for i in range(n):
            cur = pts[i]
            prev = pts[i - 1]
            ci, pi = inside(cur), inside(prev)
            if ci:
                if not pi:
                    out.append(intersect(prev, cur))
                out.append(cur)
            elif pi:
                out.append(intersect(prev, cur))
        return out

    def ix(p, q, x):
        t = (x - p[0]) / (q[0] - p[0])
        return [x, p[1] + t * (q[1] - p[1])]

    def iy(p, q, y):
        t = (y - p[1]) / (q[1] - p[1])
        return [p[0] + t * (q[0] - p[0]), y]

    poly = clip_edge(poly, lambda p: p[0] >= xmin, lambda p, q: ix(p, q, xmin))
    if poly:
        poly = clip_edge(poly, lambda p: p[0] <= xmax, lambda p, q: ix(p, q, xmax))
    if poly:
        poly = clip_edge(poly, lambda p: p[1] >= ymin, lambda p, q: iy(p, q, ymin))
    if poly:
        poly = clip_edge(poly, lambda p: p[1] <= ymax, lambda p, q: iy(p, q, ymax))
    if not poly:
        return np.empty((0, 2))
    arr = np.asarray(poly)
    return np.vstack([arr, arr[:1]])


def segmentize(line: np.ndarray, max_length: float) -> np.ndarray:
    """Insert vertices so no segment exceeds max_length (OGR Segmentize)."""
    out = [line[0]]
    for i in range(1, len(line)):
        seg = line[i] - line[i - 1]
        dist = float(np.hypot(*seg))
        n = int(np.ceil(dist / max_length))
        for k in range(1, n + 1):
            out.append(line[i - 1] + seg * (k / n))
    return np.asarray(out)


def swap_xy(coords: np.ndarray) -> np.ndarray:
    """gdal vector swap-xy step."""
    return coords[:, ::-1]


def _orient(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def segments_intersect_any(a: np.ndarray, b: np.ndarray) -> bool:
    """True iff any segment of closed ring ``a`` intersects any of ``b``
    (proper or touching). Vectorized over the full segment-pair grid."""
    a0 = a[:-1]
    a1 = a[1:]
    b0 = b[:-1]
    b1 = b[1:]
    # orientation of each b endpoint against each a segment, broadcast
    d1 = _orient(a0[:, None, 0], a0[:, None, 1], a1[:, None, 0], a1[:, None, 1], b0[None, :, 0], b0[None, :, 1])
    d2 = _orient(a0[:, None, 0], a0[:, None, 1], a1[:, None, 0], a1[:, None, 1], b1[None, :, 0], b1[None, :, 1])
    d3 = _orient(b0[None, :, 0], b0[None, :, 1], b1[None, :, 0], b1[None, :, 1], a0[:, None, 0], a0[:, None, 1])
    d4 = _orient(b0[None, :, 0], b0[None, :, 1], b1[None, :, 0], b1[None, :, 1], a1[:, None, 0], a1[:, None, 1])
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    if proper.any():
        return True
    # collinear / endpoint-touching cases: any zero orientation with overlap
    def on_seg(px, py, qx, qy, rx, ry):
        return (
            (np.minimum(px, qx) <= rx) & (rx <= np.maximum(px, qx))
            & (np.minimum(py, qy) <= ry) & (ry <= np.maximum(py, qy))
        )
    t1 = (d1 == 0) & on_seg(a0[:, None, 0], a0[:, None, 1], a1[:, None, 0], a1[:, None, 1], b0[None, :, 0], b0[None, :, 1])
    t2 = (d2 == 0) & on_seg(a0[:, None, 0], a0[:, None, 1], a1[:, None, 0], a1[:, None, 1], b1[None, :, 0], b1[None, :, 1])
    t3 = (d3 == 0) & on_seg(b0[None, :, 0], b0[None, :, 1], b1[None, :, 0], b1[None, :, 1], a0[:, None, 0], a0[:, None, 1])
    t4 = (d4 == 0) & on_seg(b0[None, :, 0], b0[None, :, 1], b1[None, :, 0], b1[None, :, 1], a1[:, None, 0], a1[:, None, 1])
    return bool((t1 | t2 | t3 | t4).any())


def polygons_intersect(polys_a, polys_b) -> bool:
    """OGC Intersects for simple (multi)polygons (outer rings + holes):
    boundaries cross, or one lies inside the other (hole-aware) — the
    exact test GDAL gets from GEOS (ogr_geometry.h:552).
    """
    from gdal_ray.geo.pip import points_in_polygon_rings

    for ra in polys_a:
        for rb in polys_b:
            ea = (ra[0][:, 0].min(), ra[0][:, 1].min(), ra[0][:, 0].max(), ra[0][:, 1].max())
            eb = (rb[0][:, 0].min(), rb[0][:, 1].min(), rb[0][:, 0].max(), rb[0][:, 1].max())
            if ea[0] > eb[2] or eb[0] > ea[2] or ea[1] > eb[3] or eb[1] > ea[3]:
                continue
            if segments_intersect_any(ra[0], rb[0]):
                return True
            # containment either way (hole-aware)
            if points_in_polygon_rings(rb[0][:1, 0], rb[0][:1, 1], ra)[0]:
                return True
            if points_in_polygon_rings(ra[0][:1, 0], ra[0][:1, 1], rb)[0]:
                return True
    return False


def clip_ring_convex(subject: np.ndarray, clip_ring: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman clip of ``subject`` by a CONVEX closed ring
    (CCW or CW — orientation is normalized). The layer-algebra
    Intersection kernel for convex clip geometries (Clip/Intersection,
    ogrlayer.cpp:3345/5497, restricted to convex method features)."""
    clip = clip_ring[:-1] if (clip_ring[0] == clip_ring[-1]).all() else clip_ring
    if ring_area(np.vstack([clip, clip[:1]])) < 0:
        clip = clip[::-1]
    poly = subject[:-1].tolist() if (subject[0] == subject[-1]).all() else subject.tolist()
    n = len(clip)
    for i in range(n):
        if not poly:
            break
        ax, ay = clip[i]
        bx, by = clip[(i + 1) % n]
        out = []
        m = len(poly)
        for j in range(m):
            cur = poly[j]
            prev = poly[j - 1]
            cin = _orient(ax, ay, bx, by, cur[0], cur[1]) >= 0
            pin = _orient(ax, ay, bx, by, prev[0], prev[1]) >= 0
            if cin != pin:
                # intersection of (prev, cur) with the clip edge line
                x1, y1 = prev
                x2, y2 = cur
                denom = (x1 - x2) * (ay - by) - (y1 - y2) * (ax - bx)
                if denom != 0:
                    t = ((x1 - ax) * (ay - by) - (y1 - ay) * (ax - bx)) / denom
                    out.append([x1 + t * (x2 - x1), y1 + t * (y2 - y1)])
            if cin:
                out.append(list(cur))
        poly = out
    if not poly:
        return np.empty((0, 2))
    arr = np.asarray(poly)
    return np.vstack([arr, arr[:1]])


def buffer_convex(ring: np.ndarray, dist: float, quadsegs: int = 8) -> np.ndarray:
    """Positive buffer of a CONVEX ring (OGRGeometry::Buffer semantics for
    the convex case, ogr_geometry.h:570): Minkowski sum with a disk —
    offset edges joined by vertex arcs discretized at ``quadsegs`` segments
    per quarter circle (GEOS' quadrantSegments parameter). Returns a closed
    CCW ring; exact up to arc discretization (area deficit ->
    pi*r^2 - area(2*quadsegs*4-gon))."""
    pts = ring[:-1] if (ring[0] == ring[-1]).all() else ring
    if ring_area(np.vstack([pts, pts[:1]])) < 0:
        pts = pts[::-1]
    n = len(pts)
    step = (np.pi / 2.0) / quadsegs
    out = []
    for i in range(n):
        p = pts[i]
        din = p - pts[i - 1]
        dout = pts[(i + 1) % n] - p
        # outward normal of edge dir (dx, dy) on a CCW ring is (dy, -dx)
        a0 = np.arctan2(-din[0], din[1])
        a1 = np.arctan2(-dout[0], dout[1])
        sweep = (a1 - a0) % (2 * np.pi)
        k = max(1, int(np.ceil(sweep / step)))
        for t in np.linspace(a0, a0 + sweep, k + 1):
            out.append([p[0] + dist * np.cos(t), p[1] + dist * np.sin(t)])
    arr = np.asarray(out)
    return np.vstack([arr, arr[:1]])
