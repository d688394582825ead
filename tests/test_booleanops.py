"""Polygon boolean ops (Intersection/Union/Difference with output
geometries): area invariants + Monte-Carlo membership oracle on random
simple (star-shaped, mostly concave) polygons — no GEOS anywhere."""

import numpy as np
import pytest

from gdal_ray.geo.booleanops import (
    pieces_area,
    polygon_difference,
    polygon_intersection,
    polygon_union,
    triangulate_ring,
)
from gdal_ray.geo.geomops import ring_area
from gdal_ray.geo.pip import points_in_ring


def _star(rng, cx, cy, n=9, rmin=1.0, rmax=4.0):
    # jittered equal-angle spacing keeps every angular gap < pi -> simple
    ang = (np.arange(n) + rng.uniform(0.1, 0.9, n)) * (2 * np.pi / n)
    rad = rng.uniform(rmin, rmax, n)
    pts = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
    return np.vstack([pts, pts[:1]])


def test_triangulation_area_exact():
    rng = np.random.default_rng(5)
    for _ in range(20):
        ring = _star(rng, 0, 0)
        tris = triangulate_ring(ring)
        total = sum(abs(ring_area(np.vstack([t, t[:1]]))) for t in tris)
        assert abs(total - abs(ring_area(ring))) < 1e-9


def test_boolean_ops_area_invariants_and_membership():
    rng = np.random.default_rng(17)
    for trial in range(12):
        a = _star(rng, 0, 0)
        b = _star(rng, rng.uniform(-2, 2), rng.uniform(-2, 2))
        aa = abs(ring_area(a))
        ab = abs(ring_area(b))
        inter = polygon_intersection(a, b)
        diff = polygon_difference(a, b)
        union = polygon_union(a, b)
        ai = pieces_area(inter)
        # A = (A ∩ B) + (A \ B)
        assert abs(ai + pieces_area(diff) - aa) < 1e-8, trial
        # |A ∪ B| = |A| + |B| - |A ∩ B|
        assert abs(pieces_area(union) - (aa + ab - ai)) < 1e-8, trial
        # commutativity of intersection area
        assert abs(pieces_area(polygon_intersection(b, a)) - ai) < 1e-8, trial

        # Monte-Carlo membership: piece membership == PIP(A) & PIP(B)
        px = rng.uniform(-5, 5, 400)
        py = rng.uniform(-5, 5, 400)
        in_a = points_in_ring(px, py, a)
        in_b = points_in_ring(px, py, b)
        in_i = np.zeros(400, dtype=bool)
        for p in inter:
            in_i |= points_in_ring(px, py, p)
        assert (in_i == (in_a & in_b)).all(), trial
        in_d = np.zeros(400, dtype=bool)
        for p in diff:
            in_d |= points_in_ring(px, py, p)
        assert (in_d == (in_a & ~in_b)).all(), trial
        in_u = np.zeros(400, dtype=bool)
        for p in union:
            in_u |= points_in_ring(px, py, p)
        assert (in_u == (in_a | in_b)).all(), trial


def test_boolean_ops_disjoint_and_contained():
    sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    far = sq + 100.0
    assert polygon_intersection(sq, far) == []
    assert abs(pieces_area(polygon_union(sq, far)) - 32.0) < 1e-9
    inner = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype=float)
    assert abs(pieces_area(polygon_intersection(sq, inner)) - 1.0) < 1e-12
    assert abs(pieces_area(polygon_difference(sq, inner)) - 15.0) < 1e-9
    assert abs(pieces_area(polygon_difference(inner, sq))) < 1e-12


def test_non_simple_ring_raises_with_repair_off():
    bowtie = np.array([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], dtype=float)
    with pytest.raises(ValueError, match="not a simple polygon"):
        triangulate_ring(bowtie, repair=False)
    # default path repairs: two unit-area triangles meeting at (1,1)
    tris = triangulate_ring(bowtie)
    from gdal_ray.geo.geomops import ring_area
    total = sum(abs(ring_area(np.vstack([t, t[:1]]))) for t in tris)
    assert total == pytest.approx(2.0)


# ---------------------------------------------------------------------------
# MakeValid-lite: self-intersecting rings repair instead of crashing
# ---------------------------------------------------------------------------

def _bowtie_pieces_oracle(p0, p1, p2, p3):
    """Closed-form bowtie decomposition: ring p0-p1-p2-p3 with edges
    p0p1 x p2p3 crossing at X splits into triangles (X,p1,p2), (X,p3,p0)."""
    from gdal_ray.geo.booleanops import _segment_crossing
    from gdal_ray.geo.geomops import ring_area
    import numpy as np

    hit = _segment_crossing(p0, p1, p2, p3)
    assert hit is not None
    _, _, x = hit
    t1 = np.array([x, p1, p2, x], dtype=np.float64)
    t2 = np.array([x, p3, p0, x], dtype=np.float64)
    return abs(ring_area(t1)) + abs(ring_area(t2))


def test_make_valid_random_bowties():
    import numpy as np

    from gdal_ray.geo.booleanops import make_valid_ring, pieces_area, triangulate_ring
    from gdal_ray.geo.geomops import ring_area

    rng = np.random.default_rng(1234)
    n_checked = 0
    for _ in range(200):
        # bowtie: swap two adjacent corners of a random convex quad so edge
        # 0-1 crosses edge 2-3
        pts = rng.uniform(-100, 100, (4, 2))
        p0 = np.array([min(pts[:, 0]) - 10, min(pts[:, 1]) - 10])
        p1 = np.array([max(pts[:, 0]) + 10, max(pts[:, 1]) + 10])
        p2 = np.array([min(pts[:, 0]) - 10, max(pts[:, 1]) + 10])
        p3 = np.array([max(pts[:, 0]) + 10, min(pts[:, 1]) - 10])
        ring = np.array([p0, p1, p2, p3, p0])
        pieces = make_valid_ring(ring)
        if len(pieces) < 2:
            continue
        n_checked += 1
        # every piece must be simple (triangulates without repair)...
        for p in pieces:
            assert triangulate_ring(p, repair=False)
        # ...and the total piece area equals the shoelace decomposition
        want = _bowtie_pieces_oracle(p0, p1, p2, p3)
        assert pieces_area(pieces) == pytest.approx(want, rel=1e-9)
        # and triangulate_ring's repair path returns the same total area
        tris = triangulate_ring(ring)
        closed = [np.vstack([t, t[:1]]) for t in tris]
        assert sum(abs(ring_area(c)) for c in closed) == pytest.approx(want, rel=1e-9)
    assert n_checked >= 150  # the construction above crosses by design


def test_make_valid_simple_ring_unchanged():
    import numpy as np

    from gdal_ray.geo.booleanops import make_valid_ring
    from gdal_ray.geo.geomops import ring_area

    ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=np.float64)
    pieces = make_valid_ring(ring)
    assert len(pieces) == 1
    assert abs(ring_area(pieces[0])) == pytest.approx(100.0)
