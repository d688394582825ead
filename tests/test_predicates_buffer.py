"""Areal predicates family + convex buffer (no GEOS)."""

import numpy as np

from gdal_ray.geo.geomops import buffer_convex, ring_area
from gdal_ray.geo.predicates import relate_areal
from gdal_ray.geo.pip import points_in_ring


def _rect(cx, cy, hw, hh):
    return np.array(
        [[cx - hw, cy - hh], [cx + hw, cy - hh], [cx + hw, cy + hh],
         [cx - hw, cy + hh], [cx - hw, cy - hh]], dtype=float
    )


def test_relate_rect_cases():
    a = _rect(0, 0, 10, 10)
    assert relate_areal(a, _rect(0, 0, 3, 3)) == "contains"
    assert relate_areal(_rect(0, 0, 3, 3), a) == "within"
    assert relate_areal(a, _rect(12, 0, 4, 4)) == "overlaps"
    assert relate_areal(a, _rect(14, 0, 4, 4)) == "touches"      # shared edge x=10
    assert relate_areal(a, _rect(14, 14, 4, 4)) == "touches"     # corner contact
    assert relate_areal(a, _rect(30, 0, 4, 4)) == "disjoint"
    assert relate_areal(a, _rect(0, 0, 10, 10)) == "equals"


def test_relate_concave():
    # L-shape vs a rect in its notch: touching along the notch edges only
    L = np.array(
        [[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10], [0, 0]], dtype=float
    )
    notch = np.array([[4, 4], [10, 4], [10, 10], [4, 10], [4, 4]], dtype=float)
    assert relate_areal(L, notch) == "touches"
    assert relate_areal(L, _rect(2, 2, 1, 1)) == "contains"
    assert relate_areal(L, _rect(5, 5, 3, 3)) == "overlaps"


def test_buffer_convex_square():
    sq = _rect(0, 0, 5, 5)
    r = 2.0
    buf = buffer_convex(sq, r, quadsegs=16)
    area = abs(ring_area(buf))
    want = 100 + 4 * 10 * r / 2 * 2 + np.pi * r * r  # s^2 + 4*s*r + pi r^2
    want = 100 + 4 * 10 * r + np.pi * r * r
    assert want * 0.995 < area <= want + 1e-9

    # membership: points within distance r are inside, beyond are outside
    rng = np.random.default_rng(3)
    px = rng.uniform(-10, 10, 500)
    py = rng.uniform(-10, 10, 500)
    dx = np.maximum(np.abs(px) - 5, 0)
    dy = np.maximum(np.abs(py) - 5, 0)
    d = np.hypot(dx, dy)
    inside = points_in_ring(px, py, buf)
    assert (inside[d < r * 0.98]).all()
    assert (~inside[d > r * 1.02]).all()


def test_buffer_convex_triangle_vertices_covered():
    tri = np.array([[0, 0], [8, 0], [3, 6], [0, 0]], dtype=float)
    buf = buffer_convex(tri, 1.5)
    assert points_in_ring(tri[:-1, 0], tri[:-1, 1], buf).all()
