"""Property-based tests (hypothesis) for the pure geometry/encoding kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    lat=st.floats(-80, 80),
    dlon=st.floats(-2.9, 2.9),
    zone=st.integers(1, 60),
    south=st.booleans(),
)
def test_utm_roundtrip_property(lat, dlon, zone, south):
    from gdal_ray.geo import tmerc as T

    if south and lat > 0:
        lat = -abs(lat) - 0.1
    lon = T.utm_zone_lon0(zone) + dlon
    E, N = T.latlon_to_utm(np.array([lat]), np.array([lon]), zone, south)
    lat2, lon2 = T.utm_to_latlon(E, N, zone, south)
    assert abs(lat2[0] - lat) < 1e-9 and abs(lon2[0] - lon) < 1e-9


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(0, 2**32 - 1))
def test_hilbert_neighbors_property(x, y):
    """Consecutive Hilbert distances map to 4-neighbor grid cells, and
    xy2d is injective on sampled pairs."""
    from gdal_ray.geo.hilbert import hilbert_xy2d

    order = 16
    ix, iy = x % (1 << order), y % (1 << order)
    d = int(hilbert_xy2d(order, np.array([ix]), np.array([iy]))[0])
    assert 0 <= d < (1 << (2 * order))
    # locality: walk the curve 4 steps from d -> cells stay 4-connected
    n = 1 << order
    all_xy = {(ix, iy): d}
    # brute force invert by scanning the 8-neighborhood for d+1
    for dd in (d - 1, d + 1):
        if not (0 <= dd < n * n):
            continue
        found = None
        for nx in range(max(0, ix - 1), min(n, ix + 2)):
            for ny in range(max(0, iy - 1), min(n, iy + 2)):
                if int(hilbert_xy2d(order, np.array([nx]), np.array([ny]))[0]) == dd:
                    found = (nx, ny)
        assert found is not None, "curve step left the 8-neighborhood"
        assert abs(found[0] - ix) + abs(found[1] - iy) == 1, "not 4-connected"


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(-1000, 1000), st.integers(-1000, 1000)),
                min_size=3, max_size=12))
def test_wkb_polygon_roundtrip_property(coords):
    from gdal_ray.geo import wkb as W

    ring = np.array(coords + [coords[0]], dtype=np.float64)
    blob = W.encode_polygon([ring])
    back = W.decode_polygons(blob)[0][0]
    assert (back == ring).all()


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 10**9), st.integers(0, 7))
def test_cell_pack_unpack_property(key, z_off):
    from gdal_ray.geo import cells as CL

    z = 3 + z_off
    n = 1 << z
    x, y = key % n, (key // 7) % n
    c = CL.cell_id(z, x, y)
    zz, xx, yy = CL.cell_to_xyz(c)
    assert (int(zz), int(xx), int(yy)) == (z, x, y)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_pip_convex_matches_halfplane_property(data):
    """For strictly-interior/exterior points of a convex CCW polygon, the
    GDAL ray-cast kernel must agree with the half-plane sign test."""
    from gdal_ray.geo.pip import points_in_ring

    rng_seed = data.draw(st.integers(0, 2**31))
    rng = np.random.default_rng(rng_seed)
    k = data.draw(st.integers(3, 8))
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    if len(np.unique(np.round(ang, 6))) < 3:
        return
    rad = rng.uniform(2, 5)
    pts = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1)
    ring = np.vstack([pts, pts[:1]])
    qx = rng.uniform(-6, 6, 200)
    qy = rng.uniform(-6, 6, 200)
    got = points_in_ring(qx, qy, ring)
    # half-plane test (CCW circle order -> CCW ring)
    inside = np.ones(200, dtype=bool)
    on_edge = np.zeros(200, dtype=bool)
    for i in range(k):
        ax, ay = pts[i]
        bx, by = pts[(i + 1) % k]
        cr = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
        inside &= cr > 0
        on_edge |= np.abs(cr) < 1e-9
    m = ~on_edge
    assert (got[m] == inside[m]).all()


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31))
def test_boolean_ops_invariant_property(seed):
    from gdal_ray.geo.booleanops import (
        pieces_area, polygon_difference, polygon_intersection,
    )
    from gdal_ray.geo.geomops import ring_area

    rng = np.random.default_rng(seed)

    def star(cx, cy):
        # jittered equal-angle construction: max angular gap < pi, so the
        # star polygon is always SIMPLE (booleanops' input contract)
        n = int(rng.integers(5, 10))
        ang = (np.arange(n) + rng.uniform(0.1, 0.9, n)) * (2 * np.pi / n)
        rad = rng.uniform(1, 4, n)
        p = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
        return np.vstack([p, p[:1]])

    a = star(0, 0)
    b = star(rng.uniform(-2, 2), rng.uniform(-2, 2))
    ai = pieces_area(polygon_intersection(a, b))
    ad = pieces_area(polygon_difference(a, b))
    assert abs(ai + ad - abs(ring_area(a))) < 1e-7
