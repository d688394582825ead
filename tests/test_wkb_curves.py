"""WKB Z/M dimensions, EWKB flags, and curve-type linearization."""

import struct

import numpy as np
import pytest

from gdal_ray.geo import wkb as W
from gdal_ray.geo.geomops import ring_area


def test_iso_z_and_zm_points():
    # ISO Point Z (1001) and Point ZM (3001)
    bz = struct.pack("<BIddd", 1, 1001, 3.0, 4.0, 99.0)
    bzm = struct.pack("<BIdddd", 1, 3001, 5.0, 6.0, 1.0, 2.0)
    xs, ys = W.decode_points([bz, bzm])
    assert xs.tolist() == [3.0, 5.0] and ys.tolist() == [4.0, 6.0]


def test_ewkb_flags_and_srid():
    # EWKB Point with Z flag + SRID (PostGIS style)
    b = struct.pack("<BII", 1, (0x80000000 | 0x20000000 | 1) & 0xFFFFFFFF, 4326)
    b += struct.pack("<ddd", 7.0, 8.0, 100.0)
    xs, ys = W.decode_points([b])
    assert xs[0] == 7.0 and ys[0] == 8.0


def test_iso_linestring_z_drops_z():
    pts3 = np.array([[0, 0, 5], [1, 1, 6], [2, 0, 7]], dtype="<f8")
    b = struct.pack("<BII", 1, 1002, 3) + pts3.tobytes()
    (line,) = W.decode_lines(b)
    assert line.shape == (3, 2)
    assert np.allclose(line, pts3[:, :2])


def test_polygon_z_envelope():
    ring3 = np.array([[0, 0, 1], [4, 0, 1], [4, 3, 1], [0, 3, 1], [0, 0, 1]], dtype="<f8")
    b = struct.pack("<BIII", 1, 1003, 1, 5) + ring3.tobytes()
    assert W.wkb_envelope(b) == (0.0, 0.0, 4.0, 3.0)
    (rings,) = W.decode_polygons(b)
    assert abs(ring_area(rings[0])) == pytest.approx(12.0)


def test_circularstring_semicircle_length():
    # semicircle of radius 10 through (0,0) -> (10,10) -> (20,0)
    pts = np.array([[0.0, 0.0], [10.0, 10.0], [20.0, 0.0]])
    b = W.encode_circularstring(pts)
    (line,) = W.decode_lines(b)
    assert np.allclose(line[0], [0, 0]) and np.allclose(line[-1], [20, 0])
    seglen = np.hypot(*(np.diff(line, axis=0).T)).sum()
    assert seglen == pytest.approx(np.pi * 10.0, rel=2e-3)  # 4-deg stroking
    # every stroked vertex is on the circle
    assert np.allclose(np.hypot(line[:, 0] - 10.0, line[:, 1]), 10.0, atol=1e-9)


def test_curvepolygon_full_circle_area():
    # CurvePolygon whose single ring is a CircularString full circle
    # (two semicircle arcs), radius 5 around (0, 0)
    ctrl = np.array([[-5.0, 0.0], [0.0, 5.0], [5.0, 0.0], [0.0, -5.0], [-5.0, 0.0]])
    cs = W.encode_circularstring(ctrl)
    b = struct.pack("<BII", 1, 10, 1) + cs
    (rings,) = W.decode_polygons(b)
    area = abs(ring_area(rings[0]))
    assert area == pytest.approx(np.pi * 25.0, rel=3e-3)


def test_compoundcurve_arc_plus_segment():
    cs = W.encode_circularstring(np.array([[0.0, 0.0], [5.0, 5.0], [10.0, 0.0]]))
    ls = W.encode_linestring(np.array([[10.0, 0.0], [20.0, 0.0]]))
    b = struct.pack("<BII", 1, 9, 2) + cs + ls
    (line,) = W.decode_lines(b)
    assert np.allclose(line[0], [0, 0]) and np.allclose(line[-1], [20, 0])
    # monotone x after the arc midpoint; the junction vertex appears once
    assert ((line[:-1] != line[1:]).any(axis=1)).all()


def test_multicurve_and_multisurface():
    cs = W.encode_circularstring(np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]]))
    ls = W.encode_linestring(np.array([[5.0, 5.0], [6.0, 6.0]]))
    mc = struct.pack("<BII", 1, 11, 2) + cs + ls
    lines = W.decode_lines(mc)
    assert len(lines) == 2 and np.allclose(lines[1], [[5, 5], [6, 6]])
    poly = W.encode_polygon([np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)])
    ms = struct.pack("<BII", 1, 12, 1) + poly
    polys = W.decode_polygons(ms)
    assert len(polys) == 1 and abs(ring_area(polys[0][0])) == pytest.approx(4.0)


def test_collinear_arc_degrades_to_segments():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    out = W.linearize_arc(pts[0], pts[1], pts[2])
    assert np.allclose(out, pts)
