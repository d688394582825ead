"""LineString WKB + kernel tests (geo/lineops.py, geo/wkb.py linear types)."""

import numpy as np

from gdal_ray.geo import lineops as LN
from gdal_ray.geo import wkb as W


def test_wkb_linestring_roundtrip():
    pts = np.array([[0.0, 0.0], [3.0, 4.0], [10.0, 4.0]])
    out = W.decode_lines(W.encode_linestring(pts))
    assert len(out) == 1 and np.array_equal(out[0], pts)


def test_wkb_multilinestring_roundtrip():
    a = np.array([[0.0, 0.0], [1.0, 1.0]])
    b = np.array([[5.0, 5.0], [6.0, 7.0], [8.0, 7.0]])
    out = W.decode_lines(W.encode_multilinestring([a, b]))
    assert len(out) == 2
    assert np.array_equal(out[0], a) and np.array_equal(out[1], b)


def test_line_length_and_interpolate():
    pts = np.array([[0.0, 0.0], [3.0, 4.0], [3.0, 14.0]])  # 5 + 10
    assert LN.line_length(pts) == 15.0
    assert LN.line_interpolate(pts, 0.0) == (0.0, 0.0)
    assert LN.line_interpolate(pts, 2.5) == (1.5, 2.0)   # mid of seg 1
    assert LN.line_interpolate(pts, 10.0) == (3.0, 9.0)  # 5 into seg 2
    assert LN.line_interpolate(pts, 99.0) == (3.0, 14.0)  # clamped


def test_segmentize_equal_parts():
    pts = np.array([[0.0, 0.0], [10.0, 0.0]])
    out = LN.segmentize(pts, 4.0)  # ceil(10/4) = 3 parts
    assert np.allclose(out[:, 0], [0, 10 / 3, 20 / 3, 10])
    # short segments untouched
    assert LN.segmentize(pts, 10.0).shape[0] == 2


def test_clip_line_rect_parts_and_merge():
    # zigzag crossing the rect twice -> two parts
    pts = np.array([[-5.0, 5.0], [15.0, 5.0]])
    parts = LN.clip_line_rect(pts, 0.0, 0.0, 10.0, 10.0)
    assert len(parts) == 1
    assert np.allclose(parts[0], [[0.0, 5.0], [10.0, 5.0]])
    # consecutive in-rect segments merge into one polyline
    pts = np.array([[1.0, 1.0], [2.0, 2.0], [3.0, 1.0]])
    parts = LN.clip_line_rect(pts, 0.0, 0.0, 10.0, 10.0)
    assert len(parts) == 1 and parts[0].shape[0] == 3
    # fully outside -> nothing
    assert LN.clip_line_rect(pts, 100.0, 100.0, 110.0, 110.0) == []


def test_clip_line_convex_diamond():
    ring = np.array([[10.0, 0.0], [0.0, 10.0], [-10.0, 0.0], [0.0, -10.0], [10.0, 0.0]])
    pts = np.array([[-20.0, 0.0], [20.0, 0.0]])  # horizontal through center
    parts = LN.clip_line_convex(pts, ring)
    assert len(parts) == 1
    assert np.allclose(parts[0], [[-10.0, 0.0], [10.0, 0.0]])
    # line missing the diamond entirely
    pts = np.array([[-20.0, 15.0], [20.0, 15.0]])
    assert LN.clip_line_convex(pts, ring) == []
    # diagonal chord
    pts = np.array([[0.0, -20.0], [0.0, 20.0]])
    parts = LN.clip_line_convex(pts, ring)
    assert np.allclose(parts[0], [[0.0, -10.0], [0.0, 10.0]])
