"""Property-based codec tests (hypothesis) for the round-5 drivers:
TIFF LZW/PackBits byte streams, WKT float round-trips, GP blobs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_ray.io.tiff import (_lzw_decode, _lzw_encode, _packbits_decode,
                              _packbits_encode)
from gdal_ray.sources.gpkg import gp_unwrap, gp_wrap

FINITE = st.floats(allow_nan=False, allow_infinity=False, width=64)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=5000))
def test_lzw_roundtrip_any_bytes(data):
    assert _lzw_decode(_lzw_encode(data)) == data


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 255), st.integers(1, 9000))
def test_lzw_long_runs(byte, n):
    # long single-byte runs stress the early-change width boundaries and
    # the 4094-entry dictionary reset
    data = bytes([byte]) * n
    assert _lzw_decode(_lzw_encode(data)) == data


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=2000))
def test_packbits_roundtrip(data):
    assert _packbits_decode(_packbits_encode(data)) == data


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(FINITE, FINITE), min_size=2, max_size=12))
def test_wkt_linestring_exact_floats(pts):
    from gdal_ray.geo.wkb import encode_linestring
    from gdal_ray.geo.wkt import wkb_to_wkt, wkt_to_wkb

    wkb = encode_linestring(np.asarray(pts, dtype=np.float64))
    # shortest-round-trip float text: wkb -> wkt -> wkb is bit-stable
    assert wkt_to_wkb(wkb_to_wkt(wkb)) == wkb


@settings(max_examples=60, deadline=None)
@given(FINITE, FINITE)
def test_geojson_point_exact_floats(x, y):
    from gdal_ray.geo.wkb import encode_point
    from gdal_ray.sources.geojson import geojson_to_wkb, wkb_to_geojson

    wkb = encode_point(x, y)
    assert geojson_to_wkb(wkb_to_geojson(wkb)) == wkb


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=5, max_size=200), st.integers(-(2**31), 2**31 - 1))
def test_gp_blob_roundtrip(wkb, srs):
    assert gp_unwrap(gp_wrap(wkb, srs)) == wkb


# ---------------- round-5 late additions ----------------

@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(FINITE, FINITE), min_size=3, max_size=10),
       st.booleans())
def test_map_coords_swap_involution(pts, as_poly):
    """swap-xy twice through map_coords is byte-identity for lines and
    polygons (structure and floats preserved)."""
    from gdal_ray.geo import geomops as GO
    from gdal_ray.geo.wkb import encode_linestring, encode_polygon, map_coords

    arr = np.array(pts, dtype=np.float64)
    if as_poly:
        closed = np.vstack([arr, arr[:1]])
        buf = encode_polygon([closed])
    else:
        buf = encode_linestring(arr)
    once = map_coords(buf, GO.swap_xy)
    twice = map_coords(once, GO.swap_xy)
    assert twice == buf


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 9), st.integers(1, 9), st.integers(0, 2**31 - 1))
def test_aaigrid_int_roundtrip_property(h, w, seed):
    from gdal_ray.io.aaigrid import read_aaigrid, write_aaigrid

    rng = np.random.default_rng(seed)
    a = rng.integers(-10000, 10000, (h, w)).astype(np.int64)
    gt = [float(rng.integers(-1000, 1000)), 2.5, 0.0,
          float(rng.integers(-1000, 1000)), 0.0, -2.5]
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g.asc")
        write_aaigrid(p, a, gt)
        out, ogt, _ = read_aaigrid(p)
    assert np.array_equal(out, a)
    assert np.allclose(ogt, gt)


@settings(max_examples=25, deadline=None)
@given(st.integers(2, 8), st.integers(2, 8), st.integers(0, 2**31 - 1))
def test_xyz_roundtrip_property(h, w, seed):
    """h, w >= 2: a single row/column cannot carry its own spacing
    (the reference defaults it too)."""
    from gdal_ray.io.xyz import read_xyz, write_xyz

    rng = np.random.default_rng(seed)
    a = rng.uniform(-1e6, 1e6, (h, w))
    gt = [float(rng.integers(-10**6, 10**6)), 7.25, 0.0,
          float(rng.integers(-10**6, 10**6)), 0.0, -7.25]
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g.xyz")
        write_xyz(p, a, gt)
        out, ogt = read_xyz(p)
    assert np.array_equal(out, a)  # repr round-trip exactness
    assert np.allclose(ogt, gt)


SANE = st.floats(allow_nan=False, allow_infinity=False,
                 min_value=-1e12, max_value=1e12)
PIX = SANE.filter(lambda v: abs(v) > 1e-6)


@settings(max_examples=40, deadline=None)
@given(st.tuples(PIX, SANE, SANE, PIX).map(list))
def test_world_file_roundtrip_property(vals):
    """gt -> world file -> gt is exact for finite repr-printable
    geotransforms with nonzero pixel sizes."""
    import tempfile, os

    from gdal_ray.io.tiff import read_world_file, write_world_file

    a, b, d, e = vals
    gt = [b, a, 0.0, d, 0.0, e]
    with tempfile.TemporaryDirectory() as dd:
        p = os.path.join(dd, "x.png")
        write_world_file(p, gt)
        got = read_world_file(p)
    assert got is not None
    # center-convention round trip: x0 = (x0 + a/2) - a/2 cancels one
    # ulp of the LARGER magnitude, so tolerance scales with both terms
    for g, w in zip(got, gt):
        tol = 4e-16 * max(abs(w), abs(gt[1]), abs(gt[5]))
        assert abs(g - w) <= tol
