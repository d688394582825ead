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
