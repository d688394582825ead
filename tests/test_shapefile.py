"""ESRI Shapefile driver (gdal_ray/sources/shapefile.py): .shp/.shx/.dbf
codec, ESRI ring winding, record-range-sharded distributed read."""

import numpy as np
import pytest

from gdal_ray.geo.wkb import (encode_linestring, encode_multilinestring,
                              encode_multipolygon, encode_point,
                              encode_polygon)
from gdal_ray.sources.shapefile import read_shapefile, write_shapefile


def _roundtrip(ray_session, geoms, base, **attrs):
    import pandas as pd
    import ray.data as rd

    df = pd.DataFrame({"geometry": geoms, **attrs})
    ds = rd.from_pandas(df)
    n = write_shapefile(ds, base)
    assert n == len(geoms)
    back = read_shapefile(base + ".shp").to_pandas()
    assert len(back) == len(geoms)
    return back.sort_values("fid").reset_index(drop=True)


def test_points_roundtrip(tmp_path, ray_session):
    geoms = [encode_point(1.5, 2.5), encode_point(-3.0, 4.25), None]
    back = _roundtrip(ray_session, geoms, str(tmp_path / "pts"),
                      name=["a", "b", "c"], val=[10, 20, 30])
    assert bytes(back["geometry"][0]) == geoms[0]
    assert bytes(back["geometry"][1]) == geoms[1]
    assert back["geometry"][2] is None  # Null shape round-trips
    assert back["name"].tolist() == ["a", "b", "c"]
    assert back["val"].tolist() == [10, 20, 30]


def test_lines_roundtrip(tmp_path, ray_session):
    l1 = encode_multilinestring(
        [np.array([[0.0, 0.0], [1.0, 1.0]]),
         np.array([[5.0, 5.0], [6.0, 7.0], [8.0, 8.0]])]
    )
    back = _roundtrip(ray_session, [l1], str(tmp_path / "lines"), k=[1])
    assert bytes(back["geometry"][0]) == l1
    # a single LineString comes back as a 1-part MultiLineString (the
    # .shp PolyLine type is always multi-part; reference behaves the same)
    l2 = encode_linestring(np.array([[0.0, 0.0], [2.0, 3.0]]))
    back = _roundtrip(ray_session, [l2], str(tmp_path / "l2"), k=[1])
    assert bytes(back["geometry"][0]) == encode_multilinestring(
        [np.array([[0.0, 0.0], [2.0, 3.0]])]
    )


def test_polygon_hole_and_multi(tmp_path, ray_session):
    # WKB convention in: outer CCW, hole CW — must round-trip byte-exact
    outer = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    hole = np.array([[2.0, 2], [2, 5], [5, 5], [5, 2], [2, 2]])  # CW
    poly = encode_polygon([outer, hole])
    multi = encode_multipolygon(
        [[outer], [np.array([[20.0, 20], [25, 20], [22, 26], [20, 20]])]]
    )
    back = _roundtrip(ray_session, [poly, multi],
                      str(tmp_path / "polys"), k=[1, 2])
    assert bytes(back["geometry"][0]) == poly
    assert bytes(back["geometry"][1]) == multi


def test_polygons_fixture_roundtrip(ray_session):
    from gdal_ray.pipelines.corpus_queries import corpus_for_sf
    from gdal_ray.sources.corpus import read_parquet_tight as _rpt

    d = corpus_for_sf("/root/testdata/sf0.001")
    ds = _rpt(f"{d}/polygons.parquet").map_batches(
        lambda t: t.rename_columns(["poly_id", "geometry", "category", "area"]),
        batch_format="pyarrow",
    )
    write_shapefile(ds, "/tmp/gdal_ray_test_shp_polys")
    # tiny shard_records forces a genuinely multi-task read
    back = read_shapefile("/tmp/gdal_ray_test_shp_polys.shp",
                          shard_records=16).to_pandas()
    orig = _rpt(f"{d}/polygons.parquet").to_pandas()
    assert len(back) == len(orig)
    m = back.merge(orig, on="poly_id")
    assert all(bytes(a) == bytes(b) for a, b in zip(m["geometry"], m["wkb"]))
    assert np.allclose(m["area_x"], m["area_y"])
    # column projection
    cols = read_shapefile("/tmp/gdal_ray_test_shp_polys.shp",
                          columns=["fid", "poly_id"]).schema().names
    assert cols == ["fid", "poly_id"]


def test_dbf_types_and_mixed_rejected(tmp_path, ray_session):
    import pandas as pd
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({
        "geometry": [encode_point(0.0, 0.0)],
        "i": [7], "f": [2.5], "s": ["hey"],
    }))
    write_shapefile(ds, str(tmp_path / "t"))
    back = read_shapefile(str(tmp_path / "t.shp")).to_pandas()
    assert back["i"][0] == 7 and abs(back["f"][0] - 2.5) < 1e-9
    assert back["s"][0] == "hey"
    mixed = rd.from_pandas(pd.DataFrame({
        "geometry": [encode_point(0.0, 0.0),
                     encode_polygon([np.array([[0.0, 0], [1, 0], [0, 1],
                                               [0, 0]])])],
        "k": [1, 2],
    }))
    with pytest.raises(ValueError, match="mixed shape types"):
        write_shapefile(mixed, str(tmp_path / "m"))
