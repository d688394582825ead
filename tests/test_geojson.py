"""GeoJSON / GeoJSONSeq vector drivers (gdal_ray/sources/geojson.py) —
codec round-trips, FeatureCollection read semantics, and a byte-exact
distributed round-trip of the polygons fixture."""

import json
import shutil

import numpy as np
import pytest

from gdal_ray.sources.geojson import (geojson_to_wkb, read_geojson,
                                      read_geojsonseq, wkb_to_geojson,
                                      write_geojsonseq)

GEOMS = [
    {"type": "Point", "coordinates": [1.5, -2.25]},
    {"type": "MultiPoint", "coordinates": [[0.0, 0.0], [3.0, 4.0]]},
    {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]]},
    {"type": "MultiLineString",
     "coordinates": [[[0.0, 0.0], [1.0, 1.0]],
                     [[5.0, 5.0], [6.0, 7.0], [8.0, 8.0]]]},
    {"type": "Polygon",
     "coordinates": [[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0],
                      [0.0, 0.0]],
                     [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 1.0]]]},
    {"type": "MultiPolygon",
     "coordinates": [[[[0.0, 0.0], [2.0, 0.0], [1.0, 2.0], [0.0, 0.0]]],
                     [[[5.0, 5.0], [7.0, 5.0], [6.0, 7.0], [5.0, 5.0]]]]},
]


@pytest.mark.parametrize("geom", GEOMS, ids=[g["type"] for g in GEOMS])
def test_geometry_codec_roundtrip(geom):
    rt = wkb_to_geojson(geojson_to_wkb(geom))
    assert rt["type"] == geom["type"]
    assert json.dumps(rt["coordinates"]) == json.dumps(geom["coordinates"])


def test_geometrycollection_rejected():
    with pytest.raises(ValueError, match="GeometryCollection"):
        geojson_to_wkb({"type": "GeometryCollection", "geometries": []})


def test_read_featurecollection(tmp_path, ray_session):
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "geometry": GEOMS[0],
         "properties": {"name": "a", "v": 1}},
        {"type": "Feature", "id": 7, "geometry": GEOMS[4],
         "properties": {"name": "b", "extra": 2.5}},
        {"type": "Feature", "geometry": None, "properties": {"name": "c"}},
    ]}
    p = tmp_path / "fc.geojson"
    p.write_text(json.dumps(fc))
    df = read_geojson(str(p)).to_pandas()
    # property-schema union, AST order of first appearance
    assert list(df.columns) == ["fid", "geometry", "name", "v", "extra"]
    # sequential FIDs where the Feature lacks an id member
    assert df["fid"].tolist() == [0, 7, 2]
    assert df["name"].tolist() == ["a", "b", "c"]
    assert df["v"].tolist()[0] == 1 and np.isnan(df["v"].tolist()[1])
    assert df["geometry"].isna().tolist() == [False, False, True]
    assert wkb_to_geojson(df["geometry"][1])["type"] == "Polygon"


def test_seq_roundtrip_polygons_fixture(ray_session):
    """Distributed write + sharded text re-read of the polygons fixture:
    WKB byte-equality through the GeoJSON text form (our canonical
    little-endian 2D WKB survives repr-exact JSON floats)."""
    import pandas as pd

    from gdal_ray.pipelines.corpus_queries import corpus_for_sf
    from gdal_ray.sources.corpus import read_parquet_tight as _rpt

    d = corpus_for_sf("/root/testdata/sf0.001")
    out = "/tmp/gdal_ray_test_gj_polys"
    shutil.rmtree(out, ignore_errors=True)
    ds = _rpt(f"{d}/polygons.parquet").map_batches(
        lambda t: t.rename_columns(["poly_id", "geometry", "category", "area"]),
        batch_format="pyarrow",
    ).map_batches(
        lambda df: df.assign(fid=np.arange(len(df))), batch_format="pandas"
    )
    summary = write_geojsonseq(ds, out).to_pandas()
    back = read_geojsonseq(out).to_pandas()
    orig = _rpt(f"{d}/polygons.parquet").to_pandas()
    assert int(summary["n"].sum()) == len(orig) == len(back)
    m = back.merge(orig, on="poly_id")
    assert len(m) == len(orig)
    assert all(bytes(a) == bytes(b) for a, b in zip(m["geometry"], m["wkb"]))
    assert np.allclose(m["area_x"], m["area_y"])
    # explicit fields= skips the schema pass and projects
    cols = read_geojsonseq(out, fields=["category"]).schema().names
    assert cols == ["fid", "geometry", "category"]


def test_gate_query_matches_direct(ray_session):
    """q_geojson_roundtrip equals the same aggregation computed directly
    from the parquet table (the identity the SQL twin relies on)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from gdal_ray.pipelines.ext_queries import q_geojson_roundtrip

    sf = "/root/testdata/sf0.001"
    got = q_geojson_roundtrip(sf).to_pandas().reset_index(drop=True)
    t = pq.read_table(f"{sf}/customer.parquet",
                      columns=["c_custkey", "c_mktsegment"]).to_pandas()
    k = t["c_custkey"].astype(np.int64)
    want = (
        pd.DataFrame({
            "segment": t["c_mktsegment"],
            "n": 1,
            "sum_x2": (k % 360 - 180) * 2 + 1,
            "sum_y4": (k % 140 - 70) * 4 + 1,
            "min_fid": k, "max_fid": k,
        })
        .groupby("segment", as_index=False)
        .agg({"n": "sum", "sum_x2": "sum", "sum_y4": "sum",
              "min_fid": "min", "max_fid": "max"})
        .sort_values("segment").reset_index(drop=True)
    )
    got = got.sort_values("segment").reset_index(drop=True)[want.columns]
    assert got.astype("int64", errors="ignore").equals(
        want.astype("int64", errors="ignore"))
