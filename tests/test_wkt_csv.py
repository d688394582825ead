"""WKT codec (geo/wkt.py) + CSV vector layer driver (sources/csvlayer.py)."""

import shutil

import numpy as np
import pytest

from gdal_ray.geo.wkt import wkb_to_wkt, wkt_to_wkb

WKTS = [
    "POINT (1.5 -2.25)",
    "MULTIPOINT ((0 0), (3 4))",
    "LINESTRING (0 0, 1 1, 2 0)",
    "MULTILINESTRING ((0 0, 1 1), (5 5, 6 7, 8 8))",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 1))",
    "MULTIPOLYGON (((0 0, 2 0, 1 2, 0 0)), ((5 5, 7 5, 6 7, 5 5)))",
]


@pytest.mark.parametrize("wkt", WKTS, ids=[w.split(" ")[0] for w in WKTS])
def test_wkt_roundtrip(wkt):
    wkb = wkt_to_wkb(wkt)
    assert wkb_to_wkt(wkb) == wkt
    # text skin over the same canonical WKB: second pass is bit-stable
    assert wkt_to_wkb(wkb_to_wkt(wkb)) == wkb


def test_wkt_variants():
    # MULTIPOINT without inner parens (both forms are legal WKT)
    assert wkt_to_wkb("MULTIPOINT (0 0, 3 4)") == \
        wkt_to_wkb("MULTIPOINT ((0 0), (3 4))")
    # EMPTY -> null geometry; whitespace/case tolerated
    assert wkt_to_wkb("POINT EMPTY") is None
    assert wkt_to_wkb(None) is None
    assert wkb_to_wkt(None) is None
    assert wkt_to_wkb("  point ( 1 2 )") == wkt_to_wkb("POINT (1 2)")
    # exact float round-trip through the text form (repr, not %.15g)
    v = 1.0000000000000002
    assert wkt_to_wkb(wkb_to_wkt(wkt_to_wkb(f"POINT ({v!r} 2)"))) == \
        wkt_to_wkb(f"POINT ({v!r} 2)")
    with pytest.raises(ValueError, match="unsupported WKT type"):
        wkt_to_wkb("GEOMETRYCOLLECTION (POINT (1 2))")


def test_csv_layer_roundtrip_polygons(ray_session):
    """Polygons fixture -> CSV with a WKT geometry column -> read back:
    byte-equal WKB, attributes intact."""
    from gdal_ray.pipelines.corpus_queries import corpus_for_sf
    from gdal_ray.sources.corpus import read_parquet_tight as _rpt
    from gdal_ray.sources.csvlayer import read_csv_layer, write_csv_layer

    d = corpus_for_sf("/root/testdata/sf0.001")
    out = "/tmp/gdal_ray_test_csv_polys"
    shutil.rmtree(out, ignore_errors=True)
    ds = _rpt(f"{d}/polygons.parquet").map_batches(
        lambda t: t.rename_columns(["poly_id", "geometry", "category", "area"]),
        batch_format="pyarrow",
    )
    summary = write_csv_layer(ds, out).to_pandas()
    back = read_csv_layer(out, wkt_col="wkt").to_pandas()
    orig = _rpt(f"{d}/polygons.parquet").to_pandas()
    assert int(summary["n"].sum()) == len(orig) == len(back)
    m = back.merge(orig, on="poly_id")
    assert all(bytes(a) == bytes(b) for a, b in zip(m["geometry"], m["wkb"]))
    assert np.allclose(m["area_x"], m["area_y"])


def test_csv_layer_xy_points(tmp_path, ray_session):
    from gdal_ray.geo.wkb import decode_points
    from gdal_ray.sources.csvlayer import read_csv_layer

    p = tmp_path / "pts.csv"
    p.write_text("name,lon,lat\na,1.5,2.5\nb,-3.25,4\n")
    df = read_csv_layer(str(p), xy_cols=("lon", "lat")).to_pandas()
    assert list(df.columns)[0] == "geometry"
    x, y = decode_points(df["geometry"].tolist())
    assert x.tolist() == [1.5, -3.25] and y.tolist() == [2.5, 4.0]
    # X/Y columns are kept as attributes (reference KEEP_GEOM_COLUMNS)
    assert "lon" in df.columns and df["name"].tolist() == ["a", "b"]
