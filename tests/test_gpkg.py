"""GeoPackage driver (gdal_ray/sources/gpkg.py): GP-blob codec, spec
tables, single-writer sink, rowid-sharded distributed read."""

import sqlite3
import struct

import numpy as np
import pytest

from gdal_ray.sources.gpkg import (gp_unwrap, gp_wrap, gpkg_layers,
                                   read_gpkg, write_gpkg)

PATH = "/tmp/gdal_ray_test_polys.gpkg"


def test_gp_blob_codec():
    wkb = b"\x01\x01\x00\x00\x00" + struct.pack("<dd", 1.5, -2.0)
    blob = gp_wrap(wkb, srs_id=3857)
    assert blob[:2] == b"GP" and blob[2] == 0
    assert struct.unpack_from("<i", blob, 4)[0] == 3857
    assert gp_unwrap(blob) == wkb
    assert gp_wrap(None) is None and gp_unwrap(None) is None
    # envelope indicator 1 (32-byte XY envelope) skips correctly
    env = struct.pack("<4d", 0, 0, 1, 1)
    manual = b"GP" + bytes([0, 0x03]) + struct.pack("<i", 0) + env + wkb
    assert gp_unwrap(manual) == wkb
    # empty-geometry flag -> None
    empty = b"GP" + bytes([0, 0x21]) + struct.pack("<i", 0)
    assert gp_unwrap(empty) is None
    with pytest.raises(ValueError, match="GP magic"):
        gp_unwrap(b"XX" + bytes(10))


@pytest.fixture(scope="module")
def gpkg_file(ray_session):
    from gdal_ray.pipelines.corpus_queries import corpus_for_sf
    from gdal_ray.sources.corpus import read_parquet_tight as _rpt

    d = corpus_for_sf("/root/testdata/sf0.001")
    ds = _rpt(f"{d}/polygons.parquet").map_batches(
        lambda t: t.rename_columns(["poly_id", "geometry", "category", "area"]),
        batch_format="pyarrow",
    )
    n = write_gpkg(ds, PATH, "polys", srs_id=3857,
                   geometry_type="MULTIPOLYGON")
    assert n == 53
    return PATH


def test_spec_tables(gpkg_file):
    con = sqlite3.connect(f"file:{gpkg_file}?mode=ro", uri=True)
    try:
        assert con.execute("PRAGMA application_id").fetchone()[0] == 0x47504B47
        assert gpkg_layers(gpkg_file) == ["polys"]
        g = con.execute(
            "SELECT column_name, geometry_type_name, srs_id "
            "FROM gpkg_geometry_columns WHERE table_name='polys'"
        ).fetchone()
        assert g == ("geometry", "MULTIPOLYGON", 3857)
        assert con.execute(
            "SELECT srs_id FROM gpkg_spatial_ref_sys WHERE srs_id=3857"
        ).fetchone() == (3857,)
    finally:
        con.close()


def test_sharded_read_roundtrip(gpkg_file, ray_session):
    from gdal_ray.pipelines.corpus_queries import corpus_for_sf
    from gdal_ray.sources.corpus import read_parquet_tight as _rpt

    d = corpus_for_sf("/root/testdata/sf0.001")
    # tiny shard_rows forces a genuinely multi-task read
    back = read_gpkg(gpkg_file, shard_rows=16).to_pandas()
    orig = _rpt(f"{d}/polygons.parquet").to_pandas()
    assert len(back) == len(orig)
    m = back.merge(orig, on="poly_id")
    assert all(bytes(a) == bytes(b) for a, b in zip(m["geometry"], m["wkb"]))
    assert np.allclose(m["area_x"], m["area_y"])
    assert m["fid"].notna().all()
    # column projection
    cols = read_gpkg(gpkg_file, layer="polys",
                     columns=["fid", "poly_id"]).schema().names
    assert cols == ["fid", "poly_id"]


def test_gate_query_matches_direct(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq

    from gdal_ray.pipelines.ext_queries import q_gpkg_roundtrip

    sf = "/root/testdata/sf0.001"
    got = q_gpkg_roundtrip(sf).to_pandas().reset_index(drop=True)
    t = pq.read_table(f"{sf}/supplier.parquet",
                      columns=["s_suppkey", "s_nationkey"]).to_pandas()
    k = t["s_suppkey"].astype(np.int64)
    want = (
        pd.DataFrame({
            "nationkey": t["s_nationkey"].astype(np.int64),
            "n": 1,
            "sum_x2": (k % 360 - 180) * 2 + 1,
            "sum_y4": (k % 140 - 70) * 4 + 1,
            "min_fid": k, "max_fid": k,
        })
        .groupby("nationkey", as_index=False)
        .agg({"n": "sum", "sum_x2": "sum", "sum_y4": "sum",
              "min_fid": "min", "max_fid": "max"})
        .sort_values("nationkey").reset_index(drop=True)
    )
    got = got.sort_values("nationkey").reset_index(drop=True)[want.columns]
    assert got.astype("int64").equals(want.astype("int64"))
