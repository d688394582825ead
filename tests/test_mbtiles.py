"""MBTiles driver: spec-table layout, TMS row flip, byte-exact round-trip
against the parquet tile pyramid, distributed sharded read."""

import sqlite3

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def small_corpus(ray_session):
    from gdal_ray.fixtures.generate import generate_corpus

    return generate_corpus(300)


@pytest.fixture(scope="module")
def pyramid(ray_session, small_corpus, tmp_path_factory):
    from gdal_ray.pipelines.tiling import tile_pyramid

    out = str(tmp_path_factory.mktemp("mbt_tiles"))
    tile_pyramid(small_corpus, out, z_base=5, z_min=3)
    return out


def _pyramid_df(out):
    import pathlib

    import pyarrow.parquet as pq

    files = sorted(str(p) for p in pathlib.Path(out).glob("z*/tiles.parquet"))
    return pd.concat(
        [pq.read_table(f, columns=["z", "x", "y", "png"]).to_pandas()
         for f in files], ignore_index=True)


def test_mbtiles_roundtrip_and_spec(pyramid, tmp_path):
    from gdal_ray.sources.mbtiles import (export_mbtiles, mbtiles_metadata,
                                          read_mbtiles)

    path = str(tmp_path / "t.mbtiles")
    want = _pyramid_df(pyramid)
    s = export_mbtiles(pyramid, path, name="unit")
    assert s["n_tiles"] == len(want)
    assert s["minzoom"] == 3 and s["maxzoom"] == 5

    # spec tables + TMS convention, checked with raw sqlite
    con = sqlite3.connect(path)
    meta = dict(con.execute("SELECT name, value FROM metadata"))
    assert meta["format"] == "png" and meta["name"] == "unit"
    assert meta["minzoom"] == "3" and meta["maxzoom"] == "5"
    left, bot, right, top = map(float, meta["bounds"].split(","))
    assert -180 <= left < right <= 180 and -86 <= bot < top <= 86
    r = want.iloc[0]
    (blob,) = con.execute(
        "SELECT tile_data FROM tiles WHERE zoom_level=? AND tile_column=?"
        " AND tile_row=?",
        (int(r["z"]), int(r["x"]), (1 << int(r["z"])) - 1 - int(r["y"])),
    ).fetchone()
    assert bytes(blob) == r["png"]
    # unique index exists (resume/replace safety at the sqlite level)
    idx = [row[1] for row in con.execute("PRAGMA index_list(tiles)")]
    assert "tile_index" in idx
    con.close()

    # distributed read: byte-exact, XYZ y restored
    got = read_mbtiles(path, shard_rows=7).to_pandas()
    key = ["z", "x", "y"]
    got = got.sort_values(key).reset_index(drop=True)
    want2 = want.sort_values(key).reset_index(drop=True)
    assert got[key].equals(want2[key].astype("int64"))
    assert all(bytes(a) == bytes(b) for a, b in zip(got["png"], want2["png"]))

    # zoom filter pushes into the per-shard SELECT
    z4 = read_mbtiles(path, zoom=4).to_pandas()
    assert (z4["z"] == 4).all() and len(z4) == (want["z"] == 4).sum()


def test_mbtiles_bounds_cover_tiles(pyramid, tmp_path):
    """metadata bounds = exact WGS84 envelope of the maxzoom tile range."""
    import numpy as np

    from gdal_ray.geo.mercator import meters_to_latlon, tile_bounds
    from gdal_ray.sources.mbtiles import export_mbtiles, mbtiles_metadata

    path = str(tmp_path / "b.mbtiles")
    export_mbtiles(pyramid, path)
    want = _pyramid_df(pyramid)
    z = int(want["z"].max())
    at = want[want["z"] == z]
    xmin, xmax = int(at["x"].min()), int(at["x"].max())
    ymin, ymax = int(at["y"].min()), int(at["y"].max())
    ml, mb, _, _ = tile_bounds(xmin, (1 << z) - 1 - ymax, z)
    _, _, mr, mt = tile_bounds(xmax, (1 << z) - 1 - ymin, z)
    bl, ll = meters_to_latlon(ml, mb)
    tl, rl = meters_to_latlon(mr, mt)
    got = list(map(float, mbtiles_metadata(path)["bounds"].split(",")))
    assert np.allclose(got, [ll, bl, rl, tl], atol=1e-7)


def test_mbtiles_cli(pyramid, tmp_path, ray_session):
    """gdal2tiles to .mbtiles + the mbtiles write/info/extract commands."""
    import numpy as np

    from gdal_ray.cli import main
    from gdal_ray.io.tiff import write_geotiff
    from gdal_ray.sources.mbtiles import mbtiles_metadata

    # single-raster gdal2tiles path into one .mbtiles
    rng = np.random.default_rng(3)
    a = rng.integers(0, 255, (96, 96)).astype("uint8")
    src = str(tmp_path / "m.tif")
    # 3857 extent near the origin, ~1 tile at z2
    write_geotiff(src, a, [0.0, 2000.0, 0.0, 200000.0, 0.0, -2000.0],
                  epsg=3857)
    out = str(tmp_path / "one.mbtiles")
    main(["gdal2tiles", src, out, "--zoom", "2", "4"])
    meta = mbtiles_metadata(out)
    assert meta["format"] == "png" and meta["name"] == "m"
    assert int(meta["minzoom"]) >= 2 and int(meta["maxzoom"]) == 4

    # pyramid -> mbtiles -> info -> extract tree
    mb = str(tmp_path / "pyr.mbtiles")
    main(["mbtiles", "write", pyramid, mb, "corpus"])
    from gdal_ray.cli_utils import cmd_mbtiles

    info = cmd_mbtiles("info", mb)
    assert info["metadata"]["name"] == "corpus"
    assert set(info["tiles_per_zoom"]) == {3, 4, 5}
    tree = str(tmp_path / "tree")
    s = cmd_mbtiles("extract", mb, tree)
    assert s["tiles"] == sum(info["tiles_per_zoom"].values())
    want = _pyramid_df(pyramid)
    r = want.iloc[-1]
    f = (tmp_path / "tree" / str(int(r["z"])) / str(int(r["x"]))
         / f"{int(r['y'])}.png")
    assert f.read_bytes() == r["png"]


def test_mbtiles_empty_and_missing(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.sources.mbtiles import read_mbtiles, write_mbtiles

    with pytest.raises(FileNotFoundError):
        read_mbtiles(str(tmp_path / "nope.mbtiles"))
    empty = rd.from_arrow(pa.table({
        "z": pa.array([], pa.int64()), "x": pa.array([], pa.int64()),
        "y": pa.array([], pa.int64()), "png": pa.array([], pa.binary())}))
    with pytest.raises(ValueError, match="no tiles"):
        write_mbtiles(empty, str(tmp_path / "e.mbtiles"))
