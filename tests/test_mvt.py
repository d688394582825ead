"""MVT codec (io/mvt.py): structural encode/decode round-trips, zigzag
command-stream math, value-pool interning; distributed vector-tile
pipeline (pipelines/vectortiles.py) into MBTiles."""

import numpy as np
import pytest


def test_zigzag_roundtrip():
    from gdal_ray.io.mvt import unzigzag, zigzag

    v = np.array([0, -1, 1, -2, 2, 2**31, -(2**31), 12345, -99999],
                 dtype=np.int64)
    assert (zigzag(v)[:5] == [0, 1, 2, 3, 4]).all()
    assert (unzigzag(zigzag(v)) == v).all()


def _rt(layers, extent=4096):
    from gdal_ray.io.mvt import decode_mvt, encode_mvt

    return decode_mvt(encode_mvt(layers, extent=extent))


def test_point_feature_roundtrip():
    got = _rt({"pts": [
        {"geom_type": 1, "parts": [np.array([[25, 17]])], "id": 7,
         "properties": {"name": "a", "rank": 3, "score": 1.5,
                        "neg": -42, "flag": True}},
        {"geom_type": 1,
         "parts": [np.array([[5, 5], [100, 200], [3, 4000]])]},
    ]})
    lay = got["pts"]
    assert lay["extent"] == 4096
    f0, f1 = lay["features"]
    assert f0["id"] == 7 and f0["geom_type"] == 1
    assert (f0["parts"][0] == [[25, 17]]).all()
    assert f0["properties"] == {"name": "a", "rank": 3, "score": 1.5,
                                "neg": -42, "flag": True}
    # multipoint: one part, cumulative deltas decoded back
    assert (f1["parts"][0] == [[5, 5], [100, 200], [3, 4000]]).all()


def test_line_and_polygon_roundtrip():
    line = np.array([[2, 2], [2, 10], [10, 10]])
    line2 = np.array([[0, 0], [4096, 4096]])
    ring = np.array([[0, 0], [100, 0], [100, 100], [0, 100]])
    hole = np.array([[20, 20], [20, 40], [40, 40], [40, 20]])
    got = _rt({"geo": [
        {"geom_type": 2, "parts": [line, line2]},
        {"geom_type": 3, "parts": [ring, hole], "id": 1},
    ]}, extent=8192)
    lay = got["geo"]
    assert lay["extent"] == 8192
    f0, f1 = lay["features"]
    assert len(f0["parts"]) == 2
    assert (f0["parts"][0] == line).all() and (f0["parts"][1] == line2).all()
    assert len(f1["parts"]) == 2
    assert (f1["parts"][0] == ring).all() and (f1["parts"][1] == hole).all()


def test_value_pool_interning():
    """Shared property values are interned once (spec layout), and the
    key/value pools preserve first-seen order."""
    from gdal_ray.io.mvt import encode_mvt

    feats = [{"geom_type": 1, "parts": [np.array([[i, i]])],
              "properties": {"cls": "road", "n": i % 2}} for i in range(50)]
    one = encode_mvt({"l": feats})
    # 50 features share 1 'road' + 2 ints: pool must stay tiny
    blown = sum(len(encode_mvt({"l": [f]})) for f in feats)
    assert len(one) < blown * 0.6
    from gdal_ray.io.mvt import decode_mvt

    back = decode_mvt(one)["l"]["features"]
    assert all(b["properties"]["cls"] == "road" for b in back)
    assert [b["properties"]["n"] for b in back] == [i % 2 for i in range(50)]


def test_negative_and_multilayer():
    got = _rt({
        "a": [{"geom_type": 2,
               "parts": [np.array([[-10, -20], [30, -5]])]}],
        "b": [{"geom_type": 1, "parts": [np.array([[1, 1]])]}],
    })
    assert set(got) == {"a", "b"}
    assert (got["a"]["features"][0]["parts"][0] == [[-10, -20], [30, -5]]).all()


def test_vector_tiles_pipeline(ray_session, tmp_path):
    import sqlite3

    import pandas as pd
    import ray.data as rd

    from gdal_ray.geo.wkb import encode_point, encode_polygon
    from gdal_ray.io.mvt import decode_mvt
    from gdal_ray.pipelines.vectortiles import (vector_tiles,
                                                vector_tiles_to_mbtiles)

    osh = np.pi * 6378137.0
    size3 = 2 * osh / 8  # z3 tile size
    # point in the middle of z3 tile (4, 3) — the (+x, +y-merc) quadrant
    px = -osh + 4.5 * size3
    py = osh - 3.5 * size3
    # polygon spanning the corner of four z3 tiles around (4, 4)/(3, 3)
    cx, cy = -osh + 4 * size3, osh - 4 * size3
    w = size3 / 4
    ring = np.array([[cx - w, cy - w], [cx + w, cy - w],
                     [cx + w, cy + w], [cx - w, cy + w], [cx - w, cy - w]])
    df = pd.DataFrame({
        "fid": [1, 2],
        "geometry": [encode_point(px, py), encode_polygon([ring])],
        "kind": ["pt", "poly"],
    })
    ds = rd.from_pandas(df)
    tiles = vector_tiles(ds, [3], id_col="fid", prop_cols=["kind"],
                         num_buckets=4).to_pandas()
    keys = set(zip(tiles["z"], tiles["x"], tiles["y"]))
    # polygon touches tiles (3,3),(4,3),(3,4),(4,4); point adds to (4,3)
    assert keys == {(3, 3, 3), (3, 4, 3), (3, 3, 4), (3, 4, 4)}
    t43 = tiles[(tiles["x"] == 4) & (tiles["y"] == 3)].iloc[0]
    lay = decode_mvt(bytes(t43["pbf"]))["layer"]
    feats = {f["id"]: f for f in lay["features"]}
    assert set(feats) == {1, 2}
    assert feats[1]["geom_type"] == 1
    assert feats[1]["properties"]["kind"] == "pt"
    # point lands mid-tile: (2048, 2048) at extent 4096
    assert (feats[1]["parts"][0] == [[2048, 2048]]).all()
    # polygon clipped to the buffered rect: corner quarter + buffer
    poly = feats[2]["parts"][0]
    assert feats[2]["geom_type"] == 3 and len(poly) >= 3
    assert poly[:, 0].min() >= -80 and poly[:, 1].max() <= 4096 + 80
    # a tile the polygon only TOUCHES still carries it, clipped
    t33 = tiles[(tiles["x"] == 3) & (tiles["y"] == 3)].iloc[0]
    lay33 = decode_mvt(bytes(t33["pbf"]))["layer"]
    assert [f["id"] for f in lay33["features"]] == [2]

    # MBTiles sink: format=pbf + json vector_layers metadata
    path = str(tmp_path / "vt.mbtiles")
    s = vector_tiles_to_mbtiles(ds, path, [3], id_col="fid",
                                prop_cols=["kind"], num_buckets=4)
    assert s["n_tiles"] == 4
    con = sqlite3.connect(path)
    meta = dict(con.execute("SELECT name, value FROM metadata"))
    assert meta["format"] == "pbf" and "vector_layers" in meta["json"]
    (blob,) = con.execute(
        "SELECT tile_data FROM tiles WHERE zoom_level=3 AND tile_column=4"
        " AND tile_row=?", ((1 << 3) - 1 - 3,)).fetchone()
    con.close()
    assert bytes(blob) == bytes(t43["pbf"])


def test_read_vector_tiles(ray_session, tmp_path):
    """Write vector tiles, read them back distributed: ids/props survive,
    point coordinates return within half a tile-unit of the original."""
    import json

    import pandas as pd
    import ray.data as rd

    from gdal_ray.geo.wkb import decode_points, encode_point
    from gdal_ray.pipelines.vectortiles import (read_vector_tiles,
                                                vector_tiles_to_mbtiles)

    osh = np.pi * 6378137.0
    size = 2 * osh / 16  # z4
    rng = np.random.default_rng(7)
    xs = -osh + rng.uniform(0.1, 15.9, 20) * size
    ys = osh - rng.uniform(0.1, 15.9, 20) * size
    df = pd.DataFrame({
        "fid": np.arange(20, dtype=np.int64),
        "geometry": [encode_point(x, y) for x, y in zip(xs, ys)],
        "cls": [f"c{i % 3}" for i in range(20)],
    })
    path = str(tmp_path / "rt.mbtiles")
    vector_tiles_to_mbtiles(rd.from_pandas(df), path, [4], id_col="fid",
                            prop_cols=["cls"], num_buckets=4)
    back = read_vector_tiles(path).to_pandas().sort_values("fid")
    assert len(back) == 20 and set(back["fid"]) == set(range(20))
    assert (back["layer"] == "layer").all()
    assert [json.loads(p)["cls"] for p in back["props"]] == \
        [f"c{i % 3}" for i in back["fid"]]
    bx, by = decode_points(back["geometry"].tolist())
    tol = size / 4096 * 0.51  # half a quantization step
    assert np.abs(bx - xs[back["fid"]]).max() < tol
    assert np.abs(by - ys[back["fid"]]).max() < tol
    # zoom/layer filters
    assert read_vector_tiles(path, zoom=4).count() == 20
    assert read_vector_tiles(path, layer="nope").count() == 0


def test_ogr2ogr_mbtiles_cli(ray_session, tmp_path, capsys):
    import json
    import sqlite3

    import pandas as pd

    from gdal_ray.cli import main
    from gdal_ray.geo.wkb import encode_point
    from gdal_ray.sources.gpkg import write_gpkg

    import ray.data as rd

    osh = np.pi * 6378137.0
    pts = [encode_point(-osh + (i + 0.5) * osh / 2, osh / 3)
           for i in range(3)]
    src = str(tmp_path / "p.gpkg")
    write_gpkg(rd.from_pandas(pd.DataFrame(
        {"fid": [1, 2, 3], "geometry": pts})), src, "pts", srs_id=3857)
    dst = str(tmp_path / "p.mbtiles")
    main(["ogr2ogr", src, dst, "--zoom", "1", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["written"] > 0
    con = sqlite3.connect(dst)
    meta = dict(con.execute("SELECT name, value FROM metadata"))
    n = con.execute("SELECT COUNT(*) FROM tiles").fetchone()[0]
    con.close()
    assert meta["format"] == "pbf" and n == out["written"]


def test_vector_tiles_line_clip(ray_session):
    import pandas as pd
    import ray.data as rd

    from gdal_ray.geo.wkb import encode_linestring
    from gdal_ray.io.mvt import decode_mvt
    from gdal_ray.pipelines.vectortiles import vector_tiles

    osh = np.pi * 6378137.0
    size = 2 * osh / 4  # z2
    # horizontal line crossing tiles (1,1) and (2,1) at z2
    y = osh - 1.5 * size
    pts = np.array([[-osh + 1.25 * size, y], [-osh + 2.75 * size, y]])
    ds = rd.from_pandas(pd.DataFrame(
        {"fid": [9], "geometry": [encode_linestring(pts)]}))
    tiles = vector_tiles(ds, [2], id_col="fid", num_buckets=2).to_pandas()
    assert set(zip(tiles["x"], tiles["y"])) == {(1, 1), (2, 1)}
    for _, r in tiles.iterrows():
        lay = decode_mvt(bytes(r["pbf"]))["layer"]
        seg = lay["features"][0]["parts"][0]
        assert lay["features"][0]["geom_type"] == 2
        assert (seg[:, 1] == 2048).all()
        assert seg[:, 0].min() >= -80 and seg[:, 0].max() <= 4096 + 80
