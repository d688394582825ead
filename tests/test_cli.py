"""CLI surface (gdal_ray/cli.py): info / ogr2ogr / translate over the
engine's own drivers, mirroring apps/gdalinfo_bin.cpp, apps/ogr2ogr*,
apps/gdal_translate* at the command level."""

import json

import numpy as np
import pandas as pd
import pytest

from gdal_ray.cli import cmd_info, cmd_ogr2ogr, cmd_translate, main
from gdal_ray.io.tiff import read_tiff_header, read_tile, write_geotiff

GT = [500000.0, 10.0, 0.0, 4000000.0, 0.0, -10.0]


def _reassemble(path):
    h = read_tiff_header(path)
    out = np.zeros((h["n_tiles_y"] * h["tile_h"],
                    h["n_tiles_x"] * h["tile_w"]), dtype=h["dtype"])
    for i in range(len(h["offsets"])):
        ty, tx = divmod(i, h["n_tiles_x"])
        out[ty * h["tile_h"]:(ty + 1) * h["tile_h"],
            tx * h["tile_w"]:(tx + 1) * h["tile_w"]] = read_tile(path, h, i)
    return out[: h["h"], : h["w"]], h


@pytest.fixture
def tif(tmp_path):
    rng = np.random.default_rng(11)
    a = rng.integers(0, 4000, (120, 200)).astype("uint16")
    p = str(tmp_path / "in.tif")
    write_geotiff(p, a, GT, epsg=32633, tile=64, compress="lzw")
    return p, a


@pytest.fixture
def vec(tmp_path):
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature",
         "geometry": {"type": "Polygon",
                      "coordinates": [[[float(x), 0.0], [float(x + 1), 0.0],
                                       [float(x + 1), 1.0], [float(x), 1.0],
                                       [float(x), 0.0]]]},
         "properties": {"name": f"p{x}", "v": x * 1.5}}
        for x in range(6)
    ]}
    p = tmp_path / "in.geojson"
    p.write_text(json.dumps(fc))
    return str(p)


def test_info_geotiff(tif):
    p, a = tif
    info = cmd_info(p)
    assert info["driver"] == "GeoTIFF"
    assert info["size"] == [200, 120]
    assert info["dtype"] == "uint16"
    assert info["compression"] == "LZW"
    assert info["epsg"] == 32633
    assert info["origin"] == [GT[0], GT[3]]
    assert info["pixel_size"] == [GT[1], GT[5]]
    # extent = [minx, miny, maxx, maxy]
    assert info["extent"] == [500000.0, 4000000.0 - 120 * 10.0,
                              500000.0 + 200 * 10.0, 4000000.0]


def test_info_vector(vec, ray_session):
    info = cmd_info(vec)
    assert info["features"] == 6
    assert "geometry" in info["fields"] and "name" in info["fields"]
    assert info["extent"] == [0.0, 0.0, 6.0, 1.0]


def test_translate_window_scale(tif, tmp_path):
    src, a = tif
    dst = str(tmp_path / "out.tif")
    res = cmd_translate(src, dst, srcwin=[10, 20, 100, 50],
                        scale=[0.05, 2.0], compress="deflate")
    assert res["size"] == [100, 50]
    out, h = _reassemble(dst)
    exp = np.clip(np.floor(a[20:70, 10:110].astype(np.float64) * 0.05
                           + 2.0 + 0.5), 0, 255).astype("uint8")
    assert np.array_equal(out, exp)
    # geotransform shifted by the window origin
    assert h["gt"][0] == GT[0] + 10 * GT[1]
    assert h["gt"][3] == GT[3] + 20 * GT[5]
    assert h["epsg"] == 32633


def test_translate_plain_copy(tif, tmp_path):
    src, a = tif
    dst = str(tmp_path / "copy.tif")
    cmd_translate(src, dst, compress="packbits")
    out, h = _reassemble(dst)
    assert np.array_equal(out, a)
    assert h["gt"] == GT


def test_ogr2ogr_chain(vec, tmp_path, ray_session):
    """geojson -> gpkg -> shp -> geojsonl: WKB geometry survives every
    format hop byte-exactly (all are little-endian 2D codecs here)."""
    from gdal_ray.sources.geojson import read_geojson

    src_wkb = [bytes(b) for b in
               read_geojson(vec).to_pandas()["geometry"]]

    gpkg = str(tmp_path / "a.gpkg")
    assert cmd_ogr2ogr(vec, gpkg) == 6
    info = cmd_info(gpkg)
    assert info["driver"] == "GPKG" and info["layers"]["a"]["features"] == 6

    shp = str(tmp_path / "b.shp")
    assert cmd_ogr2ogr(gpkg, shp) == 6

    seq = str(tmp_path / "c.geojsonl")
    assert cmd_ogr2ogr(shp, seq) == 6
    from gdal_ray.sources.geojson import read_geojsonseq

    df = read_geojsonseq(seq + ".d").to_pandas()
    got = sorted(bytes(b) for b in df["geometry"])
    assert got == sorted(src_wkb)
    assert sorted(df["name"]) == [f"p{x}" for x in range(6)]


def test_main_arg_parsing(tif, tmp_path, capsys):
    src, a = tif
    dst = str(tmp_path / "m.tif")
    main(["translate", src, dst, "--srcwin", "0", "0", "50", "40",
          "--scale", "0.1", "0", "--compress", "lzw"])
    out = json.loads(capsys.readouterr().out)
    assert out["size"] == [50, 40] and out["dtype"] == "uint8"
    main(["info", src])
    assert json.loads(capsys.readouterr().out)["size"] == [200, 120]
    with pytest.raises(SystemExit):
        main(["frobnicate"])
    with pytest.raises(SystemExit):
        main([])


def test_translate_rgb_multiband(tmp_path):
    """RGB GeoTIFF through info + translate: band count reported, window
    + rescale operate on all bands, chunky layout round-trips."""
    rng = np.random.default_rng(23)
    a = rng.integers(0, 256, (80, 120, 3)).astype("uint8")
    src = str(tmp_path / "rgb.tif")
    write_geotiff(src, a, GT, epsg=32633, tile=64, compress="lzw")
    info = cmd_info(src)
    assert info["bands"] == 3 and info["size"] == [120, 80]
    dst = str(tmp_path / "rgb_out.tif")
    res = cmd_translate(src, dst, srcwin=[10, 5, 60, 40], compress="deflate")
    assert res["size"] == [60, 40]
    h = read_tiff_header(dst)
    assert h["spp"] == 3
    out = np.zeros((h["n_tiles_y"] * h["tile_h"],
                    h["n_tiles_x"] * h["tile_w"], 3), dtype=h["dtype"])
    for i in range(len(h["offsets"])):
        ty, tx = divmod(i, h["n_tiles_x"])
        out[ty * h["tile_h"]:(ty + 1) * h["tile_h"],
            tx * h["tile_w"]:(tx + 1) * h["tile_w"]] = read_tile(dst, h, i)
    assert np.array_equal(out[: h["h"], : h["w"]], a[5:45, 10:70])


def test_dem_command_modes(tmp_path):
    """gdaldem CLI surface: hillshade matches the kernel, color-relief
    reads a percent ramp file and writes a 4-band RGBA GeoTIFF."""
    from gdal_ray.cli import cmd_dem
    from gdal_ray.raster.kernels import hillshade

    rng = np.random.default_rng(41)
    dem = rng.uniform(100, 900, (90, 110)).astype("float32")
    src = str(tmp_path / "dem.tif")
    write_geotiff(src, dem, GT, epsg=32633)

    dst = str(tmp_path / "hs.tif")
    res = cmd_dem("hillshade", src, dst)
    assert res["bands"] == 1 and res["dtype"] == "uint8"
    out, h = _reassemble(dst)
    want = hillshade(dem.astype(np.float64), ewres=GT[1], nsres=GT[5])
    assert np.array_equal(out, want)
    assert h["gt"] == GT and h["epsg"] == 32633

    ramp = tmp_path / "ramp.txt"
    ramp.write_text("0% 0 0 120\n50% 30 200 30\n100% 255 255 255\n")
    dst2 = str(tmp_path / "cr.tif")
    res2 = cmd_dem("color-relief", src, dst2, color_file=str(ramp))
    assert res2["bands"] == 4
    h2 = read_tiff_header(dst2)
    assert h2["spp"] == 4
    # min maps to the first ramp color, max to the last
    t0 = read_tile(dst2, h2, 0)
    assert t0.shape[2] == 4

    with pytest.raises(SystemExit):
        cmd_dem("wat", src, dst)


def test_locationinfo(tif, capsys):
    """gdallocationinfo surface: geo and pixel addressing, all four
    GRIORA kernels, outside-raster reporting."""
    from gdal_ray.cli import cmd_locationinfo, main
    from gdal_ray.raster.kernels import (
        interpolate_at_point_bilinear,
        interpolate_at_point_cubicspline,
    )

    src, a = tif  # GT = [500000, 10, 0, 4000000, 0, -10], 200x120 uint16
    # geo coordinate of pixel center (col 7, row 3)
    gx, gy = 500000.0 + 7.5 * 10.0, 4000000.0 - 3.5 * 10.0
    r = cmd_locationinfo(src, gx, gy)
    assert r["inside"] and r["pixel"] == [7, 3]
    assert r["value"] == float(a[3, 7])
    # pixel addressing
    r2 = cmd_locationinfo(src, 7.5, 3.5, geoloc=False)
    assert r2["value"] == r["value"]
    # interpolated kernels match direct calls
    px, py = np.array([7.25]), np.array([3.75])
    r3 = cmd_locationinfo(src, 7.25, 3.75, geoloc=False, resample="bilinear")
    assert r3["value"] == float(interpolate_at_point_bilinear(
        a.astype(np.float64), px, py)[0])
    r4 = cmd_locationinfo(src, 7.25, 3.75, geoloc=False,
                          resample="cubicspline")
    assert r4["value"] == float(interpolate_at_point_cubicspline(
        a.astype(np.float64), px, py)[0])
    # outside
    assert cmd_locationinfo(src, 0.0, 0.0)["inside"] is False
    # argv surface
    main(["locationinfo", src, "7.5", "3.5", "--pixel", "-r", "cubic"])
    out = json.loads(capsys.readouterr().out)
    assert out["inside"] is True


def test_tindex_and_rasterize(tif, vec, tmp_path, ray_session):
    """gdaltindex footprints land in a GeoPackage with location
    attributes; gdal_rasterize burns the geojson polygons into a GeoTIFF
    with the center-containment scanline rule."""
    from gdal_ray.cli import cmd_rasterize, cmd_tindex
    from gdal_ray.geo.wkb import wkb_envelope
    from gdal_ray.sources.gpkg import read_gpkg

    src, a = tif
    src2 = str(tmp_path / "second.tif")
    write_geotiff(src2, a[:40, :50], [0.0, 1.0, 0.0, 40.0, 0.0, -1.0],
                  epsg=4326)
    idx = str(tmp_path / "index.gpkg")
    assert cmd_tindex(idx, [src, src2]) == 2
    df = read_gpkg(idx).to_pandas().sort_values("location").reset_index(drop=True)
    assert len(df) == 2
    envs = {loc: wkb_envelope(bytes(g))
            for loc, g in zip(df["location"], df["geometry"])}
    assert envs[src] == (GT[0], GT[3] - 120 * 10.0, GT[0] + 200 * 10.0, GT[3])
    assert envs[src2] == (0.0, 0.0, 50.0, 40.0)

    # rasterize the 6 unit squares (x in 0..6, y in 0..1) at 1px per 0.25
    dst = str(tmp_path / "burn.tif")
    res = cmd_rasterize(vec, dst, size=[24, 4], burn=7.0)
    assert res["burned"] == 6
    out, h = _reassemble(dst)
    assert out.shape == (4, 24)
    assert (out == 7.0).all()  # squares tile the extent exactly
    assert h["gt"][0] == 0.0 and h["gt"][1] == 0.25


def test_contour_command(tmp_path, ray_session):
    """gdal_contour CLI: a linear ramp DEM produces straight iso-lines at
    base + k*interval, exported as WKB LineStrings with ELEV."""
    from gdal_ray.cli import cmd_contour
    from gdal_ray.sources.gpkg import read_gpkg

    # ramp: value = row index * 10 -> levels every 25 cross between rows
    dem = (np.arange(20, dtype=np.float64)[:, None]
           * 10.0 * np.ones((1, 30))).astype(np.float32)
    src = str(tmp_path / "ramp.tif")
    write_geotiff(src, dem, [0.0, 1.0, 0.0, 20.0, 0.0, -1.0], epsg=32633)
    dst = str(tmp_path / "contours.gpkg")
    n = cmd_contour(src, dst, interval=25.0)
    assert n > 0
    df = read_gpkg(dst).to_pandas()
    assert len(df) == n
    levels = sorted(df["ELEV"].unique())
    # range is (0, 190): expect 25..175 in steps of 25
    assert levels == [25.0 * k for k in range(1, 8)]
    # each contour of a pure ramp is a horizontal line: constant y
    import struct
    for _, r in df.iterrows():
        b = bytes(r["geometry"])
        assert struct.unpack_from("<I", b, 1)[0] == 2  # LineString
        npts = struct.unpack_from("<I", b, 5)[0]
        pts = np.frombuffer(b, dtype="<f8", count=npts * 2,
                            offset=9).reshape(npts, 2)
        assert np.ptp(pts[:, 1]) < 1e-9
        assert np.ptp(pts[:, 0]) > 25.0  # spans most of the width


def test_pipeline_command(vec, tmp_path, ray_session, capsys):
    """CLI step-pipeline: read geojson ! filter ! swap-xy ! write gpkg."""
    import numpy as np

    from gdal_ray.cli import main
    from gdal_ray.geo import wkb as W
    from gdal_ray.sources.gpkg import read_gpkg

    dst = str(tmp_path / "piped.gpkg")
    main(["pipeline", "read", vec, "!", "filter", "expr=v > 3",
          "!", "swap-xy", "!", "write", dst])
    out = json.loads(capsys.readouterr().out)
    assert out["rows"] == 3  # v = x*1.5 > 3 -> x in {3,4,5}
    df = read_gpkg(dst).to_pandas()
    assert len(df) == 3
    # swapped: the unit squares now span y in [x, x+1], x in [0, 1]
    ring = W.decode_polygons(bytes(df.sort_values("name")
                                   .iloc[0]["geometry"]))[0][0]
    assert ring[:, 0].min() == 0.0 and ring[:, 0].max() == 1.0
    assert ring[:, 1].min() == 3.0 and ring[:, 1].max() == 4.0
    with pytest.raises(SystemExit):
        main(["pipeline", "read", vec, "!", "write"])


def test_sql_command(tmp_path, ray_session, capsys):
    """CLI OGR SQL over the sf0.001 tables: inline JSON rows and parquet
    export."""
    from gdal_ray.cli import main

    sf = "/root/testdata/sf0.001"
    main(["sql",
          "SELECT o_orderpriority, COUNT(*) AS n FROM orders "
          "GROUP BY o_orderpriority ORDER BY o_orderpriority",
          sf])
    out = json.loads(capsys.readouterr().out)
    assert out["columns"] == ["o_orderpriority", "n"]
    assert sum(r["n"] for r in out["rows"]) > 0
    dst = str(tmp_path / "res.parquet")
    main(["sql", "SELECT c_custkey FROM customer WHERE c_custkey <= 5",
          sf, "--out", dst])
    res = json.loads(capsys.readouterr().out)
    assert res["rows"] == 6  # keys start at 0


def test_raster_utility_commands(tmp_path, capsys):
    """sieve/fillnodata/proximity/viewshed CLI: each matches its kernel
    on a small crafted raster."""
    from gdal_ray.cli import cmd_raster_util
    from gdal_ray.raster.kernels import fillnodata, proximity, sieve
    from gdal_ray.raster.viewshed import viewshed

    a = np.full((20, 20), 5, dtype=np.int32)
    a[3, 3] = 9            # 1-px speck for sieve
    a[10:12, 10:12] = 0    # nodata hole / proximity target
    src = str(tmp_path / "u.tif")
    write_geotiff(src, a, GT, epsg=32633)

    d1 = str(tmp_path / "sieved.tif")
    cmd_raster_util("sieve", src, d1, threshold=2)
    out1, _ = _reassemble(d1)
    assert np.array_equal(out1, sieve(a, 2))
    assert out1[3, 3] == 5

    d2 = str(tmp_path / "filled.tif")
    cmd_raster_util("fillnodata", src, d2, nodata=0)
    out2, _ = _reassemble(d2)
    assert np.array_equal(out2.astype(np.float64),
                          fillnodata(a.astype(np.float64), 0.0))
    assert (out2[10:12, 10:12] != 0).all()

    d3 = str(tmp_path / "prox.tif")
    cmd_raster_util("proximity", src, d3, target=0)
    out3, h3 = _reassemble(d3)
    assert h3["dtype"] == np.dtype("<f4")
    assert np.allclose(out3, proximity(a == 0).astype(np.float32))
    assert out3[10, 10] == 0.0 and out3[0, 0] > 10.0

    d4 = str(tmp_path / "vs.tif")
    cmd_raster_util("viewshed", src, d4, ox=10, oy=10)
    out4, _ = _reassemble(d4)
    want4 = viewshed(a.astype(np.float64), 10, 10).astype(np.uint8) * 255
    assert np.array_equal(out4, want4)


def test_grid_command(vec, tmp_path, ray_session, capsys):
    """gdal_grid CLI: point layer with z attribute -> nearest grid."""
    import pandas as pd
    import ray.data as rd

    from gdal_ray.cli import _vector_write, cmd_grid
    from gdal_ray.geo.wkb import encode_point

    pts = pd.DataFrame({
        "geometry": [encode_point(float(x) + 0.5, 0.5) for x in range(6)],
        "z": [float(10 * x) for x in range(6)],
    })
    src = str(tmp_path / "pts.gpkg")
    _vector_write(rd.from_pandas(pts), src)
    dst = str(tmp_path / "grid.tif")
    res = cmd_grid(src, dst, size=[6, 1], algorithm="nearest",
                   extent=[0.0, 0.0, 6.0, 1.0])
    assert res["n_points"] == 6
    out, h = _reassemble(dst)
    assert np.array_equal(out[0], np.array([0, 10, 20, 30, 40, 50],
                                           dtype=np.float32))


def test_warp_command(tif, tmp_path, capsys):
    """gdalwarp CLI: 32633 -> 4326 nearest matches warp_image directly;
    the area ops route through warp_image_area."""
    from gdal_ray.cli import cmd_warp, main
    from gdal_ray.raster.warp import warp_image

    src, a = tif
    dst = str(tmp_path / "w.tif")
    res = cmd_warp(src, dst, None, "EPSG:4326")  # s_srs from the header
    out, h = _reassemble(dst)
    want, wgt = warp_image(a, tuple(GT), "EPSG:32633", "EPSG:4326")
    assert np.array_equal(out, want)
    assert h["gt"] == list(wgt) and h["epsg"] == 4326
    assert res["size"] == [want.shape[1], want.shape[0]]

    dst2 = str(tmp_path / "wa.tif")
    main(["warp", src, dst2, "-t_srs", "EPSG:4326", "-r", "med"])
    out2 = json.loads(capsys.readouterr().out)
    want2, _ = warp_image(a, tuple(GT), "EPSG:32633", "EPSG:4326",
                          resampling="med")
    got2, _ = _reassemble(dst2)
    assert np.array_equal(got2, want2)
    with pytest.raises(SystemExit):
        main(["warp", src, dst2])  # missing -t_srs
