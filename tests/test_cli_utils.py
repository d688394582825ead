"""gdal-utils script suite (gdal_ray/cli_utils.py): gdaladdo, nearblack,
pansharpen, polygonize, footprint, gdal_merge, gdal_calc, rgb2pct /
pct2rgb, gdal2xyz, gdaltransform, gdalcompare, gdal2tiles, gdal_retile,
ogrmerge, gdal_create, gdalmanage, gdal_edit — each against a scalar
oracle (the tool's published semantics over the same pixels)."""

import json
import os

import numpy as np
import pytest

from gdal_ray import cli_utils as U
from gdal_ray.cli import main
from gdal_ray.io.tiff import (read_tiff_header, read_tiff_ifds,
                              write_geotiff)

GT = [500000.0, 10.0, 0.0, 4000000.0, 0.0, -10.0]


def _full(path, hdr=None):
    from gdal_ray.cli_utils import _read_full_ifd

    return _read_full_ifd(path, hdr or read_tiff_header(path))


@pytest.fixture
def tif(tmp_path):
    rng = np.random.default_rng(23)
    a = rng.integers(0, 4000, (128, 192)).astype("uint16")
    p = str(tmp_path / "in.tif")
    write_geotiff(p, a, GT, epsg=32633, tile=64)
    return p, a


def test_addo_overviews_and_dump(tif, tmp_path):
    p, a = tif
    res = U.cmd_addo(p, [2, 4], resample="average")
    assert res["dst"] == p + ".ovr"
    hdrs = read_tiff_ifds(p + ".ovr")
    assert [(h["h"], h["w"]) for h in hdrs] == [(64, 96), (32, 48)]
    # level 1 pixels == the average kernel applied directly
    from gdal_ray.raster.kernels import resample_average

    lvl0 = _full(p + ".ovr", hdrs[0])
    assert np.array_equal(lvl0, resample_average(a, 2))
    # geotransform scaled by the factor
    assert hdrs[0]["gt"][1] == GT[1] * 2
    assert hdrs[1]["gt"][5] == GT[5] * 4
    dump = U.cmd_dumpoverviews(p, str(tmp_path / "lvl"))
    assert [lv["w"] for lv in dump["levels"]] == [96, 48]
    assert os.path.exists(str(tmp_path / "lvl_1.tif"))


def test_addo_every_kernel(tif):
    p, a = tif
    for r in ("nearest", "mode", "rms", "gauss", "cubic"):
        res = U.cmd_addo(p, [2], resample=r)
        assert read_tiff_ifds(res["dst"])[0]["w"] == 96


def test_nearblack(tmp_path):
    a = np.full((40, 60), 200, dtype=np.uint8)
    a[:, :5] = 3  # near-black collar
    p = str(tmp_path / "n.tif")
    write_geotiff(p, a, GT)
    out = str(tmp_path / "nb.tif")
    res = U.cmd_nearblack(p, out, near=15)
    arr = _full(out)
    assert (arr[:, :5] == 0).all() and (arr[:, 5:] == 200).all()
    assert res["changed"] == 5 * 40


def test_pansharpen(tmp_path):
    rng = np.random.default_rng(5)
    ms = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    pan = rng.integers(0, 255, (64, 64)).astype(np.uint8)
    pms = str(tmp_path / "ms.tif")
    ppan = str(tmp_path / "pan.tif")
    write_geotiff(pms, ms, [0, 2, 0, 0, 0, -2])
    write_geotiff(ppan, pan, [0, 1, 0, 0, 0, -1])
    out = str(tmp_path / "sharp.tif")
    res = U.cmd_pansharpen(ppan, pms, out)
    assert res["shape"] == [64, 64, 3]
    from gdal_ray.raster.kernels import pansharpen_brovey

    assert np.array_equal(_full(out), pansharpen_brovey(ms, pan))


def test_polygonize_and_footprint(tmp_path, ray_session):
    a = np.zeros((20, 30), dtype=np.int32)
    a[2:8, 3:13] = 7      # 6x10 region of value 7
    a[12:18, 20:25] = 9   # 6x5 region of value 9
    p = str(tmp_path / "r.tif")
    write_geotiff(p, a, [0.0, 1.0, 0.0, 20.0, 0.0, -1.0], nodata=0)
    out = str(tmp_path / "polys.geojson")
    res = U.cmd_polygonize(p, out, nodata=0)
    assert res["polygons"] == 2
    from gdal_ray.sources.geojson import read_geojson

    df = read_geojson(out).to_pandas().sort_values("DN")
    assert list(df["DN"]) == [7.0, 9.0]
    assert list(df["pixel_count"]) == [60, 30]
    assert list(df["area"]) == [60.0, 30.0]

    fp = str(tmp_path / "foot.geojson")
    res2 = U.cmd_footprint(p, fp)
    assert res2["parts"] == 2 and res2["area"] == 90.0


def test_merge_later_wins(tmp_path):
    a = np.full((10, 10), 1, dtype=np.uint8)
    b = np.full((10, 10), 2, dtype=np.uint8)
    pa_ = str(tmp_path / "a.tif")
    pb = str(tmp_path / "b.tif")
    write_geotiff(pa_, a, [0.0, 1.0, 0.0, 10.0, 0.0, -1.0])
    # b overlaps the right half of a
    write_geotiff(pb, b, [5.0, 1.0, 0.0, 10.0, 0.0, -1.0])
    out = str(tmp_path / "m.tif")
    res = U.cmd_merge(out, [pa_, pb])
    assert res["size"] == [15, 10]
    m = _full(out)
    assert (m[:, :5] == 1).all() and (m[:, 5:] == 2).all()


def test_calc_expressions(tif, tmp_path):
    p, a = tif
    out = str(tmp_path / "c.tif")
    res = U.cmd_calc("where(A > 2000, A * 2, 0) + sqrt(A)", {"A": p}, out)
    expect = np.where(a > 2000, a.astype(np.float64) * 2, 0) + np.sqrt(
        a.astype(np.float64))
    got = _full(out)
    assert np.allclose(got, expect, rtol=1e-6)
    # numpy's sqrt(uint16) promotes to float32 — gdal_calc matches numpy
    assert res["dtype"] == "float32"
    # two inputs
    out2 = str(tmp_path / "c2.tif")
    U.cmd_calc("maximum(A, B)", {"A": p, "B": p}, out2, out_dtype="uint16")
    assert np.array_equal(_full(out2), a)


def test_calc_rejects_unsafe():
    with pytest.raises(SystemExit):
        U.calc_eval("__import__('os')", {})
    with pytest.raises(SystemExit):
        U.calc_eval("A.sum()", {"A": np.ones(3)})
    with pytest.raises(SystemExit):
        U.calc_eval("open('x')", {})


def test_rgb2pct_pct2rgb_png_and_tif(tmp_path):
    rng = np.random.default_rng(7)
    # few distinct colors -> quantization is exact
    base = np.array([[10, 20, 30], [200, 100, 50], [0, 255, 128],
                     [255, 0, 0]], dtype=np.uint8)
    img = base[rng.integers(0, 4, (32, 48))]
    src = str(tmp_path / "rgb.tif")
    write_geotiff(src, img, GT, epsg=32633)
    # tif -> palette tif -> rgb tif round trip
    pal_tif = str(tmp_path / "pal.tif")
    res = U.cmd_rgb2pct(src, pal_tif, n_colors=8, method="nearest")
    assert res["colors"] <= 8
    hdr = read_tiff_header(pal_tif)
    assert hdr["colormap"] is not None
    back = str(tmp_path / "back.tif")
    U.cmd_pct2rgb(pal_tif, back)
    # median-cut palette entries are 5-bit histogram-bin centers, so the
    # round trip is within the bin radius (the reference's octree is
    # approximate the same way), and 4 distinct colors stay 4 colors
    got = _full(back)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 4
    assert len(np.unique(got.reshape(-1, 3), axis=0)) == 4
    # png palette path agrees with the tif path byte-for-byte
    pal_png = str(tmp_path / "pal.png")
    U.cmd_rgb2pct(src, pal_png, n_colors=8, method="nearest")
    back2 = str(tmp_path / "back2.tif")
    U.cmd_pct2rgb(pal_png, back2)
    assert np.array_equal(_full(back2), got)


def test_gdal2xyz(tmp_path):
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = str(tmp_path / "z.tif")
    write_geotiff(p, a, [0.0, 1.0, 0.0, 3.0, 0.0, -1.0])
    out = str(tmp_path / "z.csv")
    res = U.cmd_gdal2xyz(p, out)
    assert res["rows"] == 12
    lines = open(out).read().strip().splitlines()
    assert lines[0] == "x,y,z"
    # first pixel center: (0.5, 2.5), value 0
    assert lines[1].split(",") == ["0.5", "2.5", "0"]
    # parquet output
    outp = str(tmp_path / "z.parquet")
    U.cmd_gdal2xyz(p, outp)
    import pyarrow.parquet as pq

    t = pq.read_table(outp)
    assert t.num_rows == 12 and t.column("z").to_pylist()[5] == 5.0


def test_transform_roundtrip():
    pts = U.cmd_transform("EPSG:4326", "EPSG:3857", [12.5, 41.9])
    from gdal_ray.geo.mercator import latlon_to_meters

    mx, my = latlon_to_meters(41.9, 12.5)
    assert pts[0] == pytest.approx([float(mx), float(my)])
    back = U.cmd_transform("EPSG:3857", "EPSG:4326",
                           [pts[0][0], pts[0][1]])
    assert back[0] == pytest.approx([12.5, 41.9], abs=1e-9)


def test_compare(tif, tmp_path):
    p, a = tif
    res = U.cmd_compare(p, p)
    assert res["same"] and res["pixels_differing"] == 0
    b = a.copy()
    b[0, 0] += 1
    p2 = str(tmp_path / "b.tif")
    write_geotiff(p2, b, GT, epsg=32633)
    res2 = U.cmd_compare(p, p2)
    assert not res2["same"]
    assert res2["pixels_differing"] == 1 and res2["max_abs_diff"] == 1.0


def test_gdal2tiles_tree(tmp_path):
    # small world-ish extent in 3857 so low zooms cover it
    a = np.random.default_rng(3).integers(0, 255, (64, 64, 3)).astype(
        np.uint8)
    p = str(tmp_path / "w.tif")
    ext = 20037508.342789244
    write_geotiff(p, a, [-ext, 2 * ext / 64, 0.0, ext, 0.0, -2 * ext / 64],
                  epsg=3857)
    out = str(tmp_path / "tiles")
    res = U.cmd_gdal2tiles(p, out, 0, 1)
    # z0: 1 tile, z1: 4 tiles
    assert res["tiles"] == 5
    assert os.path.exists(os.path.join(out, "0", "0", "0.png"))
    assert os.path.exists(os.path.join(out, "1", "1", "1.png"))
    meta = json.load(open(os.path.join(out, "metadata.json")))
    assert meta["scheme"] == "xyz"
    from gdal_ray.io.codec import decode_png

    t = decode_png(open(os.path.join(out, "0", "0", "0.png"), "rb").read())
    assert t.shape == (256, 256, 3)


def test_retile(tif, tmp_path):
    p, a = tif
    out = str(tmp_path / "tiles")
    res = U.cmd_retile(p, out, 100, 100)
    assert res["tiles"] == 4  # 192x128 in 100x100 blocks -> 2x2
    t11 = _full(os.path.join(out, "in_1_1.tif"))
    assert np.array_equal(t11, a[:100, :100])
    t22 = _full(os.path.join(out, "in_2_2.tif"))
    assert np.array_equal(t22, a[100:, 100:])
    idx = open(os.path.join(out, "in_index.csv")).read().splitlines()
    assert idx[0] == "location,wkt" and len(idx) == 5
    # second tile's geotransform shifted by 100 px
    h = read_tiff_header(os.path.join(out, "in_1_2.tif"))
    assert h["gt"][0] == GT[0] + 100 * GT[1]


def test_ogrmerge(tmp_path, ray_session):
    fc = lambda vals: {"type": "FeatureCollection", "features": [  # noqa
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [float(v), 0.0]},
         "properties": {"v": v}} for v in vals]}
    p1 = tmp_path / "a.geojson"
    p2 = tmp_path / "b.geojson"
    p1.write_text(json.dumps(fc([1, 2])))
    p2.write_text(json.dumps(fc([3])))
    out = str(tmp_path / "m.geojson")
    res = U.cmd_ogrmerge(out, [str(p1), str(p2)])
    assert res["rows"] == 3
    from gdal_ray.sources.geojson import read_geojson

    df = read_geojson(out).to_pandas()
    assert sorted(df["v"]) == [1, 2, 3]
    assert set(df["source"]) == {"a.geojson", "b.geojson"}


def test_create_manage_edit(tmp_path):
    p = str(tmp_path / "c.tif")
    U.cmd_create(p, 30, 20, burn=5.5, gt=GT, epsg=32633, nodata=-1)
    hdr = read_tiff_header(p)
    assert (hdr["w"], hdr["h"]) == (30, 20)
    assert hdr["nodata"] == -1.0
    assert (_full(p) == 5.5).all()

    ident = U.cmd_manage("identify", p)
    assert ident["driver"] == "GTiff"
    p2 = str(tmp_path / "c2.tif")
    U.cmd_manage("copy", p, p2)
    assert os.path.exists(p2)
    p3 = str(tmp_path / "c3.tif")
    U.cmd_manage("rename", p2, p3)
    assert os.path.exists(p3) and not os.path.exists(p2)
    U.cmd_manage("delete", p3)
    assert not os.path.exists(p3)

    # edit: move origin + change nodata, pixels identical
    res = U.cmd_edit(p, gt=[1.0, 2.0, 0.0, 5.0, 0.0, -2.0], nodata=9)
    hdr2 = read_tiff_header(p)
    assert hdr2["gt"][:2] == [1.0, 2.0] and hdr2["nodata"] == 9.0
    assert hdr2["epsg"] == 32633
    assert (_full(p) == 5.5).all()
    assert res["nodata"] == 9


def test_manage_shapefile_unit(tmp_path, ray_session):
    import pandas as pd
    import ray.data as rd

    from gdal_ray.geo.wkb import encode_point
    from gdal_ray.sources.shapefile import write_shapefile

    ds = rd.from_pandas(pd.DataFrame(
        {"geometry": [encode_point(1.0, 2.0)], "v": [1]}))
    base = str(tmp_path / "pts")
    write_shapefile(ds, base)
    ident = U.cmd_manage("identify", base + ".shp")
    assert ident["driver"] == "ESRI Shapefile"
    assert len(ident["files"]) >= 3  # .shp + .shx + .dbf
    U.cmd_manage("delete", base + ".shp")
    assert not os.path.exists(base + ".shx")


def test_main_dispatch_utils(tif, tmp_path, capsys):
    p, a = tif
    main(["addo", p, "2", "-r", "nearest"])
    out = json.loads(capsys.readouterr().out)
    assert out["levels"] == [[64, 96]]
    main(["compare", p, p])
    assert json.loads(capsys.readouterr().out)["same"]
    main(["transform", "-s_srs", "EPSG:4326", "-t_srs", "EPSG:3857",
          "0", "0"])
    pts = json.loads(capsys.readouterr().out)
    assert pts[0] == [0.0, 0.0] or abs(pts[0][0]) < 1e-6
    dst = str(tmp_path / "m.tif")
    main(["calc", "--calc", "A + 1", "-A", p, dst, "--type", "uint16"])
    assert json.loads(capsys.readouterr().out)["dtype"] == "uint16"
    assert np.array_equal(_full(dst), a + 1)


def test_layer_algebra_intersection_and_areas(tmp_path, ray_session):
    def sq(x0, y0, s):
        return {"type": "Polygon", "coordinates": [[
            [x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s],
            [x0, y0]]]}

    mk = lambda geoms: {"type": "FeatureCollection", "features": [  # noqa
        {"type": "Feature", "geometry": g, "properties": {}}
        for g in geoms]}
    pa_ = tmp_path / "a.geojson"
    pb = tmp_path / "b.geojson"
    pa_.write_text(json.dumps(mk([sq(0, 0, 2)])))          # A: 4 sq units
    pb.write_text(json.dumps(mk([sq(1, 1, 2), sq(10, 10, 1)])))
    out = str(tmp_path / "int.geojson")
    res = U.cmd_layer_algebra("intersection", str(pa_), str(pb), out)
    assert res["pairs"] == 1  # the far square never intersects
    from gdal_ray.sources.geojson import read_geojson

    df = read_geojson(out).to_pandas()
    assert len(df) == 1
    assert df["area"][0] == pytest.approx(1.0)   # unit overlap square

    # symdifference area table: A loses 1 -> 3, near-B loses 1 -> 3,
    # far-B untouched -> 1
    outt = str(tmp_path / "sym.csv")
    res2 = U.cmd_layer_algebra("symdifference", str(pa_), str(pb), outt)
    import pandas as pd

    t = pd.read_csv(outt)
    assert sorted(t["area"]) == pytest.approx([1.0, 3.0, 3.0])
    assert res2["rows"] == 3


def test_srsinfo():
    r = U.cmd_srsinfo("EPSG:32633")
    assert r["family"] == "projected"
    assert r["parameters"] == {"zone": 33, "south": False}
    assert "+proj=utm +zone=33" in r["proj4"]
    assert r["transform_resolves"]
    r2 = U.cmd_srsinfo("LCC:33,45,40,-96")
    assert r2["parameters"]["sp1"] == 33.0 and "+proj=lcc" in r2["proj4"]
    r3 = U.cmd_srsinfo("EPSG:4326")
    assert r3["family"] == "geographic"
    r4 = U.cmd_srsinfo("TOTALLY:bogus")
    assert r4["family"] == "unknown"


def test_translate_outsize_and_ot(tif, tmp_path):
    from gdal_ray.cli import cmd_translate
    from gdal_ray.raster.kernels import resample_nearest

    p, a = tif
    out = str(tmp_path / "half.tif")
    res = cmd_translate(p, out, outsize=[96, 0])  # 0 keeps aspect
    assert res["size"] == [96, 64]
    assert np.array_equal(_full(out), resample_nearest(a, 64, 96))
    # geotransform scaled 2x
    assert read_tiff_header(out)["gt"][1] == GT[1] * 2
    out2 = str(tmp_path / "f32.tif")
    res2 = cmd_translate(p, out2, ot="float32")
    assert res2["dtype"] == "float32"
    assert np.array_equal(_full(out2), a.astype(np.float32))
    out3 = str(tmp_path / "bi.tif")
    res3 = cmd_translate(p, out3, outsize=[64, 32], resample="bilinear")
    assert res3["size"] == [64, 32]


def test_info_reports_overviews_nodata(tif):
    from gdal_ray.cli import cmd_info

    p, a = tif
    U.cmd_addo(p, [2, 4])
    info = cmd_info(p)
    assert info["overviews"] == [[96, 64], [48, 32]]
    p2 = p.replace("in.tif", "nd.tif")
    write_geotiff(p2, a, GT, nodata=42)
    assert cmd_info(p2)["nodata"] == 42.0


def test_enhance_equalize_and_minmax(tmp_path):
    from gdal_ray.raster.kernels import equalize_histogram, stretch_minmax

    rng = np.random.default_rng(9)
    a = (rng.normal(1000, 100, (64, 64)) ** 1.2).astype(np.float64)
    p = str(tmp_path / "e.tif")
    write_geotiff(p, a, GT)
    out = str(tmp_path / "eq.tif")
    U.cmd_enhance(p, out, mode="equalize")
    got = _full(out)
    assert got.dtype == np.uint8
    assert np.array_equal(got, equalize_histogram(a))
    # equalization flattens: every ~16-bucket of the 0..255 range gets
    # roughly equal mass
    h = np.bincount(got.ravel() // 16, minlength=16)
    assert h.min() > 0.5 * h.max()
    out2 = str(tmp_path / "mm.tif")
    U.cmd_enhance(p, out2, mode="minmax", lo_pct=5, hi_pct=95)
    assert np.array_equal(_full(out2), stretch_minmax(a, 5, 95))


def test_reclass(tmp_path):
    a = np.array([[1, 2, 3], [2, 1, 9]], dtype=np.float32)
    p = str(tmp_path / "r.tif")
    write_geotiff(p, a, GT)
    out = str(tmp_path / "rc.tif")
    res = U.cmd_reclass(p, out, "1=10,2=20")
    assert np.array_equal(_full(out),
                          np.array([[10, 20, 3], [20, 10, 9]]))
    assert res["remapped"] == 4
    out2 = str(tmp_path / "rc2.tif")
    U.cmd_reclass(p, out2, "1=10,default=0")
    assert np.array_equal(_full(out2), np.array([[10, 0, 0], [0, 10, 0]]))


def test_ogrtindex(tmp_path, ray_session):
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [3.0, 7.0]},
         "properties": {}},
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [5.0, 9.0]},
         "properties": {}},
    ]}
    p = tmp_path / "pts.geojson"
    p.write_text(json.dumps(fc))
    out = str(tmp_path / "idx.geojson")
    n = U.cmd_ogrtindex(out, [str(p)])
    assert n == 1
    from gdal_ray.geo.wkb import wkb_envelope
    from gdal_ray.sources.geojson import read_geojson

    df = read_geojson(out).to_pandas()
    assert df["n_features"][0] == 2
    assert list(wkb_envelope(bytes(df["geometry"][0]))) == [3.0, 7.0,
                                                            5.0, 9.0]


def test_lineref(tmp_path, ray_session):
    # L-shaped line: (0,0)->(10,0)->(10,5), length 15
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature",
         "geometry": {"type": "LineString",
                      "coordinates": [[0.0, 0.0], [10.0, 0.0], [10.0, 5.0]]},
         "properties": {}}]}
    p = tmp_path / "line.geojson"
    p.write_text(json.dumps(fc))
    # create: mileposts every 4 units -> 0,4,8,12,15
    out = str(tmp_path / "mp.geojson")
    res = U.cmd_lineref("create", str(p), out, step=4.0)
    assert res["mileposts"] == 5
    from gdal_ray.geo.wkb import decode_points
    from gdal_ray.sources.geojson import read_geojson

    df = read_geojson(out).to_pandas().sort_values("measure")
    assert list(df["measure"]) == [0.0, 4.0, 8.0, 12.0, 15.0]
    xs, ys = decode_points([bytes(g) for g in df["geometry"]])
    assert list(xs) == [0.0, 4.0, 8.0, 10.0, 10.0]
    assert list(ys) == [0.0, 0.0, 0.0, 2.0, 5.0]
    # get_pos: point near (10, 3) -> measure 13
    res2 = U.cmd_lineref("get_pos", str(p), "11", "3")
    assert res2["measure"] == pytest.approx(13.0)
    # point before the start clamps to 0
    assert U.cmd_lineref("get_pos", str(p), "-5", "-1")["measure"] == 0.0
    # get_subline between 4 and 13: (4,0)->(10,0)->(10,3)
    out3 = str(tmp_path / "sub.geojson")
    res3 = U.cmd_lineref("get_subline", str(p), out3, mb=4.0, me=13.0)
    assert res3["vertices"] == 3
    from gdal_ray.geo.wkb import decode_lines

    sub = decode_lines(bytes(read_geojson(out3).to_pandas()["geometry"][0]))[0]
    assert np.allclose(sub, [[4, 0], [10, 0], [10, 3]])


def test_line_locate_kernel_oracle():
    from gdal_ray.geo.lineops import line_locate, line_substring

    pts = np.array([[0.0, 0.0], [3.0, 4.0], [3.0, 10.0]])  # lens 5, 6
    # closest to the first segment midpoint
    assert line_locate(pts, 1.5, 2.0) == pytest.approx(2.5)
    # beyond the end clamps to total length
    assert line_locate(pts, 3.0, 99.0) == pytest.approx(11.0)
    # substring across the vertex keeps it
    sub = line_substring(pts, 2.5, 8.0)
    assert np.allclose(sub, [[1.5, 2.0], [3.0, 4.0], [3.0, 7.0]])
    # degenerate zero-length request -> single repeated point collapses
    sub2 = line_substring(pts, 5.0, 5.0)
    assert sub2.shape[0] == 1 and np.allclose(sub2[0], [3.0, 4.0])


def test_mdiminfo_and_mdim(tmp_path):
    rng = np.random.default_rng(31)
    rgb = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
    p = str(tmp_path / "cube.tif")
    write_geotiff(p, rgb, GT, epsg=32633)
    info = U.cmd_mdiminfo(p)
    dims = info["arrays"][0]["dimensions"]
    assert [(d["name"], d["size"]) for d in dims] == [
        ("band", 3), ("y", 40), ("x", 60)]
    # slice band 1, window, stride 2 in x
    out = str(tmp_path / "v.tif")
    res = U.cmd_mdim(p, out, view="1, 10:30, ::2")
    assert res["shape"] == [20, 30]
    assert np.array_equal(_full(out), rgb[10:30, ::2, 1])
    # band-mean reduce
    out2 = str(tmp_path / "m.tif")
    U.cmd_mdim(p, out2, reduce_spec="mean:0")
    assert np.allclose(_full(out2), rgb.astype(np.float64).mean(axis=2))
    # transpose y<->x keeps a valid 3-d cube
    out3 = str(tmp_path / "t.tif")
    res3 = U.cmd_mdim(p, out3, transpose="0,2,1")
    assert res3["shape"] == [60, 40, 3]
    # resample last two dims
    out4 = str(tmp_path / "r.tif")
    res4 = U.cmd_mdim(p, out4, view="0", resample="20,30")
    assert res4["shape"] == [20, 30]


def test_overview_delete_refresh(tif):
    p, a = tif
    U.cmd_addo(p, [2, 4])
    assert os.path.exists(p + ".ovr")
    # mutate the base, refresh keeps the factors and recomputes pixels
    a2 = (a // 2).astype(a.dtype)
    write_geotiff(p, a2, GT, epsg=32633, tile=64)
    res = U.cmd_overview_refresh(p)
    assert res["levels"] == [[64, 96], [32, 48]]
    from gdal_ray.raster.kernels import resample_average

    hdrs = read_tiff_ifds(p + ".ovr")
    assert np.array_equal(_full(p + ".ovr", hdrs[0]), resample_average(a2, 2))
    assert U.cmd_overview_delete(p)["deleted"] == p + ".ovr"
    assert not os.path.exists(p + ".ovr")
    assert U.cmd_overview_delete(p)["deleted"] is None


def test_nodata_to_alpha(tmp_path):
    a = np.full((10, 12), 5, dtype=np.uint8)
    a[2:4, 3:6] = 0
    p = str(tmp_path / "n.tif")
    write_geotiff(p, a, GT, nodata=0)
    out = str(tmp_path / "na.tif")
    res = U.cmd_nodata_to_alpha(p, out)  # nodata from the tag
    assert res["bands"] == 2 and res["transparent"] == 6
    got = _full(out)
    assert np.array_equal(got[:, :, 0], a)
    assert (got[2:4, 3:6, 1] == 0).all()
    assert (got[0, 0, 1] == 255).all()


def test_color_merge_hsv(tmp_path):
    rng = np.random.default_rng(41)
    rgb = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    gray = rng.integers(0, 255, (16, 16)).astype(np.uint8)
    pg = str(tmp_path / "g.tif")
    pc = str(tmp_path / "c.tif")
    write_geotiff(pg, gray, GT, epsg=32633)
    write_geotiff(pc, rgb, GT)
    out = str(tmp_path / "m.tif")
    U.cmd_color_merge(pg, pc, out)
    got = _full(out)
    # oracle: matplotlib-free HSV round trip per pixel via colorsys
    import colorsys

    for y in range(0, 16, 5):
        for x in range(0, 16, 5):
            r, g, b = (rgb[y, x] / 255.0).tolist()
            hh, ss, _vv = colorsys.rgb_to_hsv(r, g, b)
            er, eg, eb = colorsys.hsv_to_rgb(hh, ss, gray[y, x] / 255.0)
            assert abs(int(got[y, x, 0]) - round(er * 255)) <= 1
            assert abs(int(got[y, x, 1]) - round(eg * 255)) <= 1
            assert abs(int(got[y, x, 2]) - round(eb * 255)) <= 1
    # value channel == the grayscale input exactly
    assert np.array_equal(got.max(axis=2), gray)


def test_update_paint_by_georef(tmp_path):
    dstv = np.zeros((20, 20), dtype=np.float32)
    pd_ = str(tmp_path / "d.tif")
    write_geotiff(pd_, dstv, [0.0, 1.0, 0.0, 20.0, 0.0, -1.0])
    src = np.full((6, 6), 9, dtype=np.float32)
    # source origin at (5, 12) in dst pixel space, partially clipped? no
    ps = str(tmp_path / "s.tif")
    write_geotiff(ps, src, [5.0, 1.0, 0.0, 8.0, 0.0, -1.0])
    res = U.cmd_update(ps, pd_)
    assert res["updated_pixels"] == 36
    got = _full(pd_)
    assert (got[12:18, 5:11] == 9).all()
    assert got.sum() == 36 * 9
    # clipped paint: source sticking out left/top
    ps2 = str(tmp_path / "s2.tif")
    write_geotiff(ps2, src, [-3.0, 1.0, 0.0, 23.0, 0.0, -1.0])
    res2 = U.cmd_update(ps2, pd_)
    assert res2["window"] == [0, 0, 3, 3]


def test_set_geom_type_step(ray_session):
    import struct

    import ray.data as rd

    import pandas as pd

    from gdal_ray.geo.wkb import encode_point, encode_polygon
    from gdal_ray.pipelines.registry import Pipeline

    sq = encode_polygon([np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0],
                                   [0.0, 0.0]])])
    pt = encode_point(3.0, 4.0)
    ds = rd.from_pandas(pd.DataFrame({"geometry": [sq, pt], "v": [1, 2]}))
    out = Pipeline([("set-geom-type", {"to": "multi"})]).run(ds).to_pandas()
    types = [struct.unpack_from("<I", bytes(g), 1)[0]
             for g in out["geometry"]]
    assert types == [6, 4]  # MULTIPOLYGON, MULTIPOINT
    # round back down: one-element multis unwrap
    ds2 = rd.from_pandas(out)
    back = Pipeline([("set-geom-type", {"to": "single"})]).run(ds2).to_pandas()
    types2 = [struct.unpack_from("<I", bytes(g), 1)[0]
              for g in back["geometry"]]
    assert types2 == [3, 1]
    assert bytes(back["geometry"][0]) == sq
    assert bytes(back["geometry"][1]) == pt


def test_translate_band_select(tmp_path):
    from gdal_ray.cli import cmd_translate

    rng = np.random.default_rng(47)
    rgb = rng.integers(0, 255, (20, 24, 3)).astype(np.uint8)
    p = str(tmp_path / "rgb.tif")
    write_geotiff(p, rgb, GT)
    out = str(tmp_path / "b2.tif")
    cmd_translate(p, out, bands=[2])
    assert np.array_equal(_full(out), rgb[:, :, 1])
    # reorder bgr
    out2 = str(tmp_path / "bgr.tif")
    cmd_translate(p, out2, bands=[3, 2, 1])
    assert np.array_equal(_full(out2), rgb[:, :, ::-1])
    with pytest.raises(SystemExit):
        cmd_translate(p, out, bands=[4])
