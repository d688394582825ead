"""VRT driver (sources/vrt.py): gdalbuildvrt XML write, parse, mosaic
assembly, distributed source read. Reference: frmts/vrt/vrtdataset.cpp,
apps/gdalbuildvrt_lib.cpp:1946, autotest/gcore/data/byte.vrt shape."""

import numpy as np
import pytest

from gdal_ray.io.tiff import write_geotiff
from gdal_ray.sources.vrt import build_vrt, read_vrt, read_vrt_tiles, vrt_mosaic


@pytest.fixture
def three_tifs(tmp_path):
    """Three overlapping 10 m tiles on one grid; the third overlaps the
    first (later-wins paint is observable)."""
    rng = np.random.default_rng(91)
    arrs, paths = [], []
    origins = [(500000.0, 4000000.0), (500000.0 + 40 * 10.0, 4000000.0),
               (500000.0 + 20 * 10.0, 4000000.0 - 10 * 10.0)]
    for i, (ox, oy) in enumerate(origins):
        a = rng.integers(1 + i * 60, 50 + i * 60, (30, 40)).astype("uint16")
        p = str(tmp_path / f"t{i}.tif")
        write_geotiff(p, a, [ox, 10.0, 0.0, oy, 0.0, -10.0], epsg=32633,
                      tile=16, compress="deflate")
        arrs.append(a)
        paths.append(p)
    return paths, arrs


def test_build_and_read_vrt(three_tifs, tmp_path):
    paths, arrs = three_tifs
    out = str(tmp_path / "mosaic.vrt")
    meta = build_vrt(paths, out, nodata=0)
    assert (meta["w"], meta["h"]) == (80, 40)
    m = read_vrt(out)
    assert (m["w"], m["h"]) == (80, 40)
    assert m["epsg"] == 32633 and m["dtype"] == np.uint16 and m["nodata"] == 0
    assert len(m["bands"]) == 1 and len(m["bands"][0]) == 3
    assert m["bands"][0][0]["dst_rect"] == (0, 0, 40, 30)
    assert m["bands"][0][1]["dst_rect"] == (40, 0, 40, 30)
    assert m["bands"][0][2]["dst_rect"] == (20, 10, 40, 30)


def test_vrt_mosaic_later_wins(three_tifs, tmp_path):
    paths, arrs = three_tifs
    out = str(tmp_path / "mosaic.vrt")
    build_vrt(paths, out, nodata=0)
    canvas, gt = vrt_mosaic(out)
    # scalar oracle: paint in order
    want = np.zeros((40, 80), dtype=np.uint16)
    want[0:30, 0:40] = arrs[0]
    want[0:30, 40:80] = arrs[1]
    want[10:40, 20:60] = arrs[2]
    assert np.array_equal(canvas, want)
    assert gt == [500000.0, 10.0, 0.0, 4000000.0, 0.0, -10.0]


def test_vrt_distributed_read(three_tifs, tmp_path, ray_session):
    """read_vrt_tiles emits standard raster rows with DstRect-placed
    geotransforms, byte-identical to the source arrays."""
    paths, arrs = three_tifs
    out = str(tmp_path / "mosaic.vrt")
    build_vrt(paths, out)
    df = read_vrt_tiles(out).to_pandas().set_index("raster_id").sort_index()
    assert len(df) == 3
    for k in range(3):
        r = df.loc[f"mosaic#s{k}"]
        got = np.asarray(r["pixels"], dtype=np.int64).reshape(r["h"], r["w"])
        assert np.array_equal(got, arrs[k])
    # placement of the overlapping third source
    r2 = df.loc["mosaic#s2"]
    assert list(r2["gt"]) == [500000.0 + 200.0, 10.0, 0.0,
                              4000000.0 - 100.0, 0.0, -10.0]


def test_vrt_rejects_mixed_resolution(three_tifs, tmp_path):
    paths, _ = three_tifs
    bad = str(tmp_path / "bad.tif")
    write_geotiff(bad, np.zeros((5, 5), dtype=np.uint16),
                  [0.0, 5.0, 0.0, 0.0, 0.0, -5.0])
    with pytest.raises(ValueError, match="uniform resolution"):
        build_vrt(paths + [bad], str(tmp_path / "x.vrt"))


def test_vrt_cli(three_tifs, tmp_path, capsys):
    """buildvrt + info through the CLI surface."""
    import json

    from gdal_ray.cli import main

    paths, _ = three_tifs
    vrt = str(tmp_path / "cli.vrt")
    main(["buildvrt", vrt] + paths)
    out = json.loads(capsys.readouterr().out)
    assert out["w"] == 80 and out["n_sources"] == 3
    main(["info", vrt])
    info = json.loads(capsys.readouterr().out)
    assert info["driver"] == "VRT" and info["size"] == [80, 40]
    assert info["epsg"] == 32633 and len(info["sources"]) == 3
    assert info["extent"] == [500000.0, 4000000.0 - 400.0,
                              500000.0 + 800.0, 4000000.0]
