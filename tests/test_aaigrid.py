"""AAIGrid (.asc) codec (io/aaigrid.py) + CLI conversion surface.
Reference: frmts/aaigrid/aaigriddataset.cpp header grammar."""

import json

import numpy as np
import pytest

from gdal_ray.io.aaigrid import read_aaigrid, write_aaigrid


def test_asc_roundtrip_int(tmp_path):
    rng = np.random.default_rng(101)
    a = rng.integers(-50, 4000, (17, 23)).astype(np.int32)
    gt = [500000.0, 30.0, 0.0, 4000000.0, 0.0, -30.0]
    p = str(tmp_path / "g.asc")
    write_aaigrid(p, a, gt, nodata=-9999)
    out, ogt, nd = read_aaigrid(p)
    assert np.array_equal(out, a)
    assert ogt == gt and nd == -9999.0


def test_asc_roundtrip_float(tmp_path):
    rng = np.random.default_rng(103)
    a = rng.uniform(-1, 1, (5, 7))
    gt = [0.0, 0.5, 0.0, 2.5, 0.0, -0.5]
    p = str(tmp_path / "f.asc")
    write_aaigrid(p, a, gt)
    out, ogt, nd = read_aaigrid(p)
    assert np.array_equal(out, a)  # repr round-trip is exact
    assert ogt == gt and nd is None


def test_asc_center_variant(tmp_path):
    """xllcenter/yllcenter shift by half a cell (the reference's center
    branch)."""
    p = tmp_path / "c.asc"
    p.write_text("ncols 2\nnrows 2\nxllcenter 10.5\nyllcenter 20.5\n"
                 "cellsize 1\n1 2\n3 4\n")
    out, gt, _ = read_aaigrid(str(p))
    assert np.array_equal(out, [[1, 2], [3, 4]])
    assert gt == [10.0, 1.0, 0.0, 22.0, 0.0, -1.0]


def test_asc_rejects_nonsquare(tmp_path):
    with pytest.raises(ValueError, match="square"):
        write_aaigrid(str(tmp_path / "x.asc"), np.zeros((2, 2)),
                      [0.0, 1.0, 0.0, 0.0, 0.0, -2.0])


def test_asc_cli_conversion(tmp_path, capsys):
    """tif -> asc -> tif through the translate CLI keeps values and
    geotransform."""
    from gdal_ray.cli import main
    from gdal_ray.io.tiff import write_geotiff

    rng = np.random.default_rng(107)
    a = rng.integers(0, 255, (12, 18)).astype(np.uint8)
    gt = [100.0, 10.0, 0.0, 900.0, 0.0, -10.0]
    src = str(tmp_path / "in.tif")
    write_geotiff(src, a, gt, epsg=3857)
    asc = str(tmp_path / "mid.asc")
    main(["translate", src, asc])
    capsys.readouterr()
    main(["info", asc])
    info = json.loads(capsys.readouterr().out)
    assert info["driver"] == "AAIGrid" and info["size"] == [18, 12]
    assert info["geotransform"] == gt
    out, ogt, _ = read_aaigrid(asc)
    assert np.array_equal(out, a)


# ---------------- XYZ gridded text (io/xyz.py) ----------------

def test_xyz_roundtrip(tmp_path):
    from gdal_ray.io.xyz import read_xyz, write_xyz

    rng = np.random.default_rng(109)
    a = rng.integers(-10, 500, (9, 13)).astype(np.float64)
    gt = [1000.0, 25.0, 0.0, 2000.0, 0.0, -25.0]
    p = str(tmp_path / "g.xyz")
    write_xyz(p, a, gt)
    out, ogt = read_xyz(p)
    assert np.array_equal(out, a)
    assert np.allclose(ogt, gt)


def test_xyz_shuffled_rows_and_header(tmp_path):
    """Lines in arbitrary order with a header still rebuild the grid
    (the reference sorts by inferred coordinates)."""
    from gdal_ray.io.xyz import read_xyz

    lines = ["X Y Z"]
    rng = np.random.default_rng(111)
    vals = {}
    for r in range(3):
        for c in range(4):
            x, y = 10.0 + c * 2.0, 50.0 - r * 2.0
            v = float(rng.integers(0, 99))
            vals[(r, c)] = v
            lines.append(f"{x},{y},{v}")
    body = lines[:1] + [lines[1:][i] for i in
                        rng.permutation(12)]
    p = tmp_path / "s.xyz"
    p.write_text("\n".join(body) + "\n")
    out, gt = read_xyz(str(p))
    assert out.shape == (3, 4)
    for (r, c), v in vals.items():
        assert out[r, c] == v
    assert gt == [9.0, 2.0, 0.0, 51.0, 0.0, -2.0]


def test_xyz_rejects_uneven(tmp_path):
    from gdal_ray.io.xyz import read_xyz

    p = tmp_path / "bad.xyz"
    p.write_text("0 0 1\n1 0 2\n3 0 3\n")
    with pytest.raises(ValueError, match="unevenly"):
        read_xyz(str(p))


def test_xyz_cli_conversion(tmp_path, capsys):
    from gdal_ray.cli import main
    from gdal_ray.io.tiff import write_geotiff
    from gdal_ray.io.xyz import read_xyz

    a = (np.arange(30, dtype=np.float64).reshape(5, 6) * 3.0)
    gt = [0.0, 10.0, 0.0, 50.0, 0.0, -10.0]
    src = str(tmp_path / "in.tif")
    write_geotiff(src, a.astype(np.float32), gt)
    xyz = str(tmp_path / "out.xyz")
    main(["translate", src, xyz])
    capsys.readouterr()
    out, ogt = read_xyz(xyz)
    assert np.array_equal(out, a)
    assert np.allclose(ogt, gt)
