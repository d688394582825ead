"""KML driver (sources/kml.py): parse + bit-exact round-trips."""

import numpy as np
import pytest
import ray.data as rd

from gdal_ray.geo import wkb as W
from gdal_ray.sources.kml import read_kml, write_kml, write_kml_dir

DOC = b"""<?xml version="1.0"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document><name>d</name>
  <Placemark><name>p1</name><description>top</description>
    <Point><coordinates>16.37,48.2,151.0</coordinates></Point>
  </Placemark>
  <Folder><name>f1</name>
    <Placemark><name>ln</name>
      <LineString><coordinates>0,0 1,1 2,0.5</coordinates></LineString>
    </Placemark>
    <Placemark><name>pg</name>
      <Polygon>
        <outerBoundaryIs><LinearRing>
          <coordinates>0,0 4,0 4,4 0,4 0,0</coordinates>
        </LinearRing></outerBoundaryIs>
        <innerBoundaryIs><LinearRing>
          <coordinates>1,1 2,1 2,2 1,2 1,1</coordinates>
        </LinearRing></innerBoundaryIs>
      </Polygon>
    </Placemark>
  </Folder>
  <Placemark><name>mg</name>
    <MultiGeometry>
      <Point><coordinates>5,5</coordinates></Point>
      <Point><coordinates>6,6</coordinates></Point>
    </MultiGeometry>
  </Placemark>
</Document></kml>
"""


@pytest.fixture()
def kml_file(tmp_path):
    p = tmp_path / "a.kml"
    p.write_bytes(DOC)
    return str(p)


def test_read_placemarks_and_folders(ray_session, kml_file):
    df = read_kml(kml_file).to_pandas().sort_values("fid")
    assert df["name"].tolist() == ["p1", "ln", "pg", "mg"]
    assert df["folder"].tolist() == ["d", "f1", "f1", "d"]
    x, y = W.decode_points([df["geometry"].iloc[0]])
    assert (x[0], y[0]) == (16.37, 48.2)  # altitude dropped
    line = W.decode_lines(bytes(df["geometry"].iloc[1]))[0]
    assert line.shape == (3, 2) and line[2, 1] == 0.5
    rings = W.decode_polygons(bytes(df["geometry"].iloc[2]))[0]
    assert len(rings) == 2 and len(rings[0]) == 5
    assert df["description"].iloc[0] == "top"


def test_point_shard_roundtrip_bit_exact(ray_session, tmp_path):
    n = 123
    rng = np.random.default_rng(3)
    x = rng.uniform(-180, 180, n)
    y = rng.uniform(-90, 90, n)
    ds = rd.from_items([
        {"fid": i, "geometry": W.encode_point(x[i], y[i]),
         "name": f"k{i}", "description": None}
        for i in range(n)
    ]).repartition(3)
    out = str(tmp_path / "shards")
    write_kml_dir(ds, out).materialize()
    back = read_kml(out).to_pandas()
    assert len(back) == n
    bx, by = W.decode_points(back["geometry"].tolist())
    order = np.argsort(back["name"].str.slice(1).astype(int).to_numpy())
    assert (bx[order] == x).all() and (by[order] == y).all()


def test_polygon_single_doc_roundtrip(ray_session, tmp_path):
    outer = np.array([[0.0, 0.0], [10.5, 0.0], [10.5, 7.25],
                      [0.0, 7.25], [0.0, 0.0]])
    hole = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0],
                     [1.0, 2.0], [1.0, 1.0]])
    ds = rd.from_items([{"fid": 0, "name": "poly", "description": "x < y",
                         "geometry": W.encode_polygon([outer, hole])}])
    p = str(tmp_path / "one.kml")
    assert write_kml(ds, p) == 1
    back = read_kml(p).to_pandas()
    rings = W.decode_polygons(bytes(back["geometry"].iloc[0]))[0]
    assert (rings[0] == outer).all() and (rings[1] == hole).all()
    assert back["description"].iloc[0] == "x < y"  # xml-escaped round trip
