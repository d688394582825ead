"""GML driver (sources/gml.py): parse + bit-exact round-trips."""

import numpy as np
import pytest
import ray.data as rd

from gdal_ray.geo import wkb as W
from gdal_ray.sources.gml import read_gml, write_gml, write_gml_dir

DOC = b"""<?xml version="1.0"?>
<wfs:FeatureCollection xmlns:wfs="http://www.opengis.net/wfs"
  xmlns:gml="http://www.opengis.net/gml" xmlns:ogr="http://ogr.maptools.org/">
  <gml:featureMember>
    <ogr:city fid="1">
      <ogr:geom><gml:Point><gml:pos>16.37 48.2</gml:pos></gml:Point></ogr:geom>
      <ogr:name>wien</ogr:name><ogr:pop>1900000</ogr:pop>
    </ogr:city>
  </gml:featureMember>
  <gml:featureMember>
    <ogr:road fid="2">
      <ogr:geom><gml:LineString>
        <gml:posList>0 0 1 1 2 0.5</gml:posList>
      </gml:LineString></ogr:geom>
      <ogr:name>r1</ogr:name>
    </ogr:road>
  </gml:featureMember>
  <gml:featureMember>
    <ogr:zone fid="3">
      <ogr:geom><gml:Polygon>
        <gml:exterior><gml:LinearRing>
          <gml:posList>0 0 4 0 4 4 0 4 0 0</gml:posList>
        </gml:LinearRing></gml:exterior>
        <gml:interior><gml:LinearRing>
          <gml:posList>1 1 2 1 2 2 1 2 1 1</gml:posList>
        </gml:LinearRing></gml:interior>
      </gml:Polygon></ogr:geom>
    </ogr:zone>
  </gml:featureMember>
  <gml:featureMember>
    <ogr:old fid="4">
      <ogr:geom><gml:Point>
        <gml:coordinates>5.5,6.5</gml:coordinates>
      </gml:Point></ogr:geom>
    </ogr:old>
  </gml:featureMember>
</wfs:FeatureCollection>
"""


@pytest.fixture()
def gml_file(tmp_path):
    p = tmp_path / "a.gml"
    p.write_bytes(DOC)
    return str(p)


def test_read_members_and_geometries(ray_session, gml_file):
    df = read_gml(gml_file).to_pandas().sort_values("fid")
    assert len(df) == 4
    x, y = W.decode_points([df["geometry"].iloc[0]])
    assert (x[0], y[0]) == (16.37, 48.2)
    assert df["name"].tolist()[:2] == ["wien", "r1"]
    assert df["pop"].iloc[0] == "1900000"
    line = W.decode_lines(bytes(df["geometry"].iloc[1]))[0]
    assert line.shape == (3, 2) and line[2, 1] == 0.5
    rings = W.decode_polygons(bytes(df["geometry"].iloc[2]))[0]
    assert len(rings) == 2
    # legacy gml:coordinates form
    x4, y4 = W.decode_points([df["geometry"].iloc[3]])
    assert (x4[0], y4[0]) == (5.5, 6.5)


def test_shard_roundtrip_bit_exact(ray_session, tmp_path):
    n = 150
    rng = np.random.default_rng(6)
    x = rng.uniform(-180, 180, n)
    y = rng.uniform(-90, 90, n)
    ds = rd.from_items([
        {"fid": i, "geometry": W.encode_point(x[i], y[i]),
         "name": f"g{i}"} for i in range(n)]).repartition(3)
    out = str(tmp_path / "shards")
    write_gml_dir(ds, out).materialize()
    back = read_gml(out).to_pandas()
    assert len(back) == n
    bx, by = W.decode_points(back["geometry"].tolist())
    order = np.argsort(back["name"].str.slice(1).astype(int).to_numpy())
    assert (bx[order] == x).all() and (by[order] == y).all()


def test_polygon_single_doc_roundtrip(ray_session, tmp_path):
    outer = np.array([[0.0, 0.0], [10.5, 0.0], [10.5, 7.25],
                      [0.0, 7.25], [0.0, 0.0]])
    hole = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0],
                     [1.0, 2.0], [1.0, 1.0]])
    ds = rd.from_items([{"fid": 0, "name": "p",
                         "geometry": W.encode_polygon([outer, hole])}])
    p = str(tmp_path / "one.gml")
    assert write_gml(ds, p) == 1
    rings = W.decode_polygons(bytes(
        read_gml(p).to_pandas()["geometry"].iloc[0]))[0]
    assert (rings[0] == outer).all() and (rings[1] == hole).all()
