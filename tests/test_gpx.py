"""GPX driver (sources/gpx.py): round-trips + reference layer contract."""

import os

import numpy as np
import pytest
import ray.data as rd

from gdal_ray.geo import wkb as W
from gdal_ray.sources.gpx import read_gpx, write_gpx, write_gpx_dir

NS_DOC = b"""<?xml version="1.0"?>
<gpx version="1.1" creator="t" xmlns="http://www.topografix.com/GPX/1/1">
  <wpt lat="48.2" lon="16.37"><ele>151.5</ele><name>wien &amp; co</name></wpt>
  <wpt lat="-33.9" lon="151.2"><name>syd</name><desc>d</desc></wpt>
  <rte><name>r1</name>
    <rtept lat="1.0" lon="2.0"/><rtept lat="1.5" lon="2.5"/>
  </rte>
  <trk><name>t1</name>
    <trkseg><trkpt lat="0.0" lon="0.0"><ele>5.0</ele></trkpt>
            <trkpt lat="0.5" lon="1.0"/></trkseg>
    <trkseg><trkpt lat="2.0" lon="2.0"/></trkseg>
  </trk>
</gpx>
"""


@pytest.fixture()
def gpx_file(tmp_path):
    p = tmp_path / "a.gpx"
    p.write_bytes(NS_DOC)
    return str(p)


def test_read_waypoints_namespaced(ray_session, gpx_file):
    df = read_gpx(gpx_file, "waypoints").to_pandas().sort_values("fid")
    assert len(df) == 2
    x, y = W.decode_points(df["geometry"].tolist())
    assert x.tolist() == [16.37, 151.2] and y.tolist() == [48.2, -33.9]
    assert df["name"].tolist() == ["wien & co", "syd"]
    assert df["ele"].tolist()[0] == 151.5 and np.isnan(df["ele"].iloc[1])


def test_read_tracks_and_points(ray_session, gpx_file):
    trk = read_gpx(gpx_file, "tracks").to_pandas()
    assert len(trk) == 1 and trk["n_points"].iloc[0] == 3
    segs = W.decode_lines(bytes(trk["geometry"].iloc[0]))
    assert len(segs) == 2 and len(segs[0]) == 2 and len(segs[1]) == 1
    tp = read_gpx(gpx_file, "track_points").to_pandas()
    assert tp["track_seg_id"].tolist() == [0, 0, 1]
    assert tp["pt_id"].tolist() == [0, 1, 0]
    assert tp["ele"].iloc[0] == 5.0
    rte = read_gpx(gpx_file, "routes").to_pandas()
    assert rte["n_points"].iloc[0] == 2
    rp = read_gpx(gpx_file, "route_points").to_pandas()
    assert rp["pt_id"].tolist() == [0, 1]


def test_waypoint_roundtrip_bit_exact(ray_session, tmp_path):
    n = 257
    rng = np.random.default_rng(7)
    x = rng.uniform(-180, 180, n)
    y = rng.uniform(-90, 90, n)
    ele = rng.uniform(-100, 8000, n)
    ds = rd.from_items([
        {"fid": i, "geometry": W.encode_point(x[i], y[i]),
         "name": f"w{i}", "desc": None, "ele": float(ele[i])}
        for i in range(n)
    ]).repartition(4)
    out = str(tmp_path / "shards")
    write_gpx_dir(ds, out, "waypoints").materialize()
    assert len(os.listdir(out)) == 4
    back = read_gpx(out, "waypoints").to_pandas()
    assert len(back) == n
    bx, by = W.decode_points(back["geometry"].tolist())
    # repr round-trip => bit-exact ordinates
    order = np.argsort(back["name"].str.slice(1).astype(int).to_numpy())
    assert (bx[order] == x).all() and (by[order] == y).all()
    assert (back["ele"].to_numpy()[order] == ele).all()


def test_track_single_doc_roundtrip(ray_session, tmp_path):
    seg1 = np.array([[0.0, 0.0], [1.25, 2.5]])
    seg2 = np.array([[3.0, 4.0], [5.0, 6.0], [7.0, 8.0]])
    ds = rd.from_items([{
        "fid": 0, "name": "t",
        "geometry": W.encode_multilinestring([seg1, seg2]),
    }])
    p = str(tmp_path / "one.gpx")
    assert write_gpx(ds, p, "tracks") == 1
    back = read_gpx(p, "tracks").to_pandas()
    segs = W.decode_lines(bytes(back["geometry"].iloc[0]))
    assert (segs[0] == seg1).all() and (segs[1] == seg2).all()
