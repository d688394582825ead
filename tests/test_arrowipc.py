"""Arrow IPC driver (sources/arrowipc.py): byte-exact round-trips."""

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from gdal_ray.geo import wkb as W
from gdal_ray.sources.arrowipc import read_arrow_ipc, write_arrow_ipc


def test_mixed_schema_roundtrip(ray_session, tmp_path):
    n = 300
    rng = np.random.default_rng(5)
    x = rng.uniform(-180, 180, n)
    y = rng.uniform(-90, 90, n)
    ds = rd.from_items([
        {"fid": i, "geometry": W.encode_point(x[i], y[i]),
         "name": f"r{i}", "val": float(i) * 0.5,
         "flag": bool(i % 2)}
        for i in range(n)
    ]).repartition(4)
    out = str(tmp_path / "shards")
    shards = write_arrow_ipc(ds, out).to_pandas()
    assert shards["n"].sum() == n and len(os.listdir(out)) == 4
    back = read_arrow_ipc(out).to_pandas().sort_values("fid")
    assert len(back) == n
    bx, by = W.decode_points(back["geometry"].tolist())
    assert (bx == x).all() and (by == y).all()  # WKB bytes untouched
    assert back["val"].tolist() == [i * 0.5 for i in range(n)]
    assert back["flag"].tolist() == [bool(i % 2) for i in range(n)]


def test_column_pruned_read(ray_session, tmp_path):
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"], "c": [0.1, 0.2, 0.3]})
    out = str(tmp_path / "d")
    write_arrow_ipc(rd.from_arrow(t), out).materialize()
    got = read_arrow_ipc(out, columns=["a", "c"]).to_pandas()
    assert list(got.columns) == ["a", "c"] and got["a"].sum() == 6
