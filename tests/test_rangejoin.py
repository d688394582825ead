"""Distributed range join (stages/rangejoin.py): nested-loop oracle."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from gdal_ray.stages.rangejoin import range_join

L = pa.schema([("lid", pa.int64()), ("v", pa.float64())])
R = pa.schema([("rid", pa.int64()), ("lo", pa.float64()),
               ("hi", pa.float64())])


def test_matches_nested_loop_oracle(ray_session):
    rng = np.random.default_rng(21)
    lv = rng.uniform(-50, 150, 300)
    lo = rng.uniform(-60, 140, 40)
    hi = lo + rng.uniform(0, 30, 40)  # intervals span multiple bins
    lds = rd.from_items([{"lid": i, "v": float(lv[i])}
                         for i in range(len(lv))]).repartition(3)
    rds = rd.from_items([{"rid": i, "lo": float(lo[i]), "hi": float(hi[i])}
                         for i in range(len(lo))]).repartition(2)
    out = range_join(lds, rds, "v", "lo", "hi", 7.0, L, R,
                     num_buckets=4).to_pandas()
    got = sorted(zip(out["lid"], out["rid"]))
    want = sorted((i, j) for i in range(len(lv)) for j in range(len(lo))
                  if lo[j] <= lv[i] <= hi[j])
    assert got == want  # each pair exactly once (no bin duplicates)


def test_inclusive_ends_and_empty(ray_session):
    lds = rd.from_items([{"lid": 0, "v": 5.0}, {"lid": 1, "v": 10.0},
                         {"lid": 2, "v": 10.0001}])
    rds = rd.from_items([{"rid": 7, "lo": 5.0, "hi": 10.0}])
    out = range_join(lds, rds, "v", "lo", "hi", 3.0, L, R).to_pandas()
    assert sorted(out["lid"]) == [0, 1]  # both ends inclusive, 2 excluded
    none = range_join(lds, rds.filter(expr="rid > 100"),
                      "v", "lo", "hi", 3.0, L, R).to_pandas()
    assert len(none) == 0
