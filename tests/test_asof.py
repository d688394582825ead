"""Distributed as-of join (stages/asof.py): scalar merge_asof oracle +
hand-pinned boundary cases."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from gdal_ray.stages.asof import asof_join

L_SCHEMA = pa.schema([("lid", pa.int64()), ("k", pa.int64()),
                      ("ts", pa.int64())])
R_SCHEMA = pa.schema([("k", pa.int64()), ("ts", pa.int64()),
                      ("rid", pa.int64()), ("val", pa.float64())])


def _run(ray_session, lrows, rrows, direction="backward"):
    lds = rd.from_items(lrows).repartition(2)
    rds = rd.from_items(rrows).repartition(2)
    out = asof_join(lds, rds, "k", "ts", L_SCHEMA, R_SCHEMA,
                    direction=direction, num_buckets=4)
    return out.to_pandas().sort_values("lid").reset_index(drop=True)


def test_backward_hand_pinned(ray_session):
    lrows = [{"lid": 0, "k": 1, "ts": 10}, {"lid": 1, "k": 1, "ts": 5},
             {"lid": 2, "k": 1, "ts": 4}, {"lid": 3, "k": 2, "ts": 10},
             {"lid": 4, "k": 3, "ts": 100}]
    rrows = [{"k": 1, "ts": 5, "rid": 50, "val": 0.5},
             {"k": 1, "ts": 9, "rid": 90, "val": 0.9},
             {"k": 2, "ts": 11, "rid": 110, "val": 1.1}]
    out = _run(ray_session, lrows, rrows)
    # lid0: latest r.ts<=10 is 9; lid1: exact tie ts=5 matches (inclusive);
    # lid2: none before 4; lid3: right only after; lid4: key absent
    assert out["r_rid"].fillna(-1).tolist() == [90, 50, -1, -1, -1]
    assert out.loc[0, "r_val"] == 0.9 and out.loc[1, "r_val"] == 0.5


def test_forward_direction(ray_session):
    lrows = [{"lid": 0, "k": 1, "ts": 10}]
    rrows = [{"k": 1, "ts": 9, "rid": 9, "val": 0.0},
             {"k": 1, "ts": 12, "rid": 12, "val": 0.0}]
    out = _run(ray_session, lrows, rrows, direction="forward")
    assert out.loc[0, "r_rid"] == 12  # smallest ts >= 10


def test_matches_pandas_merge_asof_random(ray_session):
    rng = np.random.default_rng(13)
    lrows = [{"lid": i, "k": int(rng.integers(0, 6)),
              "ts": int(rng.integers(0, 1000))} for i in range(200)]
    rrows = [{"k": int(rng.integers(0, 6)), "ts": int(ts),
              "rid": int(i), "val": float(i)}
             for i, ts in enumerate(
                 rng.choice(2000, size=80, replace=False))]
    out = _run(ray_session, lrows, rrows)
    ldf = pd.DataFrame(lrows).sort_values("ts", kind="mergesort")
    rdf = (pd.DataFrame(rrows).rename(
        columns={"rid": "r_rid", "val": "r_val"})
        .sort_values("ts", kind="mergesort"))
    want = (pd.merge_asof(ldf, rdf, on="ts", by="k")
            .sort_values("lid").reset_index(drop=True))
    assert out["r_rid"].fillna(-1).tolist() == \
        want["r_rid"].fillna(-1).tolist()
    assert out["r_val"].fillna(-1).tolist() == \
        want["r_val"].fillna(-1).tolist()
