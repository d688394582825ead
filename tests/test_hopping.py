"""Hopping-window aggregate (relational.q_hopping_windows): scalar
window-membership oracle on the real sf0.001 events table."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from gdal_ray.pipelines.relational import q_hopping_windows

HOP = 900_000_000
SIZE = 1_800_000_000


def test_hopping_matches_scalar_oracle(ray_session):
    got = q_hopping_windows("/root/testdata/sf0.001").to_pandas()
    ev = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["ts", "event_type", "value"]).to_pandas()
    us = ev["ts"].astype("int64").to_numpy()
    v2 = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    rows = []
    for i in range(len(ev)):
        k0 = (us[i] - SIZE) // HOP + 1
        k1 = us[i] // HOP
        assert k1 - k0 + 1 == SIZE // HOP  # exactly two windows per event
        for k in range(k0, k1 + 1):
            rows.append((k * HOP, ev["event_type"].iloc[i], v2[i]))
    want = (pd.DataFrame(rows, columns=["wstart", "event_type", "v2"])
            .groupby(["wstart", "event_type"], as_index=False)
            .agg(n=("v2", "size"), sum_v2=("v2", "sum"))
            .sort_values(["wstart", "event_type"]).reset_index(drop=True))
    got = got.sort_values(["wstart", "event_type"]).reset_index(drop=True)
    assert got["n"].tolist() == want["n"].tolist()
    assert got["sum_v2"].tolist() == want["sum_v2"].tolist()
    assert got["wstart"].tolist() == want["wstart"].tolist()
    # every event counted exactly twice across all windows
    assert got["n"].sum() == 2 * len(ev)
