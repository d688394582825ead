"""HyperLogLog sketch (stages/sketch.py): partial-combine associativity +
estimate accuracy."""

import numpy as np
import pytest


def test_partials_combine_associatively():
    from gdal_ray.stages.sketch import hll_partial

    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 40, 50_000)
    b = rng.integers(0, 1 << 40, 50_000)
    whole = hll_partial(np.concatenate([a, b]))
    combined = np.maximum(hll_partial(a), hll_partial(b))
    assert (whole == combined).all()


@pytest.mark.parametrize("n", [100, 5_000, 200_000])
def test_estimate_within_expected_error(n):
    from gdal_ray.stages.sketch import hll_estimate, hll_partial

    keys = np.arange(n, dtype=np.int64) * 2654435761  # distinct keys
    est = hll_estimate(hll_partial(keys))
    # p=12 -> standard error ~1.04/sqrt(4096) = 1.6%; allow 5 sigma
    assert abs(est - n) / n < 0.08


def test_distributed_registers_match_local(ray_session):
    import os

    import ray.data as rd

    from gdal_ray.stages.sketch import hll_partial, hll_registers

    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(os.path.join(sf, "orders.parquet"), columns=["o_custkey"])
    table, acc = hll_registers(ds, "o_custkey")
    keys = pq.read_table(os.path.join(sf, "orders.parquet"), columns=["o_custkey"])
    local = hll_partial(np.asarray(keys["o_custkey"], dtype=np.int64))
    assert (acc == local).all()
    # estimate tracks the true distinct count
    from gdal_ray.stages.sketch import hll_estimate

    true = len(np.unique(np.asarray(keys["o_custkey"])))
    assert abs(hll_estimate(acc) - true) / true < 0.08
