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


def test_cms_partial_properties():
    from gdal_ray.stages.sketch import cms_partial, cms_query

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 500, 20000).astype(np.int64)
    acc = cms_partial(keys)
    assert acc.shape == (4, 1024)
    # every depth row sums to n (each key lands in exactly one slot per row)
    assert (acc.sum(axis=1) == len(keys)).all()
    # estimate never under-counts; with 500 distinct keys in 4x1024
    # cells the min-over-depths is exact for the vast majority
    vals, true = np.unique(keys, return_counts=True)
    est = cms_query(acc, vals)
    assert (est >= true).all()
    assert (est == true).mean() > 0.95
    # partials combine by sum: split build == whole build
    acc2 = cms_partial(keys[:7000]) + cms_partial(keys[7000:])
    assert (acc2 == acc).all()
    with pytest.raises(ValueError):
        cms_partial(keys, w_bits=20, d=4)


def test_cms_distributed_matches_local(ray_session):
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from gdal_ray.stages.sketch import cms_partial, cms_query, cms_registers

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(os.path.join(sf, "orders.parquet"),
                         columns=["o_custkey"])
    table, acc = cms_registers(ds, "o_custkey")
    keys = np.asarray(pq.read_table(os.path.join(sf, "orders.parquet"),
                                    columns=["o_custkey"])["o_custkey"],
                      dtype=np.int64)
    local = cms_partial(keys)
    assert (acc == local).all()
    # sparse table round-trips to the dense array
    dense = np.zeros_like(acc)
    t = table.to_pandas()
    dense[t["depth"], t["slot"]] = t["count"]
    assert (dense == acc).all()
    # point queries upper-bound the true counts
    vals, true = np.unique(keys, return_counts=True)
    est = cms_query(acc, vals)
    assert (est >= true).all() and est.sum() < true.sum() * 1.5
