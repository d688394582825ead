"""Misra-Gries heavy hitters + stratified sampling oracles."""

import numpy as np
import pandas as pd
import pytest

from gdal_ray.stages.heavyhitters import MisraGries, heavy_hitters
from gdal_ray.stages.sampling import KNUTH, stratified_sample


class TestMG:
    def test_superset_guarantee(self):
        # adversarial: many singletons drown a few heavy keys
        rng = np.random.default_rng(2)
        heavy = np.repeat([7, 13, 99], 500)
        noise = rng.integers(1000, 100000, size=10_000)
        stream = rng.permutation(np.concatenate([heavy, noise]))
        k = 40
        mg = MisraGries(k)
        for chunk in np.array_split(stream, 23):
            mg.update_many(chunk)
        n = len(stream)
        # every item with true count > n/(k+1) must survive
        for v in (7, 13, 99):
            assert 500 > n / (k + 1)
            assert v in mg.counters

    def test_merge_superset(self):
        rng = np.random.default_rng(9)
        heavy = np.repeat([1, 2], 800)
        noise = rng.integers(10, 5000, size=6_000)
        stream = rng.permutation(np.concatenate([heavy, noise]))
        parts = np.array_split(stream, 8)
        mgs = []
        for p in parts:
            m = MisraGries(30)
            m.update_many(p)
            mgs.append(m)
        merged = mgs[0]
        for m in mgs[1:]:
            merged.merge(m)
        assert 800 > len(stream) / 31
        assert 1 in merged.counters and 2 in merged.counters
        assert len(merged.counters) <= 30

    def test_distributed_equals_exact(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(4)
        vals = rng.zipf(1.3, 40_000).astype(np.int64)
        ds = rd.from_pandas(pd.DataFrame({"u": vals})).repartition(10)
        out = heavy_hitters(ds, "u", denom=64)
        n = len(vals)
        thresh = -(-n // 64)
        uniq, cnts = np.unique(vals, return_counts=True)
        want = sorted(
            [(v, c) for v, c in zip(uniq, cnts) if c >= thresh],
            key=lambda t: (-t[1], t[0]),
        )
        got = list(zip(out["value"], out["cnt"]))
        assert got == want and len(want) >= 3


class TestStratified:
    def test_matches_hash_rule(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(21)
        n = 5_000
        keys = rng.choice(["a", "b", "c"], size=n, p=[0.7, 0.2, 0.1])
        ids = rng.permutation(n).astype(np.int64)
        df = pd.DataFrame({"k": keys, "id": ids, "payload": ids * 3})
        ds = rd.from_pandas(df).repartition(7)
        out = (
            stratified_sample(ds, "k", "id", 25, num_buckets=4)
            .to_pandas()
            .sort_values(["k", "id"])
            .reset_index(drop=True)
        )
        # reference: same hash rule in plain pandas
        h = ((df["id"].astype(np.uint64) % (1 << 32)) * np.uint64(KNUTH)) % (
            1 << 32
        )
        ref = (
            df.assign(__h=h.astype(np.int64))
            .sort_values(["__h", "id"], kind="mergesort")
            .groupby("k", sort=False)
            .head(25)
            .drop(columns="__h")
            .sort_values(["k", "id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out[["k", "id", "payload"]], ref)
        assert (out.groupby("k").size() == 25).all()

    def test_small_groups_keep_everything(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"k": ["x"] * 3 + ["y"] * 10,
                           "id": np.arange(13, dtype=np.int64)})
        ds = rd.from_pandas(df)
        out = stratified_sample(ds, "k", "id", 5, num_buckets=2).to_pandas()
        sizes = out.groupby("k").size()
        assert sizes["x"] == 3 and sizes["y"] == 5
