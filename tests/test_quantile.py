"""Distributed quantile oracles (stages/quantile.py).

Exact path: rank rule = smallest value with cumulative count >=
ceil(q*n/100), pinned against numpy on a Ray dataset. KLL path: rank
error bound ~1.65/k from the KLL16 paper, asserted generously at 3/k.
"""

import numpy as np
import pandas as pd
import pytest

from gdal_ray.stages.quantile import KLLSketch, exact_int_quantiles, kll_quantiles


def exact_rank_quantile(vals: np.ndarray, q_pct: int) -> float:
    s = np.sort(vals)
    thresh = max(-(-q_pct * len(s) // 100), 1)
    return s[thresh - 1]


def rank_err(sorted_vals: np.ndarray, est: float, q: float) -> float:
    """Distance from q to the estimate's rank interval [P(v<est), P(v<=est)]
    — 0 when q lands inside it (the right metric under heavy ties)."""
    n = len(sorted_vals)
    lo = np.searchsorted(sorted_vals, est, side="left") / n
    hi = np.searchsorted(sorted_vals, est, side="right") / n
    return max(lo - q, q - hi, 0.0)


class TestExact:
    def test_matches_rank_rule(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(7)
        vals = rng.integers(0, 500, size=20_000)
        ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(8)
        out = exact_int_quantiles(ds, "x", [10, 25, 50, 75, 90, 99, 100])
        for _, row in out.iterrows():
            assert row["value"] == exact_rank_quantile(vals, int(row["q_pct"]))
        assert str(out["value"].dtype) == "int64"
        assert str(out["q_pct"].dtype) == "int64"

    def test_skewed_and_tiny(self, ray_session):
        import ray.data as rd

        vals = np.array([5] * 999 + [1000])  # heavy tie + outlier
        ds = rd.from_pandas(pd.DataFrame({"x": vals}))
        out = exact_int_quantiles(ds, "x", [50, 99, 100]).set_index("q_pct")
        assert out.loc[50, "value"] == 5
        assert out.loc[99, "value"] == 5  # ceil(0.99*1000)=990 <= 999 ties
        assert out.loc[100, "value"] == 1000

    def test_max_distinct_guard(self, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(pd.DataFrame({"x": np.arange(100)}))
        with pytest.raises(ValueError, match="distinct"):
            exact_int_quantiles(ds, "x", [50], max_distinct=10)


class TestKLL:
    def test_small_input_is_exact(self):
        sk = KLLSketch(k=200)
        vals = np.arange(100, dtype=float)
        sk.update_many(vals)
        got = sk.quantiles([0.5, 0.9])
        # everything fits in the buffers: answers are exact
        assert got[0] == exact_rank_quantile(vals, 50)
        assert got[1] == exact_rank_quantile(vals, 90)

    @pytest.mark.parametrize("dist", ["uniform", "lognormal", "zipfy"])
    def test_rank_error_bound(self, dist):
        rng = np.random.default_rng(11)
        n = 200_000
        vals = {
            "uniform": rng.uniform(0, 1e6, n),
            "lognormal": rng.lognormal(3.0, 2.0, n),
            "zipfy": rng.zipf(1.5, n).astype(float),
        }[dist]
        sk = KLLSketch(k=200)
        for chunk in np.array_split(vals, 37):
            sk.update_many(chunk)
        s = np.sort(vals)
        for q in (0.1, 0.5, 0.9, 0.99):
            est = sk.quantiles([q])[0]
            assert rank_err(s, est, q) <= 3.0 / 200 + 1e-9, (dist, q, est)

    def test_merge_bound(self):
        rng = np.random.default_rng(3)
        n = 120_000
        vals = rng.normal(0, 100, n)
        parts = np.array_split(vals, 16)
        sks = []
        for p in parts:
            sk = KLLSketch(k=200)
            sk.update_many(p)
            sks.append(sk)
        merged = sks[0]
        for sk in sks[1:]:
            merged.merge(sk)
        assert merged.n == n
        s = np.sort(vals)
        for q in (0.25, 0.5, 0.75, 0.95):
            est = merged.quantiles([q])[0]
            assert rank_err(s, est, q) <= 3.0 / 200 + 1e-9

    def test_serialization_roundtrip(self):
        sk = KLLSketch(k=64)
        sk.update_many(np.arange(10_000, dtype=float))
        rt = KLLSketch.from_bytes(sk.to_bytes())
        assert rt.n == sk.n
        np.testing.assert_array_equal(
            rt.quantiles([0.1, 0.5, 0.9]), sk.quantiles([0.1, 0.5, 0.9])
        )

    def test_distributed_kll(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(5)
        vals = rng.exponential(50.0, 50_000)
        ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(12)
        out = kll_quantiles(ds, "x", [0.5, 0.9, 0.99], k=200)
        assert int(out["n"].iloc[0]) == len(vals)
        s = np.sort(vals)
        for _, row in out.iterrows():
            assert rank_err(s, row["value"], row["q"]) <= 3.0 / 200 + 1e-9


class TestGrouped:
    def test_matches_per_group_rank_rule(self, ray_session):
        import ray.data as rd

        from gdal_ray.stages.quantile import grouped_int_quantiles

        rng = np.random.default_rng(13)
        n = 30_000
        keys = rng.choice(["en", "de", "fr", "zz"], size=n, p=[0.6, 0.25, 0.1, 0.05])
        vals = rng.integers(0, 400, size=n) + (keys == "de") * 1000
        ds = rd.from_pandas(pd.DataFrame({"lang": keys, "x": vals})).repartition(8)
        out = (
            grouped_int_quantiles(ds, "lang", "x", [50, 90, 99], num_buckets=4)
            .to_pandas()
            .set_index(["lang", "q_pct"])
        )
        assert len(out) == 4 * 3
        for lang in ("en", "de", "fr", "zz"):
            grp = vals[keys == lang]
            for q in (50, 90, 99):
                assert out.loc[(lang, q), "value"] == exact_rank_quantile(grp, q)


class TestRepetition:
    def test_scalar_oracle(self):
        from gdal_ray.stages.text import RepetitionStats

        df = pd.DataFrame({"text": [
            "a\nb\na\nc", "xx\nxx\nxx", "", "no dups here",
            "long line\nlong line\nshort",
        ]})
        out = RepetitionStats()(df.copy())
        # hand-computed: (dup lines, dup_chars*10000//chars)
        assert list(out["n_dup_lines"]) == [1, 2, 0, 0, 1]
        assert list(out["dup_line_char_frac_q"]) == [
            2500, 4 * 10000 // 6, 0, 0, 9 * 10000 // 23]

    def test_top_bigram(self):
        from gdal_ray.stages.text import RepetitionStats

        df = pd.DataFrame({"text": ["one two one two one two", "a b c d"]})
        out = RepetitionStats()(df.copy())
        assert out["top_bigram_char_frac"].iloc[0] == pytest.approx(1.0)
        assert out["top_bigram_char_frac"].iloc[1] == pytest.approx(0.5)
