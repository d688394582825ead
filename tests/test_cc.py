"""Distributed connected-components oracles (stages/cc.py)."""

import numpy as np
import pandas as pd
import pytest

from gdal_ray.stages.cc import connected_components, dup_clusters


def union_find_oracle(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def run_cc(ray_session, pairs, **kw):
    import ray.data as rd

    df = pd.DataFrame(
        {"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]},
        dtype=np.int64,
    )
    out = connected_components(rd.from_pandas(df).repartition(4), **kw)
    return dict(zip(out.to_pandas()["node"], out.to_pandas()["comp"]))


class TestCC:
    def test_small_shapes(self, ray_session):
        # two triangles + a bridge + an isolated pair
        pairs = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10),
                 (100, 200)]
        got = run_cc(ray_session, pairs)
        want = union_find_oracle(pairs)
        assert got == want
        assert got[12] == 1 and got[200] == 100

    def test_chain_diameter(self, ray_session):
        # a 40-node chain: worst case for label propagation rounds
        pairs = [(i, i + 1) for i in range(40)]
        got = run_cc(ray_session, pairs)
        assert set(got.values()) == {0} and len(got) == 41

    def test_random_graph_matches_union_find(self, ray_session):
        rng = np.random.default_rng(23)
        nodes = rng.choice(5000, size=300, replace=False)
        pairs = [tuple(sorted(rng.choice(nodes, 2, replace=False).tolist()))
                 for _ in range(220)]
        pairs = [p for p in pairs if p[0] != p[1]]
        got = run_cc(ray_session, pairs)
        assert got == union_find_oracle(pairs)

    def test_dup_clusters(self, ray_session):
        import ray.data as rd

        pairs = [(5, 9), (9, 7), (20, 21), (30, 31), (31, 32), (32, 30)]
        df = pd.DataFrame({"a": [p[0] for p in pairs],
                           "b": [p[1] for p in pairs]}, dtype=np.int64)
        out = (
            dup_clusters(rd.from_pandas(df), num_buckets=4)
            .to_pandas()
            .sort_values("comp")
            .reset_index(drop=True)
        )
        assert out.to_dict("records") == [
            {"comp": 5, "size": 3, "keeper": 5},
            {"comp": 20, "size": 2, "keeper": 20},
            {"comp": 30, "size": 3, "keeper": 30},
        ]
