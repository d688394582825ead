"""Queries for the sampling operator and the user-extension Pipeline
registry — both DuckDB-checkable."""

from __future__ import annotations

import os

import ray.data as rd
from ray.data.aggregate import Count, Min

__all__ = ["q_sample_lattice", "q_pipeline_chain"]


def q_sample_lattice(sf_dir: str):
    """Deterministic 10% key-hash sample of customers -> per-segment counts
    (the reproducible, SQL-parity form of the sampling operator)."""
    from gdal_ray.stages.sampling import deterministic_sample

    ds = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    return (
        deterministic_sample(ds, "c_custkey", 10)
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_sampled"), Min("c_custkey", alias_name="min_key"))
    )


def q_pipeline_chain(sf_dir: str):
    """A user-composed named-step chain (the gdalalg pipeline surface:
    filter ! derive ! select ! sort ! limit) over the part table."""
    from gdal_ray.pipelines.registry import Pipeline

    ds = rd.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_size"]
    )
    pipe = Pipeline(
        [
            ("filter", {"expr": "p_size > 20"}),
            ("derive", {"col": "vol", "expr": "p_size * p_partkey"}),
            ("select", {"columns": ["p_partkey", "p_size", "vol"]}),
            ("sort", {"keys": ["vol", "p_partkey"], "descending": [True, False]}),
            ("limit", {"n": 50}),
        ]
    )
    return pipe.run(ds)
