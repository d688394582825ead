"""User-extension surface: a named-step pipeline registry.

Mirrors the reference's algorithm-pipeline registration
(``apps/gdalalg_abstract_pipeline.h:333-410``: named steps chained as
``gdal raster pipeline read ... ! reproject ... ! write ...``) in Ray Data
terms: each step is a registered callable ``fn(ds, **params) -> ds``;
``Pipeline([(name, params), ...])`` chains them lazily over a Dataset.
Users extend the engine by registering their own steps — no engine code
changes needed.

Built-in generic steps (the ogr2ogr/gdal-pipeline workhorses): filter,
derive, select, rename, sort, limit, sample, distinct.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
import pyarrow as pa

__all__ = ["register_step", "get_step", "list_steps", "Pipeline"]

_REGISTRY: dict[str, Callable] = {}


def register_step(name: str):
    """Decorator: register ``fn(ds, **params) -> ds`` under ``name``."""

    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def get_step(name: str) -> Callable:
    if name not in _REGISTRY:
        raise KeyError(f"unknown pipeline step {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_steps() -> list[str]:
    return sorted(_REGISTRY)


class Pipeline:
    """A declarative chain of registered steps over a Dataset (lazy)."""

    def __init__(self, steps: list[tuple[str, dict]]):
        self.steps = [(name, dict(params)) for name, params in steps]
        for name, _ in self.steps:
            get_step(name)  # fail fast on unknown names

    def run(self, ds):
        for name, params in self.steps:
            ds = get_step(name)(ds, **params)
        return ds

    def describe(self) -> str:
        return " ! ".join(
            name + ("" if not p else "(" + ", ".join(f"{k}={v}" for k, v in p.items()) + ")")
            for name, p in self.steps
        )


# ---- built-in steps ------------------------------------------------------

@register_step("filter")
def _step_filter(ds, expr: str):
    """Row filter via a pandas query expression (vectorized per batch)."""

    def flt(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.query(expr)

    return ds.map_batches(flt, batch_format="pandas")


@register_step("derive")
def _step_derive(ds, col: str, expr: str):
    """New column from a pandas eval expression over existing columns."""

    def drv(batch: pd.DataFrame) -> pd.DataFrame:
        batch[col] = batch.eval(expr)
        return batch

    return ds.map_batches(drv, batch_format="pandas")


@register_step("select")
def _step_select(ds, columns: list):
    return ds.select_columns(list(columns))


@register_step("rename")
def _step_rename(ds, mapping: dict):
    def rn(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([mapping.get(c, c) for c in batch.column_names])

    return ds.map_batches(rn, batch_format="pyarrow")


@register_step("sort")
def _step_sort(ds, keys: list, descending=False):
    return ds.sort(list(keys), descending=descending)


@register_step("limit")
def _step_limit(ds, n: int):
    return ds.limit(int(n))


@register_step("sample")
def _step_sample(ds, key_col: str, pct: int):
    from gdal_ray.stages.sampling import deterministic_sample

    return deterministic_sample(ds, key_col, pct)


@register_step("distinct")
def _step_distinct(ds, keys: list):
    from ray.data.aggregate import Count

    return (
        ds.groupby(list(keys)).aggregate(Count(alias_name="_n")).drop_columns(["_n"])
    )
