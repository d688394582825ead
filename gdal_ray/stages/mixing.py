"""Data-mixture construction (the Pile / Dolma "mixing weights" stage —
no GDAL counterpart; engine addition for training-data pipelines).

Given per-source mixture weights and a total unit budget (tokens, chars,
bytes — any additive per-doc column), select a deterministic prefix of
each source: docs in ``id_col`` order while the INCLUSIVE running sum of
``unit_col`` stays within ``budget_s = (target * w_s) // sum(w)`` (all
integer math, so the DuckDB twin — a window cumsum against the same
floor-divided budgets — matches bit-for-bit).

Distribution: ONE shuffle keyed by source (``bucketed_group_apply``);
each group's prefix scan is a vectorized sort + cumsum. Sources are few
by construction (a mixture has tens of components); if one source were
itself too large for a group, the scale path is the classic two-pass
distributed prefix sum (per-block partials -> driver prefix -> broadcast
offsets) — noted here, not needed for mixture tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from gdal_ray.ops.shuffle import bucketed_group_apply

__all__ = ["mix_budgets", "mix_select_summary", "mix_select_docs"]


def mix_budgets(weights: dict, target_units: int) -> dict:
    """{source: integer budget} with budget_s = target * w_s // sum(w)."""
    total_w = sum(weights.values())
    return {s: (int(target_units) * int(w)) // int(total_w)
            for s, w in weights.items()}


def _pick(part: pd.DataFrame, budgets: dict, source_col: str,
          id_col: str, unit_col: str) -> pd.DataFrame:
    keep = []
    for s, g in part.groupby(source_col, sort=False):
        g = g.sort_values(id_col)
        cum = g[unit_col].astype("int64").cumsum()
        keep.append(g[cum <= budgets.get(s, 0)])
    return (pd.concat(keep, ignore_index=True) if keep
            else part.iloc[0:0])


def mix_select_docs(ds, weights: dict, target_units: int,
                    source_col: str = "source", id_col: str = "doc_id",
                    unit_col: str = "n_chars", num_buckets: int = 8):
    """-> the selected doc rows themselves (for feeding the next stage)."""
    budgets = mix_budgets(weights, target_units)

    def pick(part: pd.DataFrame) -> pd.DataFrame:
        return _pick(part, budgets, source_col, id_col, unit_col)

    return bucketed_group_apply(ds, [source_col], pick, num_buckets)


def mix_select_summary(ds, weights: dict, target_units: int,
                       source_col: str = "source", id_col: str = "doc_id",
                       unit_col: str = "n_chars", num_buckets: int = 8):
    """-> one row per source: (source, budget, n_selected, units_selected,
    last_doc) — last_doc is -1 when the budget selects nothing."""
    budgets = mix_budgets(weights, target_units)

    def pick(part: pd.DataFrame) -> pd.DataFrame:
        rows = {"source": [], "budget": [], "n_selected": [],
                "units_selected": [], "last_doc": []}
        for s, g in part.groupby(source_col, sort=False):
            g = g.sort_values(id_col)
            cum = g[unit_col].astype("int64").cumsum()
            sel = g[cum <= budgets.get(s, 0)]
            rows["source"].append(s)
            rows["budget"].append(int(budgets.get(s, 0)))
            rows["n_selected"].append(int(len(sel)))
            rows["units_selected"].append(int(sel[unit_col].sum()))
            rows["last_doc"].append(
                int(sel[id_col].max()) if len(sel) else -1)
        return pd.DataFrame(rows)

    schema = pa.schema([("source", pa.string()), ("budget", pa.int64()),
                        ("n_selected", pa.int64()),
                        ("units_selected", pa.int64()),
                        ("last_doc", pa.int64())])
    return bucketed_group_apply(ds, [source_col], pick, num_buckets,
                                schema=schema)
