"""Exact distributed heavy hitters via a Misra-Gries candidate pass.

The canonical two-pass frequent-items shape for 10^12-row columns:

1. **candidate pass** — every block folds its rows into a k-counter
   Misra-Gries summary (Misra & Gries 1982); the driver merges the
   <= num_blocks summaries with the mergeable-summaries rule (Agarwal
   et al. 2012: sum matching counters, then subtract the (k+1)-largest
   counter value and drop non-positives). The merged summary's key set
   is a GUARANTEED superset of every item with frequency > n/(k+1) —
   no shuffle, O(k) state per block;
2. **verify pass** — the candidate set broadcasts into a second scan
   that counts ONLY candidates exactly (a tiny group-by), and items at
   or above the threshold are emitted with exact counts.

Because pass 2 is exact over a guaranteed superset, the final output
EQUALS the exact answer ``HAVING COUNT(*) >= threshold`` — the sketch
buys the scale, not an approximation, so the result is SQL-twin
checkable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["MisraGries", "heavy_hitters"]


class MisraGries:
    """k-counter Misra-Gries summary over int64 values."""

    def __init__(self, k: int):
        self.k = int(k)
        self.counters: dict[int, int] = {}

    def update_many(self, vals: np.ndarray):
        uniq, cnts = np.unique(np.asarray(vals, dtype=np.int64),
                               return_counts=True)
        for v, c in zip(uniq.tolist(), cnts.tolist()):
            self.counters[v] = self.counters.get(v, 0) + c
        self._shrink()

    def merge(self, other: "MisraGries"):
        for v, c in other.counters.items():
            self.counters[v] = self.counters.get(v, 0) + c
        self._shrink()
        return self

    def _shrink(self):
        if len(self.counters) <= self.k:
            return
        # subtract the (k+1)-largest count from everything, drop <= 0
        # (the mergeable-summaries decrement; error grows by that median)
        cs = np.sort(np.fromiter(self.counters.values(), dtype=np.int64))
        sub = int(cs[-(self.k + 1)])
        self.counters = {
            v: c - sub for v, c in self.counters.items() if c - sub > 0
        }


def heavy_hitters(ds, col: str, denom: int = 128):
    """Exact items with count >= ceil(n / denom), via MG candidates.

    Returns a pandas DataFrame (value, cnt) sorted by (-cnt, value).
    ``k`` is sized at ``2*denom`` so every true heavy hitter survives
    the candidate pass (MG superset guarantee needs k+1 > denom).
    """
    k = 2 * int(denom)

    def summarize(batch: pa.Table) -> pa.Table:
        mg = MisraGries(k)
        mg.update_many(np.asarray(batch[col], dtype=np.int64))
        vs = np.fromiter(mg.counters.keys(), dtype=np.int64,
                         count=len(mg.counters))
        cs = np.fromiter(mg.counters.values(), dtype=np.int64,
                         count=len(mg.counters))
        # one marker row (c = -1) carries this block's row count, so the
        # driver learns n without a second scan
        return pa.table(
            {"v": pa.array(np.append(vs, 0)),
             "c": pa.array(np.append(cs, -1)),
             "n": pa.array(np.append(np.zeros(len(vs), np.int64),
                                     np.int64(len(batch))))}
        )

    rows = (
        ds.select_columns([col])
        .map_batches(summarize, batch_format="pyarrow")
        .take_all()
    )  # bounded: <= 2*denom counter rows per block
    # summing counters of partial MGs then shrinking IS the
    # mergeable-summaries merge rule
    merged = MisraGries(k)
    total = 0
    for r in rows:
        if r["c"] < 0:
            total += int(r["n"])
        else:
            merged.counters[r["v"]] = merged.counters.get(r["v"], 0) + r["c"]
    merged._shrink()
    candidates = np.array(sorted(merged.counters), dtype=np.int64)
    thresh = -(-total // int(denom))  # ceil(n/denom)

    import ray

    cand_ref = ray.put(candidates)

    def exact_counts(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        vals = np.asarray(batch[col], dtype=np.int64)
        vals = vals[np.isin(vals, cand)]
        uniq, cnts = np.unique(vals, return_counts=True)
        return pa.table(
            {"value": pa.array(uniq), "cnt": pa.array(cnts.astype(np.int64))}
        )

    agg = (
        ds.select_columns([col])
        .map_batches(exact_counts, batch_format="pyarrow")
        .groupby("value")
        .sum("cnt")
        .to_pandas()
    )  # bounded by candidate-set size (<= 2*denom)
    cnt_col = "sum(cnt)" if "sum(cnt)" in agg.columns else "cnt"
    out = agg[agg[cnt_col] >= thresh].rename(columns={cnt_col: "cnt"})
    out = out.sort_values(["cnt", "value"], ascending=[False, True])
    out["cnt"] = out["cnt"].astype(np.int64)
    out["value"] = out["value"].astype(np.int64)
    return out.reset_index(drop=True)[["value", "cnt"]]
