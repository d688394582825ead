"""Distributed quantiles: exact histogram path + mergeable KLL sketch.

The two canonical shapes for percentiles over a 100 TB column:

- ``exact_int_quantiles``: for integer columns of bounded cardinality
  (token counts, document lengths, status codes) the exact answer needs
  NO value shuffle — each block emits its (value, count) partial
  histogram, one small group-by merges them, and the driver cumsums the
  <= ``max_distinct`` distinct rows. This is the exact-percentile
  pattern that stays one pass at any row count.

- ``KLLSketch`` / ``kll_quantiles``: for unbounded / float columns, a
  Karnin-Lang-Liberty compactor hierarchy (KLL16 paper) with
  deterministic alternating compaction. Sketches are mergeable and a
  few KB each, so every block folds its rows into one sketch row and
  the driver merges <= num_blocks sketches — the same partial-combine
  shape as the HLL distinct sketch (stages/sketch.py). Deterministic
  compaction makes a single-process build reproducible; merged results
  depend on merge order only through which *samples* survive, never
  beyond the KLL rank-error bound (~1.65/k), which the tests assert.

Quantile definition used on BOTH paths (and mirrored by the SQL twin):
``q`` maps to the smallest value whose cumulative (weighted) count
reaches ``ceil(q * n)``.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "exact_int_quantiles",
    "grouped_int_quantiles",
    "KLLSketch",
    "kll_quantiles",
]


def exact_int_quantiles(ds, col: str, q_pcts, max_distinct: int = 2_000_000):
    """Exact percentiles of an integer column via partial histograms.

    ``q_pcts``: integer percentages (e.g. [25, 50, 90, 99]) so rank
    thresholds stay exact. Returns a pandas DataFrame (q_pct, value),
    one row per requested percentile.
    """

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[col], dtype=np.int64)
        vals, cnts = np.unique(v, return_counts=True)
        return pa.table(
            {"v": pa.array(vals), "cnt": pa.array(cnts.astype(np.int64))}
        )

    merged = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .sum("cnt")
    )
    # bounded by the column's distinct-value count, NOT its row count
    hist = merged.to_pandas()
    if len(hist) > max_distinct:
        raise ValueError(
            f"{col}: {len(hist)} distinct values exceeds max_distinct="
            f"{max_distinct}; use kll_quantiles for unbounded columns"
        )
    cnt_col = "sum(cnt)" if "sum(cnt)" in hist.columns else "cnt"
    hist = hist.sort_values("v").reset_index(drop=True)
    cum = hist[cnt_col].to_numpy(dtype=np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    out = {"q_pct": [], "value": []}
    for q in q_pcts:
        thresh = -(-int(q) * n // 100)  # ceil(q*n/100) in exact int math
        i = int(np.searchsorted(cum, max(thresh, 1), side="left"))
        out["q_pct"].append(np.int64(q))
        out["value"].append(np.int64(hist["v"].iloc[min(i, len(hist) - 1)]))
    return pd.DataFrame(
        {"q_pct": pd.Series(out["q_pct"], dtype=np.int64),
         "value": pd.Series(out["value"], dtype=np.int64)}
    )


def grouped_int_quantiles(ds, key: str, col: str, q_pcts, num_buckets: int = 32):
    """Exact per-group percentiles of an integer column.

    Same rank rule as ``exact_int_quantiles``, one group per key value.
    The shuffle moves (key, value, count) partial-histogram rows — not
    data rows — so a 10^12-row table with bounded per-group cardinality
    shuffles only its distinct (key, value) pairs. Returns a Dataset
    with one row per (key, q_pct).
    """
    from gdal_ray.ops.shuffle import bucketed_group_apply

    pcts = [int(q) for q in q_pcts]

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {key: batch[key].to_pandas(),
             "v": np.asarray(batch[col], dtype=np.int64)}
        )
        g = df.groupby([key, "v"], sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        outs = {key: [], "q_pct": [], "value": []}
        for kv, g in df.groupby(key, sort=False):
            g = g.groupby("v", sort=True)["cnt"].sum()
            cum = g.to_numpy(dtype=np.int64).cumsum()
            n = int(cum[-1])
            vals = g.index.to_numpy(dtype=np.int64)
            for q in pcts:
                thresh = max(-(-q * n // 100), 1)
                i = int(np.searchsorted(cum, thresh, side="left"))
                outs[key].append(kv)
                outs["q_pct"].append(np.int64(q))
                outs["value"].append(vals[min(i, len(vals) - 1)])
        return pd.DataFrame(
            {key: outs[key],
             "q_pct": pd.Series(outs["q_pct"], dtype=np.int64),
             "value": pd.Series(outs["value"], dtype=np.int64)}
        )

    key_field = None
    sch = getattr(ds.schema(), "base_schema", None)
    if isinstance(sch, pa.Schema) and key in sch.names:
        key_field = sch.field(key).type
    out_schema = pa.schema(
        [pa.field(key, key_field or pa.string()),
         pa.field("q_pct", pa.int64()), pa.field("value", pa.int64())]
    )
    partials = ds.select_columns([key, col]).map_batches(
        partial, batch_format="pyarrow"
    )
    return bucketed_group_apply(
        partials, [key], per_key, num_buckets, schema=out_schema
    )


class KLLSketch:
    """KLL quantile sketch (Karnin, Lang, Liberty 2016) with
    deterministic alternating compaction.

    Level h holds items of weight 2^h; when total size exceeds the
    capacity budget, the fullest-over-capacity lowest level sorts its
    buffer and promotes every other element (offset flips per
    compaction) to level h+1. Rank error is O(1/k) with k retained
    items at the top level.
    """

    def __init__(self, k: int = 200):
        self.k = int(k)
        self.levels: list[list] = [[]]
        self.flips: list[int] = [0]
        self.n = 0

    # -- capacity schedule: k * (2/3)^(depth-1-h), floor 8 ---------------
    def _cap(self, h: int) -> int:
        depth = len(self.levels)
        return max(int(np.ceil(self.k * (2.0 / 3.0) ** (depth - 1 - h))), 8)

    def _total(self) -> int:
        return sum(len(b) for b in self.levels)

    def _budget(self) -> int:
        return sum(self._cap(h) for h in range(len(self.levels)))

    def update_many(self, values: np.ndarray):
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        self.levels[0].extend(vals.tolist())
        self.n += len(vals)
        self._compress()

    def _compress(self):
        while self._total() > self._budget():
            for h in range(len(self.levels)):
                if len(self.levels[h]) > self._cap(h):
                    self._compact(h)
                    break
            else:
                break

    def _compact(self, h: int):
        buf = sorted(self.levels[h])
        off = self.flips[h] & 1
        self.flips[h] += 1
        promoted = buf[off::2]
        self.levels[h] = []
        if h + 1 == len(self.levels):
            self.levels.append([])
            self.flips.append(0)
        self.levels[h + 1].extend(promoted)

    def merge(self, other: "KLLSketch"):
        while len(self.levels) < len(other.levels):
            self.levels.append([])
            self.flips.append(0)
        for h, buf in enumerate(other.levels):
            self.levels[h].extend(buf)
        self.n += other.n
        self._compress()
        return self

    def quantiles(self, qs) -> np.ndarray:
        items, weights = [], []
        for h, buf in enumerate(self.levels):
            items.extend(buf)
            weights.extend([1 << h] * len(buf))
        if not items:
            return np.full(len(qs), np.nan)
        order = np.argsort(np.asarray(items), kind="stable")
        vals = np.asarray(items)[order]
        cum = np.asarray(weights, dtype=np.int64)[order].cumsum()
        total = cum[-1]
        out = np.empty(len(qs))
        for j, q in enumerate(qs):
            thresh = max(int(np.ceil(float(q) * total)), 1)
            out[j] = vals[min(int(np.searchsorted(cum, thresh)), len(vals) - 1)]
        return out

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.k, self.levels, self.flips, self.n))

    @classmethod
    def from_bytes(cls, b: bytes) -> "KLLSketch":
        sk = cls()
        sk.k, sk.levels, sk.flips, sk.n = pickle.loads(b)
        return sk


def kll_quantiles(ds, col: str, qs, k: int = 200):
    """Distributed KLL: one sketch row per block, driver-side merge.

    Each block's rows fold into a single ~KB sketch (the 10^12-row
    COUNT-style partial shape); the driver merges <= num_blocks
    sketches. Returns a pandas DataFrame (q, value, n).
    """

    def sketch_block(batch: pa.Table) -> pa.Table:
        sk = KLLSketch(k)
        sk.update_many(np.asarray(batch[col], dtype=np.float64))
        return pa.table({"sk": pa.array([sk.to_bytes()], pa.binary())})

    parts = (
        ds.select_columns([col])
        .map_batches(sketch_block, batch_format="pyarrow")
        .take_all()
    )  # bounded: one few-KB row per input block
    merged = KLLSketch(k)
    for row in parts:
        merged.merge(KLLSketch.from_bytes(row["sk"]))
    vals = merged.quantiles(qs)
    return pd.DataFrame(
        {"q": np.asarray(qs, dtype=np.float64), "value": vals,
         "n": np.int64(merged.n)}
    )
