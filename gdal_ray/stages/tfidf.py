"""Distributed TF-IDF: document frequencies, rare-token counts, top-k terms.

The inverted-statistics shape for corpus-scale text: tokenization is the
engine's SQL-parity rule (ASCII ``\\w+`` on lowercased text, the exact
DuckDB mirror ``regexp_extract_all(lower(text), '[0-9a-z_]+')``), and
every aggregate is expressed join-free:

- ``document_frequencies``: per-batch distinct (doc, token) rows
  pre-combine to (token, batch_df) partials, ONE bucketed group-by sums
  them — df(token) without shuffling raw token occurrences;
- ``rare_token_counts``: doc-token rows and df rows CO-SHUFFLE on the
  token (the substrdup/coverage mixed-row pattern — no join operator,
  no rare-vocabulary broadcast, which would be large: most of a real
  vocabulary IS rare), then one group-by on doc_id counts each
  document's tokens with global df <= max_df. Exact-integer output —
  the gate twin replays it in SQL;
- ``tf_idf_topk``: same token co-shuffle carrying term counts, then a
  per-doc reduce keeps the top-k terms by tf * ln(N/df) (rows-only;
  scalar-replica oracle in tests).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["document_frequencies", "rare_token_counts", "tf_idf_topk"]

_TOKEN = re.compile(r"\w+", re.ASCII)


def _doc_tokens(batch: pd.DataFrame, distinct: bool) -> pd.DataFrame:
    text = batch["text"].fillna("").str.lower()
    toks = text.str.findall(_TOKEN)
    ids = batch["doc_id"].to_numpy()
    ex = toks.explode().dropna()
    df = pd.DataFrame({"doc_id": ids[ex.index.to_numpy()],
                       "token": ex.to_numpy()})
    if distinct:
        return df.drop_duplicates()
    g = df.groupby(["doc_id", "token"], sort=False).size().rename("tf")
    return g.reset_index()


def document_frequencies(ds, num_buckets: int = 32):
    """(token, df) Dataset: number of documents containing each token."""
    from gdal_ray.ops.shuffle import bucketed_group_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = _doc_tokens(batch, distinct=True)
        g = d.groupby("token", sort=False).size().rename("df")
        return g.reset_index()

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", as_index=False)["df"].sum()
        g["df"] = g["df"].astype(np.int64)
        return g

    return bucketed_group_apply(
        ds.map_batches(partial, batch_format="pandas"),
        ["token"], merge, num_buckets,
        schema=pa.schema([pa.field("token", pa.string()),
                          pa.field("df", pa.int64())]),
    )


_MIX_SCHEMA = pa.schema(
    [pa.field("token", pa.string()), pa.field("doc_id", pa.int64()),
     pa.field("tf", pa.int64()), pa.field("df", pa.int64())]
)


def _token_coshuffle(ds, dfreq, distinct: bool, num_buckets: int):
    """Mixed-row co-shuffle on token: doc rows (df = -1) + df rows
    (doc_id = -1) land together; emits (doc_id, token, tf, df)."""
    from gdal_ray.ops.shuffle import bucketed_group_apply

    def doc_rows(batch: pd.DataFrame) -> pd.DataFrame:
        d = _doc_tokens(batch, distinct=distinct)
        if distinct:
            d["tf"] = np.int64(1)
        d["df"] = np.int64(-1)
        return d[["token", "doc_id", "tf", "df"]]

    def df_rows(batch: pa.Table) -> pd.DataFrame:
        d = batch.to_pandas()
        d["doc_id"] = np.int64(-1)
        d["tf"] = np.int64(0)
        return d[["token", "doc_id", "tf", "df"]]

    mixed = ds.map_batches(doc_rows, batch_format="pandas").union(
        dfreq.map_batches(df_rows, batch_format="pyarrow")
    )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        lookup = df[df["doc_id"] < 0]
        rows = df[df["doc_id"] >= 0].copy()
        m = dict(zip(lookup["token"], lookup["df"]))
        rows["df"] = rows["token"].map(m).astype(np.int64)
        return rows[["token", "doc_id", "tf", "df"]]

    return bucketed_group_apply(mixed, ["token"], attach, num_buckets,
                                schema=_MIX_SCHEMA)


def rare_token_counts(ds, max_df: int | None = 2, max_df_frac=None,
                      num_buckets: int = 32):
    """Per document: how many of its DISTINCT tokens are globally rare —
    df <= max_df, or df <= floor(N * max_df_frac) when the fractional
    form is given (permille precision, so the threshold stays exact
    integer math on both engine and SQL sides). Documents with no
    tokens emit no row (matching the SQL join)."""
    from gdal_ray.ops.shuffle import bucketed_group_apply

    if max_df_frac is not None:
        max_df = int(ds.count()) * int(round(max_df_frac * 1000)) // 1000
    dfreq = document_frequencies(ds, num_buckets)
    joined = _token_coshuffle(ds, dfreq, distinct=True, num_buckets=num_buckets)

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id")
        out = pd.DataFrame(
            {"doc_id": g.size().index.to_numpy(dtype=np.int64),
             "n_rare": g["df"].apply(lambda s: int((s <= max_df).sum()))
             .to_numpy(dtype=np.int64)}
        )
        return out

    return bucketed_group_apply(
        joined, ["doc_id"], per_doc, num_buckets,
        schema=pa.schema([pa.field("doc_id", pa.int64()),
                          pa.field("n_rare", pa.int64())]),
    )


def tf_idf_topk(ds, k: int = 3, num_buckets: int = 32):
    """Per document: top-k tokens by tf * ln(N/df), ties to the smaller
    token. Returns (doc_id, rank, token, score)."""
    from gdal_ray.ops.shuffle import bucketed_group_apply

    n_docs = int(ds.count())
    dfreq = document_frequencies(ds, num_buckets)
    joined = _token_coshuffle(ds, dfreq, distinct=False,
                              num_buckets=num_buckets)

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["score"] = df["tf"] * np.log(n_docs / df["df"].to_numpy(float))
        df = df.sort_values(["doc_id", "score", "token"],
                            ascending=[True, False, True])
        top = df.groupby("doc_id", sort=False).head(k).copy()
        top["rank"] = top.groupby("doc_id", sort=False).cumcount() \
            .astype(np.int32)
        return top[["doc_id", "rank", "token", "score"]]

    return bucketed_group_apply(
        joined, ["doc_id"], per_doc, num_buckets,
        schema=pa.schema([pa.field("doc_id", pa.int64()),
                          pa.field("rank", pa.int32()),
                          pa.field("token", pa.string()),
                          pa.field("score", pa.float64())]),
    )
