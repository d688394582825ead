"""N-gram language-model quality scoring (the CCNet / KenLM filter shape).

CCNet (Wenzek et al., 2020) buckets web documents by the perplexity of a
small n-gram LM; the engine re-expresses both halves Ray-Data-first:

- ``train_ngrams``: distributed bigram+unigram counting — one vectorized
  ``map_batches`` pass emits PRE-COMBINED per-batch (gram, count) partials
  (the partial-aggregate discipline: the shuffle moves distinct grams, not
  tokens), one bucketed shuffle sums them. The fitted model is a plain
  (unigram dict, bigram dict, total) triple; ``top_k_bigrams`` prunes the
  broadcast table at scale (a 100 TB corpus trains the LM on a bounded
  held-in sample — the model, not the corpus, is what must fit in memory).

- ``score_docs``: stupid backoff (Brants et al., 2007, "Large Language
  Models in Machine Translation"): S(w|pw) = c(pw,w)/c(pw) when the bigram
  is in the model, else 0.4 * c(w)/N; the first token scores c(w)/N. The
  model is broadcast ONCE via ``ray.put``; per-batch scoring is pandas-
  vectorized map lookups (no per-token Python). Per-token log-probs are
  QUANTIZED to 1e-6 before the per-doc integer sum, so the output is
  order-independent and integer-exact — the registry twin recomputes it
  verbatim in DuckDB (np.log and DuckDB ln agree to a few ulp; the
  corpus's score set sits far from quantization boundaries, pinned in
  tests/test_lm.py).

Tokenization is ``text.split(' ')``, byte-identical to DuckDB's
``string_split`` (empty text -> one '' token on both sides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from gdal_ray.ops.shuffle import bucketed_group_apply

__all__ = ["train_ngrams", "score_docs", "lm_scored_docs",
           "ccnet_buckets"]

_SEP = " "  # joins (prev, word) into one bigram key — tokens are produced
# by split(' ') so no token contains a space (NB: a NUL separator silently
# breaks under pandas Series + scalar, which routes through numpy unicode
# scalars that truncate at NUL)
_BACKOFF = 0.4


def _flat_tokens(batch, id_col: str, text_col: str):
    """batch -> (doc_ids, tokens, prev_tokens) flat arrays; prev of each
    doc's first token is None (pd.NA after Series construction)."""
    ids, toks, prevs = [], [], []
    for did, tx in zip(batch[id_col].to_pylist(),
                       batch[text_col].to_pylist()):
        t = (tx or "").split(" ")
        ids.extend([did] * len(t))
        toks.extend(t)
        prevs.append(None)
        prevs.extend(t[:-1])
    return ids, toks, prevs


def train_ngrams(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                 num_buckets: int = 32, top_k_bigrams: int | None = None):
    """-> (uni: {w: n}, bi: {pw+SEP+w: n}, total_tokens). Distributed
    count with per-batch pre-combine; driver materializes only the DISTINCT
    gram table (the model)."""

    def partial(batch: pa.Table) -> pa.Table:
        _, toks, prevs = _flat_tokens(batch, id_col, text_col)
        s = pd.Series(toks, dtype="object")
        p = pd.Series(prevs, dtype="object")
        uni = s.value_counts()
        bi = (p + _SEP + s).dropna().value_counts()
        return pa.table({
            "gram": pa.array(uni.index.tolist() + bi.index.tolist(),
                             pa.string()),
            "kind": pa.array([0] * len(uni) + [1] * len(bi), pa.int8()),
            "n": pa.array(np.concatenate([
                uni.to_numpy(np.int64), bi.to_numpy(np.int64)])
                if len(uni) + len(bi) else np.empty(0, np.int64)),
        })

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(["gram", "kind"], sort=False)["n"].sum().reset_index()
        return pd.DataFrame({"gram": g["gram"].astype(object),
                             "kind": g["kind"].astype("int8"),
                             "n": g["n"].astype("int64")})

    schema = pa.schema([("gram", pa.string()), ("kind", pa.int8()),
                        ("n", pa.int64())])
    counts = bucketed_group_apply(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        ["gram", "kind"], combine, num_buckets, schema=schema)

    uni: dict[str, int] = {}
    bi: dict[str, int] = {}
    for b in counts.iter_batches(batch_format="pandas"):
        for gram, kind, n in zip(b["gram"], b["kind"], b["n"]):
            (uni if kind == 0 else bi)[gram] = int(n)
    if top_k_bigrams is not None and len(bi) > top_k_bigrams:
        keep = sorted(bi.items(), key=lambda kv: (-kv[1], kv[0]))
        bi = dict(keep[:top_k_bigrams])
    total = int(sum(uni.values()))
    return uni, bi, total


def score_docs(docs_ds, model, id_col: str = "doc_id",
               text_col: str = "text"):
    """-> (doc_id, n_tok, n_backoff, lp_q): stupid-backoff log-prob sum in
    1e-6-quantized integer units (lp_q), token count, and how many tokens
    fell to the unigram backoff. ``model`` = train_ngrams output or a
    ray.ObjectRef of it."""
    import ray

    ref = model if isinstance(model, ray.ObjectRef) else ray.put(model)

    def score(batch: pa.Table) -> pa.Table:
        uni, bi, total = ray.get(ref)
        ids, toks, prevs = _flat_tokens(batch, id_col, text_col)
        if not ids:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_tok": pa.array([], pa.int64()),
                "n_backoff": pa.array([], pa.int64()),
                "lp_q": pa.array([], pa.int64()),
            })
        s = pd.Series(toks, dtype="object")
        p = pd.Series(prevs, dtype="object")
        c_w = s.map(uni).to_numpy(dtype=np.float64)
        c_pw = p.map(uni).to_numpy(dtype=np.float64)
        c_bi = (p + _SEP + s).map(bi).to_numpy(dtype=np.float64)
        first = p.isna().to_numpy()
        seen = ~np.isnan(c_bi)
        # OOV (possible only when scoring a different set than the one
        # trained on): count-1 backoff, S = 0.4 * 1 / N at any position
        oov = np.isnan(c_w)
        c_w = np.where(oov, 1.0, c_w)
        first = first & ~oov
        seen = seen & ~oov
        # op order mirrors the DuckDB twin exactly: (0.4 * c) / N
        with np.errstate(invalid="ignore", divide="ignore"):
            lp = np.where(
                first, np.log(c_w / total),
                np.where(seen, np.log(c_bi / c_pw),
                         np.log(_BACKOFF * c_w / total)))
        lp_q = np.round(lp * 1e6).astype(np.int64)
        back = (~first) & ~seen
        df = pd.DataFrame({"doc_id": np.asarray(ids, dtype=np.int64),
                           "lp_q": lp_q, "back": back.astype(np.int64)})
        g = df.groupby("doc_id", sort=False).agg(
            n_tok=("lp_q", "size"), n_backoff=("back", "sum"),
            lp_q=("lp_q", "sum")).reset_index()
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
            "n_tok": pa.array(g["n_tok"].to_numpy(np.int64)),
            "n_backoff": pa.array(g["n_backoff"].to_numpy(np.int64)),
            "lp_q": pa.array(g["lp_q"].to_numpy(np.int64)),
        })

    return docs_ds.map_batches(score, batch_format="pyarrow")


def lm_scored_docs(docs_ds, score_ds=None, id_col: str = "doc_id",
                   text_col: str = "text", **train_kw):
    """Train on ``docs_ds``, score ``score_ds`` (default: the same set —
    the in-domain perplexity CCNet uses for its buckets)."""
    model = train_ngrams(docs_ds, id_col, text_col, **train_kw)
    return score_docs(score_ds if score_ds is not None else docs_ds,
                      model, id_col, text_col)


def ccnet_buckets(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                  **train_kw):
    """CCNet's perplexity bucketing (Wenzek et al., 2020 §3.3: head /
    middle / tail thirds by LM perplexity — here exact QUARTILES, 4
    buckets): per-doc mean quantized log-prob ``mlp_q = lp_q // n_tok``
    (integer floor division — monotone inverse of perplexity, so quartiles
    of mlp_q ARE perplexity quartiles), exact 25/50/75 thresholds via the
    distributed histogram quantile (``stages/quantile.py``), bucket =
    number of thresholds strictly below the doc's mlp_q (0 = worst ppl
    quartile, 3 = best). Returns one row per bucket: n_docs, sum_tok,
    sum_backoff, min/max mlp_q.

    Scale shape: scoring is one map_batches pass; the quantile pass is
    bounded by DISTINCT mlp_q values (not rows); threshold broadcast is
    3 ints; the final aggregate has 4 groups. The score pass runs twice
    (once under the quantile, once under the bucket assignment) — at
    petabyte scale persist the 4-int score table to parquet between the
    passes instead of recomputing (the checkpointed-pipeline pattern,
    ``pipelines/checkpointed.py``); both passes stream either way.
    """
    from gdal_ray.stages.quantile import exact_int_quantiles

    scored = lm_scored_docs(docs_ds, id_col=id_col, text_col=text_col,
                            **train_kw)

    def add_mlp(batch: pa.Table) -> pa.Table:
        lp = np.asarray(batch["lp_q"], dtype=np.int64)
        n = np.asarray(batch["n_tok"], dtype=np.int64)
        return batch.append_column("mlp_q", pa.array(lp // n))

    scored = scored.map_batches(add_mlp, batch_format="pyarrow")
    th = exact_int_quantiles(scored, "mlp_q", [25, 50, 75])
    t = np.sort(th["value"].to_numpy(np.int64))

    def assign(batch: pa.Table) -> pd.DataFrame:
        mlp = np.asarray(batch["mlp_q"], dtype=np.int64)
        bucket = (mlp[:, None] > t[None, :]).sum(axis=1).astype(np.int64)
        df = pd.DataFrame({
            "ppl_bucket": bucket,
            "n_tok": np.asarray(batch["n_tok"], dtype=np.int64),
            "n_backoff": np.asarray(batch["n_backoff"], dtype=np.int64),
            "mlp_q": mlp,
        })
        g = df.groupby("ppl_bucket", sort=False).agg(
            n_docs=("mlp_q", "size"), sum_tok=("n_tok", "sum"),
            sum_backoff=("n_backoff", "sum"), min_mlp=("mlp_q", "min"),
            max_mlp=("mlp_q", "max")).reset_index()
        return g.astype("int64")

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("ppl_bucket", sort=False).agg(
            n_docs=("n_docs", "sum"), sum_tok=("sum_tok", "sum"),
            sum_backoff=("sum_backoff", "sum"), min_mlp=("min_mlp", "min"),
            max_mlp=("max_mlp", "max")).reset_index()
        return g.astype("int64")

    from gdal_ray.ops.shuffle import bucketed_group_apply

    schema = pa.schema([(c, pa.int64()) for c in
                        ("ppl_bucket", "n_docs", "sum_tok", "sum_backoff",
                         "min_mlp", "max_mlp")])
    return bucketed_group_apply(
        scored.map_batches(assign, batch_format="pyarrow"),
        ["ppl_bucket"], combine, 4, schema=schema)
