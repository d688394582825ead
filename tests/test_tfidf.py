"""TF-IDF / rare-token oracles (stages/tfidf.py)."""

import re

import numpy as np
import pandas as pd
import pytest

from gdal_ray.stages.tfidf import (
    document_frequencies,
    rare_token_counts,
    tf_idf_topk,
)

TOKEN = re.compile(r"\w+", re.ASCII)

DOCS = pd.DataFrame(
    {
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "the cat sat on the mat",
            "the dog sat on the log",
            "cat and dog and cat",
            "zebra quagga unique words",
            "",
            "the the the THE",
        ],
    }
)


def oracle_df(docs):
    from collections import Counter

    c = Counter()
    for t in docs["text"]:
        c.update(set(TOKEN.findall(t.lower())))
    return dict(c)


class TestTfIdf:
    def test_document_frequencies(self, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(DOCS).repartition(3)
        got = dict(
            zip(*document_frequencies(ds, num_buckets=4).to_pandas()
                [["token", "df"]].T.values)
        )
        assert got == oracle_df(DOCS)
        assert got["the"] == 3 and got["zebra"] == 1

    def test_rare_token_counts(self, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(DOCS).repartition(3)
        out = rare_token_counts(ds, max_df=1, num_buckets=4).to_pandas()
        got = dict(zip(out["doc_id"], out["n_rare"]))
        dfm = oracle_df(DOCS)
        want = {}
        for _, r in DOCS.iterrows():
            toks = set(TOKEN.findall(r["text"].lower()))
            if toks:
                want[r["doc_id"]] = sum(1 for t in toks if dfm[t] <= 1)
        assert got == want
        assert got[3] == 4  # all four words unique to doc 3
        assert 4 not in got  # empty doc emits no row

    def test_topk_matches_scalar_replica(self, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(DOCS).repartition(2)
        out = tf_idf_topk(ds, k=2, num_buckets=4).to_pandas()
        dfm = oracle_df(DOCS)
        n = len(DOCS)
        for doc_id, grp in out.groupby("doc_id"):
            text = DOCS.loc[DOCS["doc_id"] == doc_id, "text"].iloc[0]
            toks = TOKEN.findall(text.lower())
            tf = pd.Series(toks).value_counts()
            scores = sorted(
                ((t, c * np.log(n / dfm[t])) for t, c in tf.items()),
                key=lambda kv: (-kv[1], kv[0]),
            )[:2]
            got = list(zip(grp.sort_values("rank")["token"],
                           grp.sort_values("rank")["score"]))
            assert [g[0] for g in got] == [s[0] for s in scores]
            for g, s in zip(got, scores):
                assert g[1] == pytest.approx(s[1], abs=1e-12)
