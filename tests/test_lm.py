"""N-gram LM scoring (gdal_ray/stages/lm.py): stupid-backoff scalar
oracle, distributed-vs-Counter training parity, OOV/pruning paths, and the
quantization-boundary margin that keeps the DuckDB twin exact."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

DOCS = {
    1: "the cat sat on the mat",
    2: "the cat ran off the mat",
    3: "a dog sat on a log",
    4: "",
}


def _train_oracle(docs):
    uni, bi = Counter(), Counter()
    for tx in docs.values():
        t = tx.split(" ")
        uni.update(t)
        bi.update(zip(t[:-1], t[1:]))
    return uni, bi, sum(uni.values())


def _score_oracle(docs, uni, bi, total):
    out = {}
    for did, tx in docs.items():
        t = tx.split(" ")
        lp_q = 0
        n_back = 0
        for i, w in enumerate(t):
            if w not in uni:
                lp = math.log(0.4 * 1.0 / total)
                n_back += 1
            elif i == 0:
                lp = math.log(uni[w] / total)
            elif (t[i - 1], w) in bi:
                lp = math.log(bi[(t[i - 1], w)] / uni[t[i - 1]])
            else:
                lp = math.log(0.4 * uni[w] / total)
                n_back += 1
            lp_q += round(lp * 1e6)
        out[did] = (len(t), n_back, lp_q)
    return out


def _mkds(docs):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))


def test_train_matches_counter(ray_session):
    from gdal_ray.stages.lm import _SEP, train_ngrams

    uni, bi, total = train_ngrams(_mkds(DOCS).repartition(3))
    euni, ebi, etotal = _train_oracle(DOCS)
    assert uni == dict(euni) and total == etotal
    assert bi == {f"{a}{_SEP}{b}": n for (a, b), n in ebi.items()}


def test_score_matches_oracle(ray_session):
    from gdal_ray.stages.lm import lm_scored_docs

    got = (lm_scored_docs(_mkds(DOCS).repartition(2)).to_pandas()
           .set_index("doc_id"))
    uni, bi, total = _train_oracle(DOCS)
    exp = _score_oracle(DOCS, uni, bi, total)
    assert len(got) == len(DOCS)
    for did, (n_tok, n_back, lp_q) in exp.items():
        r = got.loc[did]
        assert (int(r["n_tok"]), int(r["n_backoff"]), int(r["lp_q"])) == \
            (n_tok, n_back, lp_q), did
    # empty doc = one '' token, seen in training (itself) -> first-token path
    assert int(got.loc[4, "n_tok"]) == 1


def test_oov_and_pruning(ray_session):
    from gdal_ray.stages.lm import score_docs, train_ngrams

    model = train_ngrams(_mkds(DOCS))
    uni, bi, total = model
    other = {9: "the zebra sat"}
    got = score_docs(_mkds(other), model).to_pandas().iloc[0]
    # 'zebra' is OOV: scored 0.4*1/N and counted as backoff
    exp = (round(math.log(uni["the"] / total) * 1e6)
           + round(math.log(0.4 * 1.0 / total) * 1e6)
           + round(math.log(0.4 * uni["sat"] / total) * 1e6))
    assert int(got["lp_q"]) == exp and int(got["n_backoff"]) == 2
    # pruning to 2 bigrams forces more backoffs, never a crash
    pruned = train_ngrams(_mkds(DOCS), top_k_bigrams=2)
    assert len(pruned[1]) == 2
    full = score_docs(_mkds(DOCS), model).to_pandas()["n_backoff"].sum()
    less = score_docs(_mkds(DOCS), pruned).to_pandas()["n_backoff"].sum()
    assert less > full


def test_quantization_boundary_margin(ray_session):
    """The twin compares SUM(round(lp*1e6)) — safe only while every
    per-token lp*1e6 sits far from a .5 boundary relative to the few-ulp
    np.log/DuckDB-ln disagreement. Pin the margin on the real sf0.001
    corpus (fixed input, so this cannot rot silently)."""
    from gdal_ray.sources.corpus import read_parquet_tight as rpt
    from gdal_ray.stages.lm import _SEP, train_ngrams

    docs = rpt("/root/testdata/sf0.001/documents.parquet",
               columns=["doc_id", "text"])
    uni, bi, total = train_ngrams(docs)
    vals = set()
    for k, n in bi.items():
        vals.add(math.log(n / uni[k.split(_SEP)[0]]))
    for w, n in uni.items():
        vals.add(math.log(n / total))
        vals.add(math.log(0.4 * n / total))
    v = np.array(sorted(vals)) * 1e6
    frac = np.abs(v - np.floor(v) - 0.5)
    # ln(1)=0 lands exactly on an integer (distance 0.5 from boundary)
    assert frac.min() > 1e-4, f"lp too close to a .5 boundary: {frac.min()}"


def test_ccnet_buckets_scalar_oracle(ray_session):
    """Bucket assignment replicated in scalar Python: floor-div mean,
    ceil-rank quartile thresholds, strict-greater bucket counting."""
    from gdal_ray.stages.lm import ccnet_buckets

    docs = {i: " ".join(f"w{j % (i + 2)}" for j in range(3 + i))
            for i in range(12)}
    got = (ccnet_buckets(_mkds(docs).repartition(3)).to_pandas()
           .sort_values("ppl_bucket").reset_index(drop=True))

    uni, bi, total = _train_oracle(docs)
    sc = _score_oracle(docs, uni, bi, total)
    mlp = {d: lp_q // n for d, (n, _, lp_q) in sc.items()}
    vals = sorted(mlp.values())
    n = len(vals)
    thr = []
    for q in (25, 50, 75):
        rank = -(-q * n // 100)  # ceil
        thr.append(vals[rank - 1])
    bucket = {d: sum(v > t for t in thr) for d, v in mlp.items()}
    for b in sorted(set(bucket.values())):
        members = [d for d, bb in bucket.items() if bb == b]
        row = got[got["ppl_bucket"] == b].iloc[0]
        assert int(row["n_docs"]) == len(members)
        assert int(row["sum_tok"]) == sum(sc[d][0] for d in members)
        assert int(row["sum_backoff"]) == sum(sc[d][1] for d in members)
        assert int(row["min_mlp"]) == min(mlp[d] for d in members)
        assert int(row["max_mlp"]) == max(mlp[d] for d in members)
    assert int(got["n_docs"].sum()) == len(docs)


def test_registry_lm_twin_sf0001(ray_session):
    import duckdb

    import __ray_entry__ as E

    got = E.queries()["q_lm_score"]("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    exp = con.execute(E.oracle_sql()["q_lm_score"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True),
        check_dtype=False)
