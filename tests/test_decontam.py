"""Benchmark decontamination (gdal_ray/stages/decontam.py): exact arm vs a
pure-Python scalar oracle; Bloom arm's no-false-negative superset guarantee
and FPR bound; Bloom sketch unit properties."""

import numpy as np
import pandas as pd
import pytest

SPAN = 8


def _mkdocs(rows):
    return pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
    )


def _oracle(corpus: dict[int, str], bench: dict[int, str], span=SPAN):
    def wins(tx):
        toks = tx.split(" ")
        return {
            " ".join(toks[p:p + span])
            for p in range(0, len(toks) - span + 1)
        }

    bset = set()
    for tx in bench.values():
        bset |= wins(tx)
    out = {}
    for did, tx in corpus.items():
        n = len(wins(tx) & bset)
        if n:
            out[did] = n
    return out


_PHRASE = "the quick brown fox jumps over the lazy dog tonight again"
_CORPUS = {
    1: "alpha beta " + _PHRASE + " gamma delta epsilon zeta",
    2: "one two three four five six seven eight nine ten eleven twelve",
    3: _PHRASE,  # exact copy of a benchmark passage
    4: "unrelated words that share absolutely nothing with any benchmark",
    5: "prefix words then " + _PHRASE,  # shifted alignment
    6: "short text",  # under span tokens
}
_BENCH = {
    17: _PHRASE + " and some trailing eval-only tokens",
    34: "held out question answer pair with its own distinct wording here",
}


def test_exact_arm_matches_oracle(ray_session):
    import ray.data as rd

    from gdal_ray.stages.decontam import contaminated_docs

    got = (
        contaminated_docs(
            rd.from_pandas(_mkdocs(sorted(_CORPUS.items()))).repartition(3),
            rd.from_pandas(_mkdocs(sorted(_BENCH.items()))),
            span=SPAN,
        )
        .to_pandas()
        .set_index("doc_id")["n_contam"]
        .to_dict()
    )
    exp = _oracle(_CORPUS, _BENCH)
    assert got == exp
    # sanity on the construction itself: copies + shifted copy flagged,
    # disjoint and short docs not
    assert set(exp) == {1, 3, 5}
    assert exp[3] == len(_PHRASE.split()) - SPAN + 1


def test_exact_arm_whash_collision_killed(ray_session, monkeypatch):
    """Force every window hash to collide: the text fetch-back must still
    produce only TRUE verbatim overlaps (the hash is a router, not the
    verdict)."""
    import ray.data as rd

    from gdal_ray.stages import decontam as D

    monkeypatch.setattr(
        D, "window_hashes",
        lambda toks, span: np.zeros(max(0, len(toks) - span + 1),
                                    dtype=np.uint64),
    )
    got = (
        D.contaminated_docs(
            rd.from_pandas(_mkdocs(sorted(_CORPUS.items()))),
            rd.from_pandas(_mkdocs(sorted(_BENCH.items()))),
            span=SPAN,
        )
        .to_pandas()
        .set_index("doc_id")["n_contam"]
        .to_dict()
    )
    assert got == _oracle(_CORPUS, _BENCH)


def test_bloom_superset_and_fpr(ray_session):
    import ray.data as rd

    from gdal_ray.stages.decontam import contaminated_docs_bloom

    rng = np.random.default_rng(7)
    vocab = [f"tok{i}" for i in range(400)]
    corpus = {
        i: " ".join(rng.choice(vocab, 40)) for i in range(1, 120)
    }
    # plant benchmark passages into a known subset
    planted = {9, 41, 77}
    bench = {1000: " ".join(rng.choice(vocab, 60))}
    btoks = bench[1000].split(" ")
    for did in planted:
        corpus[did] = corpus[did] + " " + " ".join(btoks[10:10 + SPAN + 3])
    got = (
        contaminated_docs_bloom(
            rd.from_pandas(_mkdocs(sorted(corpus.items()))).repartition(4),
            rd.from_pandas(_mkdocs(sorted(bench.items()))),
            span=SPAN,
        )
        .to_pandas()
    )
    flagged = set(got["doc_id"].tolist())
    exact = set(_oracle(corpus, bench))
    assert planted <= exact  # construction check
    # no false negatives
    assert exact <= flagged
    # FPR bound: at 2^20 bits / k=7 / ~few-thousand keys, false extras ~ 0
    assert len(flagged - exact) <= 2


def test_bloom_sketch_units():
    from gdal_ray.stages.sketch import bloom_fold, bloom_partial, bloom_probe

    rng = np.random.default_rng(11)
    keys = rng.integers(0, 1 << 63, 5000, dtype=np.int64)
    half_a = bloom_partial(keys[:2500].astype(np.uint64), 1 << 20, 7)
    half_b = bloom_partial(keys[2500:].astype(np.uint64), 1 << 20, 7)
    folded = bloom_fold([half_a.tobytes(), half_b])
    # membership: every inserted key hits (no false negatives, ever)
    assert bloom_probe(keys.astype(np.uint64), folded, 7).all()
    # distributed build == single-shot build
    whole = bloom_partial(keys.astype(np.uint64), 1 << 20, 7)
    assert np.array_equal(folded, whole)
    # FPR on 20k fresh keys stays near the design point (~1% at this load)
    fresh = rng.integers(0, 1 << 63, 20000, dtype=np.int64).astype(np.uint64)
    fresh_mask = ~np.isin(fresh, keys.astype(np.uint64))
    fpr = bloom_probe(fresh[fresh_mask], folded, 7).mean()
    assert fpr < 0.01
    with pytest.raises(ValueError):
        bloom_fold([])


def test_registry_decontam_twin_sf0001(ray_session):
    """q_decontam vs its DuckDB twin at sf0.001 (the check_oracle compare,
    inlined so the suite pins it without the CLI)."""
    import duckdb

    import __ray_entry__ as E

    got = E.queries()["q_decontam"]("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    exp = con.execute(E.oracle_sql()["q_decontam"]).df()
    assert list(got.columns) == list(exp.columns)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True),
        check_dtype=False,
    )
