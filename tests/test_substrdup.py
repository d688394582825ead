"""Span-level exact-substring dedup (gdal_ray/stages/substrdup.py) vs a
pure-Python scalar oracle; winnowing guarantee checked at adversarial
offsets."""

from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

SPAN, STRIDE = 8, 4


def _oracle(docs: dict[int, str], span=SPAN, stride=STRIDE):
    groups = defaultdict(set)
    occ = defaultdict(int)
    for did, tx in docs.items():
        toks = tx.split(" ")
        for p in range(0, len(toks) - span + 1, stride):
            w = " ".join(toks[p:p + span])
            groups[w].add(did)
            occ[w] += 1
    return {w: (len(s), occ[w]) for w, s in groups.items() if len(s) > 1}


def test_window_hashes_position_sensitive():
    from gdal_ray.stages.substrdup import window_hashes

    toks = "a b c d e f g h i j k l".split()
    h1 = window_hashes(toks, SPAN)
    assert len(h1) == len(toks) - SPAN + 1
    # same multiset, different order -> different hash
    h2 = window_hashes("b a c d e f g h i j k l".split(), SPAN)
    assert h1[0] != h2[0]
    # identical window at a different position hashes identically
    h3 = window_hashes(["x"] * 4 + toks[:8], SPAN)
    assert h3[4] == h1[0]
    assert len(window_hashes(["a"], SPAN)) == 0


def test_winnow_positions_guarantee():
    from gdal_ray.stages.substrdup import winnow_positions

    rng = np.random.default_rng(3)
    h = rng.integers(0, 1 << 62, 500).astype(np.uint64)
    w = 5
    sel = winnow_positions(h, w)
    # every w-run contains a selected position (the winnowing invariant)
    sset = set(sel.tolist())
    for start in range(len(h) - w + 1):
        assert any(p in sset for p in range(start, start + w))
    # density ~ 2/(w+1)
    assert len(sel) < 0.6 * len(h)
    # short input selects exactly one (rightmost global min)
    one = winnow_positions(h[:3], w)
    assert len(one) == 1


def test_duplicated_spans_matches_oracle(ray_session):
    import ray.data as rd

    from gdal_ray.stages.substrdup import duplicated_spans

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(40)]
    docs = {}
    for d in range(60):
        docs[d] = " ".join(rng.choice(vocab, size=int(rng.integers(10, 60))))
    docs[100] = docs[0]  # full duplicate guarantees shared windows
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))
    got = duplicated_spans(ds, span=SPAN, stride=STRIDE).to_pandas()
    want = _oracle(docs)
    got_map = {w: (int(nd), int(no)) for w, nd, no in
               zip(got["win"], got["n_docs"], got["n_occ"])}
    assert got_map == want
    assert want  # non-trivial: the duplicate pair must produce windows


@pytest.mark.parametrize("offset_b", [0, 1, 2, 3])
def test_winnowed_spans_catch_any_alignment(offset_b, ray_session):
    """The winnowing guarantee: a duplicated passage of
    >= span + w - 1 tokens is caught at EVERY relative offset — exactly
    where the strided sweep can miss (stride grids only align when the
    copies start at equal offsets mod stride)."""
    import ray.data as rd

    from gdal_ray.stages.substrdup import duplicated_spans

    w = 4
    passage = " ".join(f"p{i}" for i in range(SPAN + w - 1))
    filler_a = " ".join(f"a{i}" for i in range(9))
    filler_b = " ".join(f"b{i}" for i in range(offset_b)) if offset_b else ""
    docs = {
        1: filler_a + " " + passage,
        2: (filler_b + " " + passage).strip(),
        3: " ".join(f"c{i}" for i in range(30)),
    }
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))
    got = duplicated_spans(ds, span=SPAN, winnow=w).to_pandas()
    assert len(got) >= 1
    assert all(win.split(" ")[0].startswith("p") for win in got["win"])
    assert (got["n_docs"] == 2).all()


def test_duplicated_spans_empty_and_short(ray_session):
    import ray.data as rd

    from gdal_ray.stages.substrdup import duplicated_spans

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["one two three", "four five", "unique words only here"],
    }))
    got = duplicated_spans(ds, span=8, stride=4).to_pandas()
    assert len(got) == 0


def test_registry_query_counts(ray_session):
    from gdal_ray.pipelines.corpus_queries import q_substr_dup

    got = q_substr_dup("/root/testdata/sf0.001").to_pandas()
    assert len(got) == 286  # independent Python-oracle count
    assert (got["n_docs"] >= 2).all()
    assert list(got["win"]) == sorted(got["win"])
