"""Gopher n-gram repetition metrics (stages/text.GopherNgramStats):
hand-computed oracles on tiny docs."""

import pandas as pd

from gdal_ray.stages.text import GopherNgramStats

ABAB = "a b a b a b x"           # 7 single-char tokens
DUP5 = "x y z w v x y z w v u"   # the 5-gram "x y z w v" repeats


def _run(texts):
    return GopherNgramStats()(pd.DataFrame({"text": texts}))


def test_top_ngram_fractions_hand_computed():
    out = _run([ABAB])
    # top 2-gram "a b" x3, 2 token chars; total 7
    assert out.loc[0, "top_frac_q_2"] == 3 * 2 * 10000 // 7
    # 3-gram tie ("a b a", "b a b" both x2) -> lexicographic min "a b a"
    assert out.loc[0, "top_frac_q_3"] == 2 * 3 * 10000 // 7
    # top 4-gram "a b a b" x2 (positions 0 and 2, overlapping occurrences)
    assert out.loc[0, "top_frac_q_4"] == 2 * 4 * 10000 // 7


def test_dup_ngram_union_coverage():
    out = _run([DUP5])
    # "x y z w v" starts at 0 and 5: union [0,5) + [5,10) covers tokens
    # 0..9 of 11 -> 10/11 quantized
    assert out.loc[0, "dup_frac_q_5"] == 10 * 10000 // 11
    for n in (6, 7, 8, 9, 10):
        assert out.loc[0, f"dup_frac_q_{n}"] == 0
    # no duplicate 5-grams in the alternating doc
    assert _run([ABAB]).loc[0, "dup_frac_q_5"] == 0


def test_overlap_counted_once():
    # "a a a a a a" : every 5-gram is "a a a a a" (x2) -> all 6 tokens
    # covered once -> fraction exactly 1
    out = _run(["a a a a a a"])
    assert out.loc[0, "dup_frac_q_5"] == 10000
    # top-2 "a a" x5, 2 chars, total 6
    assert out.loc[0, "top_frac_q_2"] == 5 * 2 * 10000 // 6


def test_paragraph_unit_repetition():
    from gdal_ray.stages.text import RepetitionStats

    doc = "aa bb\n\ncc dd\n\naa bb"  # paragraph "aa bb" repeats
    out = RepetitionStats(sep="\n\n", unit="para")(
        pd.DataFrame({"text": [doc]}))
    assert out.loc[0, "n_dup_paras"] == 1
    # dup chars 5, total chars 15 -> 5*10000//15
    assert out.loc[0, "dup_para_char_frac_q"] == 5 * 10000 // 15
    # default line unit unchanged
    out2 = RepetitionStats()(pd.DataFrame({"text": ["x\nx\ny"]}))
    assert out2.loc[0, "n_dup_lines"] == 1


def test_edge_docs():
    out = _run(["", None, "single", "two words"])
    assert (out.filter(like="frac_q").to_numpy()[:3] == 0).all()
    # "two words": top_2 = 1 occurrence x 8 chars / 8 chars
    assert out.loc[3, "top_frac_q_2"] == 10000
