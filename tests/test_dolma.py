"""Dolma quality signals (stages/text.DolmaSignals): hand-pinned cases."""

import pandas as pd

from gdal_ray.stages.text import DolmaSignals


def _run(texts):
    return DolmaSignals()(pd.DataFrame({"text": texts}))


def test_signals_hand_pinned():
    doc = "AA bb CCC\n- bullet line\nplain tail..."
    out = _run([doc])
    # words: AA bb CCC - bullet line plain tail... -> 8 words, 30 chars
    assert out.loc[0, "mean_wlen_q"] == 30 * 10000 // 8
    assert out.loc[0, "caps_word_frac_q"] == 2 * 10000 // 8  # AA, CCC
    assert out.loc[0, "symbol_ratio_q"] == 0
    assert out.loc[0, "ellipsis_line_frac_q"] == 1 * 10000 // 3
    assert out.loc[0, "bullet_line_frac_q"] == 1 * 10000 // 3


def test_symbols_bullets_and_edges():
    out = _run(["x # y … z", "  \t* indented bullet…", "", None, "A"])
    # '#' and '…' are words themselves (non-space runs): 5 words total
    assert out.loc[0, "symbol_ratio_q"] == 2 * 10000 // 5
    assert out.loc[1, "bullet_line_frac_q"] == 10000  # lstrip spaces/tabs
    assert out.loc[1, "ellipsis_line_frac_q"] == 10000
    assert (out.loc[2:3, ["mean_wlen_q", "caps_word_frac_q"]] == 0
            ).all().all()
    # single 'A' is not ALL-CAPS (needs 2+ chars)
    assert out.loc[4, "caps_word_frac_q"] == 0
    assert out.loc[4, "mean_wlen_q"] == 10000  # 1 char / 1 word
