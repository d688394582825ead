"""C4 line filter (stages/text.C4LineFilter): hand-pinned line rules."""

import pandas as pd

from gdal_ray.stages.text import C4LineFilter

DOC = "\n".join([
    "this line has exactly five words.",          # keep
    "too short line.",                            # < 5 words
    "this one has five words alright",            # no terminal punct
    'a quoted ending with five words"',           # keep (quote terminal)
    "does javascript kill this whole line here.",  # blocklist
    "Lorem Ipsum dolor sit amet filler text.",    # blocklist (case-insens.)
    "curly { brace lines are dropped here too.",  # curly brace
    "is this a kept question with many words?",   # keep (?)
    "an exclamation ending line with six words!",  # keep (!)
])


def test_line_rules_pinned():
    out = C4LineFilter()(pd.DataFrame({"text": [DOC]}))
    assert out.loc[0, "n_lines"] == 9
    assert out.loc[0, "n_kept"] == 4
    kept = out.loc[0, "filtered"].split("\n")
    assert kept == [
        "this line has exactly five words.",
        'a quoted ending with five words"',
        "is this a kept question with many words?",
        "an exclamation ending line with six words!",
    ]
    assert out.loc[0, "kept_chars"] == sum(len(x) for x in kept)
    assert out.loc[0, "keep_doc"] == 1  # 4 >= 3


def test_doc_gate_and_empty():
    docs = pd.DataFrame({"text": [
        "one good line with five words here.\nanother good line of "
        "five words.",          # only 2 kept -> dropped
        "",                     # 1 empty line, nothing kept
        None,                   # null text
    ]})
    out = C4LineFilter()(docs)
    assert out["n_kept"].tolist() == [2, 0, 0]
    assert out["keep_doc"].tolist() == [0, 0, 0]
    assert out["filtered"].tolist()[1] == ""


def test_min_params_configurable():
    f = C4LineFilter(min_words=2, min_kept_lines=1)
    out = f(pd.DataFrame({"text": ["two words."]}))
    assert out.loc[0, "n_kept"] == 1 and out.loc[0, "keep_doc"] == 1
