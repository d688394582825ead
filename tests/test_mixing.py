"""Data-mixture selection (stages/mixing.py): scalar-oracle tests."""

import pytest
import ray.data as rd

from gdal_ray.stages.mixing import (mix_budgets, mix_select_docs,
                                    mix_select_summary)

ROWS = [
    # (doc_id, source, units)
    (0, "a", 10), (1, "a", 10), (2, "a", 10), (3, "a", 10),
    (4, "b", 5), (5, "b", 5), (6, "b", 5),
    (7, "c", 100),
]


@pytest.fixture(scope="module")
def ds(ray_session):
    return rd.from_items(
        [{"doc_id": d, "source": s, "n_chars": u} for d, s, u in ROWS]
    ).repartition(3)


def test_budget_math_integer_floor():
    assert mix_budgets({"a": 2, "b": 1}, 100) == {"a": 66, "b": 33}
    assert mix_budgets({"a": 1, "b": 1, "c": 1}, 10) == {
        "a": 3, "b": 3, "c": 3}


def test_summary_prefix_selection(ds):
    # weights a:2 b:1 c:1, target 60 -> budgets a=30, b=15, c=15
    out = (mix_select_summary(ds, {"a": 2, "b": 1, "c": 1}, 60)
           .to_pandas().set_index("source").sort_index())
    assert out.loc["a", "budget"] == 30
    # a: cumsum 10,20,30,40 -> first 3 docs (inclusive <= 30)
    assert out.loc["a", "n_selected"] == 3
    assert out.loc["a", "units_selected"] == 30
    assert out.loc["a", "last_doc"] == 2
    # b: cumsum 5,10,15 -> all 3
    assert out.loc["b", "n_selected"] == 3
    # c: single 100-unit doc exceeds budget 15 -> nothing, last_doc -1
    assert out.loc["c", "n_selected"] == 0
    assert out.loc["c", "last_doc"] == -1


def test_select_docs_rows(ds):
    sel = mix_select_docs(ds, {"a": 2, "b": 1, "c": 1}, 60).to_pandas()
    assert sorted(sel["doc_id"]) == [0, 1, 2, 4, 5, 6]


def test_unknown_source_gets_zero(ds):
    out = (mix_select_summary(ds, {"a": 1}, 40)
           .to_pandas().set_index("source"))
    assert out.loc["b", "n_selected"] == 0  # not in weights -> budget 0
