"""Visibility-expression evaluator tests (Accumulo ColumnVisibility
semantics: server/.../store/cache/VisibilityFilter.java)."""

import pytest

from timely_spark.functions.viz import evaluate_visibility, viz_filter


@pytest.mark.parametrize(
    "expr,auths,visible",
    [
        (None, set(), True),
        ("", set(), True),
        ("A", {"A"}, True),
        ("A", {"B"}, False),
        ("A&B", {"A", "B"}, True),
        ("A&B", {"A"}, False),
        ("A|B", {"B"}, True),
        ("(A&B)|C", {"C"}, True),
        ("(A&B)|C", {"A"}, False),
        ("(A&B)|C", {"A", "B"}, True),
        ("(A&(B|C))", {"A", "C"}, True),
        ('"weird token"&A', {"weird token", "A"}, True),
        ("A&&B", set(), False),  # unparseable -> fail closed
    ],
)
def test_evaluate(expr, auths, visible):
    assert evaluate_visibility(expr, auths) is visible


def test_viz_filter_dataframe(spark):
    rows = [
        ("m", 1000, 1.0, {}, None),
        ("m", 2000, 2.0, {}, "A"),
        ("m", 3000, 4.0, {}, "(A&B)"),
        ("m", 4000, 8.0, {}, "(A&B)|C"),
    ]
    df = spark.createDataFrame(
        rows, "metric string, ts long, value double, tags map<string,string>, viz string"
    )
    vals = sorted(r["value"] for r in viz_filter(df, {"A", "C"}).collect())
    assert vals == [1.0, 2.0, 8.0]
    vals = sorted(r["value"] for r in viz_filter(df, set()).collect())
    assert vals == [1.0]
    vals = sorted(r["value"] for r in viz_filter(df, {"A", "B"}).collect())
    assert vals == [1.0, 2.0, 4.0, 8.0]
