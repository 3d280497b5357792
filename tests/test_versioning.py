"""Corpus snapshot diff (operators/versioning.py)."""

from pyspark.sql import functions as F

from timely_spark.operators.versioning import (
    snapshot_diff,
    snapshot_diff_summary,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_snapshot_diff_statuses(spark):
    """Planted matrix: one id per status, including both-NULL content
    (unchanged under null-safe equality — a bytewise 'nothing moved')
    and NULL->text (changed)."""
    old = _frame(
        spark,
        [
            (1, "same"),
            (2, "before"),
            (3, "gone"),
            (5, None),
            (6, None),
        ],
    )
    new = _frame(
        spark,
        [
            (1, "same"),
            (2, "after"),
            (4, "fresh"),
            (5, None),
            (6, "now set"),
        ],
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "added",
        5: "unchanged",
        6: "changed",
    }


def test_snapshot_diff_summary_matches_diff(spark):
    """The summary rollup is exactly groupBy(status) over the per-doc
    diff — counts and id ranges agree with a direct recount."""
    old = _frame(spark, [(i, f"v{i % 5}") for i in range(100) if i % 11 != 7])
    new = _frame(
        spark,
        [
            (i, f"v{i % 5}" + (" rev" if i % 17 == 0 else ""))
            for i in range(100)
            if i % 13 != 5
        ],
    )
    d = snapshot_diff(old, new)
    s = {r["status"]: r for r in snapshot_diff_summary(old, new).collect()}
    recount = {
        r["status"]: r["n"]
        for r in d.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {k: v["n_docs"] for k, v in s.items()} == recount
    # every status actually occurred in this construction
    assert set(s) == {"added", "removed", "changed", "unchanged"}
    for st, row in s.items():
        ids = [r["doc_id"] for r in d.filter(F.col("status") == st).collect()]
        assert row["min_id"] == min(ids) and row["max_id"] == max(ids)


def test_snapshot_diff_hash_only_shuffle(spark):
    """The text column must not survive past the scan: the join inputs
    project (id, md5) only, so the exchange carries hashes — pinned by
    checking the optimized plan never carries the text attribute into
    the join."""
    old = _frame(spark, [(1, "x" * 1000)])
    new = _frame(spark, [(1, "x" * 1000)])
    plan = snapshot_diff(old, new)._jdf.queryExecution().optimizedPlan().toString()
    assert "Join FullOuter" in plan
    # each join input is a 2-column (id, md5) projection; the raw text
    # attribute appears only UNDER those projects, never in the join's
    # own condition/output (md5 is computed pre-shuffle)
    head = plan.splitlines()[0]
    assert "text" not in head, f"join output leaks text: {head}"
    assert plan.count("md5(cast(text") >= 2, "md5 not pushed below the join"
