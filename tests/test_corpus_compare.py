"""Corpus comparison & selection-integrity (operators/corpus_compare.py)."""

import math

import pytest

from timely_spark.operators.corpus_compare import (
    source_drift,
    source_drift_sql,
    source_overlap_matrix,
    source_overlap_matrix_sql,
    split_leakage_guard,
    split_leakage_guard_md5,
    split_leakage_guard_md5_sql,
)


def _duck(views: dict):
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    for name, (rows, cols) in views.items():
        con.register(f"{name}_in", pd.DataFrame(rows, columns=cols))
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM {name}_in")
    return con


def test_source_overlap_planted(spark):
    """Two sources sharing exactly one 8-gram, a disjoint third, and a
    <8-token doc that must contribute nothing."""
    head = "one two three four five six seven eight"
    docs = [
        (1, head + " alpha", "srcA"),
        (2, head + " beta", "srcB"),
        (3, "x1 x2 x3 x4 x5 x6 x7 x8", "srcC"),
        (4, "short text", "srcA"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap_matrix(df, n=8).collect()
    }
    assert set(rows) == {("srcA", "srcB")}  # srcC overlaps nobody
    r = rows[("srcA", "srcB")]
    # each side: [one..eight] and [two..alpha/beta] = 2 distinct grams
    assert (r["grams_a"], r["grams_b"], r["shared_grams"]) == (2, 2, 1)
    assert r["jaccard"] == round(1 / 3 + 1e-9, 4)


def test_source_overlap_sql_twin(spark):
    """DuckDB twin agreement on a corpus with repeated grams inside a
    doc (distinctness), multi-doc sources, and apostrophe tokens."""
    docs = []
    for i in range(40):
        src = f"src{i % 4}"
        base = f"tok{i % 7} " * 10 + "don't stop the common run of words here"
        docs.append((i, base, src))
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = sorted(map(tuple, source_overlap_matrix(df, n=8).collect()))
    con = _duck({"documents": (docs, ["doc_id", "text", "source"])})
    want = sorted(
        map(tuple, con.execute(source_overlap_matrix_sql(n=8)).fetchall())
    )
    assert got == want
    assert got, "fixture must actually produce overlapping pairs"


def test_source_drift_golden(spark):
    """JS divergence against an independently-coded value: shifted
    distribution, a vanished source (0.5*ln2), and identical text
    (0.0)."""
    old = [(1, "a a b", "X"), (2, "c c", "Y"), (3, "same words", "Z")]
    new = [(4, "a b b", "X"), (5, "same words", "Z")]
    schema = "doc_id long, text string, source string"
    out = {
        r["source"]: r
        for r in source_drift(
            spark.createDataFrame(old, schema),
            spark.createDataFrame(new, schema),
        ).collect()
    }
    assert set(out) == {"X", "Y", "Z"}
    # hand-computed JS for P=(2/3,1/3) vs Q=(1/3,2/3)
    p, q = 2 / 3, 1 / 3
    js = 0.5 * (p * math.log(p / ((p + q) / 2)) + q * math.log(q / ((p + q) / 2))) + \
        0.5 * (q * math.log(q / ((p + q) / 2)) + p * math.log(p / ((p + q) / 2)))
    assert out["X"]["js_div"] == round(js + 1e-9, 4)
    assert out["Y"]["js_div"] == round(0.5 * math.log(2) + 1e-9, 4)
    assert out["Y"]["n_docs_new"] == 0 and out["Y"]["tokens_new"] == 0
    assert out["Z"]["js_div"] == 0.0
    assert out["X"]["tokens_old"] == 3 and out["X"]["tokens_new"] == 3


def test_source_drift_sql_twin(spark):
    """Twin agreement over a multi-source corpus where the 'new' side
    revises some docs and drops others (the registry row's shape)."""
    docs = [
        (i, f"word{i % 11} common text body number {i % 5}", f"src{i % 3}")
        for i in range(60)
    ]
    schema = "doc_id long, text string, source string"
    df = spark.createDataFrame(docs, schema)
    from pyspark.sql import functions as F

    old = df.filter(F.col("doc_id") % 7 != 3)
    new = df.filter(F.col("doc_id") % 5 != 1).withColumn(
        "text",
        F.when(F.col("doc_id") % 4 == 0, F.concat("text", F.lit(" extra")))
        .otherwise(F.col("text")),
    )
    got = sorted(map(tuple, source_drift(old, new).collect()))
    con = _duck({"documents": (docs, ["doc_id", "text", "source"])})
    sql = source_drift_sql(
        "SELECT doc_id, source, text FROM documents WHERE doc_id % 7 <> 3",
        "SELECT doc_id, source, CASE WHEN doc_id % 4 = 0 "
        "THEN text || ' extra' ELSE text END AS text "
        "FROM documents WHERE doc_id % 5 <> 1",
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_split_guard_repairs_leak(spark):
    """A duplicate pair whose raw hash splits differ must be forced to
    the keeper's split; unique docs keep their raw split untouched."""
    # find two ids whose raw xxhash64 buckets land in different splits
    from pyspark.sql import functions as F

    probe = spark.range(0, 200).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(100)).alias("b"),
    ).collect()
    train_id = next(r["id"] for r in probe if r["b"] < 80)
    test_id = next(r["id"] for r in probe if r["b"] >= 90)
    rows = [
        (train_id, "the duplicated text"),
        (test_id, "the duplicated text"),
        (150, "unique one"),
        (151, None),  # NULL text: its own group, must NOT vanish
        (152, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in split_leakage_guard(df).collect()}
    assert set(out) == {train_id, test_id, 150, 151, 152}
    keeper = min(train_id, test_id)
    for i in (train_id, test_id):
        assert out[i]["split"] == out[keeper]["split"]
    assert out[max(train_id, test_id)]["moved"]
    assert not out[keeper]["moved"]
    assert not out[150]["moved"]
    # the two NULL-text docs form one group on the keeper's split
    nk = min(151, 152)
    assert out[151]["split"] == out[152]["split"] == out[nk]["split"]
    with pytest.raises(ValueError, match="summing to 100"):
        split_leakage_guard(df, weights=(80, 10, 5))


def test_split_guard_md5_sql_twin(spark):
    """The oracle-matched md5-bucket variant agrees with DuckDB row for
    row, including planted duplicates and the moved flags."""
    docs = [(i, f"text body {i % 13}") for i in range(120)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(map(tuple, split_leakage_guard_md5(df).collect()))
    con = _duck({"documents": (docs, ["doc_id", "text"])})
    want = sorted(
        map(tuple, con.execute(split_leakage_guard_md5_sql()).fetchall())
    )
    assert got == want
    # duplicates exist by construction (i % 13) => some moved flags set
    assert any(r[2] for r in got)
    # leakage invariant: every md5 group single-split
    from collections import defaultdict

    split_of = {r[0]: r[1] for r in got}
    groups = defaultdict(set)
    for i, t in docs:
        groups[t].add(split_of[i])
    assert all(len(s) == 1 for s in groups.values())


def test_pair_emit_streams_without_single_row_blowup(spark):
    """pair_emit on a 1 200-element array yields exactly C(1200, 2)
    ordered pairs — the planted universal-gram shape (VERDICT r10
    hazard #1) where the old flatten-all-pairs idiom materialized the
    whole pair set (~719 400 structs) inside ONE row's value. The
    two-level Generate emits the same pairs as streamed rows; no
    intermediate array exceeds |arr| - 1 elements by construction."""
    from pyspark.sql import functions as F

    from timely_spark.operators.corpus_compare import pair_emit

    srcs = [f"s{i:04d}" for i in range(1200)]
    df = spark.createDataFrame([(srcs,)], "ss array<string>")
    pairs = pair_emit(df, "ss", "a", "b")
    n = 1200
    assert pairs.count() == n * (n - 1) // 2
    # ordering contract: a < b, every left element pairs with its tail
    head = pairs.filter(F.col("a") == "s0000")
    assert head.count() == n - 1
    corner = sorted(
        map(tuple, pairs.filter(F.col("a") == "s1198").collect())
    )
    assert corner == [("s1198", "s1199")]
    assert pairs.filter(F.col("a") >= F.col("b")).count() == 0


def test_source_overlap_universal_gram_planted(spark):
    """1 000 sources all sharing ONE boilerplate 8-gram (each doc also
    carries a source-unique gram): the overlap matrix must emit all
    C(1000, 2) pairs with shared_grams == 1 and grams_a == grams_b == 2
    — the skew shape the ×100 probe's disjoint-universe salting could
    not produce."""
    from pyspark.sql import functions as F

    from timely_spark.operators.corpus_compare import source_overlap_matrix

    boiler = "w1 w2 w3 w4 w5 w6 w7 w8"
    rows = [(f"src{i:04d}", f"u{i:04d} {boiler}") for i in range(1000)]
    df = spark.createDataFrame(rows, "source string, text string")
    m = source_overlap_matrix(df, n=8)
    n = 1000
    assert m.count() == n * (n - 1) // 2
    bad = m.filter(
        (F.col("shared_grams") != 1)
        | (F.col("grams_a") != 2)
        | (F.col("grams_b") != 2)
    )
    assert bad.count() == 0


def test_kmv_inter_exact_universal_item(spark):
    """kmv_set_ops' exact pairwise intersection uses the same streamed
    pair emission: an item present in EVERY group must produce
    inter_exact >= 1 for all C(|groups|, 2) pairs without building the
    pair set as one array value."""
    from timely_spark.operators.rollup import kmv_set_ops

    rows = [(f"g{i:02d}", "shared_item") for i in range(40)]
    rows += [(f"g{i:02d}", f"own_{i}_{j}") for i in range(40) for j in range(3)]
    df = spark.createDataFrame(rows, "grp string, item string")
    out = kmv_set_ops(df, "grp", "item", k=64).collect()
    assert len(out) == 40 * 39 // 2
    assert all(r["inter_exact"] >= 1 for r in out)
