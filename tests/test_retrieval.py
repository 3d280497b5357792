"""BM25 scoring (operators/retrieval.py)."""

import math

import pytest

from timely_spark.operators.retrieval import (
    _query_terms,
    bm25_scores,
    bm25_scores_sql,
)


def _expected(docs, query, k1=1.2, b=0.75):
    """Pure-Python BM25 with the same tokenizer/idf — the golden."""
    import re

    tok = lambda s: re.findall(r"[a-z0-9']+", (s or "").lower())  # noqa: E731
    terms = _query_terms(query)
    dls = {i: len(tok(t)) for i, t in docs}
    n = len(docs)
    avgdl = sum(dls.values()) / n
    tfs = {}
    for i, t in docs:
        for w in tok(t):
            if w in terms:
                tfs[(i, w)] = tfs.get((i, w), 0) + 1
    dfs = {}
    for (_i, w) in tfs:
        dfs[w] = dfs.get(w, 0) + 1
    out = {}
    for (i, w), tf in tfs.items():
        idf = math.log(1.0 + (n - dfs[w] + 0.5) / (dfs[w] + 0.5))
        s = idf * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * dls[i] / avgdl)
        )
        hit, tot = out.get(i, (0, 0.0))
        out[i] = (hit + 1, tot + s)
    return {i: (h, round(t + 1e-9, 4)) for i, (h, t) in out.items()}


def test_bm25_matches_pure_python_golden(spark):
    """Planted corpus with tf variation, df variation, length variation
    and a zero-token doc (which must still count toward N and avgdl):
    scores match an independently-coded BM25 exactly at 4 dp."""
    docs = [
        (1, "alpha beta alpha gamma delta"),
        (2, "alpha beta beta beta"),
        (3, "gamma gamma gamma epsilon zeta eta theta iota"),
        (4, "unrelated words only here"),
        (5, ""),  # zero tokens: in N/avgdl, never scored
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_terms_hit"], r["score"])
        for r in bm25_scores(df, "alpha gamma").collect()
    }
    want = _expected(docs, "alpha gamma")
    assert got == want
    assert set(got) == {1, 2, 3}  # 4 and 5 emit no row


def test_bm25_sql_twin_agrees(spark):
    """The DuckDB oracle SQL computes identical (n_terms_hit, score)
    rows on the same frame — the cross-engine contract the registry row
    gates on."""
    import duckdb

    docs = [
        (i, " ".join(["alpha"] * (i % 4) + ["beta"] * (i % 3) + ["pad"] * i))
        for i in range(1, 30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        map(tuple, bm25_scores(df, "alpha beta missingterm").collect())
    )
    con = duckdb.connect()
    con.register("documents_in", __import__("pandas").DataFrame(
        docs, columns=["doc_id", "text"]
    ))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_in")
    want = sorted(
        map(tuple, con.execute(
            bm25_scores_sql("alpha beta missingterm")
        ).fetchall())
    )
    assert got == want


def test_bm25_sql_twin_apostrophe_term(spark):
    """Apostrophe-bearing query terms ("don't") are inside the
    tokenizer charset [a-z0-9'] — the SQL twin must escape them into
    well-formed string literals and still agree with the engine."""
    import duckdb

    docs = [
        (1, "don't panic and don't shout"),
        (2, "panic stations everyone"),
        (3, "nothing relevant at all"),
        (4, "don't"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(map(tuple, bm25_scores(df, "Don't panic!").collect()))
    con = duckdb.connect()
    con.register(
        "documents_in",
        __import__("pandas").DataFrame(docs, columns=["doc_id", "text"]),
    )
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_in")
    want = sorted(
        map(tuple, con.execute(bm25_scores_sql("Don't panic!")).fetchall())
    )
    assert got == want
    assert {r[0] for r in got} == {1, 2, 4}


def test_bm25_rejects_empty_query(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no terms"):
        bm25_scores(df, "!!! ???")
    with pytest.raises(ValueError, match="no terms"):
        bm25_scores_sql("%%%")
