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


def _expected_topk(docs, probes, k=10):
    """Per-query top-k from the pure-Python golden: (score DESC, id ASC),
    rank 1-based over the ROUNDED score — the bm25_topk contract."""
    out = []
    for qid, q in probes.items():
        scored = _expected(docs, q)
        ranked = sorted(
            ((i, h, s) for i, (h, s) in scored.items()),
            key=lambda r: (-r[2], r[0]),
        )[:k]
        out.extend(
            (qid, i, h, s, rk + 1) for rk, (i, h, s) in enumerate(ranked)
        )
    return sorted(out)


_PROBES = {
    "qa": "alpha gamma",
    "qb": "beta gamma missingterm",
    "qc": "epsilon alpha",
}


def _fixture_docs():
    return [
        (1, "alpha beta alpha gamma delta"),
        (2, "alpha beta beta beta"),
        (3, "gamma gamma gamma epsilon zeta eta theta iota"),
        (4, "unrelated words only here"),
        (5, ""),
        (6, "epsilon epsilon alpha beta gamma"),
        (7, "alpha alpha alpha alpha alpha"),
    ]


def test_bm25_topk_matches_pure_python_golden(spark):
    """Batched scoring of 3 overlapping probe queries equals the
    independently-coded per-query BM25 golden, including ranks, with
    terms shared between queries counted once in the union."""
    from timely_spark.operators.retrieval import bm25_topk

    docs = _fixture_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(map(tuple, bm25_topk(df, _PROBES, k=3).collect()))
    assert got == _expected_topk(docs, _PROBES, k=3)


def test_bm25_topk_sql_twin_agrees(spark):
    """The DuckDB twin emits identical (query_id, doc_id, n_terms_hit,
    score, rank) rows — the doc_bm25_topk registry contract."""
    import duckdb

    import pandas as pd
    from timely_spark.operators.retrieval import bm25_topk, bm25_topk_sql

    docs = [
        (i, " ".join(["alpha"] * (i % 4) + ["beta"] * (i % 3) + ["pad"] * (i % 5)))
        for i in range(1, 40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(map(tuple, bm25_topk(df, _PROBES, k=5).collect()))
    con = duckdb.connect()
    con.register("documents_in", pd.DataFrame(docs, columns=["doc_id", "text"]))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_in")
    want = sorted(map(tuple, con.execute(bm25_topk_sql(_PROBES, k=5)).fetchall()))
    assert got == want


def test_bm25_topk_consistent_with_single_query_scores(spark):
    """Each query's batched scores equal the single-probe bm25_scores
    result (same formula, same rounding) — batching must not change a
    score, only amortize the corpus pass."""
    from timely_spark.operators.retrieval import bm25_scores, bm25_topk

    docs = _fixture_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    batched = {}
    for r in bm25_topk(df, _PROBES, k=100).collect():
        batched[(r["query_id"], r["doc_id"])] = (r["n_terms_hit"], r["score"])
    for qid, q in _PROBES.items():
        single = {
            r["doc_id"]: (r["n_terms_hit"], r["score"])
            for r in bm25_scores(df, q).collect()
        }
        assert {d: v for (qq, d), v in batched.items() if qq == qid} == single


def test_bm25_rowshape_path_matches_wide(spark, monkeypatch):
    """Past WIDE_TERMS_MAX distinct union terms the row-shaped plan
    takes over (ADVICE r10: hundreds of per-term aggregate columns blow
    up codegen) — force the threshold to 1 and require bit-identical
    rows from both plans, for bm25_topk and the bm25_scores fallback."""
    import timely_spark.operators.retrieval as retrieval

    docs = _fixture_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    wide = sorted(map(tuple, retrieval.bm25_topk(df, _PROBES, k=4).collect()))
    wide_scores = sorted(
        map(tuple, retrieval.bm25_scores(df, "alpha gamma").collect())
    )
    monkeypatch.setattr(retrieval, "WIDE_TERMS_MAX", 1)
    narrow = sorted(map(tuple, retrieval.bm25_topk(df, _PROBES, k=4).collect()))
    narrow_scores = sorted(
        map(tuple, retrieval.bm25_scores(df, "alpha gamma").collect())
    )
    assert wide == narrow
    assert wide_scores == narrow_scores


def test_bm25_topk_rejects_bad_batches(spark):
    from timely_spark.operators.retrieval import bm25_topk

    df = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no queries"):
        bm25_topk(df, {})
    with pytest.raises(ValueError, match="tokenizes to no terms"):
        bm25_topk(df, {"q1": "!!!"})
    with pytest.raises(ValueError, match="duplicate query id"):
        bm25_topk(df, [("q1", "alpha"), ("q1", "beta")])


def _expected_hybrid(docs, probes, k=10, k_fuse=20, rrf_k=60, dim=32):
    """Independent pure-Python hybrid RRF golden: BM25 ranking (from
    _expected), md5-sign cosine ranking, reciprocal-rank fusion."""
    import hashlib
    import re

    def sums_of(text):
        s = [0] * dim
        for t in re.findall(r"[a-z0-9']+", (text or "").lower()):
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            for d in range(dim):
                s[d] += 1 - 2 * ((h >> d) & 1)
        return s

    doc_sums = {i: sums_of(t) for i, t in docs}
    out = []
    for qid, q in probes.items():
        bm = sorted(
            ((i, s) for i, (_h, s) in _expected(docs, q).items()),
            key=lambda r: (-r[1], r[0]),
        )[:k_fuse]
        bm_rank = {i: r + 1 for r, (i, _s) in enumerate(bm)}
        qs = sums_of(q)
        q2 = sum(x * x for x in qs)
        cos_rows = []
        for i, ds in doc_sums.items():
            n2 = sum(x * x for x in ds)
            dot = sum(a * b for a, b in zip(qs, ds))
            if q2 > 0 and n2 > 0 and dot > 0:
                cos_rows.append(
                    (i, round(dot / ((n2 * q2) ** 0.5) + 1e-9, 6))
                )
        em = sorted(cos_rows, key=lambda r: (-r[1], r[0]))[:k_fuse]
        em_rank = {i: r + 1 for r, (i, _c) in enumerate(em)}
        fused = []
        for i in set(bm_rank) | set(em_rank):
            s = (1.0 / (rrf_k + bm_rank[i]) if i in bm_rank else 0.0) + (
                1.0 / (rrf_k + em_rank[i]) if i in em_rank else 0.0
            )
            fused.append(
                (i, round(s + 1e-9, 6), bm_rank.get(i), em_rank.get(i))
            )
        ranked = sorted(fused, key=lambda r: (-r[1], r[0]))[:k]
        out.extend(
            (qid, i, s, br, er, rk + 1)
            for rk, (i, s, br, er) in enumerate(ranked)
        )
    return sorted(out, key=lambda r: (r[0], r[5]))


def test_hybrid_topk_matches_pure_python_golden(spark):
    """RRF fusion of BM25 + md5-sign cosine rankings equals an
    independently-coded golden, including per-source ranks — a doc in
    only one ranking must still fuse (outer-join semantics)."""
    from timely_spark.operators.retrieval import hybrid_topk

    docs = _fixture_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        map(tuple, hybrid_topk(df, _PROBES, k=4, k_fuse=5).collect()),
        key=lambda r: (r[0], r[5]),
    )
    assert got == _expected_hybrid(docs, _PROBES, k=4, k_fuse=5)


def test_hybrid_topk_sql_twin_agrees(spark):
    """The DuckDB twin emits identical fused rows — the
    doc_hybrid_retrieval registry contract (value-exact oracle)."""
    import duckdb
    import pandas as pd

    from timely_spark.operators.retrieval import hybrid_topk, hybrid_topk_sql

    docs = [
        (
            i,
            " ".join(
                ["alpha"] * (i % 4)
                + ["beta"] * (i % 3)
                + ["gamma"] * (i % 2)
                + ["pad", f"w{i}"] * (i % 5)
            ),
        )
        for i in range(1, 45)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(map(tuple, hybrid_topk(df, _PROBES, k=6).collect()))
    con = duckdb.connect()
    con.register("documents_in", pd.DataFrame(docs, columns=["doc_id", "text"]))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_in")
    want = sorted(
        map(tuple, con.execute(hybrid_topk_sql(_PROBES, k=6)).fetchall())
    )
    assert got == want


def test_hybrid_rowshape_path_matches_wide(spark, monkeypatch):
    """Past WIDE_TERMS_MAX union terms hybrid_topk degrades like its
    lexical sibling (VERDICT r11 #4) instead of raising: the BM25 leg
    goes row-shaped, the embedding leg keeps its fixed dim-column
    aggregate, and the fused output is bit-identical to the wide plan
    at the boundary."""
    import timely_spark.operators.retrieval as retrieval

    docs = _fixture_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    wide = sorted(
        map(tuple, retrieval.hybrid_topk(df, _PROBES, k=4, k_fuse=5).collect())
    )
    monkeypatch.setattr(retrieval, "WIDE_TERMS_MAX", 1)
    narrow = sorted(
        map(tuple, retrieval.hybrid_topk(df, _PROBES, k=4, k_fuse=5).collect())
    )
    assert wide == narrow
    # and the golden still holds through the fallback plan
    assert sorted(narrow, key=lambda r: (r[0], r[5])) == _expected_hybrid(
        docs, _PROBES, k=4, k_fuse=5
    )


def test_hybrid_topk_oversized_union_runs(spark):
    """A probe batch with >WIDE_TERMS_MAX distinct terms (the r11 hard
    failure: hundreds of benchmark prompts) now runs through the
    fallback and still ranks the real match first."""
    from timely_spark.operators.retrieval import WIDE_TERMS_MAX, hybrid_topk

    docs = _fixture_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    probes = dict(_PROBES)
    # widen the union far past the threshold with no-hit filler terms
    probes["qwide"] = "alpha " + " ".join(
        f"zz{i}" for i in range(WIDE_TERMS_MAX + 8)
    )
    got = hybrid_topk(df, probes, k=4, k_fuse=5)
    rows = got.collect()
    assert {r["query_id"] for r in rows} >= set(probes)
    # the original probes fuse identically whether or not the filler
    # query inflated the union past the wide budget
    base = {
        (r["query_id"], r["doc_id"], r["rank"], r["rrf_score"])
        for r in hybrid_topk(df, _PROBES, k=4, k_fuse=5).collect()
    }
    got_base = {
        (r["query_id"], r["doc_id"], r["rank"], r["rrf_score"])
        for r in rows
        if r["query_id"] in dict(_PROBES)
    }
    assert got_base == base
