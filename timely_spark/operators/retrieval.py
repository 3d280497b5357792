"""BM25 scoring — the retrieval primitive for corpus curation.

Retrieval-based curation is a standing need at 100 TB: score every
document against a probe query (a benchmark prompt, a quality exemplar,
a takedown text) and act on the ranked result — the lexical sibling of
the embedding-space ANN stack in ``operators/similarity.py``. The
reference has no retrieval tier (its lookups are key-structured,
server/.../store/MetaQuery-style); this follows the Robertson/Zaragoza
BM25 formulation with the Lucene (+1) idf.

Spark-first scale shape: ONE corpus-linear token explode feeding ONE
per-doc aggregation that computes the doc length AND each query
term's tf as conditional sums in the same pass (a handful of terms —
the conditional columns cost nothing map-side), so the corpus is
tokenized exactly once and the only corpus-sized shuffle is the
groupBy(doc) exchange, which the corpus-statistics aggregate (N,
avgdl, per-term df — one broadcastable scalar row) REUSES
(ReusedExchange; no second scan, no driver collect). No shuffle
carries text; the shuffle keys are doc ids plus small ints.

Floats: scores are rounded to 4 dp with the repo's +1e-9 half-boundary
nudge on BOTH engine sides (the classifier_score / fir protocol) —
idf's ln() is the one term whose last-ulp behavior differs between the
JVM and libm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def _query_terms(query: str) -> list[str]:
    """The ONE tokenizer contract applied to the probe query,
    deduplicated, order-preserving (BM25 sums over distinct terms)."""
    import re

    out: list[str] = []
    for t in re.findall(r"[a-z0-9']+", query.lower()):
        if t not in out:
            out.append(t)
    return out


def bm25_scores(
    docs: DataFrame,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(id, n_terms_hit, score) for every document matching >= 1 query
    term: score = sum over query terms of

        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)) — Lucene's
    shifted idf (always positive). dl is the doc's FULL token count and
    avgdl the corpus mean over ALL docs (zero-token docs included),
    both from the same single-pass aggregate. Non-matching docs emit no
    row (at 100 TB the result is query-selective, not corpus-sized);
    an empty corpus therefore yields an empty result. ``score`` is
    rounded to 4 dp (+1e-9 nudge); ties in downstream top-k
    consumption must re-break on the id."""
    terms = _query_terms(query)
    if not terms:
        raise ValueError("query tokenizes to no terms")
    # explode_outer so zero-token docs still emit one (NULL-token) row
    # and count toward N / avgdl; F.count skips the NULL so dl == 0
    ex = docs.select(
        F.col(id_col), F.explode_outer(tokens(text_col)).alias("__t")
    )
    perdoc = ex.groupBy(id_col).agg(
        F.count("__t").alias("__dl"),
        *[
            F.sum(
                F.when(F.col("__t") == F.lit(t), 1).otherwise(0)
            ).alias(f"__tf{i}")
            for i in range(len(terms))
            for t in [terms[i]]
        ],
    )
    # corpus statistics: ONE scalar row (N, total tokens, per-term df)
    # over the same grouped frame — Catalyst reuses the groupBy(doc)
    # exchange, so the corpus is scanned and tokenized exactly once
    stats = perdoc.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__dl").alias("__total"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("int")).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )
    j = perdoc.crossJoin(F.broadcast(stats))
    avgdl = F.col("__total").cast("double") / F.col("__n")

    def term_score(i: int):
        dfc = F.col(f"__df{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n").cast("double") - dfc + F.lit(0.5))
            / (dfc + F.lit(0.5))
        )
        tf = F.col(f"__tf{i}")
        return (
            idf
            * tf
            * F.lit(k1 + 1.0)
            / (
                tf
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / avgdl)
            )
        )

    # balanced pairwise sum — keeps the Add chain shallow for long
    # queries (canonicalization-depth lesson, BASELINE.md engineering
    # notes); a zero-tf term contributes exactly 0.0
    def bal(lo: int, hi: int):
        if hi - lo == 1:
            return term_score(lo)
        mid = (lo + hi) // 2
        return bal(lo, mid) + bal(mid, hi)

    hit = bal(0, len(terms))
    n_hit = sum(
        (F.col(f"__tf{i}") > 0).cast("int") for i in range(len(terms))
    )
    return (
        j.select(
            F.col(id_col),
            n_hit.cast("long").alias("n_terms_hit"),
            F.round(hit + F.lit(1e-9), 4).alias("score"),
        )
        .filter(F.col("n_terms_hit") > 0)
    )


def bm25_scores_sql(
    query: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB twin of :func:`bm25_scores` — same tokenizer contract
    (TOKENS_SQL), same Lucene idf, same rounding nudge."""
    from .text import TOKENS_SQL

    terms = _query_terms(query)
    if not terms:
        raise ValueError("query tokenizes to no terms")
    toks = TOKENS_SQL.format(c=text_col)
    # the tokenizer charset [a-z0-9'] admits apostrophes ("don't") —
    # double them so the SQL string literals stay well-formed
    term_list = ", ".join("'{}'".format(t.replace("'", "''")) for t in terms)
    return f"""
WITH ex AS (SELECT {id_col}, unnest({toks}) AS t FROM {table}),
dl AS (SELECT d.{id_col}, coalesce(l.dl, 0) AS dl
       FROM {table} d LEFT JOIN (SELECT {id_col}, count(*) AS dl
                                 FROM ex GROUP BY 1) l USING ({id_col})),
stats AS (SELECT count(*) AS n, coalesce(sum(dl), 0) AS total FROM dl),
tf AS (SELECT {id_col}, t, count(*) AS tf FROM ex
       WHERE t IN ({term_list}) GROUP BY 1, 2),
df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
s AS (SELECT tf.{id_col},
             ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * {k1 + 1.0}
             / (tf.tf + {k1} * ({1.0 - b} + {b} * dl.dl
                                / (CAST(stats.total AS DOUBLE) / stats.n)))
               AS ts
      FROM tf JOIN df USING (t) JOIN dl USING ({id_col})
      CROSS JOIN stats)
SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_terms_hit,
       round(sum(ts) + 1e-9, 4) AS score
FROM s GROUP BY 1"""
